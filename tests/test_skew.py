"""Head-term skew: a term occurring in EVERY document (the Zipfian
worst case for posting assembly) must build correctly through the
salted path and stream through the sorted block writer, and score
exactly."""

from __future__ import annotations

import pytest

from vexor_spark.index.build import build_index
from vexor_spark.index.storage import PersistedIndex, build_and_write_index
from vexor_spark.oracle import pyref
from vexor_spark.sources.corpus import PAGES_SCHEMA, page_record


def _skewed_records(n: int = 400):
    recs = []
    for i in range(n):
        r = page_record(i, edges=False)
        # every page contains the hot term; tf varies
        r["html"] = (r["text"] + " hotterm" * (1 + i % 3)).encode()
        r["text"] = None  # recomputed by engine; oracle uses html
        recs.append(r)
    return recs


def test_hot_term_salted_and_streamed(spark, tmp_path):
    recs = _skewed_records()
    pages = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], None, r["lang"]) for r in recs],
        PAGES_SCHEMA,
    )
    oracle = pyref.build_corpus_index([(r["url"], r["html"]) for r in recs])
    hot_df = len(oracle["postings"]["hotterm"])
    assert hot_df >= 400  # present in every page (possibly multiple chunks)

    # salted array path
    index = build_index(pages, salt_partitions=8, term_buckets=8)
    got = {
        r["term"]: [(p["doc_id"], p["tf"], p["doc_len"]) for p in r["postings"]]
        for r in index.postings.filter("term = 'hotterm'").collect()
    }
    assert got["hotterm"] == sorted(oracle["postings"]["hotterm"])
    index.docs.unpersist(); index.postings.unpersist()

    # streamed sorted-writer path (no arrays) + query
    build_and_write_index(pages, tmp_path / "idx", term_buckets=8)
    pidx = PersistedIndex(spark, tmp_path / "idx")
    want = pyref.search(oracle, "hotterm", k=10)
    got_q = pidx.search_local("hotterm", k=10)
    assert [(d,) for _, d, _ in got_q] == [(d,) for d, _ in want]
    for (_, gd, gs), (wd, ws) in zip(got_q, want):
        assert gs == pytest.approx(ws, rel=1e-9)
    # block metadata spans the whole hot list
    blocks = (
        pidx.postings.filter("term = 'hotterm'")
        .select("block_id", "n", "df")
        .collect()
    )
    assert sum(b["n"] for b in blocks) == hot_df
    assert all(b["df"] == hot_df for b in blocks)
    assert len(blocks) == (hot_df + 127) // 128
