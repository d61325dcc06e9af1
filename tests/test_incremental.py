"""Resumable/incremental build: unchanged buckets skipped, removed urls
dropped, and the incremental result equals a from-scratch build
(idempotence) — FIXTURES.md §5 semantics."""

from __future__ import annotations

import pytest

from vexor_spark.index.checkpoint import build_index_resumable
from vexor_spark.oracle import pyref
from vexor_spark.sources.corpus import PAGES_SCHEMA, generate_pages_local, page_record

N_V1 = 60


def _v1_records():
    return generate_pages_local(N_V1, edges=True)


def _v2_records():
    """~10% changed, 3 removed, 4 added vs v1."""
    recs = []
    for i in range(N_V1):
        if i in (50, 51, 52):
            continue  # removed
        if i in (20, 21, 22, 23, 24, 25):
            r = page_record(i, seed=1042, edges=False)  # changed content
            r["url"] = page_record(i)["url"]  # same url, new html/text
            recs.append(r)
        else:
            recs.append(page_record(i))
    for i in range(N_V1, N_V1 + 4):
        recs.append(page_record(i))  # added
    return recs


def _df(spark, records):
    return spark.createDataFrame(records, PAGES_SCHEMA)


def _index_state(index):
    docs = {
        r["doc_id"]: (r["url"], r["chunk_index"], r["label"], r["doc_len"])
        for r in index.docs.collect()
    }
    postings = {
        r["term"]: [(p["doc_id"], p["tf"], p["doc_len"]) for p in r["postings"]]
        for r in index.postings.collect()
    }
    return docs, postings, index.doc_count, index.avg_doc_len


def test_incremental_build_lifecycle(spark, tmp_path):
    work = tmp_path / "work"

    # v1 full build: every non-empty bucket built
    idx1, rec1 = build_index_resumable(
        _df(spark, _v1_records()), work, n_buckets=16, salt_partitions=2, term_buckets=8
    )
    assert rec1["buckets_built"] == rec1["buckets_total"] > 0
    assert rec1["buckets_skipped"] == 0
    oracle1 = pyref.build_corpus_index([(r["url"], r["html"]) for r in _v1_records()])
    docs1, postings1, n1, avg1 = _index_state(idx1)
    assert n1 == oracle1["doc_count"]
    idx1.docs.unpersist(); idx1.postings.unpersist()

    # no-op rebuild: zero buckets rebuilt (reference UP_TO_DATE fast path)
    idx1b, rec1b = build_index_resumable(
        _df(spark, _v1_records()), work, n_buckets=16, salt_partitions=2, term_buckets=8
    )
    assert rec1b["buckets_built"] == 0
    assert rec1b["buckets_skipped"] == rec1["buckets_total"]
    docs1b, postings1b, n1b, _ = _index_state(idx1b)
    assert docs1b == docs1 and n1b == n1
    idx1b.docs.unpersist(); idx1b.postings.unpersist()

    # v2 incremental: only buckets containing changed/added/removed urls rebuilt
    v2 = _v2_records()
    idx2, rec2 = build_index_resumable(
        _df(spark, v2), work, n_buckets=16, salt_partitions=2, term_buckets=8
    )
    assert 0 < rec2["buckets_built"] < rec2["buckets_total"] + rec2["buckets_removed"] + 1
    assert rec2["buckets_skipped"] > 0

    # idempotence: incremental result == from-scratch build on v2 (oracle)
    oracle2 = pyref.build_corpus_index([(r["url"], r["html"]) for r in v2])
    docs2, postings2, n2, avg2 = _index_state(idx2)
    assert n2 == oracle2["doc_count"]
    assert avg2 == pytest.approx(oracle2["avg_doc_len"], rel=1e-12)
    want_docs = {d[0]: (d[1], d[2], d[3], d[4]) for d in oracle2["docs"]}
    assert docs2 == want_docs
    want_postings = {t: sorted(pl) for t, pl in oracle2["postings"].items()}
    assert postings2 == want_postings

    # removed url really gone
    gone = page_record(50)["url"]
    assert not any(u == gone for u, _, _, _ in docs2.values())
    idx2.docs.unpersist(); idx2.postings.unpersist()


def test_resume_after_partial_build(spark, tmp_path):
    """Stage-1 checkpoint: pre-building a subset leaves lineage that a
    later full build reuses (only the missing buckets are computed)."""
    work = tmp_path / "resume"
    all_records = _v1_records()
    subset = all_records[:30]

    _, rec_a = build_index_resumable(
        _df(spark, subset), work, n_buckets=16, salt_partitions=2, term_buckets=8
    )
    # full corpus: buckets whose page set is unchanged by the widening
    # are NOT rebuilt; every bucket gaining pages is
    idx, rec_b = build_index_resumable(
        _df(spark, all_records), work, n_buckets=16, salt_partitions=2, term_buckets=8
    )
    assert rec_b["buckets_built"] < rec_b["buckets_total"]
    oracle = pyref.build_corpus_index([(r["url"], r["html"]) for r in all_records])
    assert idx.doc_count == oracle["doc_count"]
    docs, postings, _, _ = _index_state(idx)
    assert docs == {d[0]: (d[1], d[2], d[3], d[4]) for d in oracle["docs"]}
    idx.docs.unpersist(); idx.postings.unpersist()
