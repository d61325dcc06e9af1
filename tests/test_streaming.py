"""Structured Streaming ingest: drain a backlog, merge re-crawls, and
the finalized index equals a from-scratch oracle build of the latest
state."""

from __future__ import annotations

import pytest

from vexor_spark.index.checkpoint import finalize_index
from vexor_spark.oracle import pyref
from vexor_spark.sources.corpus import PAGES_SCHEMA, page_record
from vexor_spark.streaming.ingest import start_pages_stream


def _write_batch(spark, records, path):
    spark.createDataFrame(records, PAGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(path))


def test_streaming_ingest_and_recrawl(spark, tmp_path):
    inbox = tmp_path / "inbox"
    work = tmp_path / "work"
    ckpt = tmp_path / "ckpt"

    v1 = [page_record(i) for i in range(40)]
    _write_batch(spark, v1, inbox)

    q = start_pages_stream(spark, inbox, work, ckpt, n_buckets=8)
    q.awaitTermination(120)

    idx1 = finalize_index(spark, work, salt_partitions=2, term_buckets=8)
    oracle1 = pyref.build_corpus_index([(r["url"], r["html"]) for r in v1])
    assert idx1.doc_count == oracle1["doc_count"]
    idx1.docs.unpersist(); idx1.postings.unpersist()

    # second drop: 5 new pages + 3 re-crawled urls with new content
    recrawled = []
    for i in (3, 7, 11):
        r = page_record(i, seed=999, edges=False)
        r["url"] = page_record(i)["url"]
        r["warc_ts"] = r["warc_ts"].replace(year=2027)  # newer crawl
        recrawled.append(r)
    new = [page_record(i) for i in range(40, 45)]
    _write_batch(spark, recrawled + new, inbox)

    q = start_pages_stream(spark, inbox, work, ckpt, n_buckets=8)
    q.awaitTermination(120)

    latest = {r["url"]: r for r in v1}
    for r in recrawled + new:
        latest[r["url"]] = r
    oracle2 = pyref.build_corpus_index([(r["url"], r["html"]) for r in latest.values()])

    idx2 = finalize_index(spark, work, salt_partitions=2, term_buckets=8)
    docs2 = {
        r["doc_id"]: (r["url"], r["chunk_index"], r["label"], r["doc_len"])
        for r in idx2.docs.collect()
    }
    want = {d[0]: (d[1], d[2], d[3], d[4]) for d in oracle2["docs"]}
    assert docs2 == want
    assert idx2.doc_count == oracle2["doc_count"]
    assert idx2.avg_doc_len == pytest.approx(oracle2["avg_doc_len"], rel=1e-12)
    idx2.docs.unpersist(); idx2.postings.unpersist()
