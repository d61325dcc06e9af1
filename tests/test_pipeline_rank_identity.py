"""End-to-end rank identity: Spark pipeline vs pure-Python oracle on the
synthetic pages corpus + 30-query suite (SURVEY §5 correctness gate)."""

from __future__ import annotations

import pytest

from vexor_spark.index.build import build_index
from vexor_spark.oracle import pyref
from vexor_spark.sources.corpus import generate_pages_df, generate_pages_local, query_suite

N_PAGES = 120


@pytest.fixture(scope="module")
def corpora(spark):
    pages_df = generate_pages_df(spark, N_PAGES, edges=True, partitions=6)
    index = build_index(pages_df, salt_partitions=4, term_buckets=16)
    local = generate_pages_local(N_PAGES, edges=True)
    oracle = pyref.build_corpus_index([(r["url"], r["html"]) for r in local])
    yield index, oracle
    index.docs.unpersist()
    index.postings.unpersist()


def test_doc_ids_and_lengths_identical(corpora):
    index, oracle = corpora
    got = {
        r["doc_id"]: (r["url"], r["chunk_index"], r["label"], r["doc_len"])
        for r in index.docs.collect()
    }
    want = {d[0]: (d[1], d[2], d[3], d[4]) for d in oracle["docs"]}
    assert got == want


def test_corpus_stats_identical(corpora):
    index, oracle = corpora
    assert index.doc_count == oracle["doc_count"]
    assert index.avg_doc_len == pytest.approx(oracle["avg_doc_len"], rel=1e-12)


def test_postings_identical(corpora):
    index, oracle = corpora
    got = {
        r["term"]: [(p["doc_id"], p["tf"], p["doc_len"]) for p in r["postings"]]
        for r in index.postings.collect()
    }
    want = {t: sorted(pl) for t, pl in oracle["postings"].items()}
    assert set(got.keys()) == set(want.keys())
    for term in want:
        assert got[term] == want[term], term
    # df column is posting-list length (reference A2, bm25.py:79)
    dfs = {r["term"]: r["df"] for r in index.postings.select("term", "df").collect()}
    for term in want:
        assert dfs[term] == len(want[term])


def test_topk_rank_identical_on_query_suite(corpora):
    index, oracle = corpora
    queries = query_suite(N_PAGES)
    assert len(queries) == 30
    url_by_doc = {d[0]: d[1] for d in oracle["docs"]}
    hits = 0
    for q in queries:
        want = pyref.search(oracle, q["query"], k=10)
        got = [
            (r["doc_id"], r["score"])
            for r in index.search(q["query"], k=10).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want], q["query"]
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-9), (q["query"], gd)
        if q["expected"] is not None and want:
            if url_by_doc[want[0][0]] == q["expected"]:
                hits += 1
    # the suite is built so unique-id queries rank their page #1
    assert hits >= 20


def test_filtered_search_superset_semantics(corpora):
    """url-prefix narrowing uses full-corpus stats (O6/F5 semantics)."""
    index, oracle = corpora
    prefix = "https://example.org/spark/"
    q = "spark index merge data"
    want = pyref.search_filtered(oracle, q, 10, prefix)
    got = [
        (r["doc_id"], r["score"])
        for r in index.search(q, k=10, url_prefix=prefix)
        .select("doc_id", "score")
        .collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9)
    url_by_doc = {d[0]: d[1] for d in oracle["docs"]}
    assert all(url_by_doc[d].startswith(prefix) for d, _ in got)


def test_search_result_decoration(corpora):
    index, _ = corpora
    rows = index.search("uid_000042", k=5).collect()
    assert rows, "expected at least one hit"
    top = rows[0]
    assert top["url"].endswith("000042.html")
    assert top["rank"] == 1
    assert top["preview"] is not None
    assert set(rows[0].asDict()) == {
        "rank", "doc_id", "url", "score", "preview",
        "chunk_index", "start_line", "end_line",
    }
