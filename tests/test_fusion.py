"""RRF fusion golden values (FIXTURES §4 / reference test_bm25.py:49-99
semantics) + hybrid & weighted-rerank rank parity engine vs oracle."""

from __future__ import annotations

import pytest

from vexor_spark.constants import RRF_BM25_WEIGHT, RRF_DENSE_WEIGHT, RRF_K
from vexor_spark.index.build import build_index
from vexor_spark.oracle import pyref
from vexor_spark.retrieval import hybrid_search, weighted_rerank_search
from vexor_spark.sources.corpus import generate_pages_df, generate_pages_local, query_suite

N_PAGES = 60


def test_rrf_fuse_oracle_golden():
    # dense order: docs [2, 0, 1]; bm25 scores: doc1=2.0, doc0=1.0, doc2<=0
    fused = pyref.rrf_fuse([2, 0, 1], {0: 1.0, 1: 2.0, 2: 0.0})
    k = RRF_K
    assert fused[2] == pytest.approx(RRF_DENSE_WEIGHT * (k + 1) / (k + 1))
    assert fused[0] == pytest.approx(
        RRF_DENSE_WEIGHT * (k + 1) / (k + 2) + RRF_BM25_WEIGHT * (k + 1) / (k + 2)
    )
    assert fused[1] == pytest.approx(
        RRF_DENSE_WEIGHT * (k + 1) / (k + 3) + RRF_BM25_WEIGHT * (k + 1) / (k + 1)
    )
    # zero/negative bm25 scores excluded from the bm25 ranking
    assert 2 in fused and fused[2] == pytest.approx(0.7 * 61 / 61)


def test_letter_cosine_golden():
    assert pyref.letter_cosine("abc", "abc") == pytest.approx(1.0)
    assert pyref.letter_cosine("abc", "xyz") == 0.0
    assert pyref.letter_cosine("", "abc") == 0.0
    assert pyref.letter_cosine("aab", "ab") == pytest.approx(
        (2 * 1 + 1 * 1) / ((5**0.5) * (2**0.5))
    )


@pytest.fixture(scope="module")
def built(spark):
    pages = generate_pages_df(spark, N_PAGES, edges=True, partitions=4)
    index = build_index(pages, salt_partitions=2, term_buckets=8)
    local = generate_pages_local(N_PAGES, edges=True)
    oracle = pyref.build_corpus_index([(r["url"], r["html"]) for r in local])
    yield index, oracle
    index.docs.unpersist()
    index.postings.unpersist()


def _assert_rank_parity(got, want, tol=1e-9):
    """Rank-identical up to adjacent swaps of score-ties within tol."""
    assert len(got) == len(want)
    assert {d for d, _ in got} == {d for d, _ in want}
    w_scores = dict(want)
    for gd, gs in got:
        assert gs == pytest.approx(w_scores[gd], rel=1e-7, abs=1e-9), gd
    # strict order where gaps exceed tolerance
    for i in range(len(got) - 1):
        if abs(got[i][1] - got[i + 1][1]) > tol:
            gi = [d for d, _ in got]
            wi = [d for d, _ in want]
            assert gi[i] == wi[i] or abs(w_scores[gi[i]] - w_scores[wi[i]]) <= tol


@pytest.mark.parametrize("qi", range(0, 30, 4))
def test_hybrid_rank_parity(built, qi):
    index, oracle = built
    q = query_suite(N_PAGES)[qi]["query"]
    want = pyref.hybrid_search(oracle, q, k=10)
    got = [(r["doc_id"], r["score"]) for r in hybrid_search(index, q, k=10).collect()]
    _assert_rank_parity(got, want)


@pytest.mark.parametrize("qi", [0, 5, 11, 24])
def test_weighted_rerank_parity(built, qi):
    index, oracle = built
    q = query_suite(N_PAGES)[qi]["query"]
    want = pyref.weighted_rerank_search(oracle, q, k=10)
    got = [
        (r["doc_id"], r["score"])
        for r in weighted_rerank_search(index, q, k=10).collect()
    ]
    _assert_rank_parity(got, want, tol=1e-7)


def test_weighted_rerank_duplicate_terms(built):
    """Duplicate query tokens weight BM25L contributions (legacy arm has
    no dedup) — parity on a doubled-term query."""
    index, oracle = built
    q = "spark spark index"
    want = pyref.weighted_rerank_search(oracle, q, k=10)
    got = [
        (r["doc_id"], r["score"])
        for r in weighted_rerank_search(index, q, k=10).collect()
    ]
    _assert_rank_parity(got, want, tol=1e-7)


def test_hybrid_empty_query(built):
    index, oracle = built
    got = hybrid_search(index, "搜索引擎", k=5).collect()
    want = pyref.hybrid_search(oracle, "搜索引擎", k=5)
    # dense leg still ranks by letter cosine (0 for CJK) → fused is pure
    # dense rank; both sides must agree
    _assert_rank_parity([(r["doc_id"], r["score"]) for r in got], want)
