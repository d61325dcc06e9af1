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


def _rank_bm25_bm25l_published(corpus, query, k1=1.5, b=0.75, delta=0.5):
    """Independent transcription of rank_bm25's published BM25L
    (github.com/dorianbrown/rank_bm25, BM25L._calc_idf + get_scores):
    idf = ln(N+1) - ln(df+0.5); for EVERY query token q and EVERY doc,
    score += (idf.get(q) or 0) * (k1+1) * (ctd+delta) / (k1+ctd+delta),
    ctd = tf / (1 - b + b*dl/avgdl). tf=0 docs therefore receive the
    nonzero baseline idf*(k1+1)*delta/(k1+delta) per present term."""
    import math

    n = len(corpus)
    avgdl = sum(len(d) for d in corpus) / n
    nd: dict[str, int] = {}
    for doc in corpus:
        for w in set(doc):
            nd[w] = nd.get(w, 0) + 1
    idf = {w: math.log(n + 1) - math.log(df + 0.5) for w, df in nd.items()}
    scores = [0.0] * n
    for q in query:
        for i, doc in enumerate(corpus):
            tf = doc.count(q)
            ctd = tf / (1 - b + b * len(doc) / avgdl)
            scores[i] += (idf.get(q) or 0) * (k1 + 1) * (ctd + delta) / (k1 + ctd + delta)
    return scores


def test_bm25l_matches_rank_bm25_published_formula():
    """Pin BOTH BM25L implementations (pyref oracle + engine driver path)
    to rank_bm25's published formula, including the absent-term baseline
    a tf-only implementation would miss."""
    from vexor_spark.retrieval import bm25l_scores_py

    corpus = [
        ["spark", "join", "window", "spark"],
        ["merge", "sort", "hash"],
        ["spark", "merge"],
        ["totally", "unrelated", "tokens"],
    ]
    for query in (
        ["spark", "merge"],
        ["spark", "spark", "join"],  # duplicates weighted
        ["absent"],  # not in corpus → all zeros
        ["spark", "absent", "hash"],
    ):
        want = _rank_bm25_bm25l_published(corpus, query)
        assert pyref.bm25l_scores(query, corpus) == pytest.approx(want, abs=1e-12)
        assert bm25l_scores_py(query, corpus) == pytest.approx(want, abs=1e-12)
    # the doc with NO query term still gets the per-term baseline
    got = pyref.bm25l_scores(["spark"], corpus)
    assert got[3] > 0.0


def test_rrf_topk_equals_full_ranking(spark):
    """Candidate-bounded exact RRF (fusion.rrf_topk) reproduces the
    brute-force full-corpus ranking exactly (bound proof in
    rrf_candidate_budget), across score ties and sparse bm25 legs."""
    import random

    from vexor_spark.constants import RRF_BM25_WEIGHT, RRF_DENSE_WEIGHT, RRF_K
    from vexor_spark.operators.fusion import rrf_topk

    rng = random.Random(7)
    n = 400
    dense = [(i, rng.choice([0.0, 0.25, 0.5, rng.random()])) for i in range(n)]
    bm25 = [(i, rng.choice([-1.0, 0.0, rng.random() * 3])) for i in range(n) if i % 3]
    ddf = spark.createDataFrame(dense, "doc_id long, dense_score double")
    bdf = spark.createDataFrame(bm25, "doc_id long, score double")
    got = [tuple(r) for r in rrf_topk(ddf, bdf, 10).collect()]

    # brute force on the driver
    dorder = sorted(dense, key=lambda t: (-t[1], t[0]))
    drank = {d: r + 1 for r, (d, _) in enumerate(dorder)}
    border = sorted([t for t in bm25 if t[1] > 0], key=lambda t: (-t[1], t[0]))
    brank = {d: r + 1 for r, (d, _) in enumerate(border)}
    fused = []
    for i in range(n):
        f = RRF_DENSE_WEIGHT * (RRF_K + 1) / (RRF_K + drank[i])
        if i in brank:
            f += RRF_BM25_WEIGHT * (RRF_K + 1) / (RRF_K + brank[i])
        fused.append((i, f))
    fused.sort(key=lambda t: (-t[1], t[0]))
    want = [(r + 1, d, s) for r, (d, s) in enumerate(fused[:10])]
    assert [(r, d) for r, d, _ in got] == [(r, d) for r, d, _ in want]
    for (_, _, gs), (_, _, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-12)


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
