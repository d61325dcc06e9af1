"""Hand-computed BM25 golden values (FIXTURES.md §4, mirroring the
reference's tests/unit/test_bm25.py:33-47) asserted against BOTH the
oracle and the Spark scorer, plus oracle-vs-Spark on random postings."""

from __future__ import annotations

import math

import pytest

from vexor_spark.constants import BM25_B, BM25_K1
from vexor_spark.operators.scoring import score_postings_df, top_k
from vexor_spark.oracle import pyref

# postings: term -> [(doc_id, tf, doc_len)]
GOLDEN_POSTINGS = {
    "alpha": [(0, 2, 3), (1, 1, 2)],
    "beta": [(1, 1, 2)],
}
DOC_COUNT = 3
AVG_DL = 2.0


def _idf(df: int, n: int = DOC_COUNT) -> float:
    return math.log((n - df + 0.5) / (df + 0.5) + 1.0)


def golden_scores() -> dict[int, float]:
    idf_a, idf_b = _idf(2), _idf(1)
    s0 = idf_a * 2 * (BM25_K1 + 1) / (2 + BM25_K1 * (1 - BM25_B + BM25_B * 3 / AVG_DL))
    s1_a = idf_a * 1 * (BM25_K1 + 1) / (1 + BM25_K1 * (1 - BM25_B + BM25_B * 2 / AVG_DL))
    s1_b = idf_b * 1 * (BM25_K1 + 1) / (1 + BM25_K1 * (1 - BM25_B + BM25_B * 2 / AVG_DL))
    return {0: s0, 1: s1_a + s1_b}


def test_oracle_matches_closed_form():
    got = pyref.score_postings(["alpha", "beta"], GOLDEN_POSTINGS, DOC_COUNT, AVG_DL)
    want = golden_scores()
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_oracle_empty_guards():
    assert pyref.score_postings(["alpha"], GOLDEN_POSTINGS, 0, AVG_DL) == {}
    assert pyref.score_postings(["alpha"], GOLDEN_POSTINGS, DOC_COUNT, 0.0) == {}
    assert pyref.score_postings(["missing"], GOLDEN_POSTINGS, DOC_COUNT, AVG_DL) == {}


def _postings_df(spark, postings: dict):
    rows = [
        (term, len(plist), [(int(d), int(tf), int(dl)) for d, tf, dl in sorted(plist)])
        for term, plist in postings.items()
    ]
    return spark.createDataFrame(
        rows,
        "term string, df int, postings array<struct<doc_id:bigint,tf:int,doc_len:int>>",
    )


def test_spark_scorer_matches_closed_form(spark):
    pdf = _postings_df(spark, GOLDEN_POSTINGS)
    got = {
        r["doc_id"]: r["score"]
        for r in score_postings_df(pdf, ["alpha", "beta"], DOC_COUNT, AVG_DL).collect()
    }
    want = golden_scores()
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_spark_scorer_matches_oracle_random(spark):
    import random

    rng = random.Random(7)
    terms = [f"t{i}" for i in range(50)]
    postings: dict[str, list[tuple[int, int, int]]] = {}
    doc_lens = {d: rng.randint(1, 40) for d in range(200)}
    for t in terms:
        docs = rng.sample(range(200), rng.randint(1, 60))
        postings[t] = [(d, rng.randint(1, 5), doc_lens[d]) for d in sorted(docs)]
    avg_dl = sum(doc_lens.values()) / len(doc_lens)
    query = [f"t{i}" for i in range(0, 50, 3)] + ["missing_term"]

    want = pyref.score_postings(query, postings, 200, avg_dl)
    pdf = _postings_df(spark, postings)
    got = {
        r["doc_id"]: r["score"]
        for r in score_postings_df(pdf, query, 200, avg_dl).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


def test_topk_tiebreak_doc_id_asc(spark):
    scored = spark.createDataFrame(
        [(5, 1.0), (2, 1.0), (9, 2.0), (1, 0.5)], "doc_id long, score double"
    )
    rows = top_k(scored, 3).collect()
    assert [(r["rank"], r["doc_id"]) for r in rows] == [(1, 9), (2, 2), (3, 5)]


def test_empty_query_returns_empty(spark):
    pdf = _postings_df(spark, GOLDEN_POSTINGS)
    assert score_postings_df(pdf, [], DOC_COUNT, AVG_DL).count() == 0
    assert score_postings_df(pdf, "搜索", DOC_COUNT, AVG_DL).count() == 0
