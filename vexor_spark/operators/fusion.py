"""Rank fusion: RRF hybrid + legacy weighted-sum rerank (SURVEY W2-W7).

RRF (vexor/bm25.py:92-115): fused(doc) =
    0.7·(k+1)/(k + dense_rank) + 0.3·(k+1)/(k + bm25_rank),  k = 60,
where dense_rank is the position in the dense ordering and bm25_rank is
the position among docs with POSITIVE bm25 scores ordered by
(-score, doc_id). A full-outer join + coalesce expresses this exactly.

The deterministic dense leg is the reference's own test oracle: embed a
text as its letter-count vector over a-z and rank by cosine
(tests/integration/test_end_to_end.py:15-30). Dense ordering ties keep
doc_id order (np.argsort stable, search_service.py:594).

Legacy weighted rerank (search_service.py:199-218): over the dense
top-candidate set (clamp max(20, min(2k, 150)), :171-174), fuse
0.7·sem_norm + 0.3·bm25l_norm with max-normalization (:162-168) and
BM25L lexical scores (rank_bm25's BM25L formula, used "to avoid
zero-idf on tiny candidate sets", :185-196).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vexor_spark.constants import (
    RRF_BM25_WEIGHT,
    RRF_DENSE_WEIGHT,
    RRF_K,
)

LETTERS = "abcdefghijklmnopqrstuvwxyz"


def letter_count_cols(text: Column) -> list[Column]:
    """26 letter-count columns of lower(text) — the DummyBackend
    embedding (reference test oracle), pure JVM."""
    low = F.lower(text)
    return [
        (F.length(low) - F.length(F.replace(low, F.lit(ch), F.lit("")))).cast("double")
        for ch in LETTERS
    ]


def letter_cosine_col(text: Column, query_text: str) -> Column:
    """cosine(letter_counts(text), letter_counts(query)) as a Column;
    0.0 when either vector is all-zero."""
    qcounts = [float(query_text.lower().count(ch)) for ch in LETTERS]
    qnorm = sum(c * c for c in qcounts) ** 0.5
    cols = letter_count_cols(text)
    dot = None
    sq = None
    for col, qc in zip(cols, qcounts):
        term = col * F.lit(qc)
        dot = term if dot is None else dot + term
        s = col * col
        sq = s if sq is None else sq + s
    if qnorm == 0:
        return F.lit(0.0)
    return F.when(sq > 0, dot / (F.sqrt(sq) * F.lit(qnorm))).otherwise(F.lit(0.0))


def rrf_candidate_budget(k: int, w_dense: float = RRF_DENSE_WEIGHT, rrf_k: int = RRF_K) -> int:
    """Smallest per-leg candidate count T that makes bounded RRF exact.

    Bound argument (the scale-safe replacement for ranking the FULL
    corpus through a single-partition window): let K = rrf_k and
    C = dense-top-T ∪ bm25-top-T (positive scores only, both legs
    ordered by (score desc, doc_id asc)). For any doc x ∉ C both leg
    ranks exceed T, so

        fused(x) < (w_dense + w_bm25)·(K+1)/(K+T) = (K+1)/(K+T).

    The dense leg ranks EVERY doc (bm25.py:102-104), so for any
    d ≤ T the dense-top-d docs are all in C and each has

        fused ≥ w_dense·(K+1)/(K+d)  ≥  (K+1)/(K+T)   iff  d ≤ w_dense·(K+T) − K.

    Choosing T with ⌊w_dense·(K+T)⌋ − K ≥ k guarantees ≥ k candidates
    whose exact fused score is STRICTLY above every non-candidate —
    ties cannot rescue x because the inequality chain is strict on x's
    side. Hence the global fused top-k ⊆ C, and computing exact leg
    ranks for C alone reproduces the full computation's top-k exactly.
    Solving: T = ⌈(K + k)/w_dense⌉ − K (= 40 for k=10, K=60, w=0.7).
    When the corpus has ≤ T docs, C is the whole corpus and the claim
    is trivial.
    """
    import math

    return max(k, int(math.ceil((rrf_k + k) / w_dense)) - rrf_k)


def _exact_leg_ranks(
    leg: DataFrame, score_col: str, cand_scores: dict[int, float]
) -> dict[int, int]:
    """Exact rank of each candidate within a scored leg, WITHOUT a
    global sort: rank(c) = 1 + #{rows beating c}, computed as one
    map-side conditional-count aggregation pass (|C| counters, partial
    aggregation per partition, one tiny reduced row). No shuffle of the
    leg itself, no single-partition window."""
    if not cand_scores:
        return {}
    s, i = F.col(score_col), F.col("doc_id")
    aggs = [
        F.count(
            F.when((s > F.lit(cs)) | ((s == F.lit(cs)) & (i < F.lit(cid))), True)
        ).alias(f"c{cid}")
        for cid, cs in cand_scores.items()
    ]
    row = leg.agg(*aggs).collect()[0]
    return {cid: int(row[f"c{cid}"]) + 1 for cid in cand_scores}


def rrf_topk(
    dense_scored: DataFrame,
    bm25_scored: DataFrame,
    k: int = 10,
    *,
    w_dense: float = RRF_DENSE_WEIGHT,
    w_bm25: float = RRF_BM25_WEIGHT,
    rrf_k: int = RRF_K,
    round_dp: int | None = None,
) -> DataFrame:
    """(rank, doc_id, fused) — exact weighted-RRF top-k
    (vexor/bm25.py:92-115) without ranking the full corpus.

    Inputs: dense_scored(doc_id, dense_score) over ALL docs,
    bm25_scored(doc_id, score). Per leg this runs (a) a TakeOrdered
    top-T (T = rrf_candidate_budget, proof there), (b) a bounded
    IN-filter fetch of scores for candidates sourced from the other
    leg, (c) one conditional-count aggregation for exact ranks — all
    linear map-side passes, no global sort, no window shuffle. The
    ≤ 2T candidates are fused and ranked on the driver (the same
    bounded driver merge TakeOrderedAndProject itself performs).
    """
    spark = dense_scored.sparkSession
    schema = "rank long, doc_id long, fused double"
    T = rrf_candidate_budget(k, w_dense, rrf_k)
    dtop = dense_scored.orderBy(F.desc("dense_score"), F.asc("doc_id")).limit(T).collect()
    bpos = bm25_scored.filter(F.col("score") > 0)
    btop = bpos.orderBy(F.desc("score"), F.asc("doc_id")).limit(T).collect()
    dmap = {int(r["doc_id"]): float(r["dense_score"]) for r in dtop}
    bmap = {int(r["doc_id"]): float(r["score"]) for r in btop}
    cands = set(dmap) | set(bmap)
    if not cands:
        return spark.createDataFrame([], schema)
    # Bounded (≤T-row) fetches of leg scores for cross-sourced candidates.
    miss_d = [c for c in cands if c not in dmap]
    if miss_d:
        for r in dense_scored.filter(F.col("doc_id").isin(miss_d)).collect():
            dmap[int(r["doc_id"])] = float(r["dense_score"])
    miss_b = [c for c in cands if c not in bmap]
    if miss_b:
        for r in bpos.filter(F.col("doc_id").isin(miss_b)).collect():
            bmap[int(r["doc_id"])] = float(r["score"])
    dranks = _exact_leg_ranks(dense_scored, "dense_score", {c: dmap[c] for c in cands if c in dmap})
    branks = _exact_leg_ranks(bpos, "score", {c: bmap[c] for c in cands if c in bmap})
    kk = float(rrf_k)
    fused: list[tuple[int, float]] = []
    for c in cands:
        f = 0.0
        if c in dranks:
            f += w_dense * (kk + 1.0) / (kk + dranks[c])
        if c in branks:
            f += w_bm25 * (kk + 1.0) / (kk + branks[c])
        if round_dp is not None:
            from vexor_spark.functions.rounding import round_half_up

            f = round_half_up(f, round_dp)  # == F.round, see rounding.py
        fused.append((c, f))
    fused.sort(key=lambda t: (-t[1], t[0]))
    rows = [(r + 1, c, f) for r, (c, f) in enumerate(fused[:k])]
    return spark.createDataFrame(rows, schema)


# --- BM25L (legacy rerank lexical leg) ------------------------------------
# Formula per rank_bm25's BM25L (public package the reference depends on,
# search_service.py:185-196): idf = ln((N+1)/(df+0.5));
# ctd = tf / (1 - b + b*dl/avgdl); s += idf*(k1+1)*(ctd+δ)/(k1+ctd+δ), δ=0.5.
BM25L_DELTA = 0.5


def bm25l_contribution_col(tf, doc_len, df, n_docs: float, avg_doc_len: float) -> Column:
    from vexor_spark.constants import BM25_B, BM25_K1

    idf = F.log((F.lit(n_docs) + 1.0) / (df + 0.5))
    ctd = tf / (1.0 - F.lit(BM25_B) + F.lit(BM25_B) * doc_len / F.lit(avg_doc_len))
    return (
        idf
        * F.lit(BM25_K1 + 1.0)
        * (ctd + F.lit(BM25L_DELTA))
        / (F.lit(BM25_K1) + ctd + F.lit(BM25L_DELTA))
    )


