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

from pyspark.sql import Column, DataFrame, Window
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


def dense_rank_df(scored: DataFrame, score_col: str = "dense_score") -> DataFrame:
    """(doc_id, dense_rank) — rank by (score desc, doc_id asc), all docs
    (the reference ranks the full corpus dense order, bm25.py:102-104)."""
    w = Window.orderBy(F.desc(score_col), F.asc("doc_id"))
    return scored.select("doc_id", F.row_number().over(w).alias("dense_rank"))


def bm25_rank_df(scored: DataFrame, score_col: str = "score") -> DataFrame:
    """(doc_id, bm25_rank) over POSITIVE scores only (bm25.py:105-112)."""
    positive = scored.filter(F.col(score_col) > 0)
    w = Window.orderBy(F.desc(score_col), F.asc("doc_id"))
    return positive.select("doc_id", F.row_number().over(w).alias("bm25_rank"))


def rrf_fuse_df(
    dense_ranked: DataFrame,
    bm25_ranked: DataFrame,
    *,
    k: int = RRF_K,
) -> DataFrame:
    """(doc_id, fused) — weighted RRF via full-outer join + coalesce."""
    kk = float(k)
    fused = (
        dense_ranked.join(bm25_ranked, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(
                    F.lit(RRF_DENSE_WEIGHT) * (kk + 1.0) / (kk + F.col("dense_rank")),
                    F.lit(0.0),
                )
                + F.coalesce(
                    F.lit(RRF_BM25_WEIGHT) * (kk + 1.0) / (kk + F.col("bm25_rank")),
                    F.lit(0.0),
                )
            ).alias("fused"),
        )
    )
    return fused


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


def normalize_by_max_col(score: Column) -> Column:
    """score / max(score) over the whole frame; 0 when max <= 0
    (search_service.py:162-168)."""
    mx = F.max(score).over(Window.partitionBy())
    return F.when(mx > 0, score / mx).otherwise(F.lit(0.0))
