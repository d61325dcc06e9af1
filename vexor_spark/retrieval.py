"""Retrieval modes over a built index: dense, RRF hybrid, legacy
weighted rerank (the reference's `rerank=off|hybrid|bm25` arms,
vexor/services/search_service.py:553-647).

The dense leg is the deterministic letter-count backend — the
reference's own test oracle (tests/integration/test_end_to_end.py:15-30)
— embedding each chunk's LABEL (what the reference embeds,
index_service.py:1035) and the query, ranked by cosine with stable
doc_id tie-break (search_service.py:594).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vexor_spark.constants import (
    RERANK_CANDIDATE_MAX,
    RERANK_CANDIDATE_MIN,
    FUSION_SEMANTIC_WEIGHT,
)
from vexor_spark.functions.text import page_name_col
from vexor_spark.index.build import InMemoryIndex
from vexor_spark.functions.tokenize import tokenize_col
from vexor_spark.operators.fusion import (
    bm25_rank_df,
    bm25l_contribution_col,
    dense_rank_df,
    letter_cosine_col,
    rrf_fuse_df,
)
from vexor_spark.operators.scoring import score_postings_df


def dense_scores(docs: DataFrame, query: str) -> DataFrame:
    """(doc_id, dense_score) — letter-count cosine of label vs query."""
    return docs.select(
        "doc_id", letter_cosine_col(F.col("label"), query).alias("dense_score")
    )


def hybrid_search(index: InMemoryIndex, query: str, k: int = 10) -> DataFrame:
    """(rank, doc_id, score) — RRF fusion of dense + BM25 (bm25.py:92-115,
    top-k by (fused desc, doc_id asc) per search_service.py:176-182)."""
    dense = dense_rank_df(dense_scores(index.docs, query))
    bm25 = bm25_rank_df(
        score_postings_df(index.postings, query, index.doc_count, index.avg_doc_len)
    )
    fused = rrf_fuse_df(dense, bm25)
    w = Window.orderBy(F.desc("fused"), F.asc("doc_id"))
    return (
        fused.orderBy(F.desc("fused"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", F.col("fused").alias("score"))
    )


def resolve_rerank_candidates(top_k: int) -> int:
    """max(20, min(2·top_k, 150)) — search_service.py:171-174."""
    return max(RERANK_CANDIDATE_MIN, min(int(top_k * 2), RERANK_CANDIDATE_MAX))


def weighted_rerank_search(index: InMemoryIndex, query: str, k: int = 10) -> DataFrame:
    """(rank, doc_id, score) — legacy `rerank=bm25` arm: dense candidate
    clamp, BM25L over the candidate micro-corpus, 0.7/0.3 weighted sum of
    max-normalized scores (search_service.py:199-218), stable ties by
    dense order.
    """
    n_cand = resolve_rerank_candidates(k)
    dense = dense_scores(index.docs, query)
    w_dense = Window.orderBy(F.desc("dense_score"), F.asc("doc_id"))
    candidates = (
        dense.withColumn("dense_rank", F.row_number().over(w_dense))
        .filter(F.col("dense_rank") <= n_cand)
        .join(index.docs.select("doc_id", "url", "preview"), "doc_id")
    )
    # rerank document: "{name} {path} {preview}".strip()
    # (search_service.py:158-160); tokenized with the regex path (T2
    # equals T1 when `tokenizers` is absent).
    rerank_doc = F.trim(
        F.concat_ws(
            " ", page_name_col(F.col("url")), F.col("url"), F.coalesce("preview", F.lit(""))
        )
    )
    tokenized = candidates.withColumn("tokens", tokenize_col(rerank_doc)).withColumn(
        "doc_len", F.size("tokens")
    )
    tokenized = tokenized.persist()
    stats = tokenized.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"] or 0.0)

    # Legacy arm uses the RAW query token list — duplicates counted,
    # no 32-term cap (search_service.py:203-208). Multiplicity becomes a
    # weight on the per-term contribution.
    import re
    from collections import Counter

    from vexor_spark.constants import TOKEN_PATTERN

    qtoks = re.findall(TOKEN_PATTERN, query.lower())
    qmult = Counter(qtoks)
    spark = index.docs.sparkSession
    if not qtoks or n_docs == 0 or avgdl <= 0:
        w = Window.orderBy(F.desc("dense_score"), F.asc("doc_id"))
        return (
            tokenized.orderBy(F.desc("dense_score"), F.asc("doc_id"))
            .limit(k)
            .withColumn("rank", F.row_number().over(w))
            .select("rank", "doc_id", F.col("dense_score").alias("score"))
        )
    qdf = spark.createDataFrame(
        [(t, float(m)) for t, m in qmult.items()], "term string, q_mult double"
    )
    tf = (
        tokenized.select("doc_id", "doc_len", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "doc_len", "term")
        .agg(F.count("*").cast("double").alias("tf"))
        .join(F.broadcast(qdf), "term")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    bm25l = (
        tf.join(dfreq, "term")
        .withColumn(
            "contribution",
            F.col("q_mult")
            * bm25l_contribution_col(
                F.col("tf"), F.col("doc_len").cast("double"), F.col("df"),
                float(n_docs), avgdl,
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("contribution").alias("bm25l_score"))
    )
    w_all = Window.partitionBy()
    fused = (
        tokenized.select("doc_id", "dense_rank", "dense_score")
        .join(bm25l, "doc_id", "left")
        .withColumn("sem", F.greatest(F.col("dense_score"), F.lit(0.0)))
        .withColumn("bm", F.coalesce("bm25l_score", F.lit(0.0)))
        .withColumn("sem_max", F.max("sem").over(w_all))
        .withColumn("bm_max", F.max("bm").over(w_all))
        .withColumn(
            "sem_norm",
            F.when(F.col("sem_max") > 0, F.col("sem") / F.col("sem_max")).otherwise(0.0),
        )
        .withColumn(
            "bm_norm",
            F.when(F.col("bm_max") > 0, F.col("bm") / F.col("bm_max")).otherwise(0.0),
        )
        .withColumn(
            "score",
            F.lit(FUSION_SEMANTIC_WEIGHT) * F.col("sem_norm")
            + F.lit(1.0 - FUSION_SEMANTIC_WEIGHT) * F.col("bm_norm"),
        )
    )
    # Python's sort is stable: equal fused scores keep candidate (dense)
    # order (search_service.py:217) → tie-break by dense_rank.
    w_final = Window.orderBy(F.desc("score"), F.asc("dense_rank"))
    result = (
        fused.orderBy(F.desc("score"), F.asc("dense_rank"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w_final))
        .select("rank", "doc_id", "score")
    )
    tokenized.unpersist()
    return result
