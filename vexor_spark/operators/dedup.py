"""Deduplication operators for training-data curation: exact (hash
groupBy), MinHash+LSH banding, SimHash, n-gram Jaccard verification.

All variants are pure column algebra / joins so each has an exact
DuckDB oracle (see catalog.py): the shared primitive is the
cross-engine polynomial hash from textstats.poly_hash_col. Engine-only
fast paths would substitute xxhash64; the algorithms are identical.

Scale notes:
- exact dedup is one groupBy(fingerprint) — map-side combine applies.
- MinHash banding turns near-dup detection into an equi-join on band
  keys: docs sharing any band bucket become candidate pairs. Bucket
  sizes are bounded in practice by signature entropy; a hot bucket
  (e.g. boilerplate pages) self-joins quadratically, so production
  runs cap bucket size (`max_bucket` below) and route oversized
  buckets to exact-jaccard verification in chunks.
- SimHash gives a 16-bit partition key whose Hamming neighbors can be
  enumerated for blocking.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vexor_spark.operators.textstats import HASH_MOD, poly_hash_col

# Deterministic MinHash parameters (a, b): h_j(x) = (a·h(x) + b) % M.
_rng = random.Random(0xC0FFEE)
MINHASH_K = 8
MINHASH_PARAMS: list[tuple[int, int]] = [
    (_rng.randrange(1, HASH_MOD), _rng.randrange(0, HASH_MOD)) for _ in range(MINHASH_K)
]
SIMHASH_BITS = 16


def shingles_col(tokens: Column, n: int = 3) -> Column:
    """Token n-gram shingles (space-joined); docs shorter than n yield
    one whole-doc shingle."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(tokens) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    whole = F.array(F.concat_ws(" ", tokens))
    return F.when(F.size(tokens) >= n, grams).otherwise(whole)


def minhash_sig_cols(shingles: Column, k: int = MINHASH_K) -> list[Column]:
    """k MinHash signature columns over the shingle set."""
    hashes = F.transform(shingles, lambda s: poly_hash_col(s))
    sigs = []
    for a, b in MINHASH_PARAMS[:k]:
        sigs.append(
            F.array_min(
                F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(HASH_MOD))
            )
        )
    return sigs


def minhash_signatures(
    docs: DataFrame, tokens_col: str = "tokens", *, k: int = MINHASH_K, shingle_n: int = 3
) -> DataFrame:
    """(doc_id, sig_0..sig_{k-1})."""
    sh = shingles_col(F.col(tokens_col), shingle_n)
    sigs = minhash_sig_cols(sh, k)
    return docs.select(
        "doc_id", *[s.alias(f"sig_{j}") for j, s in enumerate(sigs)]
    )


def lsh_candidate_pairs(
    signatures: DataFrame, *, bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs: docs sharing any band bucket.
    Self-join on band key (equi-join → hash shuffle on the key)."""
    assert bands * rows_per_band <= MINHASH_K
    keyed = signatures.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(b)),
                        *[
                            F.col(f"sig_{b * rows_per_band + r}").cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_key"),
    )
    left = keyed.select(F.col("doc_id").alias("doc_a"), "band_key")
    right = keyed.select(F.col("doc_id").alias("doc_b"), "band_key")
    return (
        left.join(right, "band_key")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_col(shingles_a: Column, shingles_b: Column) -> Column:
    """Exact Jaccard over distinct shingle sets."""
    sa = F.array_distinct(shingles_a)
    sb = F.array_distinct(shingles_b)
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = F.size(F.array_union(sa, sb)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def near_dup_pairs(
    docs: DataFrame,
    tokens_col: str = "tokens",
    *,
    threshold: float = 0.8,
    shingle_n: int = 3,
    bands: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — MinHash-LSH candidates verified by
    exact n-gram Jaccard ≥ threshold."""
    with_sh = docs.select(
        "doc_id", shingles_col(F.col(tokens_col), shingle_n).alias("shingles")
    )
    sigs = minhash_signatures(docs, tokens_col, shingle_n=shingle_n)
    pairs = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=rows_per_band)
    a = with_sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = with_sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("jaccard", jaccard_col(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_col(tokens: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash over token occurrences: bit j is the sign of
    Σ_tokens (2·bit_j(h(token)) − 1)."""
    hashes = F.transform(tokens, lambda t: poly_hash_col(t))

    def bit_merge(j: int):
        # (h >> j) & 1 as arithmetic: power-of-two division is exact in
        # doubles for h < 2^53, truncating cast == floor for positives.
        # (F.shiftright rejects lambda-variable Columns in pyspark 4, and
        # HOF lambdas must be exactly 2-ary — no default args.)
        shift = float(1 << j)
        return lambda acc, h: acc + (((h / F.lit(shift)).cast("long") % 2) * 2 - 1)

    out = F.lit(0).cast("long")
    for j in range(bits):
        bit_sum = F.aggregate(hashes, F.lit(0).cast("long"), bit_merge(j))
        out = out + F.when(bit_sum > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(fingerprint, rep_doc_id, n_docs) — exact duplicate groups by
    whole-text rolling hash; representative = min doc_id (the
    keep-one-copy policy)."""
    return (
        docs.select("doc_id", poly_hash_col(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").cast("long").alias("rep_doc_id"),
            F.count("*").cast("long").alias("n_docs"),
        )
    )
