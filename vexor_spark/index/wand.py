"""Block-max pruned BM25 scoring — exact top-k, batch (DataFrame) form
of block-max WAND (SURVEY §4.2; Ding & Suel's block-max indexes adapted
to a shuffle engine: documents are pruned, contributions never are).

Notation: for query term t, ub_t = idf_t · max_kernel_t upper-bounds
any single contribution of t; for block b of t, bub_{t,b} = idf_t ·
block_ub_b upper-bounds contributions inside the block.

Exactness argument:
1. θ (threshold) is a LOWER bound on the true k-th best full score:
   θ = the k-th largest single-term contribution within the list of the
   highest-ub term t*. Any k docs from that list have full scores ≥
   their t*-contributions, so at least k docs have full score ≥ θ.
2. Candidate generation: doc d (containing query-term set S) satisfies
   score(d) ≤ bub_{t,b(d)} + Σ_{t'≠t} ub_{t'} for EVERY t ∈ S. So if d
   appears in no block passing `bub_{t,b} + (Σub − ub_t) ≥ θ`, then
   score(d) < θ ≤ k-th best ⇒ d is not in the top-k. Candidates =
   union of docs in passing blocks — a superset of the top-k.
3. Exact rescore: every block that either passes the bound test or
   whose [block_first, block_last] range contains a candidate is
   decoded; exploded rows are semi-joined to the candidate set before
   the aggregation, so every candidate's every contribution is counted
   and nothing else reaches the shuffle.

What pruning buys at scale: head (high-df) terms have low idf ⇒ low
ub ⇒ their tail blocks fail the bound test; their rows are dropped at
the *block* level (never decoded) unless a candidate lives inside —
the shuffle/aggregate volume collapses from Σ|postings| to ~|candidates|·|q|.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vexor_spark.functions.codec import decode_postings_udf
from vexor_spark.operators.scoring import bm25_contribution_col

# If candidate generation exceeds this, fall back to unpruned scoring
# (collecting a huge candidate set to the driver would be the real cost).
MAX_CANDIDATES = 200_000


def _idf(df: int, n: int) -> float:
    return math.log((n - df + 0.5) / (df + 0.5) + 1.0)


def pruned_scores(
    pidx, terms: list[str], k: int, metrics: dict | None = None
) -> DataFrame:
    """(doc_id, score) for the matched docs that can reach the top-k —
    exact scores (equal to the unpruned path) for every returned doc
    that belongs to the true top-k.

    `metrics`, when given, is filled with pruning counters (theta,
    blocks_total / blocks_passing / blocks_decoded, candidates) — the
    evidence that block-max pruning engages; counting costs two extra
    .count() actions on the persisted block frame, so it is opt-in and
    off on the serving path."""
    spark = pidx.spark
    n, avgdl = pidx.doc_count, pidx.avg_doc_len

    tdict = pidx.term_dict(terms)  # {term: (df, max_kernel)} — pyarrow, tiny
    present = [t for t in terms if t in tdict]
    if not present:
        return spark.createDataFrame([], "doc_id long, score double")
    # pidx.ub_factor corrects stored max_kernel / block_ub for avg-doc-
    # length drift since encode time (see storage.PersistedIndex).
    ub = {t: _idf(tdict[t][0], n) * tdict[t][1] * pidx.ub_factor for t in present}
    total_ub = sum(ub.values())

    blocks = pidx._matched_blocks(present)

    # --- driver-side engagement check (round-5): θ is the k-th best
    # single-term contribution within ONE term's list, so θ > 0 needs a
    # term with df ≥ k. The term dict is already in hand (tiny pyarrow
    # read, no Spark job) — when every query term is rarer than k, the
    # θ pass can only measure 0 and the exactness guard would fall back
    # to full scoring anyway, so skip straight there and pay nothing.
    # This was the round-4 finding: uid-anchored queries made
    # prune=True pure overhead (θ pass + fallback, 0/30 engaged);
    # with the skip, prune=True costs the unpruned price on those
    # queries and still collapses decode volume on head-term queries.
    eligible = [t for t in present if tdict[t][0] >= k]
    if not eligible:
        if metrics is not None:
            metrics["theta"] = 0.0
            metrics["pruned"] = False
            metrics["theta_skipped"] = True
        return pidx._score_blocks(blocks)

    # --- second driver-side check: can ANY block fail the bound test?
    # A block of term t is skippable iff idf_t·block_ub·f + rest_ub_t <
    # θ; since block_ub ≥ 0 and θ ≤ ub_{t*} (θ is a single contribution
    # from t*'s own list), no block of ANY term can fail when every
    # rest_ub_t ≥ max eligible ub — the θ/candidate passes would pay 3
    # extra jobs to prune nothing. This is the round-4 measured shape:
    # 'spark merge window' (3 common terms) passed 13,680/13,680 blocks
    # because each term's rest_ub (sum of the other two) exceeded every
    # achievable θ, while 'spark' (1 term, rest_ub=0) pruned 2908→123
    # and 'merge hash' (dominated pair) pruned 10,772→10. Pure dict
    # arithmetic — no Spark job.
    theta_max = max(ub[t] for t in eligible)
    if all(total_ub - ub[t] >= theta_max for t in present):
        if metrics is not None:
            metrics["theta"] = 0.0
            metrics["pruned"] = False
            metrics["bound_skipped"] = True
        return pidx._score_blocks(blocks)

    # --- θ pass: k-th best single-term contribution of the highest-ub
    # term among those able to produce a positive θ (df ≥ k)
    t_star = max(eligible, key=lambda t: ub[t])
    # bm25_contribution_col already includes idf(df): passing t*'s df
    # yields exactly that term's contribution per posting.
    star_contrib = (
        blocks.filter(F.col("term") == t_star)
        .select(F.explode(decode_postings_udf("blob")).alias("p"))
        .select(
            bm25_contribution_col(
                F.col("p.tf").cast("double"),
                F.col("p.doc_len").cast("double"),
                F.lit(float(tdict[t_star][0])),
                float(n),
                float(avgdl),
            ).alias("c")
        )
        .orderBy(F.desc("c"))
        .limit(k)
        .collect()
    )
    theta = star_contrib[-1]["c"] if len(star_contrib) >= k else 0.0
    if metrics is not None:
        metrics["theta"] = float(theta)
    if theta <= 0.0:
        if metrics is not None:
            metrics["pruned"] = False
        return pidx._score_blocks(blocks)

    # --- candidate pass: docs in blocks whose bound can reach θ
    rest_ub = {t: total_ub - ub[t] for t in present}
    idf_map = {t: _idf(tdict[t][0], n) for t in present}
    bound_df = spark.createDataFrame(
        [(t, idf_map[t], rest_ub[t]) for t in present],
        "term string, idf double, rest_ub double",
    )
    bounded = blocks.join(F.broadcast(bound_df), "term").withColumn(
        "passes",
        F.col("idf") * F.col("block_ub") * F.lit(float(pidx.ub_factor))
        + F.col("rest_ub")
        >= F.lit(theta),
    )
    bounded = bounded.persist()
    try:
        candidates_rows = (
            bounded.filter("passes")
            .select(F.explode(decode_postings_udf("blob")).alias("p"))
            .select(F.col("p.doc_id").alias("doc_id"))
            .distinct()
            .limit(MAX_CANDIDATES + 1)
            .collect()
        )
        if metrics is not None:
            metrics["blocks_total"] = bounded.count()
            metrics["blocks_passing"] = bounded.filter("passes").count()
            metrics["candidates"] = len(candidates_rows)
            metrics["pruned"] = len(candidates_rows) <= MAX_CANDIDATES
        if len(candidates_rows) > MAX_CANDIDATES:
            return pidx._score_blocks(blocks)
        candidates = sorted(r["doc_id"] for r in candidates_rows)
        if not candidates:
            return spark.createDataFrame([], "doc_id long, score double")

        # --- exact rescore: decode passing blocks + any block whose doc-id
        # range contains a candidate (so candidates' contributions from
        # "failed" blocks are still counted)
        cand_arr = F.array(*[F.lit(int(c)) for c in candidates]) if len(candidates) <= 1000 else None
        if cand_arr is not None:
            contains_cand = (
                F.size(
                    F.filter(
                        cand_arr,
                        lambda c: (c >= F.col("block_first")) & (c <= F.col("block_last")),
                    )
                )
                > 0
            )
        else:
            # large candidate sets: join block ranges against a candidate DF
            contains_cand = None
        if contains_cand is not None:
            needed = bounded.filter(F.col("passes") | contains_cand)
        else:
            cdf = spark.createDataFrame([(int(c),) for c in candidates], "cand long")
            hit = (
                bounded.join(
                    F.broadcast(cdf),
                    (F.col("cand") >= F.col("block_first"))
                    & (F.col("cand") <= F.col("block_last")),
                    "left_semi",
                )
            )
            needed = bounded.filter("passes").unionByName(hit).dropDuplicates(
                ["term", "block_id"]
            )

        if metrics is not None:
            metrics["blocks_decoded"] = needed.count()
        cset_df = spark.createDataFrame([(int(c),) for c in candidates], "doc_id long")
        exploded = needed.select(
            F.col("df").cast("double").alias("df"),
            F.explode(decode_postings_udf("blob")).alias("p"),
        ).select(
            F.col("p.doc_id").alias("doc_id"),
            F.col("p.tf").cast("double").alias("tf"),
            F.col("p.doc_len").cast("double").alias("doc_len"),
            "df",
        )
        contrib = bm25_contribution_col(
            F.col("tf"), F.col("doc_len"), F.col("df"), float(n), float(avgdl)
        )
        return (
            exploded.join(F.broadcast(cset_df), "doc_id", "left_semi")
            .withColumn("contribution", contrib)
            .groupBy("doc_id")
            .agg(F.sum("contribution").alias("score"))
        )
    finally:
        bounded.unpersist()
