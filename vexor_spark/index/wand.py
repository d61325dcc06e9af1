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

Round-5 engagement discipline (all pure driver work, measured at 2M —
BENCH_R05_SCALE.json serving_2M_r05):
- θ is computed ON THE DRIVER from the pyarrow block cache (descending
  block_ub walk, exact by the stopping rule, typically one block) — the
  executor θ pass of round 4 decoded t*'s whole list and negated the
  win for single-term queries.
- Three dict-only skip rules route hopeless shapes straight to
  unpruned scoring: no df ≥ k term (θ would be 0); every rest_ub ≥ any
  achievable θ (no block can fail — balanced common terms); unfailable
  terms' posting volume above MAX_CANDIDATES (the candidate pass would
  cap out and fall back — anchored pairs).
Net: `prune=True` (the default) costs unpruned-price on unprunable
query shapes and wins outright on prunable ones — single common terms
at 2M run 2.8–4.0 s pruned vs 4.4–4.7 s unpruned, decoding 10 of
10,772 blocks.
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


def _theta_driver(pidx, t_star: str, df_star: int, k: int) -> float:
    """EXACT θ (k-th best single contribution of t_star) computed on
    the driver from the pyarrow block cache: decode blocks in
    descending block_ub order, stop once the k-th best so far ≥ the
    next block's upper bound (idf is a common positive factor, so the
    comparison can use raw kernels). Cost: usually one 128-posting
    block; never a Spark job."""
    import numpy as np

    from vexor_spark.constants import BM25_B, BM25_K1
    from vexor_spark.functions.codec import decode_blocks_np

    by_term, dfs = pidx._term_blocks_cached([t_star])
    blocks = by_term.get(t_star)
    if not blocks or df_star < k:
        return 0.0
    n, avgdl = pidx.doc_count, pidx.avg_doc_len
    idf = _idf(df_star, n)
    # block tuples: (block_id, first, last, block_ub, n, blob)
    order = sorted(blocks, key=lambda b: -b[3])
    kernels: list[float] = []
    kth = -1.0
    for i, b in enumerate(order):
        _ids, tfs, dls = decode_blocks_np([b[5]], [b[4]])
        tfs = tfs.astype(np.float64)
        kern = tfs * (BM25_K1 + 1.0) / (
            tfs + BM25_K1 * (1.0 - BM25_B + BM25_B * dls.astype(np.float64) / avgdl)
        )
        kernels.extend(kern.tolist())
        if len(kernels) >= k:
            kth = float(np.partition(np.asarray(kernels), len(kernels) - k)[len(kernels) - k])
            # remaining blocks are ≤ next stored block_ub (×ub_factor
            # for avg-doc-len drift since encode) in kernel terms, and
            # the walk is in descending block_ub order. Stopping earlier
            # would still be sound: any k decoded contributions give a
            # valid (just weaker) θ lower bound.
            if i + 1 >= len(order) or kth >= order[i + 1][3] * pidx.ub_factor:
                break
    if kth < 0 and kernels:
        return 0.0
    return idf * kth if kth > 0 else 0.0


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
    # rest_ub as an INDEPENDENT sum per term, inflated by 1 ppb —
    # `total_ub - ub[t]` cancels: (a+b)-b can land 1 ulp BELOW a, and
    # when θ ties ub_{t*} exactly (common: the k-th best contribution
    # often equals the max kernel) that ulp decides whether a whole
    # term counts as unfailable. Inflation is conservative for
    # exactness (a too-big rest_ub only lets MORE blocks pass).
    rest_ub = {
        t: sum(ub[u] for u in present if u != t) * (1 + 1e-12) + 1e-12
        for t in present
    }

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
    if all(rest_ub[t] >= theta_max for t in present):
        if metrics is not None:
            metrics["theta"] = 0.0
            metrics["pruned"] = False
            metrics["bound_skipped"] = True
        return pidx._score_blocks(blocks)

    # --- θ from the driver, not a Spark job (round-5): θ is the k-th
    # best single-term contribution of t*. Decoding t*'s WHOLE list
    # executor-side (the round-4 shape) costs as much as unpruned
    # scoring of that term — for single-term queries that negated every
    # block the candidate pass later skipped. Instead walk t*'s block
    # rows (already served by the pyarrow term cache) in DESCENDING
    # block_ub order, decoding one block at a time until the running
    # k-th best contribution ≥ the next block's upper bound — at that
    # point no undecoded posting can raise θ, so θ is EXACT, and
    # typically ⌈k/block_size⌉ (= 1) blocks were decoded. Any prefix of
    # this walk already yields a valid lower bound, so the early-out is
    # safe by construction.
    t_star = max(eligible, key=lambda t: ub[t])
    theta = _theta_driver(pidx, t_star, tdict[t_star][0], k)
    if metrics is not None:
        metrics["theta"] = float(theta)
    if theta <= 0.0:
        if metrics is not None:
            metrics["pruned"] = False
        return pidx._score_blocks(blocks)

    # --- third driver-side check: UNPRUNABLE posting volume. A term t
    # whose rest_ub_t ≥ θ cannot have ANY block fail the bound test —
    # its entire list lands in the candidate set. If those terms alone
    # carry more postings than MAX_CANDIDATES, the candidate pass is
    # guaranteed to trip the cap and fall back after paying full
    # decodes — skip straight to unpruned scoring. This is the
    # anchored-pair shape ('news merge': merge's 1.4M postings are
    # unfailable because rest_ub_merge = ub_news ≥ θ); measured round 5
    # at 2M: candidates 200,001 (capped) on every such query before
    # this check. Dict arithmetic + the already-computed θ; no job.
    unprunable = sum(tdict[t][0] for t in present if rest_ub[t] >= theta)
    if unprunable > MAX_CANDIDATES:
        if metrics is not None:
            metrics["pruned"] = False
            metrics["volume_skipped"] = True
        return pidx._score_blocks(blocks)

    # --- candidate pass: docs in blocks whose bound can reach θ
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
