"""Round-4 scale campaign at the 2M-page (10×) corpus — the three
measurements the round-3 verdict asked for (BENCH_R04_SCALE.json):

1. DISTRIBUTED SERVING LATENCY (verdict item 1): per-query wall-clock
   of `search_distributed(prune=True)` over the 30-query suite on the
   2M-page persisted index, warm JVM — p50/p95/mean for the pruned and
   unpruned paths, plus per-query pruning counters (theta, blocks
   total/passing/decoded, candidates) proving block-max pruning
   engages. Past driver RAM the distributed path is the product
   surface; the driver path's latency was benched in round 3.

2. MULTI-QUERY BATCH SERVING (item 8): the whole 30-query suite in ONE
   job (`search_distributed_multi`) vs 30 sequential
   `search_distributed` jobs — amortized per-query cost and the
   amortization factor, with batch-vs-sequential rank identity checked
   on every query.

3. INCREMENTAL-MERGE COST CURVE (item 3): `update_persisted_index` at
   1% / 10% / 50% of input buckets changed (changes localized by url
   bucket — the system's own staleness granularity), recording
   wall-clock, action taken, affected term buckets, and the stage-1
   re-chunk counts; plus a from-scratch rebuild for the ceiling.

Usage:
    nohup python scripts/bench_scale_r04.py --pages 2000000 \
        > /tmp/scale_r04.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import statistics
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
import sys

sys.path.insert(0, str(REPO))


def _spark(master: str = "local[32]", mem: str = "24g"):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(master)
        .config("spark.driver.memory", mem)
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _pct(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(round(p / 100 * (len(xs) - 1))))]


def probe_serving(pidx, suite, out: dict) -> None:
    from vexor_spark.functions.rounding import round_half_up

    # warm the JVM/scan paths on three queries
    for q in suite[:3]:
        pidx.search_distributed(q["query"], k=10, prune=True).collect()

    pruned_t, unpruned_t, counters = [], [], []
    identity_bad = []
    for q in suite:
        t0 = time.time()
        a = pidx.search_distributed(q["query"], k=10, prune=True).collect()
        pruned_t.append(time.time() - t0)
        t0 = time.time()
        b = pidx.search_distributed(q["query"], k=10, prune=False).collect()
        unpruned_t.append(time.time() - t0)
        al = [(r["rank"], r["doc_id"], round_half_up(r["score"], 6)) for r in a]
        bl = [(r["rank"], r["doc_id"], round_half_up(r["score"], 6)) for r in b]
        if al != bl:
            identity_bad.append(q["query"])
    # separate counters pass (counters add count() actions — never let
    # them pollute the timed numbers)
    for q in suite:
        m: dict = {}
        pidx.search_distributed(q["query"], k=10, prune=True, metrics=m).collect()
        counters.append(m)

    engaged = [m for m in counters if m.get("pruned")]
    out["serving_2M"] = {
        "queries": len(suite),
        "pruned": {
            "p50_sec": round(_pct(pruned_t, 50), 4),
            "p95_sec": round(_pct(pruned_t, 95), 4),
            "mean_sec": round(statistics.mean(pruned_t), 4),
        },
        "unpruned": {
            "p50_sec": round(_pct(unpruned_t, 50), 4),
            "p95_sec": round(_pct(unpruned_t, 95), 4),
            "mean_sec": round(statistics.mean(unpruned_t), 4),
        },
        "rank_identity_mismatches": identity_bad,
        "pruning": {
            "queries_engaged": len(engaged),
            "median_candidates": int(statistics.median(m["candidates"] for m in engaged)) if engaged else None,
            "median_blocks_total": int(statistics.median(m["blocks_total"] for m in engaged)) if engaged else None,
            "median_blocks_decoded": int(statistics.median(m["blocks_decoded"] for m in engaged)) if engaged else None,
            "per_query": counters,
        },
    }
    print("SERVING", json.dumps(out["serving_2M"]["pruned"]), flush=True)


def probe_multiquery(pidx, suite, out: dict) -> None:
    from vexor_spark.functions.rounding import round_half_up

    queries = {f"q{i:02d}": q["query"] for i, q in enumerate(suite)}
    # sequential: 30 jobs (unpruned — same machinery the batch shares)
    t0 = time.time()
    singles = {}
    for name, q in queries.items():
        singles[name] = [
            (r["rank"], r["doc_id"], round_half_up(r["score"], 6))
            for r in pidx.search_distributed(q, k=10, prune=False).collect()
        ]
    seq_secs = time.time() - t0
    # batch: ONE job
    t0 = time.time()
    batch_rows = pidx.search_distributed_multi(queries, k=10).collect()
    batch_secs = time.time() - t0
    by_q: dict = {n: [] for n in queries}
    for r in batch_rows:
        by_q[r["query"]].append((r["rank"], r["doc_id"], round_half_up(r["score"], 6)))
    bad = [n for n in queries if sorted(by_q[n]) != sorted(singles[n])]
    out["multiquery_2M"] = {
        "queries": len(queries),
        "sequential_secs": round(seq_secs, 2),
        "batch_secs": round(batch_secs, 2),
        "sequential_per_query_sec": round(seq_secs / len(queries), 4),
        "batch_per_query_sec": round(batch_secs / len(queries), 4),
        "amortization_factor": round(seq_secs / batch_secs, 2),
        "rank_identity_mismatches": bad,
    }
    print("MULTIQUERY", json.dumps(out["multiquery_2M"]), flush=True)


def probe_merge_curve(spark, pages_dir: Path, workroot: Path, out: dict) -> None:
    import pyspark.sql.functions as F

    from vexor_spark.index.checkpoint import DEFAULT_INPUT_BUCKETS, _bucket_col
    from vexor_spark.index.merge import update_persisted_index

    n_buckets = DEFAULT_INPUT_BUCKETS
    pages = spark.read.parquet(str(pages_dir))
    work = workroot / "merge_work"
    idx = workroot / "merge_idx"

    t0 = time.time()
    base = update_persisted_index(pages, work, idx, n_buckets=n_buckets)
    base_secs = time.time() - t0
    curve = {"baseline_full_build_secs": round(base_secs, 1), "ratios": {}}

    for ratio in (0.01, 0.10, 0.50):
        k = max(1, round(ratio * n_buckets))
        changed_buckets = list(range(k))
        # mutate every page in the first k url buckets with a LENGTH-
        # PRESERVING edit (replace the first 6 chars): appending text
        # can change a page's chunk count, which shifts the dense
        # doc-id order and forces the full-rebuild fallback by design —
        # the incremental path is for content edits, and this keeps the
        # probe on it. html changes too so the bucket lineage hash moves.
        edit = f"ed{int(ratio * 100):02d}"  # 4 chars
        mutated = pages.withColumn(
            "_b", _bucket_col(F.col("url"), n_buckets)
        ).withColumn(
            "text",
            F.when(
                F.col("_b").isin(changed_buckets) & (F.length("text") > 6),
                F.concat(F.lit(edit + "q "), F.expr("substring(text, 7)")),
            ).otherwise(F.col("text")),
        ).withColumn(
            "html",
            F.when(
                F.col("_b").isin(changed_buckets),
                F.encode(F.col("text"), "UTF-8"),
            ).otherwise(F.col("html")),
        ).drop("_b")
        t0 = time.time()
        s = update_persisted_index(mutated, work, idx, n_buckets=n_buckets)
        secs = time.time() - t0
        curve["ratios"][str(ratio)] = {
            "changed_input_buckets": k,
            "action": s["action"],
            "reason": s.get("reason"),
            "reported_change_ratio": s.get("change_ratio"),
            "affected_term_buckets": s.get("affected_term_buckets"),
            "term_buckets_total": s.get("term_buckets_total"),
            "pages_rechunked": s.get("stage1", {}).get("pages_built"),
            "secs": round(secs, 1),
            "vs_full_build": round(secs / base_secs, 3),
        }
        print("MERGE", ratio, json.dumps(curve["ratios"][str(ratio)]), flush=True)
        pages = mutated  # next ratio mutates on top (fresh staleness)
    out["merge_curve_2M"] = curve


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2_000_000)
    ap.add_argument("--workroot", default="/tmp/scale_r04")
    ap.add_argument("--skip-serving", action="store_true")
    ap.add_argument("--skip-multiquery", action="store_true")
    ap.add_argument("--skip-merge", action="store_true")
    args = ap.parse_args()
    workroot = Path(args.workroot)
    workroot.mkdir(parents=True, exist_ok=True)

    spark = _spark()
    from vexor_spark.index.storage import PersistedIndex, build_and_write_index
    from vexor_spark.sources.corpus import generate_pages_df, query_suite

    t_all = time.time()
    pages_dir = workroot / "pages"
    if not (pages_dir / "_SUCCESS").exists():
        t0 = time.time()
        generate_pages_df(spark, args.pages, edges=False, partitions=64).write.mode(
            "overwrite"
        ).parquet(str(pages_dir))
        print("CORPUS", round(time.time() - t0, 1), "s", flush=True)

    idx_dir = workroot / "index"
    if not (idx_dir / "meta.json").exists():
        t0 = time.time()
        build_and_write_index(
            spark.read.parquet(str(pages_dir)), idx_dir, term_buckets=64
        )
        print("BUILD", round(time.time() - t0, 1), "s", flush=True)

    artifact = REPO / "BENCH_R04_SCALE.json"
    out: dict = json.loads(artifact.read_text()) if artifact.exists() else {}
    out["pages"] = args.pages

    pidx = PersistedIndex(spark, idx_dir)
    suite = query_suite(min(args.pages, 100_000))[:30]
    if not args.skip_serving:
        probe_serving(pidx, suite, out)
        artifact.write_text(json.dumps(out, indent=2) + "\n")
    if not args.skip_multiquery:
        probe_multiquery(pidx, suite, out)
        artifact.write_text(json.dumps(out, indent=2) + "\n")
    if not args.skip_merge:
        probe_merge_curve(spark, pages_dir, workroot, out)
    out["campaign_secs"] = round(time.time() - t_all, 1)
    artifact.write_text(json.dumps(out, indent=2) + "\n")
    print("DONE", out["campaign_secs"], flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
