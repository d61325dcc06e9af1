"""spark-submit target: timed index build + query latency benchmark.

Usage (via spark-submit --py-files vexor_spark.zip):
    spark-submit --master local[8] scripts/bench_build.py \
        --pages 40000 --workdir /tmp/bench_n8 [--queries 30]

Prints one JSON line prefixed BENCH_BUILD with:
    pages, chunks(docs), build_secs, docs_per_sec, write_secs,
    query latencies (median/p95) over the 30-query suite (search_local
    on the persisted index) when --queries > 0.

The pages corpus is materialized to parquet FIRST (untimed) so the
timed section measures the engine (extract→chunk→ids→postings→persist),
not synthetic-data generation.
"""

from __future__ import annotations

import argparse
import json
import statistics
import tempfile
import time
from pathlib import Path

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=20000)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--pages-dir", default=None, help="shared corpus dir (generated once)")
    ap.add_argument("--gen-partitions", type=int, default=64)
    ap.add_argument("--queries", type=int, default=30)
    ap.add_argument("--salt", type=int, default=16)
    ap.add_argument("--term-buckets", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=2, help="report best-of-N builds")
    args = ap.parse_args()

    from vexor_spark.index.build import build_index
    from vexor_spark.index.storage import PersistedIndex, write_index
    from vexor_spark.sources.corpus import generate_pages_df, query_suite

    # A/B switch for the round-6 map-side tf: VEXOR_TF_IMPL=shuffle
    # rebinds the module attribute, which build_and_write_index picks
    # up through its call-time import — same build, one variable.
    import os as _os

    if _os.environ.get("VEXOR_TF_IMPL") == "shuffle":
        from vexor_spark.operators import postings as _postings

        _postings.term_freqs_build = _postings.term_freqs_shuffle
    elif _os.environ.get("VEXOR_TF_IMPL") == "kernel":
        from vexor_spark.operators import postings as _postings

        _postings.term_freqs_build = _postings.term_freqs

    spark = SparkSession.builder.getOrCreate()
    work = Path(args.workdir or tempfile.mkdtemp(prefix="vexor_bench_"))
    work.mkdir(parents=True, exist_ok=True)
    pages_path = Path(args.pages_dir) if args.pages_dir else work / "pages"
    idx_path = work / "index"

    # corpus materialization (untimed; fixed partition count so both
    # cluster sizes read identically-split input)
    if not (pages_path / "_SUCCESS").exists():
        generate_pages_df(
            spark, args.pages, edges=False, partitions=args.gen_partitions
        ).write.mode("overwrite").parquet(str(pages_path))

    pages = spark.read.parquet(str(pages_path))

    # warmup (untimed): run the whole pipeline on a small slice to pay
    # codegen + Python-worker + Arrow startup before the clock starts.
    warm_idx = build_index(pages.limit(256), salt_partitions=2, term_buckets=8)
    warm_idx.docs.unpersist()
    warm_idx.postings.unpersist()

    # best-of-N: single-run wall clocks in this sandbox swing 2-3x with
    # system noise; best-of-N approximates steady-state throughput.
    # The timed unit is the FULL artifact build (extract → chunk → ids →
    # tf → streamed block encode → partitioned parquet + dict + docs).
    from vexor_spark.index.storage import build_and_write_index

    times = []
    summary = None
    for _rep in range(max(args.repeats, 1)):
        t0 = time.time()
        summary = build_and_write_index(
            pages, idx_path, term_buckets=args.term_buckets
        )
        times.append(time.time() - t0)
    build_secs = min(times)

    out = {
        "pages": args.pages,
        "docs": summary["docs"],
        "build_secs": round(build_secs, 3),
        "build_secs_all": [round(t, 3) for t in times],
        "docs_per_sec": round(summary["docs"] / build_secs, 2),
        "pages_per_sec": round(args.pages / build_secs, 2),
        "parallelism": spark.sparkContext.defaultParallelism,
        # per-stage breakdown of the LAST (JIT/page-cache warm) rep
        "stage_secs": summary.get("stage_secs"),
    }

    if args.queries > 0:
        from vexor_spark.sources.corpus import query_suite_extended

        pidx = PersistedIndex(spark, idx_path)
        suite = query_suite_extended(min(args.pages, 100_000))[: args.queries]
        pidx.search_local("warmup query spark", k=10)  # warm metadata

        def run_suite() -> list[float]:
            lats = []
            for q in suite:
                tq = time.time()
                pidx.search_local(q["query"], k=10)
                lats.append(time.time() - tq)
            lats.sort()
            return lats

        # cold pass: per-term caches empty (except the warmup query)
        cold = run_suite()
        out["query_median_sec_cold"] = round(statistics.median(cold), 4)
        out["query_p95_sec_cold"] = round(cold[int(len(cold) * 0.95) - 1], 4)
        # open-time cache warm (top-df contributions), then steady state
        pidx2 = PersistedIndex(spark, idx_path)
        tw = time.time()
        out["warmed_terms"] = pidx2.warm()
        out["warm_secs"] = round(time.time() - tw, 3)
        pidx = pidx2
        lats = run_suite()
        out["query_median_sec"] = round(statistics.median(lats), 4)
        out["query_p95_sec"] = round(lats[int(len(lats) * 0.95) - 1], 4)
        out["query_mean_sec"] = round(statistics.mean(lats), 4)

        # distributed serving path (block-max pruned — the default) +
        # multi-query batch amortization. The extended suite carries
        # per-query classes (uid/phrase/edge/head — head = prunable
        # common-term queries, round-5 item 3); latency is reported
        # per class and pruning engagement is counted on the heads.
        pidx.search_distributed(suite[0]["query"], k=10).collect()
        dist = []
        by_cls: dict[str, list[float]] = {}
        for q in suite:
            tq = time.time()
            pidx.search_distributed(q["query"], k=10).collect()
            el = time.time() - tq
            dist.append(el)
            by_cls.setdefault(q.get("cls", "uid"), []).append(el)
        dist.sort()
        out["dist_query_median_sec"] = round(statistics.median(dist), 4)
        out["dist_query_p95_sec"] = round(dist[int(len(dist) * 0.95) - 1], 4)
        out["dist_query_by_class"] = {
            cls: {
                "n": len(ls),
                "p50_sec": round(statistics.median(ls), 4),
                "max_sec": round(max(ls), 4),
            }
            for cls, ls in sorted(by_cls.items())
        }
        # engagement counters (separate pass — metrics adds count()
        # actions that must not pollute the timed numbers)
        engaged, decoded, total = 0, [], []
        for q in suite:
            if q.get("cls") != "head":
                continue
            m: dict = {}
            pidx.search_distributed(q["query"], k=10, metrics=m).collect()
            if m.get("pruned"):
                engaged += 1
                decoded.append(m.get("blocks_decoded", 0))
                total.append(m.get("blocks_total", 0))
        out["head_pruning"] = {
            "queries": sum(1 for q in suite if q.get("cls") == "head"),
            "engaged": engaged,
            "median_blocks_decoded": int(statistics.median(decoded)) if decoded else None,
            "median_blocks_total": int(statistics.median(total)) if total else None,
        }
        seq = sum(dist)
        qmap = {f"q{i:02d}": q["query"] for i, q in enumerate(suite)}
        t0 = time.time()
        pidx.search_distributed_multi(qmap, k=10).collect()
        batch_secs = time.time() - t0
        out["multiquery_batch_secs"] = round(batch_secs, 3)
        out["multiquery_amortization"] = round(seq / batch_secs, 2)

    print("BENCH_BUILD " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
