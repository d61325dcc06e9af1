"""Delta-segment cost probe at the 2M-page corpus — the follow-up to
BENCH_R04_SCALE's merge curve: update cost for 1% / 10% diffuse changes
via delta segments vs the measured in-place incremental (201s / 177s)
and full rebuild (153s) on the same corpus, plus read-time overhead of
the segmented view.

Usage: nohup python scripts/bench_delta_r04.py > /tmp/delta_r04.log 2>&1 &
"""

from __future__ import annotations

import json
import statistics
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
import sys

sys.path.insert(0, str(REPO))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from vexor_spark.index.checkpoint import DEFAULT_INPUT_BUCKETS, _bucket_col
    from vexor_spark.index.delta import SegmentedIndex, delta_update
    from vexor_spark.index.merge import update_persisted_index
    from vexor_spark.index.storage import PersistedIndex
    from vexor_spark.sources.corpus import query_suite

    workroot = Path("/tmp/scale_r04")
    pages = spark.read.parquet(str(workroot / "pages"))
    work, idx = workroot / "delta_work", workroot / "delta_idx"
    n_buckets = DEFAULT_INPUT_BUCKETS

    out: dict = {}
    t0 = time.time()
    update_persisted_index(pages, work, idx, n_buckets=n_buckets)
    out["baseline_full_build_secs"] = round(time.time() - t0, 1)
    print("BASELINE", out["baseline_full_build_secs"], flush=True)

    cur = pages
    for ratio in (0.01, 0.10):
        k = max(1, round(ratio * n_buckets))
        edit = f"delta edit {int(ratio*100)} extra tokens appended"
        cur = cur.withColumn(
            "_b", _bucket_col(F.col("url"), n_buckets)
        ).withColumn(
            "text",
            F.when(F.col("_b") < k, F.concat(F.col("text"), F.lit(" " + edit)))
            .otherwise(F.col("text")),
        ).withColumn(
            "html",
            F.when(F.col("_b") < k, F.encode(F.col("text"), "UTF-8"))
            .otherwise(F.col("html")),
        ).drop("_b")
        t0 = time.time()
        s = delta_update(cur, work, idx, n_buckets=n_buckets)
        secs = time.time() - t0
        out[f"delta_{ratio}"] = {
            "changed_input_buckets": k,
            "secs": round(secs, 1),
            "vs_full_build": round(secs / out["baseline_full_build_secs"], 3),
            "docs_written": s["docs_written"],
            "docs_tombstoned": s["docs_tombstoned"],
        }
        print("DELTA", ratio, json.dumps(out[f"delta_{ratio}"]), flush=True)

    # read-time overhead of the 2-segment view vs the plain base
    seg = SegmentedIndex(spark, idx)
    base = PersistedIndex(spark, idx)
    suite = query_suite(100_000)[:10]
    seg.search_distributed(suite[0]["query"], k=10).collect()  # warm
    seg_t, base_t = [], []
    for q in suite:
        t0 = time.time()
        seg.search_distributed(q["query"], k=10).collect()
        seg_t.append(time.time() - t0)
        t0 = time.time()
        base.search_distributed(q["query"], k=10).collect()
        base_t.append(time.time() - t0)
    out["segmented_read_overhead"] = {
        "segments": 2,
        "segmented_p50_sec": round(statistics.median(seg_t), 3),
        "base_p50_sec": round(statistics.median(base_t), 3),
    }
    print("READ", json.dumps(out["segmented_read_overhead"]), flush=True)

    artifact = REPO / "BENCH_R04_SCALE.json"
    d = json.loads(artifact.read_text())
    d["delta_segments_2M"] = out
    artifact.write_text(json.dumps(d, indent=2) + "\n")
    print("DONE", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
