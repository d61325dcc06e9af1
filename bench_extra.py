"""Round-7 measurement harness (bench.py is FROZEN — this file holds
the extra instrumentation the optimization round needs; its numbers are
cited in OPTIMIZATION_r07.md).

Per-query noop-sink isolation (guide §1.4) over the headline catalog
suite: each query is built fresh, warmed once, then timed over the
noop sink, with spark.sparkContext.setJobDescription labelling the
jobs (§1.5). Prints one JSON line per query and a summary line.

Usage:
    python bench_extra.py [--sf-dir DIR] [--cpus N] [--repeats R]
                          [--queries q1,q2,...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2, help="timed repeats (min reported)")
    ap.add_argument("--queries", default=None, help="comma list; default = bench HEADLINE")
    args = ap.parse_args()

    from vexor_spark.session import get_spark

    import __spark_entry__ as entry_mod
    from bench import HEADLINE

    spark = get_spark(
        f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus, 32),
        app_name="vexor_bench_extra",
    )
    qs = entry_mod.queries()
    names = args.queries.split(",") if args.queries else list(HEADLINE)
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        sc = spark.sparkContext
        sc.setJobDescription(f"warm:{name}")
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for rep in range(max(1, args.repeats)):
            sc.setJobDescription(f"timed:{name}:{rep}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({"query": name, **out[name]}), flush=True)
    total = round(sum(v["min"] for v in out.values()), 3)
    print(json.dumps({"BENCH_EXTRA": {"sf_dir": args.sf_dir, "total_min": total,
                                      "queries": {k: v["min"] for k, v in out.items()}}}))
    spark.stop()


if __name__ == "__main__":
    main()
