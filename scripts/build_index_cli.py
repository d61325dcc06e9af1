"""spark-submit CLI: build (or incrementally refresh) a persisted index
from a pages parquet table.

    spark-submit --master local[32] --py-files vexor_spark.zip \
        scripts/build_index_cli.py --pages /data/pages --out /data/index \
        [--workdir /data/work] [--mode full] [--buckets 32] \
        [--salt 16] [--term-buckets 64]

With --workdir the build is resumable: unchanged url-buckets are
skipped via content-hash lineage (vexor `index` command analog,
including its UP_TO_DATE fast path). Without it, a from-scratch build.
Prints a one-line JSON summary.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="parquet dir of (url, warc_ts, html, ...)")
    ap.add_argument("--out", required=True, help="index output dir")
    ap.add_argument("--workdir", default=None, help="resumable chunk-store dir")
    ap.add_argument("--mode", default="full", choices=["full", "head", "name", "brief", "auto"])
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--salt", type=int, default=16)
    ap.add_argument("--term-buckets", type=int, default=64)
    args = ap.parse_args()

    from vexor_spark.index.build import build_index
    from vexor_spark.index.checkpoint import build_index_resumable
    from vexor_spark.index.storage import write_index

    spark = SparkSession.builder.getOrCreate()
    pages = spark.read.parquet(args.pages)
    t0 = time.time()
    if args.workdir:
        index, record = build_index_resumable(
            pages, args.workdir, n_buckets=args.buckets,
            salt_partitions=args.salt, term_buckets=args.term_buckets,
        )
    else:
        index = build_index(
            pages, salt_partitions=args.salt,
            term_buckets=args.term_buckets, mode=args.mode,
        )
        record = None
    write_index(index, args.out)
    print(
        json.dumps(
            {
                "docs": index.doc_count,
                "avg_doc_len": round(index.avg_doc_len, 4),
                "secs": round(time.time() - t0, 2),
                "out": args.out,
                "incremental": record,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
