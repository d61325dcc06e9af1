"""spark-submit CLI: query a persisted index (vexor `search` analog).

    spark-submit --master local[8] --py-files vexor_spark.zip \
        scripts/query_cli.py --index /data/index "posting list compression" \
        [--top 10] [--path local|distributed|pruned] [--url-prefix P] \
        [--porcelain]

Default output mirrors the reference's porcelain fields
(docs/cli.md:49-50): rank, score, url, chunk_index, start_line,
end_line, preview — tab-separated with --porcelain, aligned otherwise.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--index", required=True)
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--path", default="local", choices=["local", "distributed", "pruned"])
    ap.add_argument("--url-prefix", default=None)
    ap.add_argument("--porcelain", action="store_true")
    args = ap.parse_args()

    from vexor_spark.index.storage import PersistedIndex

    spark = SparkSession.builder.getOrCreate()
    pidx = PersistedIndex(spark, args.index)

    if args.path == "local" and not args.url_prefix:
        hits = pidx.search_local(args.query, k=args.top)
        ranked = spark.createDataFrame(
            [(r, d, s) for r, d, s in hits], "rank int, doc_id long, score double"
        )
    else:
        ranked = pidx.search_distributed(
            args.query, k=args.top, prune=(args.path == "pruned")
        )
    rows = pidx.decorate(ranked)
    if args.url_prefix:
        rows = rows.filter(F.col("url").startswith(args.url_prefix))
    out = rows.collect()
    for r in out:
        fields = [
            str(r["rank"]), f"{r['score']:.6f}", r["url"], str(r["chunk_index"]),
            str(r["start_line"] or ""), str(r["end_line"] or ""),
            (r["preview"] or "")[:100],
        ]
        print("\t".join(fields) if args.porcelain else "  ".join(fields))
    spark.stop()


if __name__ == "__main__":
    main()
