"""Retrieval-quality evaluation run (round-2 verdict item 6).

Builds the seeded synthetic corpus at --pages, evaluates all seven
retrieval arms (`off`/`bm25`/`hybrid` over the letter-count parity
backend, the same three over the hashed tf-idf backend (`*_hbow`),
plus `bm25_full`) over the committed 30-query suite
(sources/corpus.query_suite — the analog of the reference's
scripts/eval_queries.jsonl), and prints one JSON line. EVAL.md is
generated from this output.

Usage:
    spark-submit --py-files vexor_spark.zip scripts/run_eval.py \
        --pages 20000
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=20000)
    args = ap.parse_args()

    from vexor_spark.eval import ALL_ARMS, evaluate
    from vexor_spark.index.build import build_index
    from vexor_spark.sources.corpus import generate_pages_df, query_suite

    spark = SparkSession.builder.getOrCreate()
    pages = generate_pages_df(spark, args.pages, edges=True, partitions=32)
    index = build_index(pages, salt_partitions=8, term_buckets=32)
    queries = query_suite(args.pages)
    t0 = time.time()
    metrics = evaluate(index, queries, arms=ALL_ARMS)
    out = {
        "pages": args.pages,
        "docs": index.doc_count,
        "queries": len(queries),
        "scored_queries": metrics["hybrid"]["n"],
        "eval_secs": round(time.time() - t0, 1),
        "arms": metrics,
    }
    print("EVAL_RESULT " + json.dumps(out))
    index.docs.unpersist()
    index.postings.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
