"""Retrieval-quality evaluation run (round-2 verdict item 6; extended
round 5 with the ANN-served dense leg and a dense-leg latency probe).

Builds the seeded synthetic corpus at --pages and evaluates ten
retrieval arms over the committed 30-query suite
(sources/corpus.query_suite — the analog of the reference's
scripts/eval_queries.jsonl):

- `off`/`bm25`/`hybrid` — letter-count parity backend (reference test
  embedding; degenerate at corpus scale, kept for parity),
- `off_hbow`/`bm25_hbow`/`hybrid_hbow` — exact 2^16-bucket hashing-
  trick tf-idf dense leg (full per-query histogram scan),
- `off_ann`/`bm25_ann`/`hybrid_ann` — the SAME leg served through IVF
  over a 128-lane count-sketch + exact rerank of ≤200 candidates
  (retrieval.ann_dense_candidates),
- `bm25_full` — the engine's primary inverted-index path.

Also times one dense-leg evaluation both ways (full hbow scan vs ANN)
— the sublinear-latency evidence for EVAL.md.

Usage:
    spark-submit --driver-memory 16g --py-files vexor_spark.zip \
        scripts/run_eval.py --pages 200000 [--skip-letter]
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=20000)
    ap.add_argument("--skip-letter", action="store_true",
                    help="skip the (measured-degenerate) letter arms")
    ap.add_argument("--arms", default=None,
                    help="comma-separated arm subset (2M runs: the hbow"
                         " + ann triples + bm25_full fit the driver)")
    args = ap.parse_args()

    from vexor_spark.eval import ALL_ARMS, evaluate
    from vexor_spark.index.build import build_index
    from vexor_spark.retrieval import ann_dense_candidates, dense_scores
    from vexor_spark.sources.corpus import generate_pages_df, query_suite

    spark = SparkSession.builder.getOrCreate()
    pages = generate_pages_df(spark, args.pages, edges=True, partitions=32)
    index = build_index(pages, salt_partitions=8, term_buckets=32)
    queries = query_suite(args.pages)
    arms = tuple(a for a in ALL_ARMS if not (
        args.skip_letter and a in ("off", "bm25", "hybrid")))
    if args.arms:
        chosen = [a.strip() for a in args.arms.split(",") if a.strip()]
        unknown = sorted(set(chosen) - set(ALL_ARMS))
        assert not unknown, f"unknown arms {unknown}; have {ALL_ARMS}"
        arms = tuple(a for a in ALL_ARMS if a in chosen)

    # dense-leg latency probe: same query, full scan vs ANN-served
    # (caches warmed first so both sides measure steady-state serving).
    probe_q = next(q["query"] for q in queries if q.get("expected"))
    index.hbow_counts().count()
    _ = index.hbow_idf()
    index.hbow_sketch_cells().count()
    dense_scores(
        index.docs, probe_q, "hashed_bow",
        hbow_counts=index.hbow_counts(), hbow_idf=index.hbow_idf(),
    ).count()
    ann_dense_candidates(index, probe_q).count()
    lat = {}
    for name, fn in (
        ("full_scan", lambda q: dense_scores(
            index.docs, q, "hashed_bow",
            hbow_counts=index.hbow_counts(), hbow_idf=index.hbow_idf(),
        ).orderBy("dense_score", ascending=False).limit(10).collect()),
        ("ann", lambda q: ann_dense_candidates(index, q)
         .orderBy("dense_score", ascending=False).limit(10).collect()),
    ):
        ts = []
        for q in [q["query"] for q in queries if q.get("expected")][:8]:
            t0 = time.time()
            fn(q)
            ts.append(time.time() - t0)
        ts.sort()
        lat[name] = {
            "p50_sec": round(ts[len(ts) // 2], 3),
            "mean_sec": round(sum(ts) / len(ts), 3),
        }

    t0 = time.time()
    metrics = evaluate(index, queries, arms=arms)
    out = {
        "pages": args.pages,
        "docs": index.doc_count,
        "queries": len(queries),
        "scored_queries": metrics[arms[0]]["n"],
        "eval_secs": round(time.time() - t0, 1),
        "dense_leg_latency": lat,
        "arms": metrics,
    }
    print("EVAL_RESULT " + json.dumps(out))
    index.docs.unpersist()
    index.postings.unpersist()
    index.release_caches()
    spark.stop()


if __name__ == "__main__":
    main()
