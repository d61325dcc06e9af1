"""Round-7, round-6 verdict item 8: retrieval quality at 2M under a
LIVE 4-segment view.

The 2M EVAL row (round 6) ran against the base index; steady state is
segmented. Rank identity under segments is already pinned by the
serving probes (0/40 mismatches, BENCH_R07_SCALE), which makes metric
identity a corollary — this harness closes the loop end-to-end by
actually computing MRR@10 / Hit@1 / Hit@5 for the committed 30-query
suite through BOTH views of the same live corpus state:

- base+4 deltas, `SegmentedIndex.search_distributed(prune=True)`
  (the steady-state default), and
- a from-scratch rebuild of the identical corpus state,
  `PersistedIndex.search_distributed` —

and asserting the metrics match. The lexical path is the segmented
ingredient of every eval arm (`bm25_full` directly; the hybrid/ANN
arms' dense leg reads embeddings, which do not live in the inverted
layers), so lexical metric identity under segments is the binding
property for item 8's arms.

Writes "eval_segmented_2M" into BENCH_R07_SCALE.json.

Usage: python scripts/eval_segmented_r07.py [--pages 2000000]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

ARTIFACT = REPO / "BENCH_R07_SCALE.json"


def _save(rec: dict) -> None:
    out = json.loads(ARTIFACT.read_text()) if ARTIFACT.exists() else {}
    out["eval_segmented_2M"] = rec
    ARTIFACT.write_text(json.dumps(out, indent=1))


def _metrics(ranked_urls_by_query: dict[str, list[str]], expected: dict[str, str]) -> dict:
    rr, hit1, hit5 = [], 0, 0
    for q, exp in expected.items():
        urls = ranked_urls_by_query.get(q, [])
        try:
            rank = urls.index(exp) + 1
        except ValueError:
            rank = None
        rr.append(1.0 / rank if rank and rank <= 10 else 0.0)
        hit1 += 1 if rank == 1 else 0
        hit5 += 1 if rank is not None and rank <= 5 else 0
    n = len(expected)
    return {
        "mrr10": round(sum(rr) / n, 4),
        "hit1": round(hit1 / n, 4),
        "hit5": round(hit5 / n, 4),
        "n_queries": n,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2_000_000)
    ap.add_argument("--tmp", default="/tmp/evalseg_r07")
    args = ap.parse_args()

    from bench_scale_r05 import _mutate

    from vexor_spark.index.checkpoint import DEFAULT_INPUT_BUCKETS
    from vexor_spark.index.delta import SegmentedIndex, delta_update, load_manifest
    from vexor_spark.index.maintenance import update_index
    from vexor_spark.index.storage import PersistedIndex, build_and_write_index
    from vexor_spark.session import get_spark
    from vexor_spark.sources.corpus import generate_pages_df, query_suite

    spark = get_spark(
        "local[32]", shuffle_partitions=64, app_name="evalseg_r07",
        extra_conf={"spark.driver.memory": "24g"},
    )
    root = Path(args.tmp)
    root.mkdir(parents=True, exist_ok=True)
    rec: dict = {"pages": args.pages}

    pages_dir = root / "pages.parquet"
    if not (pages_dir / "_SUCCESS").exists():
        generate_pages_df(spark, args.pages, edges=True).write.mode(
            "overwrite"
        ).parquet(str(pages_dir))
    pages = spark.read.parquet(str(pages_dir))

    # base index + 4 delta segments (distinct url buckets, the
    # segcurve recipe)
    work, idx = root / "work", root / "idx"
    if not (idx / "meta.json").exists():
        t0 = time.time()
        update_index(pages, work, idx, n_buckets=DEFAULT_INPUT_BUCKETS, term_buckets=64)
        rec["base_build_secs"] = round(time.time() - t0, 1)
    cur = pages
    manifest = load_manifest(spark, idx)
    want_tags = ["sg1", "sg2", "sg3", "sg4"]
    for i, tag in enumerate(want_tags[len(manifest["segments"]):], start=len(manifest["segments"])):
        cur = _mutate(
            spark.read.parquet(str(pages_dir)), [5 + 3 * j for j in range(i + 1)],
            want_tags[i], DEFAULT_INPUT_BUCKETS,
        )
        t0 = time.time()
        s = delta_update(cur, work, idx, n_buckets=DEFAULT_INPUT_BUCKETS)
        rec.setdefault("delta_secs", []).append(round(time.time() - t0, 1))
        assert s["action"] == "delta", s
    manifest = load_manifest(spark, idx)
    rec["segments"] = len(manifest["segments"])
    assert rec["segments"] == 4

    # the live corpus state = pages with ALL 4 mutations stacked the
    # same way the deltas stacked (the last _mutate call above built
    # exactly that: buckets 5,8,11,14 carry sg4's text)
    final_state = _mutate(
        spark.read.parquet(str(pages_dir)), [5 + 3 * j for j in range(4)],
        "sg4", DEFAULT_INPUT_BUCKETS,
    )
    rb = root / "rebuild_idx"
    if not (rb / "meta.json").exists():
        t0 = time.time()
        build_and_write_index(final_state, rb, term_buckets=64)
        rec["rebuild_secs"] = round(time.time() - t0, 1)

    seg_view = SegmentedIndex(spark, idx)
    fresh = PersistedIndex(spark, rb)
    queries = query_suite(args.pages)
    expected = {q["query"]: q["expected"] for q in queries}

    def ranked_urls(searcher, docs_df, prune):
        out: dict[str, list[str]] = {}
        for q in expected:
            kw = {"prune": prune} if prune is not None else {}
            ranked = searcher.search_distributed(q, k=10, **kw)
            rows = (
                ranked.join(docs_df.select("doc_id", "url"), "doc_id")
                .orderBy("rank")
                .select("url")
                .collect()
            )
            out[q] = [r["url"] for r in rows]
        return out

    t0 = time.time()
    seg_urls = ranked_urls(seg_view, seg_view.docs_view(), prune=True)
    rec["segmented_pruned_query_secs"] = round(time.time() - t0, 1)
    t0 = time.time()
    fresh_urls = ranked_urls(fresh, fresh.docs, prune=None)
    rec["rebuild_query_secs"] = round(time.time() - t0, 1)

    rec["segmented_pruned"] = _metrics(seg_urls, expected)
    rec["rebuild"] = _metrics(fresh_urls, expected)
    rec["metrics_identical"] = rec["segmented_pruned"] == rec["rebuild"]
    diff = [q for q in expected if seg_urls[q] != fresh_urls[q]]
    rec["url_list_mismatch_queries"] = diff
    _save(rec)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
