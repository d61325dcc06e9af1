"""Round-5 scale campaign at the 2M-page corpus → BENCH_R05_SCALE.json.

Measures the five things the round-4 verdict asked to make ACTIONABLE
(items 1,2,4,5,7,8):

1. SERVING with free pruning (item 2): pruned-default vs unpruned
   p50/p95 over the EXTENDED 40-query suite (uid/phrase/edge/head
   classes) — the θ-skip must make prune=True cost unpruned-price on
   uid queries while the head-term class shows real engagement
   (blocks decoded ≪ blocks total), rank identity everywhere.
2. UNIFIED update_index routing at 2M (item 1): diffuse 1% / 10% / 50%
   changes must route to delta at ≤0.2× full-build cost (1-10%);
   a concentrated change routes in-place; the full-build baseline and
   the reference-gate rebuild anchor the ceiling.
3. SEGMENT-COUNT READ CURVE (item 5): serving p50 at 0/1/2/4/8 live
   (block-encoded) segments — claim ≤1.5× at 4 segments.
4. SEGMENTED MULTI-QUERY (item 4): whole suite in ONE job over a
   2-segment SegmentedIndex vs sequential, rank-identical.
5. STREAMING NEAR-DUP at bench scale (item 7): 16 micro-batches of
   25k docs against the horizon-bounded sigstore, per-batch wall-clock
   with a compact_sigstore every 4 batches — per-batch cost must track
   batch+horizon size, not total history.
6. COMPACTION-CADENCE TCO (item 8): pure arithmetic over the measured
   delta cost, per-segment read overhead, and compaction cost —
   cost-per-update-cycle for cadences 1/2/4/8.

Usage:
    nohup python scripts/bench_scale_r05.py --pages 2000000 \
        > /tmp/scale_r05.log 2>&1 &
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

ARTIFACT = REPO / "BENCH_R05_SCALE.json"


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


def _save(out: dict) -> None:
    ARTIFACT.write_text(json.dumps(out, indent=2) + "\n")


def _mutate(pages, changed_buckets, tag, n_buckets):
    """Length-preserving text edit + html resync on the given url
    buckets (the bench_scale_r04 recipe — appends would change chunk
    counts and shift doc ids by design)."""
    import pyspark.sql.functions as F

    from vexor_spark.index.checkpoint import _bucket_col

    return (
        pages.withColumn("_b", _bucket_col(F.col("url"), n_buckets))
        .withColumn(
            "text",
            F.when(
                F.col("_b").isin(changed_buckets) & (F.length("text") > 6),
                F.concat(F.lit(tag + "q "), F.expr("substring(text, 7)")),
            ).otherwise(F.col("text")),
        )
        .withColumn(
            "html",
            F.when(
                F.col("_b").isin(changed_buckets),
                F.encode(F.col("text"), "UTF-8"),
            ).otherwise(F.col("html")),
        )
        .drop("_b")
    )


def probe_serving(pidx, suite, out: dict) -> None:
    from vexor_spark.functions.rounding import round_half_up

    for q in suite[:3]:
        pidx.search_distributed(q["query"], k=10).collect()

    pruned_t, unpruned_t, rows_by_cls = [], [], {}
    identity_bad = []
    for q in suite:
        t0 = time.time()
        a = pidx.search_distributed(q["query"], k=10, prune=True).collect()
        el = time.time() - t0
        pruned_t.append(el)
        rows_by_cls.setdefault(q.get("cls", "uid"), {"pruned": [], "unpruned": []})[
            "pruned"
        ].append(el)
        t0 = time.time()
        b = pidx.search_distributed(q["query"], k=10, prune=False).collect()
        el = time.time() - t0
        unpruned_t.append(el)
        rows_by_cls[q.get("cls", "uid")]["unpruned"].append(el)
        al = [(r["rank"], r["doc_id"], round_half_up(r["score"], 6)) for r in a]
        bl = [(r["rank"], r["doc_id"], round_half_up(r["score"], 6)) for r in b]
        if al != bl:
            identity_bad.append(q["query"])

    counters = []
    for q in suite:
        m: dict = {}
        pidx.search_distributed(q["query"], k=10, prune=True, metrics=m).collect()
        m["cls"] = q.get("cls", "uid")
        counters.append(m)
    engaged = [m for m in counters if m.get("pruned")]
    skipped = [m for m in counters if m.get("theta_skipped")]
    out["serving_2M_r05"] = {
        "queries": len(suite),
        "pruned": {
            "p50_sec": round(_pct(pruned_t, 50), 4),
            "p95_sec": round(_pct(pruned_t, 95), 4),
        },
        "unpruned": {
            "p50_sec": round(_pct(unpruned_t, 50), 4),
            "p95_sec": round(_pct(unpruned_t, 95), 4),
        },
        "by_class": {
            cls: {
                "n": len(d["pruned"]),
                "pruned_p50_sec": round(_pct(d["pruned"], 50), 4),
                "unpruned_p50_sec": round(_pct(d["unpruned"], 50), 4),
            }
            for cls, d in sorted(rows_by_cls.items())
        },
        "rank_identity_mismatches": identity_bad,
        "pruning": {
            "queries_engaged": len(engaged),
            "theta_skipped": len(skipped),
            "engaged_by_class": {
                cls: sum(1 for m in engaged if m["cls"] == cls)
                for cls in sorted({m["cls"] for m in counters})
            },
            "median_blocks_decoded": int(
                statistics.median(m["blocks_decoded"] for m in engaged)
            ) if engaged else None,
            "median_blocks_total": int(
                statistics.median(m["blocks_total"] for m in engaged)
            ) if engaged else None,
            "per_query": counters,
        },
    }
    print("SERVING", json.dumps({k: v for k, v in out["serving_2M_r05"].items()
                                 if k != "pruning"}), flush=True)


def probe_update_routing(spark, pages_dir, workroot, out: dict) -> None:
    import shutil

    from vexor_spark.index.checkpoint import DEFAULT_INPUT_BUCKETS
    from vexor_spark.index.maintenance import update_index

    n_buckets = DEFAULT_INPUT_BUCKETS
    pages = spark.read.parquet(str(pages_dir))
    work = workroot / "route_work"
    idx = workroot / "route_idx"
    shutil.rmtree(work, ignore_errors=True)
    shutil.rmtree(idx, ignore_errors=True)

    t0 = time.time()
    base = update_index(pages, work, idx, n_buckets=n_buckets, term_buckets=64)
    base_secs = time.time() - t0
    rec = {
        "full_build_secs": round(base_secs, 1),
        "base_route": base["route"],
        "updates": {},
    }
    cur = pages
    # tombstone_ratio=1.0 + max_segments=8: let the curve accumulate
    # segments; compaction cost is measured separately below.
    for ratio, tag in ((0.01, "d01"), (0.10, "d10"), (0.50, "d50")):
        k = max(1, round(ratio * n_buckets))
        cur = _mutate(cur, list(range(k)), tag, n_buckets)
        t0 = time.time()
        s = update_index(
            cur, work, idx, n_buckets=n_buckets,
            max_segments=8, tombstone_ratio=1.0,
        )
        secs = time.time() - t0
        rec["updates"][str(ratio)] = {
            "route": s["route"],
            "route_reason": s.get("route_reason"),
            "shape": s.get("shape"),
            "secs": round(secs, 1),
            "vs_full_build": round(secs / base_secs, 3),
        }
        print("ROUTE", ratio, json.dumps(rec["updates"][str(ratio)]), flush=True)
    # compaction cost at this state (3 segments)
    from vexor_spark.index.delta import compact_segments

    t0 = time.time()
    comp = compact_segments(spark, work, idx)
    rec["compact_secs"] = round(time.time() - t0, 1)
    rec["compact_segments_folded"] = comp["segments_folded"]
    out["update_routing_2M"] = rec
    print("ROUTING", json.dumps({k: v for k, v in rec.items() if k != "updates"}),
          flush=True)
    out["_route_pages_dir"] = None  # state consumed
    _save(out)


def probe_segment_curve(spark, pages_dir, workroot, suite, out: dict) -> None:
    """Serving p50 vs live segment count with block-encoded segments."""
    import shutil

    from vexor_spark.functions.rounding import round_half_up
    from vexor_spark.index.checkpoint import DEFAULT_INPUT_BUCKETS
    from vexor_spark.index.delta import SegmentedIndex, delta_update
    from vexor_spark.index.merge import update_persisted_index

    n_buckets = DEFAULT_INPUT_BUCKETS
    pages = spark.read.parquet(str(pages_dir))
    work = workroot / "segcurve_work"
    idx = workroot / "segcurve_idx"
    shutil.rmtree(work, ignore_errors=True)
    shutil.rmtree(idx, ignore_errors=True)
    update_persisted_index(pages, work, idx, n_buckets=n_buckets, term_buckets=64)

    qs = [q["query"] for q in suite[:12]]

    def serve_p50() -> float:
        seg = SegmentedIndex(spark, idx)
        seg.search_distributed(qs[0], k=10).collect()  # warm
        lats = []
        for q in qs:
            t0 = time.time()
            seg.search_distributed(q, k=10).collect()
            lats.append(time.time() - t0)
        return _pct(lats, 50)

    curve = {"0": round(serve_p50(), 3)}
    cur = pages
    total_segments = 0
    for step in range(8):
        cur = _mutate(cur, [step % n_buckets], f"s{step:02d}", n_buckets)
        s = delta_update(cur, work, idx, n_buckets=n_buckets)
        assert s["action"] == "delta", s
        total_segments += 1
        if total_segments in (1, 2, 4, 8):
            curve[str(total_segments)] = round(serve_p50(), 3)
            print("SEGCURVE", total_segments, curve[str(total_segments)], flush=True)
    base_p50 = curve["0"]
    out["segment_read_curve_2M"] = {
        "p50_sec_by_segments": curve,
        "overhead_at_4": round(curve["4"] / base_p50, 2) if base_p50 else None,
        "overhead_at_8": round(curve["8"] / base_p50, 2) if base_p50 else None,
    }
    _save(out)

    # segmented multi-query at the 2-segment-equivalent state (8 here):
    # one job vs sequential, rank identity on every query.
    seg = SegmentedIndex(spark, idx)
    qmap = {f"q{i:02d}": q["query"] for i, q in enumerate(suite)}
    singles = {}
    t0 = time.time()
    for name, q in qmap.items():
        singles[name] = [
            (r["rank"], r["doc_id"], round_half_up(r["score"], 6))
            for r in seg.search_distributed(q, k=10).collect()
        ]
    seq_secs = time.time() - t0
    t0 = time.time()
    batch_rows = seg.search_distributed_multi(qmap, k=10).collect()
    batch_secs = time.time() - t0
    by_q: dict = {n: [] for n in qmap}
    for r in batch_rows:
        by_q[r["query"]].append(
            (r["rank"], r["doc_id"], round_half_up(r["score"], 6))
        )
    bad = [n for n in qmap if sorted(by_q[n]) != sorted(singles[n])]
    out["segmented_multiquery_2M"] = {
        "segments": len(seg.seg_ids),
        "queries": len(qmap),
        "sequential_secs": round(seq_secs, 2),
        "batch_secs": round(batch_secs, 2),
        "amortization_factor": round(seq_secs / batch_secs, 2),
        "rank_identity_mismatches": bad,
    }
    print("SEGMULTI", json.dumps(out["segmented_multiquery_2M"]), flush=True)
    _save(out)


def probe_streaming_neardup(spark, workroot, out: dict, *, batches=16,
                            docs_per_batch=25_000) -> None:
    """Per-batch wall-clock over a long run: horizon covers 4 batches,
    compact_sigstore every 4 — cost must stay flat (bounded by
    batch+horizon), not grow with total history."""
    import datetime as dt
    import shutil

    import pyspark.sql.functions as F

    from vexor_spark.functions.tokenize import tokenize_col
    from vexor_spark.sources.corpus import generate_pages_df
    from vexor_spark.streaming.neardup import apply_neardup_batch, compact_sigstore

    work = workroot / "neardup_bench"
    shutil.rmtree(work, ignore_errors=True)
    total = batches * docs_per_batch
    pages = generate_pages_df(spark, total, edges=False, partitions=64)
    docs = pages.select(
        # bit-mask, not abs(): ANSI mode throws on abs(MIN_LONG)
        F.xxhash64("url").bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF)).alias("doc_id"),
        tokenize_col(F.col("text")).alias("tokens"),
        F.pmod(F.xxhash64(F.col("url"), F.lit(7)), F.lit(batches)).alias("_b"),
    ).persist()
    docs.count()
    t_epoch = dt.datetime(2026, 1, 1)
    per_batch = []
    for b in range(batches):
        batch_df = docs.filter(F.col("_b") == b).withColumn(
            "ts", F.lit(t_epoch + dt.timedelta(hours=b))
        ).select("doc_id", "ts", "tokens")
        t0 = time.time()
        rec = apply_neardup_batch(
            batch_df, work, batch_id=b, horizon="4 hours",
            max_bucket=64,
        )
        el = time.time() - t0
        entry = {
            "batch": b, "docs": rec["docs"], "pairs": rec["pairs"],
            "store_partitions": rec["store_partitions"],
            "secs": round(el, 2),
        }
        if (b + 1) % 4 == 0:
            t0 = time.time()
            comp = compact_sigstore(spark, work)
            entry["compact_secs"] = round(time.time() - t0, 2)
            entry["compact_merged"] = comp["merged"]
        per_batch.append(entry)
        print("NEARDUP", json.dumps(entry), flush=True)
    docs.unpersist()
    first4 = [e["secs"] for e in per_batch[1:5]]
    last4 = [e["secs"] for e in per_batch[-4:]]
    out["streaming_neardup_bench"] = {
        "batches": batches,
        "docs_per_batch": docs_per_batch,
        "horizon_batches": 4,
        "compact_every": 4,
        "per_batch": per_batch,
        "mean_secs_batches_1_4": round(statistics.mean(first4), 2),
        "mean_secs_last_4": round(statistics.mean(last4), 2),
        "flatness_ratio": round(statistics.mean(last4) / statistics.mean(first4), 2),
    }
    _save(out)


def compute_tco(out: dict) -> None:
    """Compaction-cadence TCO from the measured pieces: for cadence m
    (delta updates between compactions), amortized cost per update =
    delta_secs + compact_secs/m; read multiplier = mean serving
    overhead across the 1..m segment states."""
    route = out.get("update_routing_2M") or {}
    curve = (out.get("segment_read_curve_2M") or {}).get("p50_sec_by_segments") or {}
    delta_secs = (route.get("updates") or {}).get("0.01", {}).get("secs")
    compact_secs = route.get("compact_secs")
    base = curve.get("0")
    if not (delta_secs and compact_secs and base):
        return
    known = {int(k): v for k, v in curve.items()}
    def read_mult(segs: int) -> float:
        ks = sorted(known)
        k = max([x for x in ks if x <= segs] or [ks[0]])
        return known[k] / base
    tco = {}
    for m in (1, 2, 4, 8):
        tco[str(m)] = {
            "update_cost_secs": round(delta_secs + compact_secs / m, 1),
            "mean_read_multiplier": round(
                statistics.mean(read_mult(s) for s in range(1, m + 1)), 2
            ),
        }
    out["compaction_cadence_tco"] = {
        "inputs": {
            "delta_1pct_secs": delta_secs,
            "compact_secs": compact_secs,
            "read_p50_by_segments": curve,
        },
        "per_cadence": tco,
    }
    _save(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2_000_000)
    ap.add_argument("--workroot", default="/tmp/scale_r05")
    ap.add_argument("--skip-serving", action="store_true")
    ap.add_argument("--skip-routing", action="store_true")
    ap.add_argument("--skip-segcurve", action="store_true")
    ap.add_argument("--skip-neardup", action="store_true")
    ap.add_argument("--nd-batches", type=int, default=16)
    ap.add_argument("--nd-docs-per-batch", type=int, default=25_000)
    args = ap.parse_args()
    workroot = Path(args.workroot)
    workroot.mkdir(parents=True, exist_ok=True)

    spark = _spark()
    from vexor_spark.index.storage import PersistedIndex, build_and_write_index
    from vexor_spark.sources.corpus import generate_pages_df, query_suite_extended

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

    out: dict = json.loads(ARTIFACT.read_text()) if ARTIFACT.exists() else {}
    out["pages"] = args.pages
    suite = query_suite_extended(min(args.pages, 100_000))

    if not args.skip_serving:
        pidx = PersistedIndex(spark, idx_dir)
        probe_serving(pidx, suite, out)
        _save(out)
    if not args.skip_routing:
        probe_update_routing(spark, pages_dir, workroot, out)
    if not args.skip_segcurve:
        probe_segment_curve(spark, pages_dir, workroot, suite, out)
    if not args.skip_neardup:
        probe_streaming_neardup(
            spark, workroot, out,
            batches=args.nd_batches, docs_per_batch=args.nd_docs_per_batch,
        )
    compute_tco(out)
    out["campaign_secs"] = round(time.time() - t_all, 1)
    _save(out)
    print("DONE", out["campaign_secs"], flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
