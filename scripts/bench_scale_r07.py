"""Round-7 2M-page scale campaign → BENCH_R07_SCALE.json.

Re-measures, on the ROUND-7 tree, the two serving rows the round-6
verdict flagged:

1. serving_2M_r07 — pruned vs unpruned single-query latency per class
   at the 2M base index. Round-6 measured pruned p50 +8% over unpruned
   (head class +13%) because the seed-rescue probe loaded head terms'
   full block rows for zero wins; round 7 made the probe metadata-only
   with a volume-at-cap decline (index/wand.py). Done-bar: pruned p50
   ≤ unpruned within noise, head-class pruned ≤ unpruned.
2. segment read curve + the 4-segment serving row under ONE warm
   protocol (round-6 verdict item 3: the committed 4-seg row carried a
   cold-first-read charge the base/8-seg rows didn't).

Writes its OWN artifact (BENCH_R07_SCALE.json) — the round-6 artifact
is part of the judged history and is never rewritten.

Usage: spark-submit or plain python; stages are skippable:
    python scripts/bench_scale_r07.py [--pages 2000000]
        [--skip-serving] [--skip-segcurve]
"""

from __future__ import annotations

import argparse
import json
import shutil
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

ARTIFACT = REPO / "BENCH_R07_SCALE.json"


def _spark(master: str = "local[32]", mem: str = "24g"):
    from vexor_spark.session import get_spark

    return get_spark(
        master,
        shuffle_partitions=64,
        app_name="scale_r07",
        extra_conf={"spark.driver.memory": mem},
    )


def _pct(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(len(xs) * p / 100))]


def _save(out: dict) -> None:
    ARTIFACT.write_text(json.dumps(out, indent=1))


def _ranked(searcher, q, k=10, prune=True, metrics=None):
    from vexor_spark.functions.rounding import round_half_up

    rows = searcher.search_distributed(q, k=k, prune=prune, metrics=metrics).collect()
    return [(r["rank"], r["doc_id"], round_half_up(r["score"], 6)) for r in rows]


def probe_serving(pidx, suite, out: dict, key: str) -> None:
    """Pruned vs unpruned latency + engagement + rank identity per
    class — identical protocol to round 6's probe (bench_scale_r06):
    untimed per-query unpruned warm before each timed pair."""
    for q in suite[:3]:
        pidx.search_distributed(q["query"], k=10).collect()

    pruned_t, unpruned_t, rows_by_cls = [], [], {}
    identity_bad = []
    for q in suite:
        _ranked(pidx, q["query"], prune=False)  # untimed page-cache warm
        t0 = time.time()
        a = _ranked(pidx, q["query"], prune=True)
        el = time.time() - t0
        pruned_t.append(el)
        cls = q.get("cls", "uid")
        rows_by_cls.setdefault(cls, {"pruned": [], "unpruned": []})["pruned"].append(el)
        t0 = time.time()
        b = _ranked(pidx, q["query"], prune=False)
        el = time.time() - t0
        unpruned_t.append(el)
        rows_by_cls[cls]["unpruned"].append(el)
        if a != b:
            identity_bad.append(q["query"])

    counters = []
    for q in suite:
        m: dict = {}
        pidx.search_distributed(q["query"], k=10, prune=True, metrics=m).collect()
        m["cls"] = q.get("cls", "uid")
        m["query"] = q["query"]
        counters.append(m)
    engaged = [m for m in counters if m.get("pruned")]
    out[key] = {
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
            "engaged_by_class": {
                cls: sum(1 for m in engaged if m["cls"] == cls)
                for cls in sorted({m["cls"] for m in counters})
            },
            "seed_theta_wins": sum(
                1 for m in engaged if m.get("theta_seed", 0) > m.get("theta_walk", 0)
            ),
            "seed_probe_runs": sum(
                1 for m in counters if m.get("theta_seed", 0) > 0
            ),
            "seed_precheck_skips": sum(
                1 for m in counters if m.get("seed_precheck_skipped")
            ),
            "seed_cap_volume_skips": sum(
                1 for m in counters if m.get("seed_cap_volume_skipped")
            ),
            "median_blocks_decoded": int(
                statistics.median(m["blocks_decoded"] for m in engaged)
            )
            if engaged
            else None,
            "median_blocks_total": int(
                statistics.median(m["blocks_total"] for m in engaged)
            )
            if engaged
            else None,
            "per_query": counters,
        },
    }
    print(
        key,
        json.dumps({k: v for k, v in out[key].items() if k != "pruning"}),
        flush=True,
    )


def probe_segcurve(spark, pages_dir, workroot, suite, out: dict) -> None:
    """Read curve 0→8 segments, both modes, ONE warm protocol for every
    row (each serve_p50 opens a fresh SegmentedIndex and warms with the
    first query before timing — the 4-seg row is no longer the only one
    paying a cold first read), plus the full serving probe at 4 segs."""
    from vexor_spark.index.checkpoint import DEFAULT_INPUT_BUCKETS
    from vexor_spark.index.delta import SegmentedIndex, delta_update
    from vexor_spark.index.merge import update_persisted_index

    n_buckets = DEFAULT_INPUT_BUCKETS
    pages = spark.read.parquet(str(pages_dir))
    work = workroot / "segcurve_work_r07"
    idx = workroot / "segcurve_idx_r07"
    if not (idx / "meta.json").exists():
        shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        update_persisted_index(pages, work, idx, n_buckets=n_buckets, term_buckets=64)
        print("SEGCURVE base build", round(time.time() - t0, 1), "s", flush=True)

    qs = [q["query"] for q in suite[:12]]

    def serve_p50(prune: bool) -> float:
        seg = SegmentedIndex(spark, idx)
        # warm protocol shared by EVERY row: one untimed pass of the
        # full query list (parquet footers + page cache + θ memos).
        for q in qs:
            seg.search_distributed(q, k=10, prune=prune).collect()
        lats = []
        for q in qs:
            t0 = time.time()
            seg.search_distributed(q, k=10, prune=prune).collect()
            lats.append(time.time() - t0)
        return _pct(lats, 50)

    curve_p = {"0": round(serve_p50(True), 3)}
    curve_u = {"0": round(serve_p50(False), 3)}
    print("SEGCURVE 0 pruned", curve_p["0"], "unpruned", curve_u["0"], flush=True)
    cur = pages
    total = 0
    from bench_scale_r05 import _mutate  # the length-preserving edit

    for step in range(8):
        cur = _mutate(cur, [step % n_buckets], f"r7s{step:02d}", n_buckets)
        s = delta_update(cur, work, idx, n_buckets=n_buckets)
        assert s["action"] == "delta", s
        total += 1
        if total in (1, 2, 4, 8):
            curve_p[str(total)] = round(serve_p50(True), 3)
            curve_u[str(total)] = round(serve_p50(False), 3)
            print(
                "SEGCURVE", total, "pruned", curve_p[str(total)],
                "unpruned", curve_u[str(total)], flush=True,
            )
        if total == 4:
            probe_serving(
                SegmentedIndex(spark, idx), suite, out, "segmented_pruned_2M_4segs_r07"
            )
            _save(out)

    out["segment_read_curve_2M_r07"] = {
        "protocol": "warm (full query-list pass before every timed row)",
        "pruned_p50_by_segments": curve_p,
        "unpruned_p50_by_segments": curve_u,
        "pruned_overhead_at_4": round(curve_p["4"] / curve_p["0"], 2),
        "unpruned_overhead_at_4": round(curve_u["4"] / curve_u["0"], 2),
        "pruned_overhead_at_8": round(curve_p["8"] / curve_p["0"], 2),
        "unpruned_overhead_at_8": round(curve_u["8"] / curve_u["0"], 2),
    }
    _save(out)
    print("SEGCURVE done", json.dumps(out["segment_read_curve_2M_r07"]), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2_000_000)
    ap.add_argument("--workroot", default="/tmp/scale_r07")
    ap.add_argument("--skip-serving", action="store_true")
    ap.add_argument("--skip-segcurve", action="store_true")
    args = ap.parse_args()
    workroot = Path(args.workroot)
    workroot.mkdir(parents=True, exist_ok=True)

    spark = _spark()
    from vexor_spark.index.storage import PersistedIndex, build_and_write_index
    from vexor_spark.sources.corpus import generate_pages_df, query_suite_extended

    pages_dir = workroot / "pages"
    if not (pages_dir / "_SUCCESS").exists():
        t0 = time.time()
        generate_pages_df(spark, args.pages, edges=False, partitions=64).write.mode(
            "overwrite"
        ).parquet(str(pages_dir))
        print("CORPUS", round(time.time() - t0, 1), "s", flush=True)
    out: dict = json.loads(ARTIFACT.read_text()) if ARTIFACT.exists() else {}
    out["pages"] = args.pages
    idx_dir = workroot / "index"
    if not (idx_dir / "meta.json").exists():
        t0 = time.time()
        summary = build_and_write_index(
            spark.read.parquet(str(pages_dir)), idx_dir, term_buckets=64
        )
        out["base_build"] = {
            "secs": round(time.time() - t0, 1),
            "docs": summary["docs"],
            "stage_secs": summary.get("stage_secs"),
        }
        print("BUILD", json.dumps(out["base_build"]), flush=True)
        _save(out)

    suite = query_suite_extended(min(args.pages, 100_000))

    if not args.skip_serving:
        probe_serving(PersistedIndex(spark, idx_dir), suite, out, "serving_2M_r07")
        _save(out)
    if not args.skip_segcurve:
        probe_segcurve(spark, pages_dir, workroot, suite, out)
    print("SCALE_R07 DONE", flush=True)


if __name__ == "__main__":
    main()
