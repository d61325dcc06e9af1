"""Round-6 scale campaign at the 2M-page corpus → BENCH_R06_SCALE.json.

Measures the round-5 verdict's "next round" items that need 2M-scale
evidence (VERDICT.md round 5, items 1,2,5,6,7):

1. SERVING on the BASE index (items 7 + regression context): pruned vs
   unpruned p50/p95 per query class over the extended 40-query suite.
   Round 6 adds the seed-refined θ (wand._theta_seed) — the phrase
   class, which always bound-skipped in round 5 (p50 4.72 s), must now
   engage where exact seed totals separate, with rank identity.
2. SEGMENT READ CURVE (item 2): serving p50 at 0/1/2/4/8 live
   segments, both the pruned default and the unpruned path. The
   decode-time tombstone filter (codec.make_decode_live_udf) replaced
   the per-query broadcast join — bar: unpruned overhead ≤1.5× at 4
   segments (round 5: 1.66×).
3. SEGMENTED PRUNED SERVING (item 1): at 4 live segments, the full
   suite pruned-vs-unpruned — rank identity everywhere, engagement on
   head/phrase classes, per-class p50. This is the steady-state
   (cadence-4 default) path that round 5 left unpruned.
4. BATCH PRUNING (item 6): the whole suite as ONE batch, pruned vs
   unpruned, on base and on the 8-segment state — decode-set reduction
   plus per-query rank identity vs the single-query path.
5. IN-PLACE ROUTE AT SCALE (item 5): a corpus variant whose changed
   slice has a TINY vocabulary (the only shape whose term footprint
   can be concentrated once every standard page carries uid/url-unique
   tokens — measured and documented in round 5). From the same base
   state, time the router's choice vs forced delta vs full rebuild.
6. TCO recompute with the round-6 curve.

Usage:
    nohup python scripts/bench_scale_r06.py > /tmp/scale_r06.log 2>&1 &
    # stages can be skipped: --skip-serving --skip-segcurve
    #                        --skip-batch --skip-inplace
"""

from __future__ import annotations

import argparse
import json
import shutil
import statistics
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
import sys

sys.path.insert(0, str(REPO))

ARTIFACT = REPO / "BENCH_R06_SCALE.json"


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


def _ranked(searcher, q, k=10, prune=True, metrics=None):
    from vexor_spark.functions.rounding import round_half_up

    rows = searcher.search_distributed(q, k=k, prune=prune, metrics=metrics).collect()
    return [(r["rank"], r["doc_id"], round_half_up(r["score"], 6)) for r in rows]


def probe_serving(pidx, suite, out: dict, key: str) -> None:
    """Pruned vs unpruned latency + engagement + rank identity, per
    class. Works for PersistedIndex and SegmentedIndex (same API)."""
    for q in suite[:3]:
        pidx.search_distributed(q["query"], k=10).collect()

    pruned_t, unpruned_t, rows_by_cls = [], [], {}
    identity_bad = []
    for q in suite:
        # untimed per-query cache warm (prune=False so the driver-side
        # θ memos stay cold for the timed pruned pass): without this,
        # whichever mode runs FIRST pays the parquet page-cache miss —
        # measured ~+27% on the phrase class at 2M with the probe
        # already precheck-skipped, i.e. pure run-order confound.
        _ranked(pidx, q["query"], prune=False)
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
                1
                for m in engaged
                if m.get("theta_seed", 0) > m.get("theta_walk", 0)
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
    """Read curve 0→8 segments (pruned default AND unpruned), the full
    segmented pruned-serving probe at 4 segments, and the segmented
    batch comparison at 8."""
    from vexor_spark.index.checkpoint import DEFAULT_INPUT_BUCKETS
    from vexor_spark.index.delta import SegmentedIndex, delta_update
    from vexor_spark.index.merge import update_persisted_index

    n_buckets = DEFAULT_INPUT_BUCKETS
    pages = spark.read.parquet(str(pages_dir))
    work = workroot / "segcurve_work_r06"
    idx = workroot / "segcurve_idx_r06"
    if not (idx / "meta.json").exists():
        shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        update_persisted_index(pages, work, idx, n_buckets=n_buckets, term_buckets=64)
        print("SEGCURVE base build", round(time.time() - t0, 1), "s", flush=True)

    qs = [q["query"] for q in suite[:12]]

    def serve_p50(prune: bool) -> float:
        seg = SegmentedIndex(spark, idx)
        seg.search_distributed(qs[0], k=10, prune=prune).collect()  # warm
        lats = []
        for q in qs:
            t0 = time.time()
            seg.search_distributed(q, k=10, prune=prune).collect()
            lats.append(time.time() - t0)
        return _pct(lats, 50)

    curve_p = {"0": round(serve_p50(True), 3)}
    curve_u = {"0": round(serve_p50(False), 3)}
    cur = pages
    total = 0
    from bench_scale_r05 import _mutate  # the length-preserving edit

    for step in range(8):
        cur = _mutate(cur, [step % n_buckets], f"r6s{step:02d}", n_buckets)
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
                SegmentedIndex(spark, idx), suite, out, "segmented_pruned_2M_4segs"
            )
            _save(out)

    out["segment_read_curve_2M_r06"] = {
        "pruned_p50_by_segments": curve_p,
        "unpruned_p50_by_segments": curve_u,
        "pruned_overhead_at_4": round(curve_p["4"] / curve_p["0"], 2),
        "unpruned_overhead_at_4": round(curve_u["4"] / curve_u["0"], 2),
        "pruned_overhead_at_8": round(curve_p["8"] / curve_p["0"], 2),
        "unpruned_overhead_at_8": round(curve_u["8"] / curve_u["0"], 2),
    }
    _save(out)
    print("SEGCURVE done", json.dumps(out["segment_read_curve_2M_r06"]), flush=True)


def probe_batch(spark, workroot, suite, out: dict) -> None:
    """Whole-suite batch, pruned vs unpruned, base + 8-segment state."""
    from vexor_spark.functions.rounding import round_half_up
    from vexor_spark.index.delta import SegmentedIndex
    from vexor_spark.index.storage import PersistedIndex

    qmap = {f"q{i:02d}": q["query"] for i, q in enumerate(suite)}

    def run(idx, key):
        idx.search_distributed(suite[0]["query"], k=10).collect()  # warm
        t0 = time.time()
        a = idx.search_distributed_multi(qmap, k=10, prune=True).collect()
        t_p = time.time() - t0
        t0 = time.time()
        b = idx.search_distributed_multi(qmap, k=10, prune=False).collect()
        t_u = time.time() - t0
        # metrics pass AFTER timing: the blocks_total/decoded counters
        # cost two extra count() jobs on the persisted block frame.
        m: dict = {}
        idx.search_distributed_multi(qmap, k=10, prune=True, metrics=m).collect()
        ka = sorted(
            (r["query"], r["rank"], r["doc_id"], round_half_up(r["score"], 6))
            for r in a
        )
        kb = sorted(
            (r["query"], r["rank"], r["doc_id"], round_half_up(r["score"], 6))
            for r in b
        )

        def _tolerant(xs, ys):
            """Strict on everything except the k-th-place ROUNDED-score
            tie group: raw ranking means an executor sum-order ulp can
            swap which of several 6dp-tied docs holds the last rank —
            the round-5 ADVICE k-boundary class, not a soundness issue.
            Requires equal per-rank rounded scores and equal doc sets
            outside the boundary tie group."""
            from collections import defaultdict

            gx, gy = defaultdict(list), defaultdict(list)
            for q, r, d, s in xs:
                gx[q].append((r, d, s))
            for q, r, d, s in ys:
                gy[q].append((r, d, s))
            if set(gx) != set(gy):
                return False
            for q in gx:
                rx = sorted(gx[q])
                ry = sorted(gy[q])
                if [t[2] for t in rx] != [t[2] for t in ry]:
                    return False
                if not rx:
                    continue
                skth = rx[-1][2]
                if {(d, s) for _r, d, s in rx if s != skth} != {
                    (d, s) for _r, d, s in ry if s != skth
                }:
                    return False
            return True

        out[key] = {
            "queries": len(qmap),
            "pruned_secs": round(t_p, 2),
            "unpruned_secs": round(t_u, 2),
            "identical": ka == kb,
            "identical_k_boundary_tolerant": ka == kb or _tolerant(ka, kb),
            "metrics": {k: v for k, v in m.items()},
        }
        print(key, json.dumps(out[key]), flush=True)

    run(PersistedIndex(spark, workroot / "index"), "batch_pruned_2M_base")
    seg_idx = workroot / "segcurve_idx_r06"
    if (seg_idx / "segments.json").exists():
        run(SegmentedIndex(spark, seg_idx), "batch_pruned_2M_8segs")
    _save(out)


def probe_inplace(spark, pages_dir, workroot, out: dict) -> None:
    """Item 5: prove the router's choice on a concentrated-LOOKING 1%
    change is the cheapest of the three strategies at 2M.

    The measurement that settles it: every real web page carries
    per-doc-unique tokens (its URL digits, here also the uid), so ANY
    changed bucket's term footprint covers ~all term buckets — the
    concentrated shape is geometrically impossible at web scale
    (distinct terms of ≥100 docs hash onto every one of 64-4096
    buckets). The router therefore measures diffuse and picks delta;
    this probe FORCES in-place on the same change from an identical
    base copy and times all three, so the threshold is validated by
    cost, not assumption. (The concentrated→in-place branch itself
    stays pinned at its native shape — small shared-vocab corpora, the
    reference's code-index case — in test_maintenance.py.)"""
    from bench_scale_r05 import _mutate
    from vexor_spark.index.checkpoint import (
        DEFAULT_INPUT_BUCKETS,
        build_chunks_resumable,
    )
    from vexor_spark.index.delta import (
        _pending_path,
        delta_update,
        load_manifest,
        resolve_pending_changes,
    )
    from vexor_spark.index.maintenance import (
        _incremental_merge,
        measure_change_shape,
        update_index,
    )

    n_buckets = DEFAULT_INPUT_BUCKETS
    pages = spark.read.parquet(str(pages_dir))
    work = workroot / "inplace_work"
    base_idx = workroot / "inplace_idx_base"
    rec = out.setdefault("inplace_shape_2M", {})
    if not (base_idx / "meta.json").exists():
        shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree(base_idx, ignore_errors=True)
        t0 = time.time()
        update_index(pages, work, base_idx, n_buckets=n_buckets, term_buckets=64)
        rec["full_build_secs"] = round(time.time() - t0, 1)
        _save(out)
        print("INPLACE base build", rec["full_build_secs"], flush=True)

    new_pages = _mutate(pages, [17], "r6ip", n_buckets)  # 1 of 32 buckets

    def from_copy(name):
        d = workroot / f"inplace_idx_{name}"
        shutil.rmtree(d, ignore_errors=True)
        shutil.copytree(base_idx, d)
        w = workroot / f"inplace_work_{name}"
        shutil.rmtree(w, ignore_errors=True)
        shutil.copytree(work, w)
        return w, d

    # forced IN-PLACE (the router would refuse): stage the change, then
    # call the merge directly and time it.
    w, d = from_copy("forced")
    stage1 = build_chunks_resumable(
        new_pages, w, n_buckets=n_buckets, pending_file=_pending_path(d)
    )
    manifest = load_manifest(spark, d)
    changed = resolve_pending_changes(d, stage1, manifest)
    shape = measure_change_shape(
        spark, w, d, changed, n_buckets=n_buckets, term_buckets=64
    )
    rec["shape_1pct"] = shape
    t0 = time.time()
    s = _incremental_merge(
        spark, w, d, changed, n_buckets=n_buckets, term_buckets=64,
        block_size=128,
    )
    rec["forced_inplace"] = {
        "secs": round(time.time() - t0, 1),
        "completed": s is not None,
    }
    print("INPLACE forced", json.dumps(rec["forced_inplace"]), shape, flush=True)

    # router's choice from a fresh copy
    w, d = from_copy("router")
    t0 = time.time()
    s = update_index(new_pages, w, d, n_buckets=n_buckets)
    rec["router"] = {
        "route": s["route"],
        "route_reason": s.get("route_reason"),
        "secs": round(time.time() - t0, 1),
    }
    print("INPLACE router", json.dumps(rec["router"]), flush=True)

    # forced delta from a fresh copy
    w, d = from_copy("delta")
    t0 = time.time()
    s = delta_update(new_pages, w, d, n_buckets=n_buckets)
    rec["forced_delta"] = {"action": s["action"], "secs": round(time.time() - t0, 1)}
    print("INPLACE delta", json.dumps(rec["forced_delta"]), flush=True)

    rec["router_choice_cheapest"] = rec["router"]["secs"] <= min(
        rec["forced_inplace"]["secs"],
        rec["forced_delta"]["secs"],
        rec.get("full_build_secs", 1e9),
    ) * 1.1  # ±10% timing noise band
    _save(out)
    for name in ("forced", "router", "delta"):
        shutil.rmtree(workroot / f"inplace_idx_{name}", ignore_errors=True)
        shutil.rmtree(workroot / f"inplace_work_{name}", ignore_errors=True)


def compute_tco(out: dict) -> None:
    """Cadence TCO with the round-6 pruned-default read curve; the
    delta/compact costs carry over from BENCH_R05_SCALE (same corpus,
    same code path for the write side)."""
    r05 = REPO / "BENCH_R05_SCALE.json"
    if not r05.exists():
        return
    prior = json.loads(r05.read_text())
    route = prior.get("update_routing_2M") or {}
    delta_secs = (route.get("updates") or {}).get("0.01", {}).get("secs")
    compact_secs = route.get("compact_secs")
    curve = (out.get("segment_read_curve_2M_r06") or {}).get(
        "pruned_p50_by_segments"
    ) or {}
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
    out["compaction_cadence_tco_r06"] = {
        "inputs": {
            "delta_1pct_secs": delta_secs,
            "compact_secs": compact_secs,
            "pruned_read_p50_by_segments": curve,
        },
        "per_cadence": tco,
    }
    _save(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2_000_000)
    ap.add_argument("--workroot", default="/tmp/scale_r05")
    ap.add_argument("--skip-serving", action="store_true")
    ap.add_argument("--skip-segcurve", action="store_true")
    ap.add_argument("--skip-batch", action="store_true")
    ap.add_argument("--skip-inplace", action="store_true")
    args = ap.parse_args()
    workroot = Path(args.workroot)
    workroot.mkdir(parents=True, exist_ok=True)
    sys.path.insert(0, str(REPO / "scripts"))

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
        probe_serving(PersistedIndex(spark, idx_dir), suite, out, "serving_2M_r06")
        _save(out)
    if not args.skip_segcurve:
        probe_segcurve(spark, pages_dir, workroot, suite, out)
    if not args.skip_batch:
        probe_batch(spark, workroot, suite, out)
    if not args.skip_inplace:
        probe_inplace(spark, pages_dir, workroot, out)
    compute_tco(out)
    out["campaign_secs"] = round(time.time() - t_all, 1)
    _save(out)
    print("DONE", out["campaign_secs"], flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
