"""Round-6 follow-up: rerun the 2M batch probes (free-or-winning gate,
k-boundary-tolerant identity) and the router-vs-forced-delta timing
(sampled shape measurement)."""
import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from bench_scale_r06 import ARTIFACT, _save, _spark, probe_batch


def main():
    spark = _spark()
    from bench_scale_r05 import _mutate
    from vexor_spark.index.checkpoint import DEFAULT_INPUT_BUCKETS
    from vexor_spark.index.delta import delta_update
    from vexor_spark.index.maintenance import update_index
    from vexor_spark.sources.corpus import query_suite_extended

    workroot = Path("/tmp/scale_r05")
    out = json.loads(ARTIFACT.read_text()) if ARTIFACT.exists() else {}
    suite = query_suite_extended(100_000)
    probe_batch(spark, workroot, suite, out)
    # persist the (expensive) batch-probe results immediately — the
    # in-place recheck below can fail without losing them (round-6
    # ADVICE: unguarded key reads crashed after the probe pass).
    _save(out)

    n_buckets = DEFAULT_INPUT_BUCKETS
    pages = spark.read.parquet(str(workroot / "pages"))
    base_idx = workroot / "inplace_idx_base"
    work = workroot / "inplace_work"
    rec = out.setdefault("inplace_shape_2M", {})
    if (base_idx / "meta.json").exists():
        new_pages = _mutate(pages, [17], "r6ip", n_buckets)

        def from_copy(name):
            d = workroot / f"inplace_idx_{name}"
            shutil.rmtree(d, ignore_errors=True)
            shutil.copytree(base_idx, d)
            w = workroot / f"inplace_work_{name}"
            shutil.rmtree(w, ignore_errors=True)
            shutil.copytree(work, w)
            return w, d

        w, d = from_copy("router2")
        t0 = time.time()
        s = update_index(new_pages, w, d, n_buckets=n_buckets)
        rec["router_sampled"] = {
            "route": s["route"],
            "route_reason": s.get("route_reason"),
            "shape_sampled": bool((s.get("shape") or {}).get("sampled")),
            "secs": round(time.time() - t0, 1),
        }
        print("ROUTER2", json.dumps(rec["router_sampled"]), flush=True)

        w, d = from_copy("delta2")
        t0 = time.time()
        s = delta_update(new_pages, w, d, n_buckets=n_buckets)
        rec["forced_delta_recheck"] = {
            "action": s["action"], "secs": round(time.time() - t0, 1),
        }
        print("DELTA2", json.dumps(rec["forced_delta_recheck"]), flush=True)
        forced_inplace = rec.get("forced_inplace") or {}
        rec["router_choice_cheapest"] = rec["router_sampled"]["secs"] <= min(
            forced_inplace.get("secs", 1e9),
            rec["forced_delta_recheck"]["secs"],
            rec.get("full_build_secs", 1e9),
        ) * 1.1
        for name in ("router2", "delta2"):
            shutil.rmtree(workroot / f"inplace_idx_{name}", ignore_errors=True)
            shutil.rmtree(workroot / f"inplace_work_{name}", ignore_errors=True)
    _save(out)
    print("BATCHROUTER DONE", flush=True)


if __name__ == "__main__":
    main()
