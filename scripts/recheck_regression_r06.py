"""Round-5 verdict item 3: re-measure the `rrf_hybrid` /
`ann_lsh_topk` rise (BENCH_r04 2.28/0.82 s → BENCH_r05 3.01/1.10 s,
code unchanged per the judge's diff audit).

Protocol: each measurement runs in its OWN spark-submit JVM so session
state cannot leak between conditions:

- "cold": the entry alone, 5 fresh JVMs, first-call wall-clock after a
  warm-up call of an unrelated cheap entry (corpus_stats) to absorb
  JVM/Arrow startup.
- "after_r5_modules": same, but the round-5/6 modules (index.wand,
  index.delta, operators.fusion ANN path) are imported AND a small
  eval-arm pipeline is exercised first — the r05 bench session shape.

Prints one JSON line RECHECK {...} with per-run times and medians.
"""

from __future__ import annotations

import json
import re
import statistics
import subprocess
import sys
import tempfile
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

JOB = r"""
import json, sys, time
sys.path.insert(0, "{repo}")
from pyspark.sql import SparkSession
spark = (SparkSession.builder
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as e
qs = e.queries()
qs["corpus_stats"](spark, "{sf}").collect()  # warm JVM/Arrow
if {poison}:
    # the round-5 session shape: pruning + ANN modules imported and used
    import vexor_spark.index.wand, vexor_spark.index.delta  # noqa
    qs["bm25_pruned_top10"](spark, "{sf}").collect()
    qs["ivf_kmeans_topk"](spark, "{sf}").collect()
out = {{}}
for name in ("rrf_hybrid", "ann_lsh_topk"):
    t0 = time.time(); qs[name](spark, "{sf}").collect()
    out[name] = round(time.time() - t0, 3)
print("ONE", json.dumps(out))
"""


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tmp = Path(tempfile.mkdtemp())
    zpath = tmp / "vexor_spark.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted((REPO / "vexor_spark").rglob("*.py")):
            zf.write(p, p.relative_to(REPO))

    results: dict = {}
    for cond, poison in (("cold", "False"), ("after_r5_modules", "True")):
        runs = []
        for i in range(5):
            job = tmp / f"job_{cond}_{i}.py"
            job.write_text(JOB.format(repo=REPO, sf=sf, poison=poison))
            proc = subprocess.run(
                [
                    "spark-submit", "--master", "local[32]",
                    "--conf", "spark.driver.memory=8g",
                    "--py-files", str(zpath), str(job),
                ],
                capture_output=True, text=True, timeout=1200,
            )
            m = re.search(r"ONE (\{.*\})", proc.stdout)
            if not m:
                sys.stderr.write(proc.stderr[-3000:])
                raise RuntimeError(f"no result for {cond} run {i}")
            runs.append(json.loads(m.group(1)))
            print(cond, i, runs[-1], flush=True)
        results[cond] = {
            "runs": runs,
            "median": {
                q: round(statistics.median(r[q] for r in runs), 3)
                for q in ("rrf_hybrid", "ann_lsh_topk")
            },
        }
    results["reference"] = {
        "r04": {"rrf_hybrid": 2.28, "ann_lsh_topk": 0.82},
        "r05": {"rrf_hybrid": 3.01, "ann_lsh_topk": 1.10},
    }
    print("RECHECK", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
