"""Round-6 campaign continuation: rerun the serving probes under the
fixed warm-cache protocol and the in-place probe on the fixed
term_freqs build (the original run measured the 126x HOF regression).
Reuses the cached 2M corpus/index and the 8-segment segcurve index."""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import json

from bench_scale_r06 import (
    ARTIFACT, _save, _spark, compute_tco, probe_inplace, probe_serving,
)


def main():
    spark = _spark()
    from vexor_spark.index.delta import SegmentedIndex
    from vexor_spark.index.storage import PersistedIndex
    from vexor_spark.sources.corpus import query_suite_extended

    workroot = Path("/tmp/scale_r05")
    out = json.loads(ARTIFACT.read_text()) if ARTIFACT.exists() else {}
    suite = query_suite_extended(100_000)

    probe_serving(
        PersistedIndex(spark, workroot / "index"), suite, out, "serving_2M_r06"
    )
    _save(out)
    seg_idx = workroot / "segcurve_idx_r06"
    if (seg_idx / "segments.json").exists():
        probe_serving(
            SegmentedIndex(spark, seg_idx), suite, out, "segmented_pruned_2M_8segs"
        )
        _save(out)
    probe_inplace(spark, workroot / "pages", workroot, out)
    compute_tco(out)
    _save(out)
    print("RERUN DONE", flush=True)


if __name__ == "__main__":
    main()
