"""Capture .explain('formatted') for catalog queries → plans/r07/.

Usage: python scripts/capture_plans_r07.py <suffix> [--queries a,b,c]
Writes plans/r07/<query>_<suffix>.txt (suffix = before|after).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT_QUERIES = [
    "bm25_top10",
    "bm25_multi",
    "rrf_hybrid",
    "near_dup_pairs",
    "simhash",
    "simhash64_near_dup",
    "dup_clusters",
    "curated_corpus",
    "keyword_top20",
    "exact_dup_groups",
    "minhash_sigs",
    "doc_fingerprint",
    "term_tf",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("suffix")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent / "plans" / "r07"))
    args = ap.parse_args()

    from vexor_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("local[4]", shuffle_partitions=8, app_name="plans_r07")
    qs = entry_mod.queries()
    names = args.queries.split(",") if args.queries else DEFAULT_QUERIES
    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, args.sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (outdir / f"{name}_{args.suffix}.txt").write_text(buf.getvalue())
        print("wrote", name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
