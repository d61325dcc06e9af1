"""Round-7, round-6 verdict item 5: exercise the router's CONCENTRATED
→ in-place branch at 2M on the corpus shape it exists for.

The round-6 probe showed a 1% change on the standard web corpus is
geometrically diffuse (every page carries per-doc-unique uid tokens,
so any changed slice's term footprint covers all 64 term buckets) and
forced in-place cost 1.42× a full rebuild. The branch's native shape —
the reference's code-index case — is a SHARED-VOCAB slice: docs whose
terms live in few term buckets, mutated within that same vocabulary.

This harness builds that corpus at 2M: the standard synthetic pages,
except url-bucket 17 (1/32 ≈ 62.5k docs) carries text drawn from a
24-word vocabulary pre-filtered to hash into few of the 64 term
buckets (selection by the engine's own pmod(xxhash64) — public,
deterministic). The 1% change mutates that slice within the same
vocabulary, so affected terms (old ∪ new) stay concentrated and the
router's shape probe must measure concentrated and take the in-place
branch. Forced in-place / forced delta / router are then timed from
identical index copies, settling by MEASUREMENT whether the branch's
routing is the cheapest choice at 2M — the verdict's done-bar is
either "in-place measured cheapest" or "retune/remove the branch on
the evidence".

Writes its results into BENCH_R07_SCALE.json under
"inplace_sharedvocab_2M" (round-6 artifacts untouched).

MEASURED OUTCOME (2M pages, local[32]): the shape probe reports 64/64
term buckets even though the slice's BODY vocabulary spans only 12/64
— the indexed document is url + label, and 62.5k unique urls
contribute ~62.5k distinct tokens, covering every bucket. That makes
concentration STRUCTURALLY unreachable at changed-url-bucket
granularity (any changed bucket holds corpus/32 docs ≫ 64 term
buckets), independent of body vocabulary. Forced in-place: 140.7 s;
forced delta: 47.8 s; router end-to-end (stage1 + sampled probe +
delta): 29.2 s — the router's delta choice is the measured-cheapest
strategy, and the in-place branch's precondition cannot fire at this
scale. Retune applied on this evidence: maintenance.py's
DIFFUSE_DOCS_PER_BUCKET guard skips even the sampled probe when the
dict-only changed-doc estimate dwarfs the term-bucket count (the
concentrated branch itself stays, pinned at its native small-corpus
shape in test_maintenance.py).

Usage: python scripts/bench_inplace_r07.py [--pages 2000000]
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

ARTIFACT = REPO / "BENCH_R07_SCALE.json"
SLICE_BUCKET = 17
N_URL_BUCKETS = 32
TERM_BUCKETS = 64

# candidate pool for the shared vocabulary (ordinary English words,
# none in the generator's _WORDS list so the slice's postings are its
# own); the harness keeps the 24 that hash into the fewest term buckets
_CANDIDATES = [
    "module", "compile", "parser", "lexer", "symbol", "scope", "branch",
    "commit", "tree", "node", "leaf", "token", "buffer", "stream",
    "handle", "socket", "thread", "mutex", "atomic", "fence", "cache",
    "inline", "macro", "template", "lambda", "closure", "struct",
    "method", "field", "getter", "setter", "proxy", "adapter", "facade",
    "visitor", "builder", "factory", "registry", "router", "mapper",
]


def _vocab() -> tuple[list[str], list[int]]:
    from vexor_spark.functions.hashing import spark_pmod_bucket

    by_bucket: dict[int, list[str]] = {}
    for w in _CANDIDATES:
        by_bucket.setdefault(spark_pmod_bucket(w, TERM_BUCKETS), []).append(w)
    # take buckets with the most words first — fewest buckets for 24 words
    picked: list[str] = []
    buckets: list[int] = []
    for b, ws in sorted(by_bucket.items(), key=lambda kv: -len(kv[1])):
        picked.extend(ws)
        buckets.append(b)
        if len(picked) >= 24:
            break
    return picked[:24], buckets


def _save(rec: dict) -> None:
    out = json.loads(ARTIFACT.read_text()) if ARTIFACT.exists() else {}
    out["inplace_sharedvocab_2M"] = rec
    ARTIFACT.write_text(json.dumps(out, indent=1))


def _sliced_pages(spark, n_pages: int, vocab: list[str], mutated: bool):
    """Standard synthetic corpus with url-bucket 17 rewritten to the
    shared vocabulary. Deterministic per doc (seeded by xxhash64(url));
    `mutated` swaps the lead word — a length-class-preserving edit
    within the same vocabulary, the code-index `git pull` shape."""
    import pyspark.sql.functions as F

    from vexor_spark.index.checkpoint import _bucket_col
    from vexor_spark.sources.corpus import generate_pages_df

    pages = generate_pages_df(spark, n_pages, edges=False)
    h = F.abs(F.xxhash64("url"))
    words = F.array(*[F.lit(w) for w in vocab])
    # 12 words drawn by rotating a deterministic per-doc offset
    picks = [
        F.element_at(words, (F.pmod(h + F.lit(j * 7 + (1 if mutated and j == 0 else 0)), F.lit(len(vocab))) + 1).cast("int"))
        for j in range(12)
    ]
    slice_text = F.concat_ws(" ", *picks)
    in_slice = _bucket_col(F.col("url"), N_URL_BUCKETS) == SLICE_BUCKET
    out = pages.withColumn(
        "text", F.when(in_slice, slice_text).otherwise(F.col("text"))
    )
    return out.withColumn(
        "html", F.when(in_slice, F.encode(F.col("text"), "UTF-8")).otherwise(F.col("html"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=2_000_000)
    ap.add_argument("--tmp", default="/tmp/inplace_r07")
    args = ap.parse_args()

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
    from vexor_spark.session import get_spark

    assert DEFAULT_INPUT_BUCKETS == N_URL_BUCKETS

    spark = get_spark(
        "local[32]", shuffle_partitions=64, app_name="inplace_r07",
        extra_conf={"spark.driver.memory": "24g"},
    )
    root = Path(args.tmp)
    root.mkdir(parents=True, exist_ok=True)
    vocab, vocab_buckets = _vocab()
    rec: dict = {
        "pages": args.pages,
        "vocab_words": len(vocab),
        "vocab_term_buckets": sorted(vocab_buckets),
    }
    print("vocab buckets:", sorted(vocab_buckets), flush=True)

    base_pages = root / "pages_base.parquet"
    if not (base_pages / "_SUCCESS").exists():
        t0 = time.time()
        _sliced_pages(spark, args.pages, vocab, mutated=False).write.mode(
            "overwrite"
        ).parquet(str(base_pages))
        rec["gen_secs"] = round(time.time() - t0, 1)
        print("pages written", rec["gen_secs"], flush=True)

    pages = spark.read.parquet(str(base_pages))
    work, base_idx = root / "work", root / "idx_base"
    if not (base_idx / "meta.json").exists():
        shutil.rmtree(work, ignore_errors=True)
        shutil.rmtree(base_idx, ignore_errors=True)
        t0 = time.time()
        update_index(
            pages, work, base_idx,
            n_buckets=N_URL_BUCKETS, term_buckets=TERM_BUCKETS,
        )
        rec["full_build_secs"] = round(time.time() - t0, 1)
        _save(rec)
        print("base build", rec["full_build_secs"], flush=True)

    new_pages = _sliced_pages(spark, args.pages, vocab, mutated=True)

    def from_copy(name: str):
        d = root / f"idx_{name}"
        shutil.rmtree(d, ignore_errors=True)
        shutil.copytree(base_idx, d)
        w = root / f"work_{name}"
        shutil.rmtree(w, ignore_errors=True)
        shutil.copytree(work, w)
        return w, d

    # forced IN-PLACE with the shape measured first (the branch's own
    # path, timed separately so the probe's cost is visible)
    w, d = from_copy("forced")
    t0 = time.time()
    stage1 = build_chunks_resumable(
        new_pages, w, n_buckets=N_URL_BUCKETS, pending_file=_pending_path(d)
    )
    manifest = load_manifest(spark, d)
    changed = resolve_pending_changes(d, stage1, manifest)
    rec["stage1_secs"] = round(time.time() - t0, 1)
    rec["changed_buckets"] = changed
    t0 = time.time()
    shape = measure_change_shape(
        spark, w, d, changed,
        n_buckets=N_URL_BUCKETS, term_buckets=TERM_BUCKETS,
    )
    rec["shape"] = shape
    rec["shape_secs"] = round(time.time() - t0, 1)
    print("shape", json.dumps(shape), flush=True)
    t0 = time.time()
    s = _incremental_merge(
        spark, w, d, changed,
        n_buckets=N_URL_BUCKETS, term_buckets=TERM_BUCKETS, block_size=128,
    )
    rec["forced_inplace"] = {
        "secs": round(time.time() - t0, 1),
        "completed": s is not None,
    }
    _save(rec)
    print("forced inplace", json.dumps(rec["forced_inplace"]), flush=True)

    # forced DELTA from an identical copy
    w, d = from_copy("delta")
    t0 = time.time()
    s = delta_update(new_pages, w, d, n_buckets=N_URL_BUCKETS)
    rec["forced_delta"] = {"action": s["action"], "secs": round(time.time() - t0, 1)}
    _save(rec)
    print("forced delta", json.dumps(rec["forced_delta"]), flush=True)

    # the ROUTER's choice from an identical copy (end-to-end timing)
    w, d = from_copy("router")
    t0 = time.time()
    s = update_index(new_pages, w, d, n_buckets=N_URL_BUCKETS)
    rec["router"] = {
        "route": s["route"],
        "route_reason": s.get("route_reason"),
        "secs": round(time.time() - t0, 1),
    }
    _save(rec)
    print("router", json.dumps(rec["router"]), flush=True)

    for name in ("forced", "delta", "router"):
        shutil.rmtree(root / f"idx_{name}", ignore_errors=True)
        shutil.rmtree(root / f"work_{name}", ignore_errors=True)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
