"""Delta segments — LSM-style index maintenance (round-4 addition).

WHY: the 2M-page merge campaign (BENCH_R04_SCALE.json) measured the
in-place incremental merge at 1.2-1.3× the cost of a full rebuild for
diffuse 1-10% changes. That is structural, not a bug: every page
carries unique tail terms (real webtext does too — urls, ids, rare
words), so any diffuse change marks every term-hash partition
affected, and an in-place merge must decode + re-encode the head
terms' postings, which dominate the index's bytes. Production engines
answer this with SEGMENTS (Lucene, Iceberg deletes): an update writes
a small delta artifact, queries merge layers at read time, and a
periodic compaction folds segments into the base. Update cost becomes
∝ the change, not the corpus.

Layout (under <index_dir>/):

    segments.json            manifest: ordered seg ids, per-seg stats,
                             base_len_sum / base_max_doc_id / next_doc_id
    _pending_update.json     durable staging marker (crash recovery):
                             changed buckets + target seg id, written
                             before stage-1's lineage commit and
                             cleared after the manifest commit
    segments/postings/seg=<n>/term_bucket=<b>/
                             block+varint rows — the SAME codec as the
                             base (round-5: row-format segments cost
                             2.5× read p50 at 2 segments)
    segments/docs/seg=<n>/   DOC_COLS rows for docs (re)written by seg n
    segments/tombstones/seg=<n>/
                             doc_id — kills that id in ALL LOWER layers
    segments/dfdelta/seg=<n>/term_bucket=<b>/
                             (term, df_new, df_removed)

    Each family is ONE sibling hive tree keyed by `seg`, so the read
    side is one partition-pruned scan + one max-tombstone-layer join
    per query — plan size and job count stay O(1) in segment count
    (per-layer subtrees cost ~0.35 s/segment of p50 at 2M before this
    layout, round 5).

Semantics:
- A changed input bucket tombstones every doc the current VIEW holds
  in that bucket and re-adds the bucket's current docs (stable ids:
  a surviving (url, chunk_index) keeps its id; new keys draw fresh ids
  from the manifest's next_doc_id counter — ids are never reused, so
  tombstones stay unambiguous).
- SegmentedIndex.search_distributed is EXACT: scores equal a full
  rebuild of the current corpus (pinned by test_delta.py) because the
  BM25 statistics are merged exactly — df(term) = base df + Σ(df_new −
  df_removed), doc_count and avg_doc_len from the manifest's exact
  length sums — and stored per-block df columns are overridden by the
  merged map. (Doc IDS can differ from a from-scratch rebuild for new
  urls — the rebuild re-densifies — so parity is asserted on (url,
  score), with ties broken identically by each engine's doc_id order.)
- `compact_segments` folds everything into the base artifact via the
  existing full merge over the (already-current) chunk store and
  clears the segment list.

Reference anchor: replaces the same update flow as index/merge.py
(vexor/services/index_service.py:263-344), trading read-time layer
merging for update cost ∝ change size.
"""

from __future__ import annotations

import datetime as dt
import json
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vexor_spark.index.checkpoint import (
    DEFAULT_INPUT_BUCKETS,
    _append_metrics,
    _bucket_col,
    build_chunks_resumable,
)
from vexor_spark.index.merge import DOC_COLS, full_merge
from vexor_spark.constants import SCORE_ROUND_DP
from vexor_spark.index.storage import PersistedIndex, decode_postings_udf
from vexor_spark.functions.tokenize import prepare_query_terms
from vexor_spark.operators.chunking import with_document
from vexor_spark.operators import postings as postings_mod
from vexor_spark.operators.postings import tokenize_docs
from vexor_spark.operators.scoring import bm25_contribution_col, top_k
from vexor_spark.plans.docids import assign_doc_ids


def _manifest_path(index_dir: Path) -> Path:
    return index_dir / "segments.json"


PENDING_NAME = "_pending_update.json"


def _pending_path(index_dir: Path) -> Path:
    return index_dir / PENDING_NAME


def resolve_pending_changes(index_dir: Path, stage1: dict, manifest: dict) -> list[int]:
    """Changed-bucket list for stage 2 — from the durable pending marker
    when one is outstanding (crash recovery: stage 1 committed lineage
    but the segment/manifest write never happened, so a plain retry
    would see 'no stale buckets' and silently drop the update), else
    from this run's stage-1 diff. A leftover marker whose segment ID
    already appears in the manifest is a completed update that crashed
    before cleanup — it is discarded, not re-applied."""
    pend = _pending_path(index_dir)
    pending = json.loads(pend.read_text()) if pend.exists() else None
    if pending and pending.get("seg") is not None and pending["seg"] in {
        s["seg"] for s in manifest["segments"]
    }:
        pend.unlink(missing_ok=True)
        pending = None
    if pending:
        return sorted(int(b) for b in pending["changed_buckets"])
    return sorted(list(stage1["stale_buckets"]) + list(stage1["removed_buckets"]))


class ConcurrentUpdateError(RuntimeError):
    """Another committer advanced the manifest generation first — the
    caller must reload the manifest and redo its update against the
    new view (update_index does this automatically, once)."""


def load_manifest(spark: SparkSession, index_dir: Path) -> dict:
    p = _manifest_path(index_dir)
    if p.exists():
        m = json.loads(p.read_text())
        m.setdefault("generation", 0)
        return m
    # first delta: snapshot the base's exact length sum and max id once
    base_docs = spark.read.parquet(str(index_dir / "docs"))
    row = base_docs.agg(
        F.sum("doc_len").alias("ls"), F.max("doc_id").alias("mx"),
        F.count("*").alias("n"),
    ).collect()[0]
    return {
        "segments": [],
        "generation": 0,
        "base_len_sum": int(row["ls"] or 0),
        "base_doc_count": int(row["n"]),
        "base_max_doc_id": int(row["mx"] if row["mx"] is not None else 0),
        "next_doc_id": int(row["mx"] if row["mx"] is not None else 0) + 1,
    }


def _save_manifest(
    index_dir: Path, manifest: dict, *, expected_gen: int | None = None
) -> None:
    """Manifest commit. With `expected_gen`, the write is an optimistic
    COMPARE-AND-SWAP (Iceberg's commit model, round-5 verdict item 8):
    the committer that exclusively creates the `_gen.<g+1>.lock` marker
    owns the g→g+1 transition and atomically renames the new manifest
    in; a second committer holding the same expected generation hits
    the existing marker and gets ConcurrentUpdateError — it must reload
    and redo, never silently clobber. Gen markers persist for the life
    of the segment epoch (compaction/rebuild clears them with the
    manifest), so a stale committer from ANY older generation also
    fails its CAS."""
    import os

    path = _manifest_path(index_dir)
    if expected_gen is None:  # single-writer callers (tests, tools)
        path.write_text(json.dumps(manifest, indent=1))
        return
    new_gen = int(expected_gen) + 1
    lock = index_dir / f"_gen.{new_gen}.lock"
    try:
        fd = os.open(str(lock), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        raise ConcurrentUpdateError(
            f"manifest generation {expected_gen} -> {new_gen} already "
            f"committed by another updater ({lock.name} exists)"
        ) from None
    out = {**manifest, "generation": new_gen}
    tmp = path.with_name(path.name + f".tmp.{os.getpid()}")
    tmp.write_text(json.dumps(out, indent=1))
    os.replace(tmp, path)


def _clear_generation_locks(index_dir: Path) -> None:
    """Drop gen markers when the manifest epoch ends (compaction / full
    rebuild remove segments.json; generation restarts at 0)."""
    for p in index_dir.glob("_gen.*.lock"):
        p.unlink(missing_ok=True)


def _reserve_seg_id(index_dir: Path, start: int) -> int:
    """Exclusively reserve a segment id via O_EXCL marker files so two
    concurrent updaters never write the same segments/*/seg=<n> tree —
    the manifest CAS alone cannot prevent the loser from having
    clobbered the winner's files before its commit fails."""
    import os

    seg_root = index_dir / "segments"
    seg_root.mkdir(parents=True, exist_ok=True)
    sid = int(start)
    while True:
        try:
            fd = os.open(
                str(seg_root / f"_seg.{sid}.reserved"),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
            os.close(fd)
            return sid
        except FileExistsError:
            sid += 1


def delta_update(
    pages: DataFrame,
    work_dir: str | Path,
    index_dir: str | Path,
    *,
    n_buckets: int = DEFAULT_INPUT_BUCKETS,
) -> dict:
    """Apply the pages snapshot as a DELTA SEGMENT: stage-1 staleness
    detection re-chunks only changed input buckets; the segment carries
    those buckets' current postings (block+varint encoded, same format
    as the base — segments read like a small base layer), tombstones
    for the view's previous docs there, and exact df/length
    corrections. Touches NOTHING under base postings/ or dict/. Cost ∝
    changed buckets (tokenize + one small shuffle), not corpus size.

    Crash-safe: the changed-bucket set is durably staged (stage 1
    writes the pending marker before committing lineage; this function
    clears it only after the manifest commit), so a crash anywhere in
    between resumes the unfinished segment on retry instead of
    treating the already-current chunk store as already applied."""
    work_dir, index_dir = Path(work_dir), Path(index_dir)
    spark = pages.sparkSession
    t0 = time.time()
    stage1 = build_chunks_resumable(
        pages, work_dir, n_buckets=n_buckets, pending_file=_pending_path(index_dir)
    )
    manifest = load_manifest(spark, index_dir)
    changed = resolve_pending_changes(index_dir, stage1, manifest)
    if not changed:
        return {
            "action": "noop", "secs": round(time.time() - t0, 3),
            "segments": len(manifest["segments"]),
        }
    return _apply_delta_retrying(
        spark, work_dir, index_dir, changed,
        stage1=stage1, manifest=manifest, n_buckets=n_buckets, t0=t0,
    )


def _apply_delta(
    spark: SparkSession,
    work_dir: Path,
    index_dir: Path,
    changed: list[int],
    *,
    stage1: dict,
    manifest: dict,
    n_buckets: int,
    t0: float,
) -> dict:
    """Segment build proper (see delta_update): assumes the chunk store
    is current and `changed` names the input buckets to re-index."""
    meta = json.loads((index_dir / "meta.json").read_text())
    term_buckets = int(meta["term_buckets"])

    view = SegmentedIndex(spark, index_dir, manifest=manifest)
    old_changed = (
        view.docs_view()
        .withColumn("bucket", _bucket_col(F.col("url"), n_buckets))
        .filter(F.col("bucket").isin([int(b) for b in changed]))
        .persist()
    )

    chunks_dir = work_dir / "chunks"
    present = [b for b in changed if (chunks_dir / f"bucket={b}").exists()]
    if present:
        new_chunks = (
            spark.read.option("basePath", str(chunks_dir))
            .parquet(*[str(chunks_dir / f"bucket={b}") for b in present])
            .drop("bucket")
        )
    else:  # every changed bucket was removed outright
        new_chunks = spark.createDataFrame(
            [], "url string, chunk_index int, label string, preview string, "
            "start_line int, end_line int",
        )

    # stable ids: surviving (url, chunk_index) keeps its id; fresh keys
    # draw from next_doc_id (ids never reused — tombstones stay sharp).
    old_keyed = old_changed.select(
        F.col("doc_id").alias("_old_id"), "url", "chunk_index"
    )
    joined = new_chunks.join(old_keyed, ["url", "chunk_index"], "left").persist()
    kept = joined.filter(F.col("_old_id").isNotNull()).withColumn(
        "doc_id", F.col("_old_id")
    )
    fresh_src = joined.filter(F.col("_old_id").isNull())
    id_intermediates: list = []
    # assign_doc_ids is 0-based: fresh ids are next_doc_id, next+1, ...
    fresh = assign_doc_ids(
        fresh_src.drop("_old_id"), ["url", "chunk_index"],
        id_col="_seq", persisted_out=id_intermediates,
    ).withColumn(
        "doc_id", F.col("_seq") + F.lit(int(manifest["next_doc_id"]))
    ).drop("_seq")
    seg_rows = kept.drop("_old_id").unionByName(fresh)
    seg_docs = tokenize_docs(with_document(seg_rows), "document").persist()

    stats_new = seg_docs.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("doc_len"), F.lit(0)).alias("ls"),
        F.max("doc_id").alias("mx"),
    ).collect()[0]
    stats_old = old_changed.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("doc_len"), F.lit(0)).alias("ls"),
    ).collect()[0]

    seg_id = _reserve_seg_id(
        index_dir,
        (manifest["segments"][-1]["seg"] + 1) if manifest["segments"] else 1,
    )
    seg_root = index_dir / "segments"
    # layout: sibling hive trees keyed by seg (segments/postings/seg=N/
    # term_bucket=B, segments/docs/seg=N, ...) so the READ side is ONE
    # partition-pruned scan per tree regardless of layer count — plan
    # size and job count stay O(1) in segments (round-5: per-layer
    # subtrees made serving p50 grow ~0.35 s per segment at 2M).
    for sub in ("postings", "docs", "tombstones", "dfdelta"):
        shutil.rmtree(seg_root / sub / f"seg={seg_id}", ignore_errors=True)
    # Stage intent durably BEFORE the segment files: a crash below
    # resumes this exact segment; once the manifest commit lands, the
    # seg id in the marker tells the retry it already applied.
    _pending_path(index_dir).write_text(json.dumps({
        "changed_buckets": [int(b) for b in changed], "seg": seg_id,
    }, indent=1))

    tf_new = postings_mod.term_freqs_build(
        seg_docs.select("doc_id", "doc_len", "tokens")
    ).persist()
    tb = F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int")
    # Segment postings take the SAME block+varint form as the base
    # (encoded with the base's ub basis): the read path decodes base
    # and segment layers uniformly, and the row-format read overhead
    # that made 2 segments cost 2.5× p50 in round 4 is gone — a
    # segment is just a small extra set of block rows per term bucket.
    from vexor_spark.functions.codec import POSTING_BLOCK_SIZE
    from vexor_spark.index.storage import _sorted_block_rows

    basis = float(meta.get("ub_avg_doc_len", meta.get("avg_doc_len", 1.0)) or 1.0)
    block_size = int(meta.get("block_size", POSTING_BLOCK_SIZE))
    (
        _sorted_block_rows(tf_new, basis, term_buckets, block_size)
        .write.mode("overwrite").partitionBy("term_bucket")
        .parquet(str(seg_root / "postings" / f"seg={seg_id}"))
    )
    seg_docs.select(*DOC_COLS).write.mode("overwrite").parquet(
        str(seg_root / "docs" / f"seg={seg_id}")
    )
    old_changed.select("doc_id").write.mode("overwrite").parquet(
        str(seg_root / "tombstones" / f"seg={seg_id}")
    )
    # exact df corrections: +new docs per term, −view docs per term
    df_new = tf_new.groupBy("term").agg(F.count("*").alias("df_new"))
    df_rem = (
        tokenize_docs(with_document(old_changed), "document")
        .select("doc_id", F.explode(F.array_distinct("tokens")).alias("term"))
        .groupBy("term").agg(F.count("*").alias("df_removed"))
    )
    (
        df_new.join(df_rem, "term", "full")
        .select(
            "term", tb.alias("term_bucket"),
            F.coalesce("df_new", F.lit(0)).cast("long").alias("df_new"),
            F.coalesce("df_removed", F.lit(0)).cast("long").alias("df_removed"),
        )
        .repartition("term_bucket").sortWithinPartitions("term")
        .write.mode("overwrite").partitionBy("term_bucket")
        .parquet(str(seg_root / "dfdelta" / f"seg={seg_id}"))
    )

    rec = {
        "seg": seg_id,
        "format": "blocks",
        "n_new": int(stats_new["n"]),
        "n_removed": int(stats_old["n"]),
        "len_new": int(stats_new["ls"]),
        "len_removed": int(stats_old["ls"]),
        "changed_buckets": [int(b) for b in changed],
    }
    tf_new.unpersist()
    old_changed.unpersist()
    joined.unpersist()
    seg_docs.unpersist()
    for df_ in id_intermediates:
        df_.unpersist()

    manifest["segments"].append(rec)
    if stats_new["mx"] is not None:
        manifest["next_doc_id"] = max(
            int(manifest["next_doc_id"]), int(stats_new["mx"]) + 1
        )
    try:
        _save_manifest(
            index_dir, manifest, expected_gen=int(manifest.get("generation", 0))
        )
    except ConcurrentUpdateError:
        # the loser's segment files are orphans computed against a
        # stale view — remove them (the reserved id is ours alone, so
        # this touches nothing of the winner's) and surface the
        # conflict; update_index retries against the fresh manifest.
        for sub in ("postings", "docs", "tombstones", "dfdelta"):
            shutil.rmtree(seg_root / sub / f"seg={seg_id}", ignore_errors=True)
        (seg_root / f"_seg.{seg_id}.reserved").unlink(missing_ok=True)
        raise
    _pending_path(index_dir).unlink(missing_ok=True)
    out = {
        "action": "delta",
        "seg": seg_id,
        "segments": len(manifest["segments"]),
        "docs_written": rec["n_new"],
        "docs_tombstoned": rec["n_removed"],
        "secs": round(time.time() - t0, 3),
        "stage1": {
            k: stage1[k]
            for k in ("buckets_total", "buckets_built", "buckets_removed", "pages_built")
        },
    }
    _append_metrics(work_dir, {
        "stage": "delta_update",
        "at": dt.datetime.now(dt.timezone.utc).isoformat(),
        **{k: v for k, v in out.items() if k != "stage1"},
    })
    return out


def _apply_delta_retrying(
    spark: SparkSession,
    work_dir: Path,
    index_dir: Path,
    changed: list[int],
    *,
    stage1: dict,
    manifest: dict,
    n_buckets: int,
    t0: float,
) -> dict:
    """_apply_delta, redone ONCE against a freshly loaded manifest when
    another updater wins the generation CAS — the loser's change set is
    still staged in the pending marker, so the retry recomputes
    tombstones/ids/df against the winner's committed view."""
    try:
        return _apply_delta(
            spark, work_dir, index_dir, changed,
            stage1=stage1, manifest=manifest, n_buckets=n_buckets, t0=t0,
        )
    except ConcurrentUpdateError:
        manifest = load_manifest(spark, index_dir)
        changed = resolve_pending_changes(index_dir, stage1, manifest)
        if not changed:
            return {
                "action": "noop", "secs": round(time.time() - t0, 3),
                "segments": len(manifest["segments"]),
                "retried_after_conflict": True,
            }
        out = _apply_delta(
            spark, work_dir, index_dir, changed,
            stage1=stage1, manifest=manifest, n_buckets=n_buckets, t0=t0,
        )
        out["retried_after_conflict"] = True
        return out


class SegmentedIndex:
    """Read-time merged view over base PersistedIndex + delta segments
    (see module docstring for exactness guarantees)."""

    def __init__(self, spark: SparkSession, index_dir: str | Path, *, manifest: dict | None = None):
        self.spark = spark
        self.dir = Path(index_dir)
        self.base = PersistedIndex(spark, index_dir)
        self.manifest = manifest if manifest is not None else load_manifest(spark, self.dir)
        segs = self.manifest["segments"]
        self.seg_ids = [s["seg"] for s in segs]
        # Read-side FORMAT GUARD (round-5 ADVICE, medium): the round-5
        # layout moved segments to block-encoded sibling hive trees
        # (segments/postings/seg=N). A pre-existing row-format segment
        # (old segments/seg=N/postings) would make _seg_read return
        # None and this view silently serve base-only rows while the
        # manifest-derived doc_count/avg_doc_len still include segment
        # stats — silently wrong results. Fail loudly instead and name
        # the migration (compact_segments folds layers into the base).
        if segs:
            bad = [s["seg"] for s in segs if s.get("format") != "blocks"]
            legacy = sorted(
                p.name for p in (self.dir / "segments").glob("seg=*")
            ) if (self.dir / "segments").exists() else []
            if bad or legacy or not (self.dir / "segments" / "postings").exists():
                raise ValueError(
                    f"segment layout mismatch in {self.dir}: "
                    f"non-block segments {bad or legacy} "
                    "(pre-round-5 row format). Run compact_segments() "
                    "with the engine version that WROTE them to fold "
                    "segments into the base, then re-apply updates."
                )
        self.doc_count = self.manifest["base_doc_count"] + sum(
            s["n_new"] - s["n_removed"] for s in segs
        )
        len_sum = self.manifest["base_len_sum"] + sum(
            s["len_new"] - s["len_removed"] for s in segs
        )
        self.avg_doc_len = (len_sum / self.doc_count) if self.doc_count else 0.0
        # Stored block_ub / max_kernel (base AND segments — _apply_delta
        # encodes segments with the base's ub basis) were computed with
        # meta's ub_avg_doc_len; inflate bounds for drift of the MERGED
        # avg_doc_len, exactly like PersistedIndex.ub_factor.
        meta = json.loads((self.dir / "meta.json").read_text())
        basis = float(meta.get("ub_avg_doc_len", meta.get("avg_doc_len", 0.0)) or 0.0)
        self.ub_factor: float = (
            max(1.0, self.avg_doc_len / basis) if basis > 0 else 1.0
        )

    def _seg_root(self, sub: str) -> Path:
        return self.dir / "segments" / sub

    def _seg_read(self, sub: str) -> DataFrame | None:
        """One hive-partitioned read over segments/<sub>/seg=N/... —
        the `seg` partition column identifies the layer; filters on it
        prune directories. None when no live segments / no data.
        The DataFrame (and with it Spark's file-index listing — ~3k
        files at 8 segments × 64 buckets) is cached per index instance:
        listing is paid once at first use, not per query. Reopen the
        SegmentedIndex after updates, like PersistedIndex."""
        cache = getattr(self, "_seg_frames", None)
        if cache is None:
            cache = self._seg_frames = {}
        if sub in cache:
            return cache[sub]
        root = self._seg_root(sub)
        if not self.seg_ids or not root.exists():
            cache[sub] = None
            return None
        cache[sub] = (
            self.spark.read.option("basePath", str(root))
            .parquet(str(root))
            .filter(F.col("seg").isin([int(s) for s in self.seg_ids]))
        )
        return cache[sub]

    def _tombstone_max(self) -> DataFrame | None:
        """(doc_id, _tmax) — the HIGHEST layer that tombstoned each
        doc_id, from one scan of the tombstone tree. A row written at
        layer L survives iff _tmax is null or _tmax ≤ L (a layer's own
        re-add outlives its own tombstone; later tombstones kill all
        lower layers). One join replaces the per-layer anti-joins —
        plan size stays O(1) in segment count."""
        if getattr(self, "_tomb_max", "absent") != "absent":
            return self._tomb_max
        tombs = self._seg_read("tombstones")
        if tombs is None:
            self._tomb_max = None
            return None
        out = tombs.groupBy("doc_id").agg(F.max("seg").alias("_tmax"))
        # manifest knows the exact tombstone volume — broadcast the
        # aggregated map when it is small (the common steady state), so
        # the layered read costs a map-side hash join instead of
        # shuffling the decoded posting rows.
        if sum(s["n_removed"] for s in self.manifest["segments"]) <= 2_000_000:
            out = F.broadcast(out)
        self._tomb_max = out
        return out

    # Above this volume the driver stops materializing the tombstone
    # map locally (θ walks fall back to unpruned, reads use the join
    # path) — ~80 MB of int64 pairs; compaction's tombstone_ratio
    # budget keeps real indexes far below it.
    TOMB_DRIVER_MAX = 5_000_000

    def _tombstone_arrays(self):
        """(sorted doc_ids int64, tmax int64) — the tombstone map as
        driver numpy arrays (one pyarrow read, cached per instance), or
        None when there are no tombstones or the volume exceeds
        TOMB_DRIVER_MAX. Feeds BOTH the θ walk's exclusion set and the
        decode-time filter broadcast (codec.make_decode_live_udf)."""
        if getattr(self, "_tomb_np", "absent") != "absent":
            return self._tomb_np
        import numpy as np
        import pyarrow.dataset as pads

        total = sum(s["n_removed"] for s in self.manifest["segments"])
        root = self._seg_root("tombstones")
        if not self.seg_ids or total == 0 or total > self.TOMB_DRIVER_MAX or not root.exists():
            self._tomb_np = None
            return None
        ds = pads.dataset(str(root), format="parquet", partitioning="hive")
        tbl = ds.to_table(
            columns=["doc_id", "seg"],
            filter=pads.field("seg").isin([int(s) for s in self.seg_ids]),
        )
        ids = tbl.column("doc_id").to_numpy().astype(np.int64, copy=True)
        segs = tbl.column("seg").to_numpy().astype(np.int64, copy=True)
        if len(ids) == 0:
            self._tomb_np = None
            return None
        order = np.lexsort((segs, ids))  # by doc_id, then seg asc
        ids_s, segs_s = ids[order], segs[order]
        uniq, starts = np.unique(ids_s, return_index=True)
        ends = np.r_[starts[1:], len(ids_s)] - 1
        self._tomb_np = (uniq, segs_s[ends])  # max seg per id
        return self._tomb_np

    def _tombstone_bc(self):
        """Spark broadcast of _tombstone_arrays (cached), or None."""
        if getattr(self, "_tomb_bcast", "absent") != "absent":
            return self._tomb_bcast
        arrays = self._tombstone_arrays()
        self._tomb_bcast = (
            self.spark.sparkContext.broadcast(arrays) if arrays is not None else None
        )
        return self._tomb_bcast

    def docs_view(self) -> DataFrame:
        """Current doc table: per doc_id the row from the HIGHEST layer,
        dropped when a later layer tombstoned it."""
        from pyspark.sql import Window

        allrows = (
            self.spark.read.parquet(str(self.dir / "docs"))
            .select(*DOC_COLS).withColumn("_layer", F.lit(0))
        )
        seg_docs = self._seg_read("docs")
        if seg_docs is not None:
            allrows = allrows.unionByName(
                seg_docs.select(*DOC_COLS, F.col("seg").cast("int").alias("_layer"))
            )
        w = Window.partitionBy("doc_id").orderBy(F.desc("_layer"))
        winner = (
            allrows.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        tomb_max = self._tombstone_max()
        if tomb_max is None:
            return winner.drop("_layer")
        return (
            winner.join(tomb_max, "doc_id", "left")
            .filter(F.col("_tmax").isNull() | (F.col("_tmax") <= F.col("_layer")))
            .drop("_layer", "_tmax")
        )

    def term_df_map(self, terms: list[str]) -> dict[str, int]:
        """Exact merged df per query term: base dict df + Σ seg (df_new
        − df_removed) — one pyarrow partition-pruned read over the
        dfdelta tree (sums are order-independent across layers).
        Memoized per term set: one query touches this up to three times
        (term_dict, _matched_blocks, scored_rows)."""
        key = tuple(sorted(terms))
        memo = getattr(self, "_dfmap_memo", None)
        if memo is None:
            memo = self._dfmap_memo = {}
        if key in memo:
            return dict(memo[key])
        import pyarrow.dataset as pads

        from vexor_spark.index.storage import term_buckets_for

        out = {t: d for t, (d, _mk) in self.base.term_dict(terms).items()}
        root = self._seg_root("dfdelta")
        if self.seg_ids and root.exists():
            ds = pads.dataset(str(root), format="parquet", partitioning="hive")
            tbl = ds.to_table(
                columns=["term", "df_new", "df_removed"],
                filter=pads.field("seg").isin([int(s) for s in self.seg_ids])
                & pads.field("term_bucket").isin(
                    sorted(set(term_buckets_for(
                        self.spark, terms, self.base.term_buckets
                    ).values()))
                )
                & pads.field("term").isin(terms),
            )
            for t, dn, dr in zip(
                tbl.column("term").to_pylist(),
                tbl.column("df_new").to_pylist(),
                tbl.column("df_removed").to_pylist(),
            ):
                out[t] = out.get(t, 0) + int(dn) - int(dr)
        result = {t: d for t, d in out.items() if d > 0}
        if len(memo) > 256:
            memo.clear()
        memo[key] = dict(result)
        return result

    def _seg_max_kernels(self, terms: list[str]) -> dict[str, float]:
        """{term: max block_ub across live segment layers} — pyarrow
        metadata-only read (no blobs) over the segment postings tree,
        seg/term_bucket/term pruned. Needed so query-time upper bounds
        cover segment postings too: a term's merged ub must dominate
        contributions from EVERY live layer, not just the base dict."""
        import pyarrow.dataset as pads

        from vexor_spark.index.storage import term_buckets_for

        root = self._seg_root("postings")
        if not self.seg_ids or not root.exists():
            return {}
        ds = pads.dataset(str(root), format="parquet", partitioning="hive")
        tbl = ds.to_table(
            columns=["term", "block_ub"],
            filter=pads.field("seg").isin([int(s) for s in self.seg_ids])
            & pads.field("term_bucket").isin(
                sorted(set(term_buckets_for(
                    self.spark, terms, self.base.term_buckets
                ).values()))
            )
            & pads.field("term").isin(terms),
        )
        out: dict[str, float] = {}
        for t, ub in zip(
            tbl.column("term").to_pylist(), tbl.column("block_ub").to_pylist()
        ):
            if ub is not None and float(ub) > out.get(t, 0.0):
                out[t] = float(ub)
        return out

    def term_dict(self, terms: list[str]) -> dict[str, tuple[int, float]]:
        """{term: (merged df, max kernel over ALL live layers)} — the
        wand.py pruning contract (PersistedIndex.term_dict's shape with
        layer-merged statistics)."""
        df_map = self.term_df_map(terms)
        base_mk = {t: mk for t, (_d, mk) in self.base.term_dict(terms).items()}
        seg_mk = self._seg_max_kernels(terms)
        return {
            t: (d, max(base_mk.get(t, 0.0), seg_mk.get(t, 0.0)))
            for t, d in df_map.items()
        }

    def _matched_blocks(self, terms: list[str]) -> DataFrame:
        """Block rows for the query terms across base + segment layers
        — ONE bucket-pruned base scan ∪ ONE hive-pruned segment scan,
        `_layer` marking the layer, `df` OVERRIDDEN with the exact
        merged document frequency (segment rows carry segment-local df;
        base rows pre-update df — both wrong for scoring the merged
        view)."""
        from vexor_spark.index.storage import term_buckets_for

        df_map = self.term_df_map(terms)
        present = [t for t in terms if t in df_map]
        cols = ["term", "df", "block_id", "n", "block_first", "block_last",
                "block_ub", "blob", "_layer"]
        # every row's term passed the isin(present) filter, so the map
        # lookup can't miss (element_at on maps throws under ANSI only
        # for absent keys).
        mdf = F.element_at(
            F.create_map(*[
                lit for t in present for lit in (F.lit(t), F.lit(int(df_map[t])))
            ]),
            F.col("term"),
        ).cast("long") if present else F.lit(0).cast("long")
        base = (
            self.base._matched_blocks(present)
            .withColumn("df", mdf)
            .select(*cols)
        )
        segs = self._seg_read("postings")
        if segs is None:
            return base
        buckets = sorted(
            set(term_buckets_for(self.spark, present or terms, self.base.term_buckets).values())
        )
        seg_blocks = (
            segs.filter(
                F.col("term_bucket").isin(buckets) & F.col("term").isin(present)
            )
            .withColumn("_layer", F.col("seg").cast("int"))
            .withColumn("df", mdf)
            .select(*cols)
        )
        return base.unionByName(seg_blocks)

    def _exploded_rows(self, blocks: DataFrame) -> DataFrame:
        """blocks → live (term, df, doc_id, tf, doc_len) rows. The
        tombstone filter is applied AT DECODE TIME via the broadcast
        map (codec.make_decode_live_udf) — no join stage; falls back to
        the broadcast max-layer join only when the tombstone volume
        exceeds the driver budget."""
        from vexor_spark.functions.codec import explode_blocks_rows

        bc = self._tombstone_bc()
        if bc is not None:
            # decode + tombstone filter fused in ONE mapInPandas
            # kernel (codec.explode_blocks_rows): dead postings die
            # inside the numpy batch — no join stage, no per-posting
            # Python structs, no JVM explode.
            return explode_blocks_rows(blocks, tomb_bc=bc)
        rows = explode_blocks_rows(blocks, keep_layer=True)
        tomb_max = self._tombstone_max()
        if tomb_max is not None:
            rows = rows.join(tomb_max, "doc_id", "left").filter(
                F.col("_tmax").isNull() | (F.col("_tmax") <= F.col("_layer"))
            ).drop("_tmax")
        return rows.drop("_layer")

    def _score_blocks(
        self, blocks: DataFrame, candidates: DataFrame | None = None
    ) -> DataFrame:
        """blocks (with merged df + _layer) → live (doc_id, score) —
        the layered analog of PersistedIndex._score_blocks, and the
        fallback/rescore hook wand.pruned_scores calls."""
        exploded = self._exploded_rows(blocks)
        if candidates is not None:
            exploded = exploded.join(F.broadcast(candidates), "doc_id", "left_semi")
        contrib = bm25_contribution_col(
            F.col("tf"), F.col("doc_len"), F.col("df"),
            float(self.doc_count), float(self.avg_doc_len),
        )
        return (
            exploded.withColumn("contribution", contrib)
            .groupBy("doc_id")
            .agg(F.sum("contribution").alias("score"))
        )

    def _term_blocks_for_theta(self, t_star: str):
        """θ-walk inputs (wand): t_star's BASE block METADATA rows
        (block_id, first, last, block_ub, n — blobs fetched lazily via
        _theta_blobs, see PersistedIndex) + the tombstoned-doc
        exclusion set. Tombstoned docs must not contribute to θ (their
        base postings are dead — counting one would break θ's
        lower-bound property); segment postings are ignored, which only
        weakens θ (sound). Returns ([], None) when the tombstone map
        exceeds the driver budget — wand then falls back to unpruned
        scoring."""
        total = sum(s["n_removed"] for s in self.manifest["segments"])
        if total > self.TOMB_DRIVER_MAX:
            return [], None
        arrays = self._tombstone_arrays()
        meta, _exc = self.base._term_blocks_for_theta(t_star)
        return meta, (arrays[0] if arrays is not None else None)

    def _theta_blobs(self, term: str, bids: list):
        """Lazy blob fetch for the θ machinery — θ walks base blocks
        only, so delegate to the base index."""
        return self.base._theta_blobs(term, bids)

    def _theta_blobs_multi(self, want: dict):
        return self.base._theta_blobs_multi(want)

    def prefetch_theta_meta(self, terms: list) -> None:
        self.base.prefetch_theta_meta(terms)

    def search_distributed(
        self, query: str, k: int = 10, *, prune: bool = True,
        metrics: dict | None = None, round_dp: int | None = SCORE_ROUND_DP,
    ) -> DataFrame:
        """(rank, doc_id, score) over the merged view — exact (equal to
        a full rebuild of the current corpus, test_delta.py); ranks on
        round_dp-rounded scores by default (round-7 public ranking
        contract, matching PersistedIndex.search_distributed). With
        prune=True (default), block-max pruning runs over ALL layers
        with a tombstone-aware θ (round-5 verdict item 1: under the
        cadence-4 compaction default the production index almost always
        has live segments, so the steady-state path must prune too)."""
        terms = prepare_query_terms(query)
        if not terms or self.doc_count <= 0 or self.avg_doc_len <= 0:
            return top_k(self.spark.createDataFrame([], "doc_id long, score double"), k)
        if prune:
            from vexor_spark.index.wand import pruned_scores

            slack = 1.5 * 10.0 ** (-round_dp) if round_dp is not None else 0.0
            scored = pruned_scores(self, terms, k, metrics=metrics, theta_slack=slack)
        else:
            scored = self.scored_rows(query)
            if scored is None:
                scored = self.spark.createDataFrame([], "doc_id long, score double")
        return top_k(scored, k, round_dp=round_dp)

    def scored_rows(self, query: str) -> DataFrame | None:
        """Lazy unpruned (doc_id, score) over the layered view (the
        plan top_k ranks); None when no query term survives the merged
        df map."""
        terms = prepare_query_terms(query)
        if not terms or self.doc_count <= 0 or self.avg_doc_len <= 0:
            return None
        present = [t for t in terms if t in self.term_df_map(terms)]
        if not present:
            return None
        return self._score_blocks(self._matched_blocks(present))

    def search_distributed_multi(
        self, queries: dict[str, str], k: int = 10, *,
        prune: bool = True, metrics: dict | None = None,
        round_dp: int | None = SCORE_ROUND_DP,
    ) -> DataFrame:
        """(query, rank, doc_id, score) for a WHOLE query batch in ONE
        job over the layered view — PersistedIndex.
        search_distributed_multi's shape (shared scan, one decode per
        matched block across ALL queries, broadcast (query, term)
        replication, WindowGroupLimit-bounded per-query ranks) with the
        segment layers unioned in and per-term df overridden by the
        exact merged map. Rank-identical to per-query
        search_distributed by construction (same rows, same merged
        stats, same (score desc, doc_id asc) order; pinned in
        test_delta.py). This is the steady-state serving path under
        continuous updates — the 4-8× batch amortization no longer
        requires a freshly-compacted base."""
        from pyspark.sql import Window

        spark = self.spark
        empty_schema = "query string, rank long, doc_id long, score double"
        qterms = {name: prepare_query_terms(q) for name, q in queries.items()}
        terms_all = sorted({t for ts in qterms.values() for t in ts})
        if not terms_all or self.doc_count <= 0 or self.avg_doc_len <= 0:
            return spark.createDataFrame([], empty_schema)
        df_map = self.term_df_map(terms_all)
        present = [t for t in terms_all if t in df_map]
        if not present:
            return spark.createDataFrame([], empty_schema)
        qdf = spark.createDataFrame(
            [(n, t) for n, ts in qterms.items() for t in ts if t in df_map],
            "query string, term string",
        )
        contrib = bm25_contribution_col(
            F.col("tf"), F.col("doc_len"), F.col("df"),
            float(self.doc_count), float(self.avg_doc_len),
        )
        # merged df rides on the block rows (_matched_blocks) and the
        # tombstone filter happens at decode time (_exploded_rows) — no
        # dfdf join, no tombstone join. With prune=True the shared
        # decode set shrinks to the blocks some query still needs
        # (wand.pruned_multi; tombstone-aware θ via
        # _term_blocks_for_theta, guaranteed fallback otherwise).
        exploded = None
        if prune:
            from vexor_spark.index.wand import pruned_multi

            slack = 1.5 * 10.0 ** (-round_dp) if round_dp is not None else 0.0
            exploded = pruned_multi(
                self, qterms, k, metrics=metrics, theta_slack=slack
            )
        if exploded is None:
            exploded = self._exploded_rows(self._matched_blocks(present))
        scored = (
            exploded
            .withColumn("contribution", contrib)
            .join(F.broadcast(qdf), "term")
            .groupBy("query", "doc_id")
            .agg(F.sum("contribution").alias("score"))
        )
        if round_dp is not None:
            scored = scored.withColumn("score", F.round("score", round_dp))
        w = Window.partitionBy("query").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query", "rank", F.col("doc_id").cast("long").alias("doc_id"), "score")
        )


def compact_segments(
    spark: SparkSession,
    work_dir: str | Path,
    index_dir: str | Path,
    *,
    term_buckets: int | None = None,
) -> dict:
    """Fold all segments into the base artifact (full merge over the
    already-current chunk store) and clear the segment list — the LSM
    compaction step; run it when read-time layer count or tombstone
    volume crosses the serving budget."""
    work_dir, index_dir = Path(work_dir), Path(index_dir)
    meta = json.loads((index_dir / "meta.json").read_text())
    tb = term_buckets or int(meta["term_buckets"])
    manifest = load_manifest(spark, index_dir)
    n = len(manifest["segments"])
    summary = full_merge(spark, work_dir, index_dir, term_buckets=tb)
    shutil.rmtree(index_dir / "segments", ignore_errors=True)
    _manifest_path(index_dir).unlink(missing_ok=True)
    _clear_generation_locks(index_dir)  # new epoch: generation restarts
    # a pending marker from a crashed delta is subsumed: the full merge
    # just re-read the current chunk store, change included.
    _pending_path(index_dir).unlink(missing_ok=True)
    summary["action"] = "compact_segments"
    summary["segments_folded"] = n
    return summary
