"""Resumable, incremental index builds with per-partition lineage +
metrics (SURVEY §2.9 / §7 Phase 4).

The reference's incremental semantics (snapshot diff → re-extract only
changed files → position rewrite; vexor/services/index_service.py
:263-344, 611-643, cache.py:983-994) map to a two-stage distributed
build:

Stage 1 — extraction/chunking (the Python-heavy, per-page work; analog
of the reference's embed stage whose re-run is avoided via label_hash,
index_service.py:835-868):
  pages are bucketed by pmod(xxhash64(url), N); each bucket's input
  content-hash (bit_xor of xxhash64(url, html) + row count — the
  web-scale replacement for mtime/size, SURVEY J4) is compared against
  the lineage table; only stale buckets are re-chunked, written with
  dynamic partition overwrite so untouched partitions' files are not
  rewritten. Buckets that disappeared are deleted.

Stage 2 — global merge (pure JVM shuffle work): doc ids reassigned by
(url, chunk_index) over all surviving chunks — the distributed analog
of the reference's position rewrite — then tf → postings → stats.
Stage 2 is recomputed each build; at web scale its cost is shuffle-only
and contains no Python.

Idempotence contract (tested): an incremental build over changed input
produces exactly the same index as a from-scratch build on that input.

Lineage: <work_dir>/lineage.json   {bucket: {input_hash, n_pages, built_at}}
Metrics: <work_dir>/metrics.jsonl  one record per build with per-action
bucket counts and wall seconds per stage.
"""

from __future__ import annotations

import datetime as dt
import json
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vexor_spark.constants import DEFAULT_SALT_PARTITIONS, DEFAULT_TERM_BUCKETS
from vexor_spark.index.build import InMemoryIndex
from vexor_spark.operators.chunking import chunk_pages
from vexor_spark.operators.postings import (
    build_postings,
    corpus_stats,
    tokenize_docs,
)
from vexor_spark.plans.docids import assign_doc_ids

DEFAULT_INPUT_BUCKETS = 32


def _bucket_col(url, n_buckets: int):
    return F.pmod(F.xxhash64(url), F.lit(n_buckets)).cast("int")


def input_snapshot(pages: DataFrame, n_buckets: int) -> dict[int, dict]:
    """{bucket: {input_hash, n_pages}} — order-independent content hash
    per bucket (bit_xor of per-row xxhash64(url, html) + count)."""
    rows = (
        pages.select(
            _bucket_col(F.col("url"), n_buckets).alias("bucket"),
            F.xxhash64(F.col("url"), F.col("html")).alias("_h"),
        )
        .groupBy("bucket")
        .agg(F.expr("bit_xor(_h)").alias("xh"), F.count("*").alias("n"))
        .collect()
    )
    return {
        int(r["bucket"]): {"input_hash": f"{r['xh']:016x}-{r['n']}", "n_pages": int(r["n"])}
        for r in rows
    }


def _load_lineage(work_dir: Path) -> dict:
    f = work_dir / "lineage.json"
    if f.exists():
        return {int(k): v for k, v in json.loads(f.read_text()).items()}
    return {}


def _save_lineage(work_dir: Path, lineage: dict) -> None:
    (work_dir / "lineage.json").write_text(
        json.dumps({str(k): v for k, v in sorted(lineage.items())}, indent=1)
    )


def _append_metrics(work_dir: Path, record: dict) -> None:
    with (work_dir / "metrics.jsonl").open("a") as fh:
        fh.write(json.dumps(record) + "\n")


def build_chunks_resumable(
    pages: DataFrame,
    work_dir: str | Path,
    *,
    n_buckets: int = DEFAULT_INPUT_BUCKETS,
    pending_file: str | Path | None = None,
) -> dict:
    """Stage 1. Returns the metrics record for this build step.

    `pending_file`, when given, is a durable staging marker for stage-2
    consumers (delta_update / update_index): the changed-bucket set is
    written there BEFORE the lineage commit, so a crash between the
    lineage save and the consumer's own commit leaves a record — a
    retry resumes the unfinished stage-2 work instead of reading the
    (already-current) chunk store as 'no change' and silently dropping
    the update. New changed buckets merge into any prior unconsumed
    pending set; the consumer deletes the file once its artifact is
    durably committed."""
    work_dir = Path(work_dir)
    work_dir.mkdir(parents=True, exist_ok=True)
    spark = pages.sparkSession
    t0 = time.time()

    snap = input_snapshot(pages, n_buckets)
    lineage = _load_lineage(work_dir)
    stale = [
        b
        for b, info in snap.items()
        if lineage.get(b, {}).get("input_hash") != info["input_hash"]
    ]
    removed = [b for b in lineage if b not in snap]

    chunks_dir = work_dir / "chunks"
    for b in removed:
        shutil.rmtree(chunks_dir / f"bucket={b}", ignore_errors=True)
        lineage.pop(b, None)

    if stale:
        stale_pages = pages.withColumn(
            "bucket", _bucket_col(F.col("url"), n_buckets)
        ).filter(F.col("bucket").isin([int(b) for b in stale]))
        chunks = chunk_pages(stale_pages, extra_cols=["bucket"]).select(
            "url", "chunk_index", "label", "preview", "start_line", "end_line", "bucket"
        )
        prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            chunks.write.mode("overwrite").partitionBy("bucket").parquet(str(chunks_dir))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    now = dt.datetime.now(dt.timezone.utc).isoformat()
    for b in stale:
        lineage[b] = {**snap[b], "built_at": now}
    if pending_file is not None and (stale or removed):
        pending_file = Path(pending_file)
        prior: list[int] = []
        if pending_file.exists():
            prev = json.loads(pending_file.read_text())
            # a marker whose segment id already appears in segments.json
            # is a COMPLETED update that crashed before cleanup — merging
            # its buckets into this run's marker would drop the seg key
            # and re-apply them (redundant tombstones + inflated router
            # change set, round-5 ADVICE). Discard it instead.
            applied = False
            if prev.get("seg") is not None:
                seg_manifest = pending_file.parent / "segments.json"
                if seg_manifest.exists():
                    applied = prev["seg"] in {
                        s["seg"]
                        for s in json.loads(seg_manifest.read_text()).get("segments", [])
                    }
            if not applied:
                prior = [int(b) for b in prev.get("changed_buckets", [])]
        pending_file.parent.mkdir(parents=True, exist_ok=True)
        pending_file.write_text(json.dumps({
            "changed_buckets": sorted({*prior, *(int(b) for b in stale), *(int(b) for b in removed)}),
        }, indent=1))
    _save_lineage(work_dir, lineage)

    record = {
        "stage": "chunks",
        "at": now,
        "buckets_total": len(snap),
        "buckets_built": len(stale),
        "buckets_skipped": len(snap) - len(stale),
        "buckets_removed": len(removed),
        "stale_buckets": sorted(int(b) for b in stale),
        "removed_buckets": sorted(int(b) for b in removed),
        "pages_built": sum(snap[b]["n_pages"] for b in stale),
        "secs": round(time.time() - t0, 3),
    }
    _append_metrics(work_dir, record)
    return record


def finalize_index(
    spark: SparkSession,
    work_dir: str | Path,
    *,
    salt_partitions: int = DEFAULT_SALT_PARTITIONS,
    term_buckets: int = DEFAULT_TERM_BUCKETS,
    cache: bool = True,
) -> InMemoryIndex:
    """Stage 2: surviving chunks → doc ids → postings/stats."""
    work_dir = Path(work_dir)
    t0 = time.time()
    chunks = spark.read.parquet(str(work_dir / "chunks")).drop("bucket")
    chunks = chunks.withColumn(
        "document", F.concat_ws(" ", F.col("url"), F.col("label"))
    )
    intermediates: list = []
    with_ids = assign_doc_ids(chunks, ["url", "chunk_index"], persisted_out=intermediates)
    docs = tokenize_docs(with_ids, "document")
    doc_table = docs.select(
        "doc_id", "url", "chunk_index", "label", "preview",
        "start_line", "end_line", "doc_len",
    )
    if cache:
        doc_table = doc_table.persist()
    from vexor_spark.operators import postings as postings_mod

    tf = postings_mod.term_freqs_build(docs.select("doc_id", "doc_len", "tokens"))
    postings = build_postings(tf, salt_partitions=salt_partitions, term_buckets=term_buckets)
    if cache:
        postings = postings.persist()
    stats = corpus_stats(doc_table.select("doc_id", "doc_len"))
    row = stats.collect()[0]
    if cache:
        postings.count()
    for df in intermediates:
        df.unpersist()
    _append_metrics(
        work_dir,
        {
            "stage": "merge",
            "at": dt.datetime.now(dt.timezone.utc).isoformat(),
            "doc_count": int(row["doc_count"]),
            "secs": round(time.time() - t0, 3),
        },
    )
    return InMemoryIndex(
        docs=doc_table,
        postings=postings,
        stats=stats,
        doc_count=int(row["doc_count"]),
        avg_doc_len=float(row["avg_doc_len"]) if row["avg_doc_len"] is not None else 0.0,
        term_buckets=term_buckets,
    )


def build_index_resumable(
    pages: DataFrame,
    work_dir: str | Path,
    *,
    n_buckets: int = DEFAULT_INPUT_BUCKETS,
    salt_partitions: int = DEFAULT_SALT_PARTITIONS,
    term_buckets: int = DEFAULT_TERM_BUCKETS,
) -> tuple[InMemoryIndex, dict]:
    record = build_chunks_resumable(pages, work_dir, n_buckets=n_buckets)
    index = finalize_index(
        pages.sparkSession,
        work_dir,
        salt_partitions=salt_partitions,
        term_buckets=term_buckets,
    )
    return index, record
