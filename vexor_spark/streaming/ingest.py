"""Streaming index maintenance (SURVEY §2.9 mapping: the reference has
incremental *batch* semantics; the streaming surface is Structured
Streaming → foreachBatch(merge) over new WARC/page arrivals).

Each micro-batch:
1. dedupe batch urls (latest warc_ts wins — late re-crawls of the same
   url inside one batch collapse to the newest),
2. chunk the batch pages (the Python-heavy stage runs ONLY on arrivals),
3. merge into the chunk store: for every affected bucket, existing rows
   for re-crawled urls are replaced (anti-join on url) and new rows
   appended, rewritten with dynamic partition overwrite so untouched
   buckets' files are never rewritten — the Parquet stand-in for
   Iceberg MERGE INTO,
4. append per-batch metrics.

`finalize_index` (index/checkpoint.py) then produces the queryable
index from the chunk store — the docid/postings merge is a pure-JVM
shuffle pass, run on whatever cadence freshness requires (the classic
near-real-time search split: continuous ingest, periodic merge).
"""

from __future__ import annotations

import datetime as dt
import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vexor_spark.index.checkpoint import DEFAULT_INPUT_BUCKETS, _bucket_col
from vexor_spark.operators.chunking import chunk_pages
from vexor_spark.sources.corpus import PAGES_SCHEMA

CHUNK_COLS = ["url", "chunk_index", "label", "preview", "start_line", "end_line", "bucket"]


def apply_pages_batch(
    batch_df: DataFrame,
    work_dir: str | Path,
    *,
    n_buckets: int = DEFAULT_INPUT_BUCKETS,
    batch_id: int | None = None,
) -> dict:
    """Merge one micro-batch of pages into the chunk store."""
    work_dir = Path(work_dir)
    work_dir.mkdir(parents=True, exist_ok=True)
    spark = batch_df.sparkSession
    t0 = time.time()

    latest = (
        batch_df.withColumn(
            "_rn",
            # Secondary key: two same-url rows with EQUAL warc_ts in one
            # micro-batch must pick a deterministic winner, or checkpoint
            # replays of the batch would not converge to identical stores.
            F.row_number().over(
                Window.partitionBy("url").orderBy(
                    F.desc("warc_ts"), F.desc(F.xxhash64("html"))
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("bucket", _bucket_col(F.col("url"), n_buckets))
    ).persist()
    n_pages = latest.count()
    if n_pages == 0:
        latest.unpersist()
        return {"stage": "stream_batch", "batch_id": batch_id, "pages": 0}

    affected = [int(r["bucket"]) for r in latest.select("bucket").distinct().collect()]
    new_chunks = chunk_pages(latest, extra_cols=["bucket"]).select(*CHUNK_COLS)

    chunks_dir = work_dir / "chunks"
    existing_parts = [b for b in affected if (chunks_dir / f"bucket={b}").exists()]
    if existing_parts:
        existing = (
            spark.read.option("basePath", str(chunks_dir))
            .parquet(*[str(chunks_dir / f"bucket={b}") for b in existing_parts])
            .select(*CHUNK_COLS)
        )
        batch_urls = latest.select("url")
        survivors = existing.join(batch_urls, "url", "left_anti")
        merged = survivors.unionByName(new_chunks)
    else:
        merged = new_chunks

    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy("bucket").parquet(str(chunks_dir))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    latest.unpersist()

    record = {
        "stage": "stream_batch",
        "batch_id": batch_id,
        "at": dt.datetime.now(dt.timezone.utc).isoformat(),
        "pages": n_pages,
        "buckets_touched": len(affected),
        "secs": round(time.time() - t0, 3),
    }
    with (work_dir / "metrics.jsonl").open("a") as fh:
        fh.write(json.dumps(record) + "\n")
    return record


def start_pages_stream(
    spark: SparkSession,
    input_dir: str | Path,
    work_dir: str | Path,
    checkpoint_dir: str | Path,
    *,
    n_buckets: int = DEFAULT_INPUT_BUCKETS,
    available_now: bool = True,
):
    """File-source stream of page parquet drops → chunk-store merges.

    available_now=True drains everything currently present then stops
    (micro-batch replay of a backlog); False runs continuously. The
    stream checkpoint gives exactly-once per input file; the merge is
    idempotent per url, so replays converge.
    """
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(str(input_dir))

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        apply_pages_batch(batch_df, work_dir, n_buckets=n_buckets, batch_id=batch_id)

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(checkpoint_dir))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
