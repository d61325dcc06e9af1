"""Streaming near-duplicate detection — the streaming counterpart of
the batch MinHash-LSH arm (operators/dedup.near_dup_pairs), round-3
verdict item 7.

Architecture: `foreachBatch` over arriving documents against a
persistent, watermark-bounded SIGNATURE STORE.

- Per micro-batch, each doc is prepped ONCE (the near_dup_pairs
  pattern: one groupBy over exploded shingle-hash rows yields the k
  MinHash signatures AND the sorted shingle-hash set) into
  (doc_id, ts, band_keys, sh).
- Candidates = batch-internal pairs (the same skew-capped
  bucket_candidate_pairs as batch) ∪ batch×store band-key equi-join —
  a pair of docs from different batches meets exactly once, when the
  later doc arrives and the earlier one is still inside the horizon.
- Candidates are verified with the exact shingle Jaccard
  (jaccard_col) and written to `pairs/batch_id=N`.
- The store gains the batch's rows under `sigstore/batch_id=N` and
  expires whole partitions once their newest row falls `horizon`
  behind the max event time seen — state is bounded by the horizon,
  not the corpus, exactly like dedup_stream's watermark.

Idempotent restart: every per-batch write targets its own
`batch_id=N` directory with mode=overwrite and the store read EXCLUDES
the current batch's partition, so a checkpoint replay of batch N
rewrites byte-identical outputs instead of duplicating pairs or state
(tested with a real kill-and-restart in test_streaming_neardup.py).

`compact_sigstore` is the maintenance pass (the compaction analog of
index/compaction.py): many small per-batch partitions are consolidated
into one, dropping expired rows — amortized store reads stay O(live
docs in horizon) no matter how many micro-batches have run.

Equivalence: with a horizon covering the whole corpus, the union of
emitted pairs over all batches equals batch `near_dup_pairs` on the
full corpus (same bands, same shingles, same verify; pinned by test).
"""

from __future__ import annotations

import datetime as dt
import json
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vexor_spark.operators.dedup import (
    MINHASH_K,
    _sig_aggs,
    bucket_candidate_pairs,
    jaccard_col,
    shingle_hash_rows,
)

CONSOLIDATED_BATCH_ID = -1


def _band_keys_col(bands: int, rows_per_band: int):
    assert bands * rows_per_band <= MINHASH_K
    return F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(b)),
                *[
                    F.col(f"sig_{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            )
            for b in range(bands)
        ]
    )


def _prep_docs(
    docs: DataFrame,
    *,
    tokens_col: str,
    ts_col: str,
    shingle_n: int,
    bands: int,
    rows_per_band: int,
) -> DataFrame:
    """(doc_id, ts, band_keys, sh) — signatures and shingle sets in one
    pass (tokens hashed exactly once, the near_dup_pairs shape)."""
    per_doc = (
        shingle_hash_rows(docs, tokens_col, shingle_n=shingle_n)
        .groupBy("doc_id")
        .agg(*_sig_aggs(), F.array_sort(F.collect_set("h")).alias("sh"))
    )
    return per_doc.join(
        docs.select("doc_id", F.col(ts_col).alias("ts")), "doc_id"
    ).select(
        "doc_id",
        "ts",
        _band_keys_col(bands, rows_per_band).alias("band_keys"),
        "sh",
    )


def _manifest_path(work_dir: Path) -> Path:
    return work_dir / "neardup_manifest.json"


def _load_manifest(work_dir: Path) -> dict:
    p = _manifest_path(work_dir)
    if p.exists():
        return json.loads(p.read_text())
    return {"batches": {}, "max_ts": None}


def _save_manifest(work_dir: Path, manifest: dict) -> None:
    _manifest_path(work_dir).write_text(json.dumps(manifest, indent=1, sort_keys=True))


def apply_neardup_batch(
    batch_docs: DataFrame,
    work_dir: str | Path,
    *,
    batch_id: int,
    horizon: str = "2 hours",
    tokens_col: str = "tokens",
    ts_col: str = "ts",
    threshold: float = 0.8,
    shingle_n: int = 3,
    bands: int = 4,
    rows_per_band: int = 2,
    max_bucket: int | None = None,
) -> dict:
    """One micro-batch: emit verified near-dup pairs vs the batch and
    the live signature store, then admit the batch to the store and
    expire aged partitions. See module docstring for the contract."""
    work_dir = Path(work_dir)
    work_dir.mkdir(parents=True, exist_ok=True)
    spark = batch_docs.sparkSession
    t0 = time.time()
    horizon_sec = _parse_interval_seconds(horizon)

    prep = _prep_docs(
        batch_docs,
        tokens_col=tokens_col,
        ts_col=ts_col,
        shingle_n=shingle_n,
        bands=bands,
        rows_per_band=rows_per_band,
    ).persist()
    n_docs = prep.count()
    if n_docs == 0:
        prep.unpersist()
        return {"stage": "neardup_batch", "batch_id": batch_id, "docs": 0, "pairs": 0}

    batch_max_ts = prep.agg(F.max("ts").alias("m")).collect()[0]["m"]
    manifest = _load_manifest(work_dir)
    prev_max = (
        dt.datetime.fromisoformat(manifest["max_ts"]) if manifest["max_ts"] else None
    )
    max_ts = max(batch_max_ts, prev_max) if prev_max else batch_max_ts
    cutoff = max_ts - dt.timedelta(seconds=horizon_sec)

    store_dir = work_dir / "sigstore"
    live_parts = [
        int(bid)
        for bid, meta in manifest["batches"].items()
        if int(bid) != batch_id
        and dt.datetime.fromisoformat(meta["max_ts"]) >= cutoff
    ]

    bkeys = prep.select("doc_id", F.explode("band_keys").alias("bucket_key"))
    internal = bucket_candidate_pairs(bkeys, max_bucket=max_bucket)
    sides = prep.select("doc_id", "sh")
    if live_parts:
        store = (
            spark.read.option("basePath", str(store_dir))
            .parquet(*[str(store_dir / f"batch_id={b}") for b in sorted(live_parts)])
            .filter(F.col("ts") >= F.lit(cutoff))
        )
        skeys = store.select(
            F.col("doc_id").alias("doc_s"), F.explode("band_keys").alias("bucket_key")
        )
        cross = (
            bkeys.select(F.col("doc_id").alias("doc_n"), "bucket_key")
            .join(skeys, "bucket_key")
            .filter(F.col("doc_n") != F.col("doc_s"))
            .select(
                F.least("doc_n", "doc_s").alias("doc_a"),
                F.greatest("doc_n", "doc_s").alias("doc_b"),
            )
            .distinct()
        )
        candidates = internal.unionByName(cross).distinct()
        sides = sides.unionByName(store.select("doc_id", "sh")).dropDuplicates(
            ["doc_id"]
        )
    else:
        candidates = internal

    a = sides.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sides.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    pairs = (
        candidates.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("jaccard", jaccard_col(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .persist()
    )
    n_pairs = pairs.count()
    pairs.write.mode("overwrite").parquet(str(work_dir / "pairs" / f"batch_id={batch_id}"))
    prep.select("doc_id", "ts", "band_keys", "sh").write.mode("overwrite").parquet(
        str(store_dir / f"batch_id={batch_id}")
    )
    pairs.unpersist()
    prep.unpersist()

    # manifest update + partition expiry (idempotent on replay)
    manifest["batches"][str(batch_id)] = {"max_ts": batch_max_ts.isoformat()}
    manifest["max_ts"] = max_ts.isoformat()
    manifest["horizon_sec"] = horizon_sec  # lets compact_sigstore shed expired rows
    expired = [
        bid
        for bid, meta in manifest["batches"].items()
        if dt.datetime.fromisoformat(meta["max_ts"]) < cutoff
    ]
    for bid in expired:
        shutil.rmtree(store_dir / f"batch_id={bid}", ignore_errors=True)
        del manifest["batches"][bid]
    _save_manifest(work_dir, manifest)

    record = {
        "stage": "neardup_batch",
        "batch_id": batch_id,
        "docs": int(n_docs),
        "pairs": int(n_pairs),
        "store_partitions": len(manifest["batches"]),
        "expired_partitions": len(expired),
        "secs": round(time.time() - t0, 3),
    }
    with (work_dir / "metrics.jsonl").open("a") as fh:
        fh.write(json.dumps(record) + "\n")
    return record


def compact_sigstore(
    spark: SparkSession, work_dir: str | Path, *, horizon: str | None = None
) -> dict:
    """Consolidate the per-batch signature-store partitions into ONE,
    dropping rows already past the horizon cutoff (ts < max_ts −
    horizon): amortized store reads stay O(live docs in horizon)
    regardless of micro-batch count — on-disk size included, not just
    the read-time filter. The horizon comes from the manifest (recorded
    by apply_neardup_batch) unless overridden. Whole-partition expiry
    can't shed rows from the merged partition (its max_ts is the global
    max), so shedding HERE is what bounds the consolidated store.

    Safe relative to restarts: replaying an already-consolidated batch
    just rewrites its (now redundant) partition, and
    `dropDuplicates(doc_id)` on read keeps candidates exact."""
    work_dir = Path(work_dir)
    store_dir = work_dir / "sigstore"
    manifest = _load_manifest(work_dir)
    parts = sorted(int(b) for b in manifest["batches"])
    t0 = time.time()
    if len(parts) <= 1:
        return {"action": "compact_sigstore", "merged": 0, "secs": 0.0}
    horizon_sec = (
        _parse_interval_seconds(horizon)
        if horizon is not None
        else manifest.get("horizon_sec")
    )
    max_ts = max(dt.datetime.fromisoformat(m["max_ts"]) for m in manifest["batches"].values())
    rows = (
        spark.read.option("basePath", str(store_dir))
        .parquet(*[str(store_dir / f"batch_id={b}") for b in parts])
        .select("doc_id", "ts", "band_keys", "sh")
        .dropDuplicates(["doc_id"])
    )
    if horizon_sec is not None:
        cutoff = max_ts - dt.timedelta(seconds=int(horizon_sec))
        rows = rows.filter(F.col("ts") >= F.lit(cutoff))
    staging = store_dir / "_consolidating"
    rows.write.mode("overwrite").parquet(str(staging))
    for b in parts:
        shutil.rmtree(store_dir / f"batch_id={b}", ignore_errors=True)
    target = store_dir / f"batch_id={CONSOLIDATED_BATCH_ID}"
    shutil.rmtree(target, ignore_errors=True)
    staging.rename(target)
    manifest["batches"] = {
        str(CONSOLIDATED_BATCH_ID): {"max_ts": max_ts.isoformat()}
    }
    _save_manifest(work_dir, manifest)
    return {
        "action": "compact_sigstore",
        "merged": len(parts),
        "secs": round(time.time() - t0, 3),
    }


def start_neardup_stream(
    spark: SparkSession,
    input_dir: str | Path,
    work_dir: str | Path,
    checkpoint_dir: str | Path,
    *,
    schema: str,
    horizon: str = "2 hours",
    tokens_col: str = "tokens",
    ts_col: str = "ts",
    threshold: float = 0.8,
    available_now: bool = True,
):
    """File-source stream of document parquet drops → near-dup pairs.
    foreachBatch(apply_neardup_batch) with a durable checkpoint; each
    batch's outputs are keyed by batch_id, so restart replays are
    idempotent."""
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(input_dir))
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        apply_neardup_batch(
            batch_df,
            work_dir,
            batch_id=int(batch_id),
            horizon=horizon,
            tokens_col=tokens_col,
            ts_col=ts_col,
            threshold=threshold,
        )

    writer = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(checkpoint_dir))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _parse_interval_seconds(text: str) -> int:
    """'2 hours' / '30 minutes' / '45 seconds' / '1 day' → seconds."""
    amount, unit = text.strip().split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit.lower()]
    return int(float(amount) * mult)
