"""Streaming near-dup (streaming/neardup.py): per-batch MinHash
banding against the watermark-bounded signature store must equal batch
near_dup_pairs on the same corpus, survive a checkpoint restart
without duplicating pairs, expire state past the horizon, and keep
working identically across sigstore compaction."""

from __future__ import annotations

import datetime as dt
import json

import pyarrow.dataset as pa_ds
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from vexor_spark.operators.dedup import near_dup_pairs
from vexor_spark.streaming.neardup import (
    apply_neardup_batch,
    compact_sigstore,
    start_neardup_stream,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("tokens", ArrayType(StringType())),
    ]
)

T0 = dt.datetime(2025, 6, 1, 8, 0, 0)


def _t(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


# 80 distinct tokens: a one-word edit perturbs 3 of 78 shingles, so
# any two cluster members keep Jaccard ≈ 0.86 ≥ 0.8.
BASE = [f"tok{i}" for i in range(80)]


def _doc(i: int, minutes: float, edit: int | None = None):
    toks = list(BASE)
    if edit is not None:
        toks[edit] = f"edit{i}"
    return (i, _t(minutes), toks)


def _unrelated(i: int, minutes: float):
    return (i, _t(minutes), [f"w{i}a", f"w{i}b", f"w{i}c", f"w{i}d", f"w{i}e", f"w{i}f"])


# Planted near-identical docs spread across three batches (every pair
# among 0/1/10/11/20 verifies at ≈0.86), plus unrelated noise.
BATCH1 = [_doc(0, 0), _doc(1, 1, edit=30), _unrelated(2, 2), _unrelated(3, 3)]
BATCH2 = [_doc(10, 10, edit=4), _unrelated(12, 11), _doc(11, 12, edit=50)]
BATCH3 = [_doc(20, 20, edit=9), _unrelated(21, 21)]
ALL_ROWS = BATCH1 + BATCH2 + BATCH3


def _pair_set(rows) -> set[tuple[int, int]]:
    return {(int(r["doc_a"]), int(r["doc_b"])) for r in rows}


def _emitted_pairs(spark, work_dir) -> set[tuple[int, int]]:
    ds = pa_ds.dataset(str(work_dir / "pairs"), format="parquet", partitioning="hive")
    tbl = ds.to_table(columns=["doc_a", "doc_b"])
    return set(zip(tbl["doc_a"].to_pylist(), tbl["doc_b"].to_pylist()))


def test_stream_matches_batch_neardup(spark, tmp_path):
    work = tmp_path / "nd"
    for i, batch in enumerate([BATCH1, BATCH2, BATCH3], start=1):
        rec = apply_neardup_batch(
            spark.createDataFrame(batch, SCHEMA),
            work,
            batch_id=i,
            horizon="2 hours",
        )
        assert rec["docs"] == len(batch)

    got = _emitted_pairs(spark, work)
    want = _pair_set(
        near_dup_pairs(
            spark.createDataFrame(ALL_ROWS, SCHEMA), "tokens", max_bucket=None
        ).collect()
    )
    assert want, "planted clusters must produce pairs"
    assert got == want
    # cross-batch pairs actually exercised (0-10, 0-20, 10-20, 1-11)
    assert (0, 10) in got and (10, 20) in got and (1, 11) in got


def test_stream_restart_idempotent_and_horizon(spark, tmp_path):
    inp = tmp_path / "in"
    ckpt = tmp_path / "ckpt"
    work = tmp_path / "nd"
    inp.mkdir()

    def drop(rows, n):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
            str(inp / f"b{n}")
        )

    def drain():
        q = start_neardup_stream(
            spark, inp, work, ckpt, schema=SCHEMA, horizon="30 minutes"
        )
        q.awaitTermination(180)

    drop(BATCH1, 1)
    drain()
    after1 = _emitted_pairs(spark, work)
    assert after1 == {(0, 1)}  # 0 and 1 share the BASE body

    # RESTART with the same checkpoint: batch 2 only processed once
    drop(BATCH2, 2)
    drain()
    after2 = _emitted_pairs(spark, work)
    assert (0, 10) in after2 and (1, 11) in after2 and (10, 11) in after2

    # a third drain with no new data must not re-emit or duplicate
    drain()
    assert _emitted_pairs(spark, work) == after2

    # horizon: a near-dup arriving hours later must NOT pair with the
    # expired docs — and their store partitions are gone
    drop([_doc(30, 300, edit=2)], 3)
    drain()
    after3 = _emitted_pairs(spark, work)
    assert after3 == after2, "expired store rows must not produce pairs"
    manifest = json.loads((work / "neardup_manifest.json").read_text())
    live = set(manifest["batches"])
    assert "0" not in live and "1" not in live  # early batches expired


def test_sigstore_compaction_preserves_results(spark, tmp_path):
    work = tmp_path / "nd"
    apply_neardup_batch(
        spark.createDataFrame(BATCH1, SCHEMA), work, batch_id=1, horizon="2 hours"
    )
    apply_neardup_batch(
        spark.createDataFrame(BATCH2, SCHEMA), work, batch_id=2, horizon="2 hours"
    )
    rec = compact_sigstore(spark, work)
    assert rec["merged"] == 2
    manifest = json.loads((work / "neardup_manifest.json").read_text())
    assert list(manifest["batches"]) == ["-1"]

    # batch 3 against the consolidated store: identical to the
    # uncompacted run in test_stream_matches_batch_neardup
    apply_neardup_batch(
        spark.createDataFrame(BATCH3, SCHEMA), work, batch_id=3, horizon="2 hours"
    )
    got = _emitted_pairs(spark, work)
    want = _pair_set(
        near_dup_pairs(
            spark.createDataFrame(ALL_ROWS, SCHEMA), "tokens", max_bucket=None
        ).collect()
    )
    assert got == want


def test_sigstore_compaction_sheds_expired_rows(spark, tmp_path):
    """ADVICE r4: whole-partition expiry can't shed old rows from a
    mixed-age partition, and the consolidated partition takes the
    global max_ts — so compaction itself must filter on the horizon
    cutoff or the store grows without bound."""
    work = tmp_path / "nd_shed"
    b1 = [_unrelated(2, 0), _unrelated(3, 20)]  # mixed ages, one partition
    b2 = [_unrelated(12, 22)]
    for i, batch in enumerate([b1, b2], start=1):
        apply_neardup_batch(
            spark.createDataFrame(batch, SCHEMA), work,
            batch_id=i, horizon="15 minutes",
        )
    # max_ts = minute 22, cutoff = 7: doc 2 (minute 0) is expired but
    # its partition survives (partition max_ts = minute 20).
    manifest = json.loads((work / "neardup_manifest.json").read_text())
    assert set(manifest["batches"]) == {"1", "2"}
    assert manifest["horizon_sec"] == 900

    rec = compact_sigstore(spark, work)
    assert rec["merged"] == 2
    ds = pa_ds.dataset(
        str(work / "sigstore"), format="parquet", partitioning="hive"
    )
    ids = set(ds.to_table(columns=["doc_id"])["doc_id"].to_pylist())
    assert ids == {3, 12}, "expired row must be shed on disk, live rows kept"
