"""Streaming exact dedup (streaming/dedup.py): first arrival per
fingerprint survives, in-horizon duplicates drop — including across a
query restart sharing the checkpoint — and fingerprints re-admit once
the watermark passes the dedup horizon (bounded state)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from vexor_spark.streaming.dedup import dedup_stream

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("text", StringType()),
    ]
)

T0 = dt.datetime(2025, 6, 1, 8, 0, 0)


def _t(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _drop(spark, path, rows, batch: int) -> None:
    spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(path / f"b{batch}"))


def _drain(spark, input_dir, checkpoint, sink: list) -> None:
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(str(input_dir))
    )
    q = (
        dedup_stream(stream, watermark="30 minutes")
        .writeStream.foreachBatch(lambda df, _id: sink.extend(df.collect()))
        .option("checkpointLocation", str(checkpoint))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_dedup_stream_first_seen_and_horizon(spark, tmp_path):
    inp = tmp_path / "in"
    ckpt = tmp_path / "ckpt"
    inp.mkdir()
    sink: list = []

    # batch 1: two distinct docs + an immediate duplicate of doc 0
    _drop(
        spark,
        inp,
        [
            (0, _t(0), "alpha beta gamma"),
            (1, _t(1), "delta epsilon"),
            (2, _t(2), "alpha beta gamma"),  # dup of doc 0 -> dropped
        ],
        1,
    )
    _drain(spark, inp, ckpt, sink)
    assert sorted(r["doc_id"] for r in sink) == [0, 1]
    fp_by_doc = {r["doc_id"]: r["fingerprint"] for r in sink}

    # batch 2 (RESTART, same checkpoint): in-horizon duplicate still
    # dropped via persisted state; a new doc passes
    _drop(
        spark,
        inp,
        [
            (3, _t(5), "delta epsilon"),  # dup of doc 1 -> dropped
            (4, _t(6), "zeta eta"),
        ],
        2,
    )
    _drain(spark, inp, ckpt, sink)
    assert sorted(r["doc_id"] for r in sink) == [0, 1, 4]

    # batch 3 advances event time far past the 30-min horizon (the
    # watermark itself moves at the NEXT batch boundary) ...
    _drop(spark, inp, [(5, _t(120), "late arrival doc")], 3)
    _drain(spark, inp, ckpt, sink)
    assert 5 in {r["doc_id"] for r in sink}

    # ... so in batch 4 the old fingerprint's state has expired and the
    # duplicate re-admits (bounded state, by design)
    _drop(spark, inp, [(6, _t(125), "alpha beta gamma")], 4)
    _drain(spark, inp, ckpt, sink)
    ids = {r["doc_id"] for r in sink}
    assert 6 in ids, "fingerprint must re-admit once the watermark passed"
    # the re-admitted copy carries the same fingerprint as the original
    assert {r["doc_id"]: r["fingerprint"] for r in sink}[6] == fp_by_doc[0]
