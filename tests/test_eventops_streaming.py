"""Watermarked streaming rollups + stateful sessionization
(streaming/eventops.py): late rows inside the watermark merge, windows
finalize exactly once, sessions close by gap or event-time timeout —
across query RESTARTS sharing one checkpoint (the replay shape of a
real ingest)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from vexor_spark.streaming.eventops import hourly_rollup_stream, session_stream

EVENTS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)

T0 = dt.datetime(2025, 3, 1, 10, 0, 0)


def _t(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _drop(spark, path, rows, batch: int) -> None:
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(path / f"b{batch}"))


def _drain(spark, input_dir, checkpoint, transform, sink: list) -> None:
    stream = spark.readStream.schema(EVENTS_SCHEMA).option(
        "recursiveFileLookup", "true"
    ).parquet(str(input_dir))
    q = (
        transform(stream)
        .writeStream.foreachBatch(lambda df, _id: sink.extend(df.collect()))
        .option("checkpointLocation", str(checkpoint))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_hourly_rollup_late_data_merges(spark, tmp_path):
    inp, ckpt = tmp_path / "in", tmp_path / "ckpt"
    inp.mkdir()
    out: list = []

    # batch 1: two users in the 10:00 window; a 12:00 row moves the
    # watermark to 10:00 (2h lateness) — nothing finalizes yet.
    _drop(spark, inp, [
        (1, 1, _t(0), 1.0), (1, 2, _t(20), 2.0), (2, 3, _t(30), 5.0),
        (9, 4, _t(120), 0.0),
    ], 1)
    _drain(spark, inp, ckpt, hourly_rollup_stream, out)
    assert out == []  # watermark (10:00) hasn't passed any window end

    # batch 2: a LATE row for the 10:00 window (allowed: watermark is
    # 10:00 < window end 11:00) + a 14:00 row → watermark 12:00 →
    # the 10:00 windows finalize WITH the late row merged.
    _drop(spark, inp, [(1, 5, _t(45), 10.0), (9, 6, _t(240), 0.0)], 2)
    _drain(spark, inp, ckpt, hourly_rollup_stream, out)
    done = {(r["user_id"], r["hour_start"]): (r["n_events"], r["sum_value"]) for r in out}
    assert done[(1, _t(0))] == (3, 13.0)  # late row included
    assert done[(2, _t(0))] == (1, 5.0)
    assert (9, _t(120)) not in done  # 12:00 window end 13:00 > watermark

    # batch 3: advance watermark past 13:00 → the 12:00 window closes.
    _drop(spark, inp, [(9, 7, _t(420), 0.0)], 3)
    _drain(spark, inp, ckpt, hourly_rollup_stream, out)
    done = {(r["user_id"], r["hour_start"]): (r["n_events"], r["sum_value"]) for r in out}
    assert done[(9, _t(120))] == (1, 0.0)


def test_session_stream_gap_close_and_timeout(spark, tmp_path):
    inp, ckpt = tmp_path / "in", tmp_path / "ckpt"
    inp.mkdir()
    out: list = []

    # batch 1: one open session for user 1 (10:00, 10:10).
    _drop(spark, inp, [(1, 1, _t(0), 1.0), (1, 2, _t(10), 2.0)], 1)
    _drain(spark, inp, ckpt, session_stream, out)
    assert out == []  # session still open

    # batch 2: 11:30 row (gap 80 min > 30) closes session 1 and opens
    # session 2; a 15:00 row from another user pushes the watermark to
    # 13:00 > 12:00 (= 11:30 + gap), arming user 1's timeout.
    _drop(spark, inp, [(1, 3, _t(90), 4.0), (99, 4, _t(300), 0.0)], 2)
    _drain(spark, inp, ckpt, session_stream, out)
    sess = {(r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["sum_value"]) for r in out}
    assert sess[(1, _t(0))] == (_t(10), 2, 3.0)

    # batch 3: any new data triggers the timed-out state flush.
    _drop(spark, inp, [(99, 5, _t(420), 0.0)], 3)
    _drain(spark, inp, ckpt, session_stream, out)
    sess = {(r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["sum_value"]) for r in out}
    assert sess[(1, _t(90))] == (_t(90), 1, 4.0)
    # user 99's 15:00 session closes by gap when its 17:00 event lands;
    # the 17:00 session stays open (nothing after it).
    assert sess[(99, _t(300))] == (_t(300), 1, 0.0)
    assert (99, _t(420)) not in sess


def test_session_stream_matches_batch_semantics(spark, tmp_path):
    """Closed streaming sessions equal the batch gap-sessionization on
    the same rows (for sessions the watermark has finalized)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(11)
    rows = []
    eid = 0
    # GLOBAL clock (batch splits must not create rows older than the
    # watermark, which would be legitimately dropped as too-late):
    # users share a monotone timeline, so file order ≈ event order.
    t = 0.0
    for _ in range(60):
        t += rng.choice([1, 5, 10, 29, 31, 45, 90])
        u = rng.randint(1, 5)
        rows.append((u, eid, _t(t), float(rng.randint(0, 9))))
        eid += 1
    # sentinel far in the future finalizes everything
    rows.append((999, eid, _t(t + 100000), 0.0))

    inp, ckpt = tmp_path / "in", tmp_path / "ckpt"
    inp.mkdir()
    out: list = []
    _drop(spark, inp, rows[: len(rows) // 2], 1)
    _drain(spark, inp, ckpt, session_stream, out)
    _drop(spark, inp, rows[len(rows) // 2 :], 2)
    _drain(spark, inp, ckpt, session_stream, out)
    _drop(spark, inp, [(999, eid + 1, _t(t + 200000), 0.0)], 3)
    _drain(spark, inp, ckpt, session_stream, out)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], round(r["sum_value"], 9))
        for r in out
        if r["user_id"] != 999
    }

    # batch oracle: same gap logic via window functions
    df = spark.createDataFrame(rows, EVENTS_SCHEMA).filter(F.col("user_id") != 999)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w) > 30 * 60,
            1,
        ).otherwise(0)
    )
    sess = (
        df.withColumn("brk", brk)
        .withColumn("sid", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], round(r["sum_value"], 9))
        for r in sess.collect()
    }
    assert got == want
