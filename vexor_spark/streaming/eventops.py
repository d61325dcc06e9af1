"""Event-time streaming operators: watermarked windowed rollups and
stateful gap sessionization (the streaming counterparts of the batch
`events_hourly` / `events_sessions` catalog entries).

- `hourly_rollup_stream`: Structured Streaming `window()` aggregation
  with a watermark — late rows inside the allowed lateness merge into
  their window; rows older than the watermark are dropped and the
  finalized window is emitted exactly once (append mode).
- `session_stream`: custom stateful operator via
  `applyInPandasWithState` — per-user GroupState carries the open
  session (start, last_ts, n, sum); a row with gap > `gap_min` closes
  the current session and opens a new one; event-time timeout flushes
  sessions the watermark has passed. This is the shape any bespoke
  stateful web-scale operator takes (dedup-by-key with TTL, rate
  limiting, CDC folding): per-key Arrow batches + an explicit state
  struct, no driver involvement.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_MIN = 30  # same gap as the batch events_sessions entry

SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

# state: open session accumulator
SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def hourly_rollup_stream(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Streaming (window, user_id) rollup with late-data handling:
    count + sum per user-hour, finalized once the watermark passes the
    window end (append output mode)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def _us(ts: dt.datetime) -> int:
    return int(ts.timestamp() * 1_000_000)


def _session_fn(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user session folding. Rows may arrive unsorted within a
    micro-batch; sort by event time first. Emits every CLOSED session;
    the open session lives in state until the gap closes it or the
    event-time timeout fires."""
    user_id = int(key[0])
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000

    if state.hasTimedOut:
        if state.exists:
            start_us, last_us, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start": pd.Timestamp(start_us, unit="us"),
                        "session_end": pd.Timestamp(last_us, unit="us"),
                        "n_events": int(n),
                        "sum_value": float(total),
                    }
                ]
            )
        return

    rows = pd.concat(list(batches), ignore_index=True).sort_values("ts")
    if state.exists:
        start_us, last_us, n, total = state.get
    else:
        start_us = last_us = None  # type: ignore[assignment]
        n, total = 0, 0.0

    closed: list[dict] = []
    for ts, value in zip(rows["ts"], rows["value"]):
        t = _us(ts)
        if start_us is None:
            start_us, last_us, n, total = t, t, 1, float(value)
            continue
        if t - last_us > gap_us:
            closed.append(
                {
                    "user_id": user_id,
                    "session_start": pd.Timestamp(start_us, unit="us"),
                    "session_end": pd.Timestamp(last_us, unit="us"),
                    "n_events": int(n),
                    "sum_value": float(total),
                }
            )
            start_us, last_us, n, total = t, t, 1, float(value)
        else:
            last_us = max(last_us, t)
            n += 1
            total += float(value)
    state.update((int(start_us), int(last_us), int(n), float(total)))
    # flush the open session once the event-time watermark passes
    # last_ts + gap (no more rows can legally join it).
    state.setTimeoutTimestamp(int(last_us // 1000) + SESSION_GAP_MIN * 60 * 1000)
    if closed:
        yield pd.DataFrame(closed)


def session_stream(events: DataFrame, *, watermark: str = "2 hours") -> DataFrame:
    """Streaming gap sessionization: one output row per closed session
    (closed by a later event's gap, or by event-time timeout once the
    watermark passes session_end + gap)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_OUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
