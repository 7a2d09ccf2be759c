"""Stateful streaming sessionization — ``applyInPandasWithState``.

The batch twin is ``pipeline/events.py::sessionize`` (lag + cumulative-sum
windows). A stream can't window over "the user's previous event" without
state, so this is the engine's custom stateful operator: per-user session
state with an event-time timeout.

Semantics (same gap rule as batch):

- events for a user belong to one session while consecutive gaps are
  ≤ ``gap_minutes``; a bigger gap closes the session and opens a new one;
- a session is EMITTED when it closes — either a later event arrives past
  the gap, or the event-time watermark passes ``last_ts + gap`` (the
  ``EventTimeTimeout`` path), so results are append-mode and final;
- late events beyond the watermark are dropped by Spark before the
  operator (standard watermark contract); an in-watermark event that is
  still older than the session's ``last_ts`` extends the open session but
  can't rewind it (state keeps aggregates, not history).

State per user: (session_start_us, last_ts_us, n_events, sum_value) —
epoch microseconds, converted to timestamps on emit. The per-batch group
data arrives as Arrow record batches; everything inside is vectorized
pandas.

At 1000-executor scale this shards by ``user_id`` across the cluster with
state in the executors' state store; the only shuffle per micro-batch is
the groupBy — exactly the batch operator's shuffle, amortized over the
stream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_US = 1_000_000


def _emit(user_id: int, start_us: int, last_us: int, n: int, sv: float) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
            "sum_value": [round(sv, 4)],
        }
    )


def make_session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * _US

    def fn(key, pdfs, state: GroupState):
        user_id = key[0]
        if state.hasTimedOut:
            start_us, last_us, n, sv = state.get
            state.remove()
            yield _emit(user_id, start_us, last_us, n, sv)
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        # datetime64[ns] → epoch microseconds
        ts_us = batch["ts"].astype("int64") // 1000
        order = ts_us.argsort(kind="stable")
        ts_us = ts_us.iloc[order].to_numpy()
        vals = batch["value"].iloc[order].to_numpy()

        if state.exists:
            start_us, last_us, n, sv = state.get
        else:
            start_us, last_us, n, sv = int(ts_us[0]), int(ts_us[0]) - 1, 0, 0.0

        closed = []
        for t, v in zip(ts_us.tolist(), vals.tolist()):
            if n > 0 and t - last_us > gap_us:
                closed.append((start_us, last_us, n, sv))
                start_us, n, sv = t, 0, 0.0
            # an in-watermark late event extends but never rewinds
            last_us = max(last_us, t)
            n += 1
            sv += v
        state.update((start_us, last_us, n, sv))
        # flush the open session once the watermark passes last_ts + gap
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)
        for s in closed:
            yield _emit(user_id, *s)

    return fn


def stream_sessionize(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "0 seconds",
) -> DataFrame:
    """events stream (user_id, ts, value, …) → append-mode stream of
    finalized sessions (user_id, session_start, session_end, n_events,
    sum_value). Start with ``.writeStream`` (any sink; tests use memory)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_fn(gap_minutes),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
