"""Stateful streaming sessionization via applyInPandasWithState
(SURVEY.md §2D) — the custom-stateful-operator pattern: per-user session
state, sessions closed either by a later event exceeding the 30-minute
gap or by the event-time watermark passing the session's timeout. The
batch equivalent (identical gap semantics on bounded data) is
``plans.analytics.q_events_sessionize``.

Timeout design: EventTimeTimeout + a watermark equal to the session gap.
State is one tuple per user still inside the watermark horizon — bounded
regardless of stream length, and late events inside the delay fold into
the right session. (ProcessingTimeTimeout is deliberately avoided: its
wall-clock state-cleanup batch deadlocks under pyspark 4.1.2's
applyInPandasWithState, and wall-clock close is the wrong semantics for
a replayable backup stream anyway.)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_GAP_US = 30 * 60 * 1_000_000
WATERMARK = "30 minutes"

_STATE_SCHEMA = StructType(
    [
        StructField("session_start_us", LongType()),
        StructField("last_seen_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events into the user's open session;
    emit sessions closed in-batch (gap exceeded) or by watermark."""
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "session_start_us": start,
                    "session_end_us": last,
                    "n_events": n,
                }
            ]
        )
        return
    ts = sorted(int(t) for pdf in pdfs for t in pdf["ts_us"].tolist())
    if not ts:
        return
    if state.exists:
        start, last, n = state.get
    else:
        start, last, n = ts[0], ts[0], 0
    closed = []
    for t in ts:
        if t - last > SESSION_GAP_US:
            closed.append(
                {
                    "user_id": user_id,
                    "session_start_us": start,
                    "session_end_us": last,
                    "n_events": n,
                }
            )
            start, n = t, 0
        last = t
        n += 1
    state.update((start, last, n))
    # close when the watermark passes the session's gap horizon (ms)
    state.setTimeoutTimestamp((last + SESSION_GAP_US) // 1000)
    if closed:
        yield pd.DataFrame(closed)


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events must carry (user_id long, ts_us long). Emits closed
    sessions. State is one tuple per user active inside the watermark
    horizon — bounded regardless of event volume."""
    watermarked = events.withColumn(
        "event_time", F.timestamp_micros(F.col("ts_us"))
    ).withWatermark("event_time", WATERMARK)
    return watermarked.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
