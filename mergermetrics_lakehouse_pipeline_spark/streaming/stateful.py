"""Custom stateful streaming operator: incremental gap-based
sessionization via ``applyInPandasWithState``.

The batch twin (``operators/events.py: sessionize``) recomputes sessions
from all history; this operator maintains one open session per user in
Spark's state store and emits a session row the moment a gap closes it —
the unbounded-stream shape where re-aggregating history is impossible.

Per group and micro-batch: sort the batch's events by (ts, event_id),
fold them into the open-session state, emit every session closed by a
gap, keep the trailing session open in state. State per user is O(1)
(five scalars), so state-store size scales with |active users|, not
event volume.

Ordering contract: events for a user must arrive in event-time order
*across* micro-batches (within a batch we sort). On a real pipeline that
is the landing layout (time-ordered files); out-of-order tails belong to
the watermarked window operators instead.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

#: emitted (closed) session rows
SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

#: open-session state: (start_us, last_us, n_events, total_value)
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _sessionize_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    gap_us = 30 * 60 * 1_000_000
    (user_id,) = key
    if state.exists:
        start_us, last_us, n_events, total_value = state.get
    else:
        start_us, last_us, n_events, total_value = None, None, 0, 0.0

    closed: list[tuple[int, int, int, int, float]] = []
    events = pd.concat(list(batches), ignore_index=True)
    events = events.sort_values(["ts_us", "event_id"])
    for ts_us, value in zip(events["ts_us"], events["value"]):
        ts_us = int(ts_us)
        if start_us is None:
            start_us, last_us, n_events, total_value = ts_us, ts_us, 1, float(value)
        elif ts_us - last_us > gap_us:
            closed.append((user_id, n_events, start_us, last_us, total_value))
            start_us, last_us, n_events, total_value = ts_us, ts_us, 1, float(value)
        else:
            last_us, n_events, total_value = ts_us, n_events + 1, total_value + float(value)
    state.update((start_us, last_us, n_events, total_value))
    if closed:
        yield pd.DataFrame(
            closed, columns=["user_id", "n_events", "start_us", "end_us", "total_value"]
        )


def streaming_sessionize(stream: DataFrame) -> DataFrame:
    """events stream -> closed-session stream (append mode).

    Input needs columns (user_id, event_id, ts, value); ts is converted
    to integer micros before the stateful step so state holds plain
    longs."""
    from pyspark.sql import functions as F

    prepared = stream.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
