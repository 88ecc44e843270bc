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
    ArrayType,
    DoubleType,
    LongType,
    StringType,
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


#: processing-time idle flush used when timeouts are enabled
IDLE_FLUSH_MS = 2_000


def _sessionize_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    gap_us = 30 * 60 * 1_000_000
    (user_id,) = key

    # timeout invocation: no new data for this user within the idle
    # horizon — flush the open session and DROP the state row. Without
    # this path, users who never return would pin state forever; with
    # it the state store size tracks ACTIVE users, the property that
    # holds at 100 TB/day.
    if state.hasTimedOut:
        if state.exists:
            start_us, last_us, n_events, total_value = state.get
            state.remove()
            if start_us is not None:
                yield pd.DataFrame(
                    [(user_id, n_events, start_us, last_us, total_value)],
                    columns=[
                        "user_id", "n_events", "start_us", "end_us", "total_value"
                    ],
                )
        return

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
    try:
        state.setTimeoutDuration(IDLE_FLUSH_MS)
    except Exception:
        pass  # NoTimeout configuration: duration calls are invalid
    if closed:
        yield pd.DataFrame(
            closed, columns=["user_id", "n_events", "start_us", "end_us", "total_value"]
        )


def streaming_sessionize(stream: DataFrame, *, idle_flush: bool = False) -> DataFrame:
    """events stream -> closed-session stream (append mode).

    Input needs columns (user_id, event_id, ts, value); ts is converted
    to integer micros before the stateful step so state holds plain
    longs.

    ``idle_flush=True`` arms a processing-time state timeout
    (``GroupStateTimeout.ProcessingTimeTimeout``): a user idle past the
    horizon gets their open session emitted and their state row REMOVED
    — the state-TTL discipline that keeps the store bounded by active
    users on an unbounded stream. Use it with a continuous
    processing-time trigger; under ``Trigger.AvailableNow`` armed
    timeouts keep the drain alive waiting for future firings, so
    bounded backfills should leave it off. Default off also gives exact
    batch parity (the trailing open session stays unemitted, like the
    batch operator's final groups)."""
    from pyspark.sql import functions as F

    prepared = stream.select(
        "user_id", "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"), "value"
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_flush
        else GroupStateTimeout.NoTimeout
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Space-saving heavy hitters
# ---------------------------------------------------------------------------

#: emitted per micro-batch: the group's current counter table
HH_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("item", LongType()),
        StructField("est_count", LongType()),
        StructField("max_overestimate", LongType()),
        StructField("n_seen", LongType()),
    ]
)

#: state: parallel arrays of the k counters + total items seen
HH_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("errors", ArrayType(LongType())),
        StructField("n_seen", LongType()),
    ]
)

HH_K = 8


def _heavy_hitters_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    k: int = HH_K,
) -> Iterator[pd.DataFrame]:
    """Metwally et al.'s SPACE-SAVING: k counters per group, smallest
    counter evicted (its count inherited as the newcomer's overestimate
    bound). Guarantees: est >= true; est - err <= true; every item with
    true count > n/k is present. State is O(k) per group — constant,
    however long the stream runs. With ``k`` >= the group's distinct
    item count no eviction ever fires and the counters are EXACT (the
    property the driver's exact-twin query verifies)."""
    (etype,) = key
    if state.hasTimedOut:  # pragma: no cover - not armed in tests
        state.remove()
        return
    if state.exists:
        items, counts, errors, n_seen = state.get
        table = {i: [c, e] for i, c, e in zip(items, counts, errors)}
        n_seen = int(n_seen)
    else:
        table, n_seen = {}, 0

    for pdf in batches:
        for item in pdf["item"]:
            item = int(item)
            n_seen += 1
            if item in table:
                table[item][0] += 1
            elif len(table) < k:
                table[item] = [1, 0]
            else:
                evict = min(table, key=lambda x: (table[x][0], x))
                floor = table[evict][0]
                del table[evict]
                table[item] = [floor + 1, floor]

    ordered = sorted(table.items(), key=lambda kv: (-kv[1][0], kv[0]))
    state.update(
        (
            [i for i, _ in ordered],
            [c for _, (c, _) in ordered],
            [e for _, (_, e) in ordered],
            n_seen,
        )
    )
    yield pd.DataFrame(
        [(etype, i, c, e, n_seen) for i, (c, e) in ordered],
        columns=["event_type", "item", "est_count", "max_overestimate", "n_seen"],
    )


def streaming_heavy_hitters(stream: DataFrame, *, k: int = HH_K) -> DataFrame:
    """events stream -> per-type top-k user table, refreshed every
    micro-batch (append mode; the row with the highest n_seen per
    (event_type, item) is the latest view).

    The exact batch answer needs a full groupBy over all history; this
    keeps ``k`` counters per type in the state store — the
    bounded-memory sketch for 'top users right now' on an unbounded
    stream. ``k`` >= distinct items per group degrades gracefully to
    exact counting (no eviction path ever fires)."""
    import functools

    from pyspark.sql import functions as F

    prepared = stream.select(
        "event_type", F.col("user_id").alias("item")
    )
    return prepared.groupBy("event_type").applyInPandasWithState(
        functools.partial(_heavy_hitters_group, k=k),
        outputStructType=HH_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Sliding-window threshold alerts (CEP-style rate detector)
# ---------------------------------------------------------------------------

#: one row per alerting event
ALERT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("n_in_window", LongType()),
    ]
)

#: state: event-time stamps still inside the trailing window
ALERT_STATE_SCHEMA = StructType(
    [StructField("stamps", ArrayType(LongType()))]
)


def _threshold_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
    k: int,
    window_us: int,
) -> Iterator[pd.DataFrame]:
    """Per user: fold events in (ts, event_id) order; each event first
    evicts stamps older than ``ts - window_us`` (inclusive lower bound),
    then counts itself — emit an alert row whenever the trailing-window
    count reaches ``k``. State is the stamp list inside the window:
    bounded by window x per-user arrival rate, evicted as time advances
    (the CEP rate-detector state discipline). The same ordering contract
    as sessionization: cross-batch event-time order per user."""
    (uid,) = key
    if state.hasTimedOut:  # pragma: no cover
        state.remove()
        return
    stamps: list[int] = list(state.get[0]) if state.exists else []

    out = []
    for pdf in batches:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        for ts_us, eid in zip(pdf["ts_us"], pdf["event_id"]):
            ts_us = int(ts_us)
            lo = ts_us - window_us
            stamps = [s for s in stamps if s >= lo]
            stamps.append(ts_us)
            if len(stamps) >= k:
                out.append((int(uid), int(eid), ts_us, len(stamps)))
    state.update(([s for s in stamps],))
    yield pd.DataFrame(
        out, columns=["user_id", "event_id", "ts_us", "n_in_window"]
    )


def streaming_threshold_alerts(
    stream: DataFrame,
    *,
    event_type: str = "click",
    k: int = 5,
    window_s: int = 3600,
) -> DataFrame:
    """CEP-style rate detector: alert on every ``event_type`` event that
    is the k-th (or later) for its user within the trailing
    ``window_s`` seconds — the fraud/abuse/alerting primitive (N failed
    logins in M minutes) that needs true sliding-window state, not
    tumbling buckets.

    Exact contract (hash-checkable against a batch self-join oracle):
    the window is event-time [ts - W, ts], inclusive; within equal
    timestamps the (ts, event_id) processing order decides which event
    sees which — identical to the oracle's
    ``ts2 >= ts - W AND (ts2 < ts OR (ts2 = ts AND id2 <= id))`` count.
    """
    from pyspark.sql import functions as F

    prepared = (
        stream.filter(F.col("event_type") == event_type)
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )
    )

    def fn(key, batches, state):
        yield from _threshold_group(
            key, batches, state, k=k, window_us=window_s * 1_000_000
        )

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=ALERT_SCHEMA,
        stateStructType=ALERT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
