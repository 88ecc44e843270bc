"""Event-stream operators: windowed aggregation, sessionization, JSON
property extraction.

The reference has no streaming surface (SURVEY §2.9 — its "incremental"
load is batch-over-new-files), but a complete engine needs event-time
analytics: these are pure DataFrame→DataFrame transformations, shared
verbatim between the batch registry queries (DuckDB-oracle-checked) and
the Structured Streaming jobs in ``streaming/`` (stream-batch parity is
asserted in tests/test_streaming.py).

Scale notes: tumbling/hopping aggregation is one shuffle with map-side
partial aggregation; hopping multiplies rows by windows-per-event
*before* the partial agg, which is the standard cost. Sessionization is
one shuffle on user_id (the session assignment is two window functions
over the same partitioning — Spark evaluates them in a single sort) and
holds only per-user history, so it scales with the largest single user,
not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.dates import epoch_us

#: event-time column expected by every operator here
TS = "ts"


def _win_start(alias: str = "window_start") -> F.Column:
    return F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(alias)


def tumbling_counts(df: DataFrame, window: str = "1 hour") -> DataFrame:
    """Per (tumbling window, event_type): event count and exact-decimal
    value sum. Epoch-aligned windows (Spark ``F.window`` default), so the
    window start equals ``date_trunc`` in any engine."""
    return (
        df.groupBy(F.window(TS, window), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(_win_start(), "event_type", "n_events", "total_value")
    )


def hopping_counts(
    df: DataFrame, window: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Per (hopping window, event_type) counts — each event contributes to
    window/slide overlapping windows."""
    return (
        df.groupBy(F.window(TS, window, slide), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(_win_start(), "event_type", "n_events")
    )


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessions: a new session starts when a user is idle for
    more than ``gap_minutes``.

    Classic two-pass window formulation (lag -> boundary flag -> running
    sum = session number), then one aggregation per (user, session).
    Deterministic ordering: (ts, event_id) breaks same-timestamp ties.
    """
    order = [F.col(TS), F.col(id_col)]
    by_user = Window.partitionBy(user_col).orderBy(*order)
    gap_us = gap_minutes * 60 * 1_000_000
    prev_us = F.lag(epoch_us(TS)).over(by_user)
    is_new = F.when(
        prev_us.isNull() | (epoch_us(TS) - prev_us > gap_us), 1
    ).otherwise(0)
    sess = df.withColumn(
        "session_no",
        F.sum(is_new).over(by_user.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy(user_col, "session_no").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min(TS), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        (
            (F.max(epoch_us(TS)) - F.min(epoch_us(TS)))
            / F.lit(1_000_000.0)
        ).alias("duration_s"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


def cascading_rollup(df: DataFrame) -> DataFrame:
    """Multi-resolution continuous aggregate (the hypertable-rollup
    shape): minute, hour and day rollups per event_type in ONE pass.

    The scale-correct formulation: aggregate the raw events once at the
    finest grain (minute — the only full shuffle), then derive each
    coarser grain by re-aggregating the previous one (sum-of-sums,
    sum-of-counts — both exact: counts are BIGINT, values stay DECIMAL
    until the final cast). Spark's ReuseExchange then shares the
    minute-level shuffle across all three union branches, so the raw
    table is scanned and shuffled exactly once however many resolutions
    are stacked — at 100 TB the hour/day re-aggs touch only the already
    tiny minute rollup. Plan-asserted in tests/test_plan_invariants.py.
    """

    def _lvl(src: DataFrame, grain: str, n_col: F.Column, v_col: F.Column) -> DataFrame:
        return src.groupBy(
            F.date_trunc(grain, F.col("bucket")).alias("bucket"), F.col("event_type")
        ).agg(n_col.alias("n_events"), v_col.alias("_val"))

    minute = df.groupBy(
        F.date_trunc("minute", F.col(TS)).alias("bucket"), F.col("event_type")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("_val"),
    )
    hour = _lvl(minute, "hour", F.sum("n_events"), F.sum("_val"))
    day = _lvl(hour, "day", F.sum("n_events"), F.sum("_val"))

    def _out(src: DataFrame, tag: str) -> DataFrame:
        return src.select(
            F.lit(tag).alias("resolution"),
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "event_type",
            "n_events",
            F.col("_val").cast("double").alias("total_value"),
        )

    return _out(minute, "minute").unionByName(_out(hour, "hour")).unionByName(
        _out(day, "day")
    )


def extract_props(df: DataFrame, key: str = "k") -> DataFrame:
    """Typed extraction from the JSON ``props`` payload (scalar path
    lookup stays JVM-side via ``get_json_object``)."""
    return df.withColumn(
        f"prop_{key}",
        F.get_json_object(F.col("props"), f"$.{key}").cast("int"),
    )


def props_rollup(df: DataFrame, key: str = "k") -> DataFrame:
    """Aggregate the extracted JSON property per event_type."""
    return (
        extract_props(df, key)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(f"prop_{key}").alias(f"sum_{key}"),
            F.min(f"prop_{key}").alias(f"min_{key}"),
            F.max(f"prop_{key}").alias(f"max_{key}"),
        )
    )


def attribution_join(
    df: DataFrame,
    *,
    from_type: str = "click",
    to_type: str = "purchase",
    horizon_minutes: int = 60,
) -> DataFrame:
    """Conversion attribution: every ``to_type`` event matched to every
    ``from_type`` event of the same user that preceded it within the
    horizon. Equi key (user_id) + event-time range predicate — Spark
    plans a hash/sort-merge join on user with the range as a post-join
    filter, which scales (unlike a bare non-equi join; for the keyless
    case see operators/rangejoin.py).

    Shared verbatim by the stream-stream join twin
    (streaming/jobs.py:streaming_attribution_join) — the range bound is
    exactly what lets Structured Streaming evict join state.
    """
    src = df.filter(F.col("event_type") == from_type).select(
        F.col("user_id"),
        F.col("event_id").alias("from_id"),
        F.col(TS).alias("from_ts"),
    )
    dst = df.filter(F.col("event_type") == to_type).select(
        F.col("user_id").alias("to_user"),
        F.col("event_id").alias("to_id"),
        F.col(TS).alias("to_ts"),
        F.col("value").alias("to_value"),
    )
    cond = (
        (src["user_id"] == dst["to_user"])
        & (dst["to_ts"] >= src["from_ts"])
        & (dst["to_ts"] <= src["from_ts"] + F.expr(f"INTERVAL {horizon_minutes} MINUTES"))
    )
    return src.join(dst, cond).select(
        "user_id",
        F.col("from_id").alias("click_id"),
        F.col("to_id").alias("purchase_id"),
        (
            (epoch_us("to_ts") - epoch_us("from_ts"))
            / F.lit(1_000_000.0)
        ).alias("seconds_to_convert"),
        F.col("to_value").alias("purchase_value"),
    )


def transition_matrix(df: DataFrame) -> DataFrame:
    """First-order Markov transition model over per-user event sequences.

    For each user, events are ordered by (ts, event_id) — the event_id
    tie-break makes the sequence deterministic — and each consecutive
    (event_type -> next event_type) hop is counted. Output: one row per
    observed (from_type, to_type) with the count, the from-type total,
    and the maximum-likelihood transition probability.

    Scale notes: ONE shuffle on user_id for the lead() window; per-user
    state is a single row of lookahead, so cost scales with events, not
    with users x types. The final aggregation over (from, to) pairs is
    tiny (|types|^2 groups) with map-side partial aggregation. The
    probability is a single BIGINT/BIGINT division in DOUBLE — an exactly
    rounded IEEE op, so the result is bit-identical cross-engine (the
    DuckDB oracle replays it).
    """
    w = Window.partitionBy("user_id").orderBy(F.col(TS).asc(), F.col("event_id").asc())
    hops = (
        df.select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    totals = Window.partitionBy("from_type")
    return hops.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.sum("n_transitions").over(totals).alias("total_from"),
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(totals).cast("double")
        ).alias("p_transition"),
    )


def ohlc_aggs() -> list:
    """The OHLC aggregate expressions: open/close are argmin/argmax by
    (ts, event_id), computed as MIN/MAX over a (ts, event_id, value)
    struct — fully associative, so the SAME list serves the batch
    one-pass aggregation and the incremental per-micro-batch streaming
    state update."""
    first_s = F.min(F.struct(TS, "event_id", "value"))
    last_s = F.max(F.struct(TS, "event_id", "value"))
    return [
        first_s["value"].cast("double").alias("open"),
        F.max("value").cast("double").alias("high"),
        F.min("value").cast("double").alias("low"),
        last_s["value"].cast("double").alias("close"),
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("volume"),
    ]


_OHLC_OUT = ["open", "high", "low", "close", "n_events", "volume"]


def hourly_ohlc(df: DataFrame) -> DataFrame:
    """Hourly OHLC bars per event type — ONE aggregation pass (map-side
    combinable, deterministic tie-breaks), no window sort, no join-back.
    Streaming twin: streaming/jobs.py streaming_hourly_ohlc (groups by
    F.window instead of date_trunc so watermark state eviction applies;
    identical values because hour windows are epoch-aligned)."""
    return (
        df.select(
            "event_type",
            F.date_trunc("hour", TS).alias("hour_raw"),
            TS,
            "event_id",
            "value",
        )
        .groupBy("event_type", "hour_raw")
        .agg(*ohlc_aggs())
        .select(
            "event_type",
            F.date_format("hour_raw", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            *_OHLC_OUT,
        )
    )
