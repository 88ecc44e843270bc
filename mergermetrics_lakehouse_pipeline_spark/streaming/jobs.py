"""Structured Streaming jobs.

The reference's "incremental" path is batch-over-new-files with manual
staging + affected-month recompute (SURVEY §2.9,
``2_incremental_load_fact.py:51-306``). This module provides the
idiomatic streaming upgrade the survey recommends: a file-source stream
with ``Trigger.AvailableNow`` semantics (process everything that has
landed, then stop — deterministic like the batch job, restartable via
checkpoint), event-time windowed aggregation with a watermark, and a
``foreachBatch`` upsert that reuses the batch merge operator, so the
exactly-once table maintenance logic is written once.

Every aggregation here delegates to ``operators/events.py`` — the same
code path the DuckDB-oracle-checked batch queries run. Tests assert
stream-batch parity on the driver testdata.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import events as ev
from ..operators.merge import upsert_all

#: legacy events.parquet physical schema (TIMESTAMP(NANOS) files read as
#: long nanos under spark.sql.legacy.parquet.nanosAsLong); kept as the
#: fallback when the landing dir can't be peeked (empty at start)
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over events parquet, ``ts`` normalized to a
    TIMESTAMP whatever the physical encoding (long nanos, TIMESTAMP_NTZ,
    or TIMESTAMP).

    File streams require a fixed schema up front; a one-time static
    footer peek (driver-side, metadata only) pins it to what's actually
    on disk — the same adaptivity registry.events_table applies per
    micro-batch would otherwise be impossible.

    ``maxFilesPerTrigger`` bounds per-microbatch work — on a real landing
    zone that is the backpressure knob; tests use it to force multiple
    micro-batches from a single directory.
    """
    try:
        schema = spark.read.parquet(path).schema
    except AnalysisException:
        # missing/empty landing dir only: fall back to the legacy shape.
        # Anything else (IO, permissions) must propagate — silently
        # pinning the wrong schema surfaces later as a baffling parquet
        # type error mid-stream.
        schema = EVENTS_RAW_SCHEMA
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(path)
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":
        # `div`, not `/`: double division is inexact for epoch-nanos magnitudes
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # NTZ -> TIMESTAMP is a wall-clock identity under the session's UTC tz
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def streaming_tumbling_counts(
    stream: DataFrame, *, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window aggregation — late events beyond the
    watermark are dropped; state for closed windows is evicted (the knob
    that keeps state bounded on an unbounded stream)."""
    return ev.tumbling_counts(stream.withWatermark(ev.TS, watermark), window)


def streaming_dedup(
    stream: DataFrame,
    *,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once ingest dedup for at-least-once sources:
    ``dropDuplicatesWithinWatermark`` keeps the first arrival of each key
    and drops re-deliveries that land within the watermark horizon.
    Unlike plain ``dropDuplicates`` on a stream (whose key state grows
    forever), the watermark EVICTS state for keys older than the horizon
    — the property that keeps a 100 TB/day ingest's dedup state bounded
    by (horizon × arrival rate), not by corpus lifetime. Emits in append
    mode immediately (first-seen rows don't wait for the window close).
    """
    return stream.withWatermark(ev.TS, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def run_available_now(
    result: DataFrame,
    *,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "complete",
    timeout_s: int = 120,
) -> DataFrame:
    """Run a streaming DataFrame to completion (AvailableNow) into an
    in-memory sink and return the materialized result table."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, timeout_s, query_name)
    spark = result.sparkSession
    return spark.table(query_name)


def _await_or_raise(q, timeout_s: int, name: str) -> None:
    """awaitTermination(timeout) returns False while the query is still
    running — silently proceeding would read a partially-populated sink
    (or refresh a table mid-merge), so stop the query and fail loudly."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"streaming query {name!r} still running after {timeout_s}s"
        )


def foreach_batch_upsert(
    stream: DataFrame,
    *,
    target_table: str,
    keys: list[str],
    checkpoint_dir: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    timeout_s: int = 120,
) -> None:
    """Stream -> (optional per-batch transform) -> MERGE into a table.

    The streaming twin of the reference's staging-table MERGE
    (``2_incremental_load_fact.py:218-225``): each micro-batch is upserted
    on ``keys`` via the batch merge operator, so re-delivered rows update
    in place and the sink stays idempotent under replays (checkpoint +
    deterministic MERGE = effectively exactly-once table maintenance).
    """

    def handle(batch: DataFrame, batch_id: int) -> None:
        if transform is not None:
            batch = transform(batch)
        upsert_all(target_table, batch, keys)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, timeout_s, f"upsert->{target_table}")
    # micro-batches run in a cloned session; drop the caller session's
    # stale file-listing cache for the rewritten table
    stream.sparkSession.catalog.refreshTable(target_table)


def foreach_batch_distinct_fold(
    stream: DataFrame,
    *,
    state_table: str,
    keys: list[str],
    id_col: str,
    checkpoint_dir: str,
    timeout_s: int = 120,
) -> None:
    """Stream -> exact per-group DISTINCT counts maintained as bitmap
    state (operators/ivm.py): each micro-batch aggregates to its own
    bitmap state and OR-folds into ``state_table``.

    Because bitmap OR is idempotent, a batch re-delivered after a
    checkpoint/sink desync (the classic foreachBatch at-least-once
    hazard) folds to the exact same state — this sink is safe WITHOUT
    relying on transactional writes, which additive streaming counts
    are not. Read counts off the state any time with
    ``distinct_from_state`` — no raw-event rescan.
    """
    from ..operators.ivm import distinct_state, merge_distinct_state

    spark = stream.sparkSession

    def handle(batch: DataFrame, batch_id: int) -> None:
        from ..sources.catalog import staged_overwrite

        s = batch.sparkSession  # micro-batches run in a cloned session
        delta = distinct_state(batch, keys=keys, id_col=id_col)
        if s.catalog.tableExists(state_table):
            # staged on-disk rewrite, NOT cache/localCheckpoint +
            # overwrite: a failure mid-overwrite from volatile blocks
            # would lose ALL accumulated state (the streaming checkpoint
            # only replays the current batch); the staging table keeps a
            # durable copy of the merged state until the target rewrite
            # completes
            staged_overwrite(
                s, state_table, merge_distinct_state(s.table(state_table), delta, keys=keys)
            )
        else:
            delta.write.mode("overwrite").format("parquet").saveAsTable(state_table)

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, timeout_s, f"distinct-fold->{state_table}")
    spark.catalog.refreshTable(state_table)


def streaming_attribution_join(
    stream: DataFrame,
    *,
    from_type: str = "click",
    to_type: str = "purchase",
    horizon_minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join (self-join of the event stream): match
    each ``to_type`` event to same-user ``from_type`` events within the
    horizon, exactly the batch attribution_join semantics
    (operators/events.py — parity asserted in tests).

    Both sides carry a watermark and the join condition bounds the two
    event-time columns against each other — the two requirements that
    let Structured Streaming compute how long a buffered row can still
    match and EVICT join state past that bound. Without the range
    bound, stream-stream join state grows forever; with it, state is
    (watermark + horizon) x arrival rate, the bounded-state shape that
    survives an unbounded stream.
    """
    src = (
        stream.withWatermark(ev.TS, watermark)
        .filter(F.col("event_type") == from_type)
        .select(
            F.col("user_id"),
            F.col("event_id").alias("from_id"),
            F.col(ev.TS).alias("from_ts"),
        )
    )
    dst = (
        stream.withWatermark(ev.TS, watermark)
        .filter(F.col("event_type") == to_type)
        .select(
            F.col("user_id").alias("to_user"),
            F.col("event_id").alias("to_id"),
            F.col(ev.TS).alias("to_ts"),
            F.col("value").alias("to_value"),
        )
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
            (F.unix_micros(F.col("to_ts").cast("timestamp")) - F.unix_micros(F.col("from_ts").cast("timestamp")))
            / F.lit(1_000_000.0)
        ).alias("seconds_to_convert"),
        F.col("to_value").alias("purchase_value"),
    )


def streaming_hourly_ohlc(
    stream: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked streaming OHLC bars — the incremental twin of
    operators/events.py hourly_ohlc. The struct-MIN/MAX open/close
    aggregates are associative, so each micro-batch folds into per-bar
    state instead of re-sorting history; grouping by ``F.window`` (not
    ``date_trunc``) lets the watermark evict closed bars, which is what
    keeps state bounded on an unbounded stream. Hour windows are
    epoch-aligned, so values match the batch operator exactly."""
    wm = stream.withWatermark(ev.TS, watermark)
    return (
        wm.groupBy(F.window(ev.TS, "1 hour").alias("w"), "event_type")
        .agg(*ev.ohlc_aggs())
        .select(
            "event_type",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "volume",
        )
    )


def foreach_batch_delta_append(
    stream: DataFrame,
    *,
    table_path: str,
    app_id: str,
    checkpoint_dir: str,
    timeout_s: int = 120,
) -> None:
    """Stream -> idempotent append into a protocol-authored Delta table.

    Each micro-batch commits with the Delta ``txn`` action
    (appId=``app_id``, version=batch_id) — the protocol's
    streaming-sink watermark. On restart/replay the handler consults
    ``last_txn_version`` and SKIPS any batch id it already committed,
    so at-least-once batch delivery yields exactly-once table contents
    (the same mechanism delta-spark's streaming sink uses; here over
    sources/delta_log.py). Checkpoint + txn stamp are belt-and-braces:
    either alone suffices, together a wiped checkpoint still cannot
    double-append.
    """
    from ..sources.delta_log import last_txn_version, write_delta

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch_id <= last_txn_version(batch.sparkSession, table_path, app_id):
            return  # already committed by a previous incarnation
        write_delta(batch, table_path, mode="append", txn=(app_id, batch_id))

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, timeout_s, f"delta-append->{table_path}")
