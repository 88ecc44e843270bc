"""Structured Streaming: stream-batch parity and foreachBatch MERGE.

The streaming jobs reuse the batch transformations in operators/events.py
(which are DuckDB-oracle-checked via the registry), so these tests only
need to prove the *streaming* machinery: file-source micro-batching,
watermarked windowed state, AvailableNow termination, and idempotent
foreachBatch upserts."""

from __future__ import annotations

import pathlib

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.operators import events as ev
from mergermetrics_lakehouse_pipeline_spark.registry import events_table
from mergermetrics_lakehouse_pipeline_spark.streaming import (
    foreach_batch_upsert,
    read_events_stream,
    run_available_now,
    streaming_tumbling_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """File streams need a *directory* source: re-land the events table as
    4 parquet files (raw long-nanos ts, like the source file)."""
    d = tmp_path_factory.mktemp("events_landing")
    spark.read.parquet(f"{SF_DIR}/events.parquet").repartition(4).write.mode(
        "overwrite"
    ).parquet(str(d))
    return str(d)


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_stream_batch_parity_tumbling(spark, tmp_path, events_dir):
    """AvailableNow streaming aggregation == batch aggregation on the
    same files (complete mode, so the watermark drops nothing)."""
    stream = read_events_stream(spark, events_dir)
    assert stream.isStreaming
    result = run_available_now(
        streaming_tumbling_counts(stream, window="1 hour", watermark="2 hours"),
        query_name="t_stream_parity",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    batch = ev.tumbling_counts(events_table(spark, SF_DIR), "1 hour")
    assert _rows(result, "window_start", "event_type") == _rows(
        batch, "window_start", "event_type"
    )


def test_foreach_batch_upsert_idempotent(spark, tmp_path, events_dir):
    """Micro-batched foreachBatch MERGE lands every event exactly once;
    replaying the same stream from a fresh checkpoint changes nothing."""
    spark.sql("DROP TABLE IF EXISTS t_stream_sink")
    events = events_table(spark, SF_DIR)
    seed = events.filter(F.col("event_id") < 0)  # empty, right schema
    seed.write.mode("overwrite").format("parquet").saveAsTable("t_stream_sink")

    def run(ckpt: pathlib.Path):
        stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
        foreach_batch_upsert(
            stream,
            target_table="t_stream_sink",
            keys=["event_id"],
            checkpoint_dir=str(ckpt),
        )

    run(tmp_path / "c1")
    n_expected = events.count()
    assert spark.table("t_stream_sink").count() == n_expected
    # replay the whole stream: MERGE keys make it a no-op
    run(tmp_path / "c2")
    sink = spark.table("t_stream_sink")
    assert sink.count() == n_expected
    assert sink.select(F.count_distinct("event_id")).first()[0] == n_expected


def test_foreach_batch_distinct_fold_exact_and_replay_safe(
    spark, tmp_path, events_dir
):
    """Streaming bitmap-distinct maintenance: after the stream drains,
    counts read off the state table equal batch COUNT DISTINCT; replaying
    the whole stream from a fresh checkpoint (at-least-once redelivery,
    worst case) leaves the state byte-identical because bitmap OR is
    idempotent."""
    from mergermetrics_lakehouse_pipeline_spark.operators.ivm import (
        distinct_from_state,
    )
    from mergermetrics_lakehouse_pipeline_spark.streaming import (
        foreach_batch_distinct_fold,
    )

    spark.sql("DROP TABLE IF EXISTS t_distinct_state")
    events = events_table(spark, SF_DIR)

    def run(ckpt: pathlib.Path):
        stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
        foreach_batch_distinct_fold(
            stream,
            state_table="t_distinct_state",
            keys=["event_type"],
            id_col="user_id",
            checkpoint_dir=str(ckpt),
        )

    run(tmp_path / "d1")
    got = {
        r.event_type: r.n_distinct
        for r in distinct_from_state(
            spark.table("t_distinct_state"), keys=["event_type"]
        ).collect()
    }
    expected = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == expected
    # full redelivery: fold every batch AGAIN -> state unchanged
    run(tmp_path / "d2")
    again = {
        r.event_type: r.n_distinct
        for r in distinct_from_state(
            spark.table("t_distinct_state"), keys=["event_type"]
        ).collect()
    }
    assert again == expected
    spark.sql("DROP TABLE IF EXISTS t_distinct_state")


def test_watermark_present_in_plan(spark, tmp_path, events_dir):
    """The windowed aggregation carries an event-time watermark (bounded
    state on unbounded input)."""
    stream = read_events_stream(spark, events_dir)
    agg = streaming_tumbling_counts(stream, watermark="2 hours")
    assert "EventTimeWatermark" in agg._jdf.queryExecution().analyzed().toString()


def test_stateful_sessionization(spark, tmp_path):
    """applyInPandasWithState sessionizer: closed sessions match the
    batch sessionizer minus each user's trailing (still-open) session;
    a later landing closes those via persisted state."""
    from mergermetrics_lakehouse_pipeline_spark.streaming.stateful import streaming_sessionize

    from pyspark.sql import Window

    landing, out_dir = tmp_path / "landing", str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")
    events = events_table(spark, SF_DIR).select("user_id", "event_id", "ts", "value")
    events.coalesce(1).write.mode("overwrite").parquet(str(landing))
    schema = spark.read.parquet(str(landing)).schema

    def run_stream():
        # parquet sink: supports checkpoint recovery (memory sink doesn't)
        stream = spark.readStream.schema(schema).parquet(str(landing))
        q = (
            streaming_sessionize(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out_dir)

    def key_set(df, start_col):
        return {
            (r.user_id, r.n_events, round(r.total_value, 2), r.start_s)
            for r in df.withColumn("start_s", start_col).collect()
        }

    batch = ev.sessionize(events, gap_minutes=30)
    batch_start_s = F.unix_timestamp(
        F.to_timestamp("session_start", "yyyy-MM-dd HH:mm:ss")
    )
    stream_start_s = (F.col("start_us") / 1_000_000).cast("long")
    w_last = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.col("session_no").desc())
    )

    act1 = key_set(run_stream(), stream_start_s)
    exp1 = key_set(batch.withColumn("rn", w_last).filter(F.col("rn") > 1), batch_start_s)
    assert act1 == exp1  # all sessions closed by an in-stream gap

    # land strictly-later events: one per user, far in the future —
    # persisted state closes every still-open session
    later = events.groupBy("user_id").agg(F.max("ts").alias("ts")).select(
        "user_id",
        (F.lit(10_000_000) + F.col("user_id")).alias("event_id"),
        (F.col("ts") + F.expr("INTERVAL 10 DAYS")).alias("ts"),
        F.lit(1.0).alias("value"),
    )
    later.coalesce(1).write.mode("append").parquet(str(landing))
    act_all = key_set(run_stream(), stream_start_s)
    exp_all = key_set(batch, batch_start_s)
    assert act_all == exp_all


def test_streaming_dedup_drops_redeliveries(spark, tmp_path, events_dir):
    """dropDuplicatesWithinWatermark: the same files landed twice (an
    at-least-once redelivery) produce each event exactly once, matching
    batch dropDuplicates on the key."""
    from mergermetrics_lakehouse_pipeline_spark.streaming import streaming_dedup

    # land every file a second time: full-row duplicates, new filenames
    dup_dir = tmp_path / "dup_landing"
    src = spark.read.parquet(events_dir)
    src.write.mode("overwrite").parquet(str(dup_dir))
    src.write.mode("append").parquet(str(dup_dir))
    assert spark.read.parquet(str(dup_dir)).count() == 2 * src.count()

    stream = read_events_stream(spark, str(dup_dir))
    result = run_available_now(
        streaming_dedup(stream, keys=("event_id",), watermark="2 hours"),
        query_name="t_stream_dedup",
        checkpoint_dir=str(tmp_path / "ckpt_dedup"),
        output_mode="append",
    )
    batch = events_table(spark, SF_DIR)
    assert result.count() == batch.select("event_id").distinct().count()
    assert _rows(result.select("event_id", "event_type", "value"), "event_id") == _rows(
        batch.select("event_id", "event_type", "value"), "event_id"
    )


def test_stream_stream_attribution_join_parity(spark, tmp_path, events_dir):
    """Stream-stream watermarked self-join == the oracle-checked batch
    attribution join on the same files (append mode; single AvailableNow
    pass so the watermark evicts nothing before all rows arrive)."""
    from mergermetrics_lakehouse_pipeline_spark.streaming import (
        streaming_attribution_join,
    )

    stream = read_events_stream(spark, events_dir)
    result = run_available_now(
        streaming_attribution_join(stream, horizon_minutes=60, watermark="2 hours"),
        query_name="t_stream_attr",
        checkpoint_dir=str(tmp_path / "ckpt_attr"),
        output_mode="append",
    )
    batch = ev.attribution_join(
        events_table(spark, SF_DIR), horizon_minutes=60
    )
    key = ("user_id", "click_id", "purchase_id")
    assert _rows(result, *key) == _rows(batch, *key)
    assert batch.count() > 0


def test_stateful_idle_flush_timeout_branch(spark):
    """The ProcessingTimeTimeout path: a timed-out user's open session
    is emitted once and the state row removed (unit-level — Spark's
    timeout scheduling is upstream; our branch logic is what can rot)."""
    import pandas as pd

    from mergermetrics_lakehouse_pipeline_spark.streaming import stateful as st

    class FakeState:
        def __init__(self, tup):
            self._t = tup
            self.exists = tup is not None
            self.hasTimedOut = True
            self.removed = False

        @property
        def get(self):
            return self._t

        def remove(self):
            self.removed = True

    s = FakeState((1_000_000, 2_000_000, 3, 9.5))
    out = list(st._sessionize_group((42,), iter([]), s))
    assert s.removed
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (
        row.user_id, row.n_events, row.start_us, row.end_us, row.total_value
    ) == (42, 3, 1_000_000, 2_000_000, 9.5)

    # timed out with no state: nothing emitted, no crash
    s2 = FakeState(None)
    assert list(st._sessionize_group((1,), iter([]), s2)) == []


def test_stream_batch_parity_ohlc(spark, tmp_path, events_dir):
    """Streaming OHLC (window-grouped, watermarked) == the batch
    date_trunc operator on the same files: hour windows are
    epoch-aligned, and the struct-MIN/MAX aggregates fold identically
    per micro-batch (associativity is the parity argument)."""
    from mergermetrics_lakehouse_pipeline_spark.streaming import (
        streaming_hourly_ohlc,
    )

    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    result = run_available_now(
        streaming_hourly_ohlc(stream),
        query_name="t_stream_ohlc",
        checkpoint_dir=str(tmp_path / "ckpt_ohlc"),
    )
    batch = ev.hourly_ohlc(events_table(spark, SF_DIR))
    assert _rows(result, "event_type", "hour") == _rows(
        batch, "event_type", "hour"
    )


def test_streaming_heavy_hitters_space_saving_guarantees(spark, tmp_path, events_dir):
    """Space-saving invariants against the exact batch counts:
    est >= true, est - err <= true, and every item with true count
    > n/k is present — per event type, after draining the whole landing
    across several micro-batches (state carries between batches)."""
    from mergermetrics_lakehouse_pipeline_spark.streaming.stateful import (
        HH_K,
        streaming_heavy_hitters,
    )

    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    q = (
        streaming_heavy_hitters(stream)
        .writeStream.format("memory")
        .queryName("t_hh")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_hh"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    out = spark.table("t_hh").toPandas()
    # latest emission per type = the rows with that type's max n_seen
    final = (
        out.sort_values("n_seen")
        .groupby("event_type", group_keys=False)[out.columns.tolist()]
        .apply(lambda g: g[g.n_seen == g.n_seen.max()])
    )

    exact = (
        events_table(spark, SF_DIR)
        .groupBy("event_type", "user_id")
        .count()
        .toPandas()
    )
    for etype, grp in final.groupby("event_type"):
        true = dict(
            zip(
                exact[exact.event_type == etype].user_id,
                exact[exact.event_type == etype]["count"],
            )
        )
        n = int(grp.n_seen.iloc[0])
        assert n == sum(true.values())
        kept = set()
        for r in grp.itertuples():
            t_count = int(true.get(r.item, 0))
            assert r.est_count >= t_count, (etype, r.item)
            assert r.est_count - r.max_overestimate <= t_count, (etype, r.item)
            kept.add(int(r.item))
        for item, c in true.items():
            if c > n / HH_K:
                assert item in kept, (etype, item, c)


def test_threshold_alerts_state_survives_micro_batches(spark, tmp_path):
    """The sliding-window alert state must carry ACROSS micro-batches:
    time-ordered event files delivered one per trigger yield exactly
    the alerts a single-batch replay yields."""
    import pandas as pd

    from mergermetrics_lakehouse_pipeline_spark.streaming.jobs import (
        read_events_stream,
    )
    from mergermetrics_lakehouse_pipeline_spark.streaming.stateful import (
        streaming_threshold_alerts,
    )

    base = 1_700_000_000_000_000
    rows = []
    for i in range(12):  # user 1: a click every 10 min -> alerts from the 3rd on
        rows.append((1, 100 + i, base + i * 600_000_000, "click", 1.0))
    for i in range(4):  # user 2: one click every 2 days -> never alerts (W=1h)
        rows.append((2, 200 + i, base + i * 172_800_000_000, "click", 1.0))

    landing = tmp_path / "landing"
    landing.mkdir()
    # three time-ordered files -> three micro-batches under maxFilesPerTrigger=1
    chunks = [rows[:5], rows[5:10], rows[10:]]
    for j, chunk in enumerate(sorted(chunks, key=lambda c: c[0][2])):
        pd.DataFrame(
            [
                {
                    "event_id": e,
                    "user_id": u,
                    "ts": pd.Timestamp(t, unit="us"),
                    "event_type": et,
                    "value": v,
                }
                for (u, e, t, et, v) in chunk
            ]
        ).to_parquet(landing / f"f{j}.parquet")

    def run(max_files):
        out = tmp_path / f"out{max_files}"
        q = (
            streaming_threshold_alerts(
                read_events_stream(
                    spark, str(landing), max_files_per_trigger=max_files
                ),
                event_type="click",
                k=3,
                window_s=3600,
            )
            .writeStream.format("parquet")
            .option("path", str(out))
            .option(
                "checkpointLocation", str(tmp_path / f"ckpt{max_files}")
            )
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return {
            (r.user_id, r.event_id, r.n_in_window)
            for r in spark.read.parquet(str(out)).collect()
        }

    single = run(99)
    split = run(1)
    assert split == single
    # user 1 alerts from its 3rd click on, every time (window never empties)
    assert {(u, e) for (u, e, _) in single if u == 1} == {
        (1, 100 + i) for i in range(2, 12)
    }
    assert not any(u == 2 for (u, _, _) in single)
