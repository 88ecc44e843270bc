"""Custom Python DataSource (sources/pydatasource.py): partition
planning, determinism, filter pushdown, and streaming offset replay.

The registry query synth_source_rollup additionally hash-verifies the
generator's row content against a DuckDB replay of the same md5
arithmetic — these tests cover the connector machinery itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.sources.pydatasource import (
    register_synth_source,
    synth_row,
)


def _load(spark, n_partitions=3, rows=100):
    register_synth_source(spark)
    return (
        spark.read.format("synth_events")
        .option("numPartitions", n_partitions)
        .option("rowsPerPartition", rows)
        .load()
    )


def test_batch_read_partitions_and_content(spark):
    df = _load(spark, n_partitions=3, rows=100)
    assert df.rdd.getNumPartitions() == 3
    rows = df.orderBy("event_id").collect()
    assert len(rows) == 300
    # content is the closed-form row function, independent of partitioning
    assert tuple(rows[0]) == synth_row(0)
    assert tuple(rows[250]) == synth_row(250)
    wide = _load(spark, n_partitions=10, rows=30).orderBy("event_id").collect()
    assert [r.event_id for r in wide] == list(range(300))
    assert tuple(wide[123]) == tuple(rows[123])


def test_filter_pushdown_consumed_and_residual_applied(spark):
    df = _load(spark)
    pushed = df.filter(F.col("event_type") == "purchase")
    expected = [t for t in map(synth_row, range(300)) if t[3] == "purchase"]
    got = [tuple(r) for r in pushed.orderBy("event_id").collect()]
    assert got == expected
    # a residual (non-pushable) filter must still be applied by Spark
    both = df.filter((F.col("event_type") == "purchase") & (F.col("value") > 50.0))
    assert {tuple(r) for r in both.collect()} == {t for t in expected if t[4] > 50.0}


def test_stream_offsets_advance_and_replay(spark, tmp_path):
    register_synth_source(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_one_batch():
        stream = (
            spark.readStream.format("synth_events")
            .option("batchSize", 200)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(once=True)
            .start()
        )
        assert q.awaitTermination(120)

    run_one_batch()
    first = spark.read.parquet(out)
    assert first.count() == 200
    assert {r.event_id for r in first.collect()} == set(range(200))
    # restarting from the checkpoint continues from the committed offset:
    # no duplicates, next 200 rows exactly
    run_one_batch()
    both = spark.read.parquet(out)
    assert both.count() == 400
    assert {r.event_id for r in both.collect()} == set(range(400))
    # row content matches the batch closed form
    r37 = both.filter(F.col("event_id") == 37).first()
    assert tuple(r37) == synth_row(37)


def test_pushed_filter_leaves_no_residual_filter_node(spark):
    """When pushFilters consumes the event_type equality, Spark drops it
    from the post-scan Filter — the plan-visible proof the pushdown
    actually happened (and rows are skipped generator-side)."""
    df = _load(spark).filter(F.col("event_type") == "view")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    import re

    # no Filter NODE ("RuntimeFilters: []" on the scan line is not one)
    assert not re.search(r"(?:\*\(\d+\)|\+-) Filter ", final), final
