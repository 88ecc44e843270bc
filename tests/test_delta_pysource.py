"""The Delta commit log as a REAL Spark source (Python DataSource API,
sources/delta_pysource.py): batch reads of the current snapshot,
checkpointed Structured Streaming over append histories, CDF-mode
streaming over DML'd tables, executor-side Arrow decoding with
partition-value injection and deletion-vector subtraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import StreamingQueryException

from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
    delete_delta,
    delete_delta_dv,
    optimize_delta,
    read_delta,
    update_delta,
    write_delta,
)
from mergermetrics_lakehouse_pipeline_spark.sources.delta_pysource import (
    DeltaLogDataSource,
)


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "t")


@pytest.fixture(autouse=True)
def _register(spark):
    spark.dataSource.register(DeltaLogDataSource)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _kv(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def test_batch_read_matches_read_delta(spark, tbl):
    df = spark.range(30).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("p")
    )
    write_delta(df, tbl, mode="overwrite", partition_by=["p"])
    write_delta(
        df.filter("k < 5").withColumn("k", F.col("k") + 100),
        tbl,
        mode="append",
    )
    out = spark.read.format("delta_pylog").option("path", tbl).load()
    assert _rows(out) == _rows(read_delta(spark, tbl))
    # partition values came from hive dirs, injected executor-side
    assert out.schema["p"].dataType.typeName() == "long"


def test_batch_read_subtracts_deletion_vectors(spark, tbl):
    write_delta(_kv(spark).repartitionByRange(4, "k"), tbl, mode="overwrite")
    delete_delta_dv(spark, tbl, "k", 5, 14)
    out = spark.read.format("delta_pylog").option("path", tbl).load()
    assert _rows(out.select("k")) == {
        (k,) for k in range(40) if not 5 <= k <= 14
    }


def test_stream_replays_appends_and_checkpoint_resumes(spark, tbl, tmp_path):
    nation = _kv(spark, 30)
    write_delta(nation.filter("k < 10"), tbl, mode="overwrite")  # v0
    write_delta(nation.filter("k >= 10 and k < 20"), tbl, mode="append")  # v1
    optimize_delta(spark, tbl, target_files=2)  # v2: must yield nothing

    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    stream = spark.readStream.format("delta_pylog").option("path", tbl).load()
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _rows(spark.read.parquet(sink))
    assert got == _rows(nation.filter("k < 20"))

    # new commit, SAME checkpoint: only the delta is appended — no
    # re-emit of the already-committed offsets (exactly-once resume)
    write_delta(nation.filter("k >= 20"), tbl, mode="append")  # v3
    q2 = (
        spark.readStream.format("delta_pylog").option("path", tbl).load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert _rows(spark.read.parquet(sink)) == _rows(nation)


def test_stream_append_mode_rejects_dml(spark, tbl, tmp_path):
    write_delta(_kv(spark, 20), tbl, mode="overwrite")
    delete_delta(spark, tbl, "k", 0, 5)
    q = (
        spark.readStream.format("delta_pylog").option("path", tbl).load()
        .writeStream.format("memory")
        .queryName("dpys_dml")
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="mode=cdf"):
        q.awaitTermination(120)


def test_cdf_stream_folds_dml_history(spark, tbl, tmp_path):
    df = _kv(spark).repartitionByRange(4, "k")
    write_delta(
        df.filter("k < 30"), tbl, mode="overwrite",
        configuration={"delta.enableChangeDataFeed": "true"},
    )  # v0
    write_delta(df.filter("k >= 30"), tbl, mode="append")  # v1
    delete_delta(spark, tbl, "k", 5, 9)  # v2
    update_delta(spark, tbl, "k", 20, 24, {"v": "v * 2"})  # v3

    stream = (
        spark.readStream.format("delta_pylog")
        .option("path", tbl)
        .option("mode", "cdf")
        .load()
    )
    assert stream.columns == ["k", "v", "_change_type", "_commit_version"]
    q = (
        stream.writeStream.format("memory")
        .queryName("dpys_cdf")
        .option("checkpointLocation", str(tmp_path / "c"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    changes = spark.table("dpys_cdf")
    counts = dict(
        (r["_change_type"], r["n"])
        for r in changes.groupBy("_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert counts == {
        "insert": 40,
        "delete": 5,
        "update_preimage": 5,
        "update_postimage": 5,
    }
    # fold the streamed changes back into table state
    state: set[tuple] = set()
    for r in changes.collect():
        if r["_change_type"] in ("insert", "update_postimage"):
            state.add((r["k"], r["v"]))
        else:
            state.discard((r["k"], r["v"]))
    assert state == _rows(read_delta(spark, tbl))


def test_stream_admission_control_caps_commits_per_batch(spark, tbl):
    """maxcommitsperbatch bounds each micro-batch's offset range — the
    reader-level unit check drives the same latestOffset/partitions
    protocol the engine does."""
    from mergermetrics_lakehouse_pipeline_spark.sources.delta_pysource import (
        DeltaLogStreamReader,
        _table_schema,
    )

    df = _kv(spark, 40)
    for i in range(4):
        write_delta(
            df.filter(f"k % 4 = {i}"), tbl,
            mode="overwrite" if i == 0 else "append",
        )

    schema, _ = _table_schema(tbl)
    r = DeltaLogStreamReader(
        {"path": tbl, "maxcommitsperbatch": "1"}, schema
    )
    start = r.initialOffset()
    seen = []
    for _ in range(4):
        end = r.latestOffset()
        seen.append((int(start["version"]), int(end["version"])))
        parts = r.partitions(start, end)
        assert all(p.change != "empty" for p in parts)
        start = end
    # one commit per batch: offsets advance 0,1,2,3
    assert [e for _s, e in seen] == [0, 1, 2, 3]
    # caught up: next poll does not advance
    assert int(r.latestOffset()["version"]) == 3

    # unbounded reader takes everything in one range
    r2 = DeltaLogStreamReader({"path": tbl}, schema)
    assert int(r2.latestOffset()["version"]) == 3
