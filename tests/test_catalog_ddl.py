"""Catalog/DDL surface (SURVEY §2.1 S3-S12, S15): write modes, existence
gate, views, COPY INTO equivalent, medallion bootstrap."""

from __future__ import annotations

from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.session import (
    BRONZE,
    GOLD,
    SILVER,
    ensure_medallion_schemas,
)
from mergermetrics_lakehouse_pipeline_spark.sources.catalog import (
    copy_into,
    create_view,
    drop_table,
    table_exists,
    write_table,
)


def test_medallion_schemas(spark):
    ensure_medallion_schemas(spark)
    dbs = {r.namespace for r in spark.sql("SHOW DATABASES").collect()}
    assert {BRONZE, SILVER, GOLD} <= dbs


def test_write_modes_and_existence_gate(spark):
    drop_table(spark, "t_ddl_x")
    assert not table_exists(spark, "t_ddl_x")
    df = spark.range(5).withColumnRenamed("id", "k")
    write_table(df, "t_ddl_x")  # S3 overwrite
    assert table_exists(spark, "t_ddl_x")  # S15 gate
    write_table(df, "t_ddl_x", mode="append")  # S4 append accumulates
    assert spark.table("t_ddl_x").count() == 10
    write_table(df, "t_ddl_x")  # overwrite resets
    assert spark.table("t_ddl_x").count() == 5
    # S5 schema evolution on append (mergeSchema no-ops on parquet, but the
    # widened frame must land)
    widened = df.withColumn("extra", F.lit("x"))
    write_table(widened, "t_ddl_x", mode="overwrite", merge_schema=True)
    assert "extra" in spark.table("t_ddl_x").columns
    drop_table(spark, "t_ddl_x")  # S10
    assert not table_exists(spark, "t_ddl_x")


def test_create_view_over_table(spark):
    write_table(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double"), "t_ddl_base"
    )
    create_view(spark, "v_ddl", "SELECT k, v * 2 AS v2 FROM t_ddl_base")  # S9
    got = {r.k: r.v2 for r in spark.table("v_ddl").collect()}
    assert got == {1: 20.0, 2: 40.0}
    # CREATE OR REPLACE redefines in place
    create_view(spark, "v_ddl", "SELECT k FROM t_ddl_base WHERE k = 1")
    assert spark.table("v_ddl").columns == ["k"]
    spark.sql("DROP VIEW v_ddl")
    drop_table(spark, "t_ddl_base")


def test_copy_into_equivalent(spark, tmp_path):
    src = tmp_path / "landing"
    src.mkdir()
    (src / "a.csv").write_text("date,qty\n2025-01-01,3\n2025-01-02,4\n")
    drop_table(spark, "t_ddl_copy")
    write_table(
        spark.createDataFrame([], "date date, qty bigint"), "t_ddl_copy"
    )
    copy_into(  # S12: read -> cast/select -> append
        spark,
        "t_ddl_copy",
        str(src),
        ["CAST(date AS DATE) AS date", "CAST(qty AS BIGINT) AS qty"],
    )
    out = spark.table("t_ddl_copy")
    assert out.count() == 2
    assert dict(out.dtypes) == {"date": "date", "qty": "bigint"}
    drop_table(spark, "t_ddl_copy")


def test_compact_table_unpartitioned(spark):
    from mergermetrics_lakehouse_pipeline_spark.sources.catalog import (
        compact_table,
        table_file_stats,
    )

    drop_table(spark, "t_compact")
    # fragment: 40 tiny files for ~4k rows
    spark.range(4000).withColumn("v", F.col("id") * 2).repartition(40).write.format(
        "parquet"
    ).saveAsTable("t_compact")
    before = table_file_stats(spark, "t_compact")
    assert before["n_files"] == 40
    stats = compact_table(spark, "t_compact", target_file_bytes=64 * 1024 * 1024)
    assert stats["after"]["n_files"] < before["n_files"]
    assert spark.table("t_compact").count() == 4000
    assert spark.table("t_compact").agg(F.sum("v")).collect()[0][0] == 2 * sum(
        range(4000)
    )
    drop_table(spark, "t_compact")


def test_compact_table_partitioned_preserves_layout(spark):
    from mergermetrics_lakehouse_pipeline_spark.sources.catalog import (
        compact_table,
        table_file_stats,
    )

    drop_table(spark, "t_compact_p")
    df = (
        spark.range(3000)
        .withColumn("v", F.col("id") % 7)
        .withColumn("pt", (F.col("id") % 3).cast("string"))
    )
    write_table(df.repartition(30), "t_compact_p", partition_by=["pt"])
    before = table_file_stats(spark, "t_compact_p")
    assert before["n_files"] > 3  # fragmented within partitions
    compact_table(spark, "t_compact_p", partition_by=["pt"])
    after = table_file_stats(spark, "t_compact_p")
    assert after["n_files"] == 3  # one file per partition value
    # partition pruning still works after the rewrite
    pruned = spark.table("t_compact_p").filter(F.col("pt") == "1")
    assert pruned.count() == 1000
    explained = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in explained
    assert spark.table("t_compact_p").count() == 3000
    drop_table(spark, "t_compact_p")


def test_versioned_table_time_travel(spark, tmp_path):
    """write_version commits immutable snapshots; read_version time
    travels; the latest pointer only moves after a full write."""
    import pytest as _pt

    from mergermetrics_lakehouse_pipeline_spark.sources.catalog import (
        latest_version,
        read_version,
        write_version,
    )

    root = str(tmp_path / "versions")
    with _pt.raises(ValueError):
        read_version(spark, root)

    v1_df = spark.range(5).withColumnRenamed("id", "k")
    assert write_version(v1_df, root) == 1
    v2_df = spark.range(3).withColumnRenamed("id", "k")
    assert write_version(v2_df, root) == 2
    assert latest_version(root) == 2

    assert read_version(spark, root, 1).count() == 5  # history intact
    assert read_version(spark, root).count() == 3     # latest default
    assert read_version(spark, root, 2).count() == 3


def test_vacuum_versions(spark, tmp_path):
    """vacuum_versions removes pre-retention snapshots and crashed
    writers' uncommitted dirs; the latest survives any keep_last."""
    import os

    import pytest as _pt

    from mergermetrics_lakehouse_pipeline_spark.sources.catalog import (
        latest_version,
        read_version,
        vacuum_versions,
        write_version,
    )

    root = str(tmp_path / "versions")
    assert vacuum_versions(root) == []  # no table yet: no-op
    for n in (5, 4, 3):
        write_version(spark.range(n).withColumnRenamed("id", "k"), root)
    # a crashed writer: directory exists, pointer never moved to it
    spark.range(9).write.parquet(f"{root}/v=9")

    with _pt.raises(ValueError):
        vacuum_versions(root, keep_last=0)
    # within the in-flight grace window the uncommitted v=9 is treated as
    # a possibly-live writer and spared...
    assert vacuum_versions(root, keep_last=2) == [1]
    assert os.path.isdir(f"{root}/v=9")
    # ...past the grace window it is a crashed writer's leftover
    assert vacuum_versions(root, keep_last=2, in_flight_grace_s=0.0) == [9]
    assert read_version(spark, root, 2).count() == 4   # retained history
    assert read_version(spark, root).count() == 3      # latest untouched
    assert latest_version(root) == 3
    with _pt.raises(Exception):
        read_version(spark, root, 1).count()           # vacuumed away
    assert vacuum_versions(root, keep_last=1) == [2]
    assert sorted(e for e in os.listdir(root) if e.startswith("v=")) == ["v=3"]


def test_staged_overwrite_keeps_staging_on_target_failure(spark, monkeypatch):
    """Durability contract: if the final target overwrite fails, the
    staging table (the only surviving copy of the new content) must be
    KEPT and named in the raised error — the property the streaming
    bitmap fold's recovery story depends on. Failure is injected by
    failing exactly the target-table write."""
    import pytest
    from pyspark.sql.readwriter import DataFrameWriter

    from mergermetrics_lakehouse_pipeline_spark.sources.catalog import (
        staged_overwrite,
    )

    orig = DataFrameWriter.saveAsTable

    def flaky(self, name, *a, **kw):
        if name == "so_victim":
            raise OSError("injected executor-loss during target overwrite")
        return orig(self, name, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "saveAsTable", flaky)
    content = spark.range(5).selectExpr("id AS x")
    with pytest.raises(RuntimeError, match="so_victim__stage_") as exc:
        staged_overwrite(spark, "so_victim", content)
    # the staging table named in the error still exists with the data
    stage_name = str(exc.value).split("staging table '")[1].split("'")[0]
    assert spark.catalog.tableExists(stage_name)
    assert spark.table(stage_name).count() == 5
    spark.sql(f"DROP TABLE IF EXISTS {stage_name}")
    spark.sql("DROP TABLE IF EXISTS so_victim")


def test_staged_overwrite_success_drops_staging(spark):
    """Happy path: staging table is cleaned up after a successful
    overwrite and the target holds the new content."""
    from mergermetrics_lakehouse_pipeline_spark.sources.catalog import (
        staged_overwrite,
    )

    spark.sql("DROP TABLE IF EXISTS so_ok")
    spark.range(3).selectExpr("id AS x").write.saveAsTable("so_ok")
    staged_overwrite(spark, "so_ok", spark.range(7).selectExpr("id AS x"))
    assert spark.table("so_ok").count() == 7
    leftovers = [
        t.name for t in spark.catalog.listTables() if t.name.startswith("so_ok__stage_")
    ]
    assert leftovers == []
    spark.sql("DROP TABLE IF EXISTS so_ok")
