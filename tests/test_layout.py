"""Z-order layout: measured per-file min/max narrowing in BOTH
dimensions — the property single-column range layout cannot provide."""

from __future__ import annotations

from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.operators.layout import zorder_write

SF_DIR = "/root/testdata/sf0.001"


def _avg_file_range_frac(spark, path: str, col: str) -> float:
    """Mean per-file (max-min) extent of ``col``, as a fraction of the
    global extent — the data-skipping figure of merit (what parquet
    footer pruning sees)."""
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    per_file = df.groupBy("_f").agg(
        (F.max(col) - F.min(col)).cast("double").alias("ext")
    )
    g = df.agg((F.max(col) - F.min(col)).cast("double").alias("gext")).collect()[0]
    mean_ext = per_file.agg(F.avg("ext")).collect()[0][0]
    return mean_ext / g.gext


def test_zorder_narrows_both_dimensions(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )

    naive = str(tmp_path / "naive")
    li.repartitionByRange(8, "l_partkey").write.mode("overwrite").parquet(naive)

    zpath = str(tmp_path / "zorder")
    zorder_write(li, zpath, cols=("l_partkey", "l_suppkey"), n_files=8)

    # row preservation
    assert spark.read.parquet(zpath).count() == li.count()

    # single-column layout: tight on partkey, blind on suppkey
    assert _avg_file_range_frac(spark, naive, "l_partkey") < 0.30
    assert _avg_file_range_frac(spark, naive, "l_suppkey") > 0.85

    # z-order: bounded extent in BOTH dimensions
    zx = _avg_file_range_frac(spark, zpath, "l_partkey")
    zy = _avg_file_range_frac(spark, zpath, "l_suppkey")
    assert zx < 0.75 and zy < 0.75, (zx, zy)
