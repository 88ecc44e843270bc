"""Physically-partitioned incremental cycle: work bounded by affected
months, untouched partitions' files never rewritten, idempotent replay."""

from __future__ import annotations

import datetime as dt
import os
import pathlib

from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.pipeline.fact import (
    incremental_fact_cycle_partitioned,
    monthly_rollup,
)
from mergermetrics_lakehouse_pipeline_spark.sources.catalog import write_table

DAILY, MONTHLY = "t_pinc_daily", "t_pinc_monthly"


def _daily_rows(spark):
    rows = []
    for m, day_count in ((1, 5), (2, 5), (3, 5)):
        for d in range(1, day_count + 1):
            rows.append(
                (dt.date(2025, m, d), f"o{m}{d}", f"P{d % 2}", f"C{d % 3}", float(d))
            )
    return spark.createDataFrame(
        rows,
        "date date, order_id string, product_code string, "
        "customer_code string, sold_quantity double",
    )


def _table_files(spark, table: str) -> dict[str, tuple[int, float]]:
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
        .filter(F.col("col_name") == "Location")
        .first()[1]
    )
    root = pathlib.Path(loc.removeprefix("file:"))
    return {
        str(p.relative_to(root)): (p.stat().st_size, p.stat().st_mtime)
        for p in root.rglob("*.parquet")
    }


def _setup(spark):
    for t in (DAILY, MONTHLY):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    daily = _daily_rows(spark).withColumn("month_start", F.trunc("date", "MM"))
    write_table(daily, DAILY, partition_by=["month_start"])
    write_table(
        monthly_rollup(daily.drop("month_start")), MONTHLY, partition_by=["date"]
    )


def test_partitioned_cycle(spark):
    _setup(spark)
    before = _table_files(spark, DAILY)

    batch = spark.createDataFrame(
        [
            (dt.date(2025, 2, 20), "oNEW", "P1", "C1", 42.0),   # new row, month 2
            (dt.date(2025, 2, 1), "o21", "P1", "C1", 999.0),     # dup key -> ignored
        ],
        "date date, order_id string, product_code string, "
        "customer_code string, sold_quantity double",
    )
    months = incremental_fact_cycle_partitioned(
        spark, daily_table=DAILY, monthly_table=MONTHLY, batch_clean_daily=batch
    )
    assert months == [dt.date(2025, 2, 1)]

    after = _table_files(spark, DAILY)
    untouched_before = {k: v for k, v in before.items() if "month_start=2025-02" not in k}
    untouched_after = {k: v for k, v in after.items() if "month_start=2025-02" not in k}
    assert untouched_before == untouched_after  # other months: same files, same mtimes

    daily = spark.table(DAILY)
    assert daily.count() == 16  # 15 original + 1 new; dup ignored (insert-only)
    assert (
        daily.filter((F.col("order_id") == "o21")).first().sold_quantity == 1.0
    )  # insert-only kept the original row

    monthly = spark.table(MONTHLY)
    feb = {
        (r.product_code, r.customer_code): r.sold_quantity
        for r in monthly.filter(F.col("date") == dt.date(2025, 2, 1)).collect()
    }
    expected = {
        (r.product_code, r.customer_code): r.sold_quantity
        for r in monthly_rollup(
            spark.table(DAILY).drop("month_start").filter(
                F.trunc("date", "MM") == dt.date(2025, 2, 1)
            )
        ).collect()
    }
    assert feb == expected


def test_partitioned_cycle_idempotent(spark):
    _setup(spark)
    batch = spark.createDataFrame(
        [(dt.date(2025, 3, 20), "oX", "P0", "C0", 7.0)],
        "date date, order_id string, product_code string, "
        "customer_code string, sold_quantity double",
    )
    for _ in range(2):
        incremental_fact_cycle_partitioned(
            spark, daily_table=DAILY, monthly_table=MONTHLY, batch_clean_daily=batch
        )
    assert spark.table(DAILY).count() == 16
    total = (
        spark.table(MONTHLY)
        .agg(F.sum("sold_quantity").alias("s"))
        .first()
        .s
    )
    # 3 months x sum(1..5)=15, plus the one new row's 7
    assert total == 3 * 15 + 7


def test_partition_pruning_in_plan(spark):
    _setup(spark)
    plan = (
        spark.table(DAILY)
        .filter(F.col("month_start").isin([dt.date(2025, 2, 1)]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    # the pruning filter actually reaches the scan (not a post-scan Filter)
    assert "month_start" in plan.split("PartitionFilters")[1][:200]
