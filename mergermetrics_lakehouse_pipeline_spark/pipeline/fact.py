"""Fact pipeline: full load + incremental load (EP2, SURVEY §2.9).

Reference semantics (3_fact_data_processing/1_full_load_fact.py and
2_incremental_load_fact.py):

full load:  clean daily orders -> join products for product_code ->
            daily gold fact -> monthly rollup -> parent fact_orders
incremental: staged batch -> clean -> insert-only MERGE into the daily
            fact -> affected-month recompute -> upsert months into the
            monthly fact

Scale design: the daily fact is the system of record at daily grain; the
monthly fact is a maintained aggregate. Both should be written partitioned
by month (sources.catalog.write_table(partition_by=["month_start"])) so
the recompute prunes physically — the engine's upgrade over the
reference's unpartitioned tables (SURVEY §4 partition-pruning row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import (
    dedupe_by_keys,
    parse_date_multi,
    strip_weekday_prefix,
    valid_numeric_or_sentinel,
)
from ..operators.incremental import recompute_affected_periods
from ..operators.merge import merge_dataframes

#: Ordered order-date formats (parity: 1_full_load_fact.py:111-125).
#: Single-letter day/month patterns (java.time: ``d``/``M`` accept 1-2
#: digits, ``dd``/``MM`` require exactly 2) so single-digit days parse
#: too — the reference's exact-width formats silently NULL every
#: "Friday, January 2, 2026" row in its own 2026-01 incremental files
#: (verified against incremental_load/orders/orders_2026_01_0*.csv; see
#: tests/test_golden_replay.py), an engine robustness fix over the
#: reference, same spirit as the pricing tie-breaker (SURVEY §7).
ORDER_DATE_FORMATS: list[str] = [
    "MMMM d, yyyy",
    "d-M-yyyy",
    "d/M/yyyy",
    "yyyy/M/d",
    "yyyy-M-d",
]

DAILY_KEYS = ["date", "order_id", "product_code", "customer_code"]
MONTHLY_KEYS = ["date", "product_code", "customer_code"]


def clean_orders(raw: DataFrame) -> DataFrame:
    """Silver: tolerant clean of raw daily order rows.

    - drop rows with NULL quantity            (1_full_load_fact.py:98)
    - junk customer ids -> sentinel 999999    (:102-107)
    - weekday-prefix strip + 4-format parse   (:111-125)
    - qty cast double (schema-drift guard, 2_incremental_load_fact.py:62-63)
    - full dedupe on the 5-column line key    (:128)
    """
    df = (
        raw.withColumn("order_qty", F.col("order_qty").cast("double"))
        .filter(F.col("order_qty").isNotNull())
        .withColumn("customer_id", valid_numeric_or_sentinel("customer_id"))
        .withColumn("product_id", F.col("product_id").cast("string"))
        .withColumn(
            "date",
            parse_date_multi(
                strip_weekday_prefix("order_placement_date"), ORDER_DATE_FORMATS
            ),
        )
        .filter(F.col("date").isNotNull())
    )
    return dedupe_by_keys(
        df,
        ["order_id", "date", "customer_id", "product_id"],
        order_by=[F.col("order_qty").desc()],
    )


def daily_fact(clean: DataFrame, products_silver: DataFrame) -> DataFrame:
    """Gold daily grain: (date, order_id, product_code, customer_code,
    sold_quantity). product_code via inner join on product_id (parity:
    1_full_load_fact.py:148-149); customer_code is the cleaned child
    customer_id (string; parent codes are aligned upstream)."""
    return (
        clean.join(
            F.broadcast(products_silver.select("product_id", "product_code")),
            "product_id",
            "inner",
        )
        .select(
            "date",
            "order_id",
            "product_code",
            F.col("customer_id").alias("customer_code"),
            F.col("order_qty").alias("sold_quantity"),
        )
    )


def monthly_rollup(daily: DataFrame) -> DataFrame:
    """Daily -> monthly grain (parity: 1_full_load_fact.py:214-227):
    date = month start, sold_quantity = SUM cast bigint."""
    return (
        daily.groupBy(
            F.trunc("date", "MM").alias("date"), "product_code", "customer_code"
        )
        .agg(F.sum("sold_quantity").cast("bigint").alias("sold_quantity"))
    )


def incremental_fact_cycle_partitioned(
    spark,
    *,
    daily_table: str,
    monthly_table: str,
    batch_clean_daily: DataFrame,
) -> list:
    """One incremental cycle against MONTH-PARTITIONED stored tables —
    the physical counterpart of ``incremental_fact_load``.

    Both tables must be partitioned by ``month_start`` (daily) / ``date``
    (monthly), e.g. via ``sources.catalog.write_table(partition_by=...)``.
    The cycle's read AND write cost is proportional to the months the
    batch touches, never to table size:

    1. collect the batch's distinct months (tiny, driver-side literal),
    2. read ONLY those partitions of the daily fact (static partition
       pruning — `.isin(months)` on the partition column reaches the scan
       as a PartitionFilter),
    3. insert-only MERGE the batch in, stage the result, dynamically
       overwrite just those daily partitions,
    4. re-aggregate those months from the post-write daily table and
       dynamically overwrite the matching monthly partitions.

    Returns the affected month list (for observability/tests).
    """
    from ..sources.catalog import drop_table, overwrite_partitions

    batch = batch_clean_daily.withColumn("month_start", F.trunc("date", "MM"))
    months = [r[0] for r in batch.select("month_start").distinct().collect()]

    daily_cols = spark.table(daily_table).columns
    affected_daily = spark.table(daily_table).filter(
        F.col("month_start").isin(months)
    )
    merged_daily = merge_dataframes(
        affected_daily, batch.select(*daily_cols), DAILY_KEYS, insert_only=True
    ).select(*daily_cols)

    # stage before overwriting partitions we just read (no read-own-truncation)
    staging = f"{daily_table}__incr_staging"
    drop_table(spark, staging)
    merged_daily.write.format("parquet").saveAsTable(staging)
    overwrite_partitions(spark.table(staging).select(*daily_cols), daily_table)
    drop_table(spark, staging)
    spark.catalog.refreshTable(daily_table)

    monthly_cols = spark.table(monthly_table).columns
    recomputed = monthly_rollup(
        spark.table(daily_table).filter(F.col("month_start").isin(months))
    )
    overwrite_partitions(recomputed.select(*monthly_cols), monthly_table)
    spark.catalog.refreshTable(monthly_table)
    return months


def incremental_fact_load(
    daily_store: DataFrame,
    monthly_store: DataFrame,
    batch_clean_daily: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """One incremental cycle; returns (new_daily_store, new_monthly_store).

    1. insert-only MERGE batch into the daily fact (idempotent on the
       4-col key; parity: 1_full_load_fact.py:182-186 /
       2_incremental_load_fact.py:218-225)
    2. recompute ONLY the months the batch touches, from the full daily
       store (parity: :246-279)
    3. upsert recomputed month rows into the monthly fact (:290-291)

    Re-running with the same batch is a no-op (idempotency invariant,
    FIXTURES.md A6).
    """
    new_daily = merge_dataframes(
        daily_store, batch_clean_daily, DAILY_KEYS, insert_only=True
    )
    recomputed = recompute_affected_periods(
        new_daily,
        batch_clean_daily,
        lambda df: F.trunc(df["date"], "MM"),
        monthly_rollup,
    )
    new_monthly = merge_dataframes(
        monthly_store, recomputed, MONTHLY_KEYS, check_unique_source=False
    )
    return new_daily, new_monthly
