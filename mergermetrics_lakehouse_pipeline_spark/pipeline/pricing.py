"""Gross-price dimension pipeline.

Reference semantics (3_pricing_data_processing.py): multi-format month
parsing with ordered precedence, price sanitization (abs, 0-fallback,
round 2), inner join to products for the surrogate key, then the
latest-non-zero-price-per-(product, year) window top-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.cleaning import parse_date_multi, sanitize_price

#: Ordered month formats — precedence resolves ambiguous d/M vs M/d values
#: (parity: 8-format coalesce, 3_pricing_data_processing.py:100-114).
PRICE_MONTH_FORMATS: list[str] = [
    "M/d/yy",
    "d/M/yy",
    "M/d/yyyy",
    "d/M/yyyy",
    "yyyy-MM-dd",
    "MM-dd-yyyy",
    "dd-MM-yyyy",
    "yyyy/MM/dd",
]


def clean_prices(raw: DataFrame) -> DataFrame:
    """Silver: parse month (tolerant), sanitize price, normalize id type."""
    return (
        raw.withColumn("month", parse_date_multi("month", PRICE_MONTH_FORMATS))
        .withColumn("gross_price", sanitize_price("gross_price"))
        .withColumn("product_id", F.col("product_id").cast("string"))
    )


def pricing_gold(silver: DataFrame, products_silver: DataFrame) -> DataFrame:
    """Gold: one price per (product_code, year) — the latest month's
    non-zero price wins; zero-only groups fall back to their latest zero.

    Window: partition (product_code, year), order (is_zero asc,
    month desc, gross_price desc) -> row_number = 1 (parity:
    3_pricing_data_processing.py:218-236 + the deterministic price
    tie-breaker the reference lacks, SURVEY §7 risk list).

    Unknown product_ids are dropped by the inner join (parity: :151-153).
    Output schema: product_code, price_usd double, year string (:247-250).
    """
    joined = silver.join(
        F.broadcast(products_silver.select("product_id", "product_code")),
        "product_id",
        "inner",
    ).withColumn("year", F.year("month"))

    w = Window.partitionBy("product_code", "year").orderBy(
        (F.col("gross_price") == 0).cast("int"),
        F.col("month").desc(),
        F.col("gross_price").desc(),
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "product_code",
            F.col("gross_price").alias("price_usd"),
            F.col("year").cast("string").alias("year"),
        )
    )
