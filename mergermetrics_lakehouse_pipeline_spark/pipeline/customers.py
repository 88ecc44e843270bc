"""Customers dimension pipeline (EP1).

Reference semantics (consolidated_pipeline/2_dimension_data_processing/
1_customer_data_processing.py): bronze raw CSV -> silver cleaned ->
gold star-schema dim -> MERGE into the parent dim on customer_code.

Cleaning steps replicated (WHAT, not HOW — all engine expressions):
- exact-duplicate removal on customer_id           (:77)
- trim + initcap of padded/mis-cased names         (:88-93,151-157)
- city spelling standardization via literal map    (:104-137)
- per-id null-city repair from a rule table        (:181-210)
- id cast to string for join-key stability         (:215)
- customer = initcap(name)-city|Unknown (concat_ws):221-228
- constant platform/channel, market CASE on city   (:229-240)
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import (
    dedupe_by_keys,
    normalize_text,
    standardize_values,
)

#: Observed dirty->canonical city spellings (FIXTURES.md A1).
DEFAULT_CITY_MAP: dict[str, str] = {
    "Austn": "Austin",
    "Austinn": "Austin",
    "Chciago": "Chicago",
    "Chicgo": "Chicago",
    "Chicagoo": "Chicago",
    "Newyork": "New York",
    "New yok": "New York",
}

#: City -> market region (parity: CASE chain :233-240).
DEFAULT_MARKET_MAP: dict[str, str] = {
    "New York": "Northeast",
    "Boston": "Northeast",
    "Chicago": "Midwest",
    "Austin": "South",
    "Dallas": "South",
    "Seattle": "West Coast",
    "San Francisco": "West Coast",
}


def clean_customers(
    raw: DataFrame,
    *,
    city_map: Mapping[str, str] | None = None,
    market_map: Mapping[str, str] | None = None,
    city_fixes: DataFrame | None = None,
    platform: str = "In-Store",
    channel: str = "Retail",
    strict_city_map: bool = False,
) -> DataFrame:
    """Silver: raw child customers -> cleaned, enriched dimension rows.

    ``city_fixes`` is the per-customer-id rule table
    (``customer_id``, ``fixed_city``) the reference builds from a Python
    dict (S13, :181-191); joined left + coalesced, exactly once.

    ``strict_city_map=True`` replays the reference's exact allowed-set
    semantics (:118-136): a city outside the mapping keys becomes NULL
    (so include identity entries like ``{"Austin": "Austin"}``); the
    default keeps unmapped spellings as-is. ``platform`` / ``channel``
    are the static parent-alignment constants (:231-232 uses
    "PowerBite Nutrition" / "Acquisition").
    """
    city_map = dict(city_map or DEFAULT_CITY_MAP)
    market_map = dict(market_map or DEFAULT_MARKET_MAP)

    df = dedupe_by_keys(raw, ["customer_id"], order_by=["customer_id"])
    df = df.withColumn("customer_name", normalize_text("customer_name"))
    df = df.withColumn(
        "city",
        standardize_values("city", city_map, keep_unmapped=not strict_city_map),
    )

    if city_fixes is not None:
        df = (
            df.join(F.broadcast(city_fixes), "customer_id", "left")
            .withColumn("city", F.coalesce(F.col("city"), F.col("fixed_city")))
            .drop("fixed_city")
        )

    market = F.lit(None).cast("string")
    for city, mkt in market_map.items():
        market = F.when(F.col("city") == city, mkt).otherwise(market)

    return (
        df.withColumn("customer_id", F.col("customer_id").cast("string"))
        .withColumn(
            "customer",
            F.concat_ws(
                "-", F.col("customer_name"), F.coalesce(F.col("city"), F.lit("Unknown"))
            ),
        )
        .withColumn("platform", F.lit(platform))
        .withColumn("channel", F.lit(channel))
        .withColumn("market", F.coalesce(market, F.lit("Unknown")))
    )


def customers_gold(silver: DataFrame) -> DataFrame:
    """Gold: parent dim_customers schema (FIXTURES.md A5):
    customer_code, customer, market, platform, channel."""
    return silver.select(
        F.col("customer_id").alias("customer_code"),
        "customer",
        "market",
        "platform",
        "channel",
    )


def build_city_fixes(
    spark: SparkSession, fixes: Mapping[int, str]
) -> DataFrame:
    """S13: literal rule table from a dict (parity: :181-191)."""
    return spark.createDataFrame(
        [(k, v) for k, v in fixes.items()], ["customer_id", "fixed_city"]
    )
