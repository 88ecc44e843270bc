"""Products dimension pipeline (EP1 variant).

Reference semantics (2_products_data_processing.py): dedupe, typo repair,
variant extraction, sentinel for non-numeric ids, sha2 surrogate key,
division CASE over categories.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import (
    dedupe_by_keys,
    extract_variant,
    normalize_text,
    surrogate_key,
    valid_numeric_or_sentinel,
)

#: category -> division CASE (parity: 2_products_data_processing.py:151-163).
DEFAULT_DIVISION_MAP: dict[str, str] = {
    "Energy Bars": "Nutrition",
    "Protein Bars": "Nutrition",
    "Protein Shakes": "Beverages",
    "Hydration Drinks": "Beverages",
    "Supplements": "Wellness",
    "Snacks": "Snacking",
}


def clean_products(
    raw: DataFrame, *, division_map: Mapping[str, str] | None = None
) -> DataFrame:
    """Silver: raw child products -> cleaned dimension rows.

    Steps (reference sites):
    - dedupe on product_id                                  (:91)
    - initcap category; '(?i)Protien'->'Protein' typo fix   (:108-136)
    - variant from parenthesized suffix of the name         (:167-170)
    - non-numeric product_id -> sentinel 999999             (:184-190)
    - product_code = sha2(product_name, 256)                (:177-182)
    - division CASE over category                           (:151-163)
    """
    division_map = dict(division_map or DEFAULT_DIVISION_MAP)

    df = dedupe_by_keys(raw, ["product_id"], order_by=["product_id"])
    df = df.withColumn(
        "product_name",
        F.regexp_replace(normalize_text("product_name", title_case=False), r"(?i)Protien", "Protein"),
    )
    df = df.withColumn(
        "category",
        F.regexp_replace(normalize_text("category"), r"(?i)Protien", "Protein"),
    )

    division = F.lit(None).cast("string")
    for cat, div in division_map.items():
        division = F.when(F.col("category") == cat, div).otherwise(division)

    return (
        df.withColumn("variant", extract_variant("product_name"))
        .withColumn("product_id", valid_numeric_or_sentinel("product_id"))
        .withColumn("product_code", surrogate_key("product_name"))
        .withColumn("division", F.coalesce(division, F.lit("Other")))
    )


def products_gold(silver: DataFrame) -> DataFrame:
    """Gold: parent dim_products schema (FIXTURES.md A5):
    product_code, division, category, product, variant."""
    return silver.select(
        "product_code",
        "division",
        "category",
        F.col("product_name").alias("product"),
        "variant",
    )
