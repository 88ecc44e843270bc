"""Unit tests for the cleaning-function library (SURVEY §5 strategy #5:
property-style checks — parsers never throw, sanitizers stay in-domain)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.functions.cleaning import (
    dedupe_by_keys,
    extract_variant,
    normalize_text,
    parse_date_multi,
    sanitize_price,
    standardize_values,
    strip_weekday_prefix,
    surrogate_key,
    valid_numeric_or_sentinel,
)

PRICE_MONTH_FORMATS = [
    "M/d/yy",
    "d/M/yy",
    "M/d/yyyy",
    "d/M/yyyy",
    "yyyy-MM-dd",
    "MM-dd-yyyy",
    "dd-MM-yyyy",
    "yyyy/MM/dd",
]


def one_col(spark, values, name="v"):
    return spark.createDataFrame([(v,) for v in values], [name])


def test_normalize_text(spark):
    df = one_col(spark, ["  SprintX nutrition ", "MacroBite superfoods", None])
    out = [r[0] for r in df.select(normalize_text("v")).collect()]
    assert out == ["Sprintx Nutrition", "Macrobite Superfoods", None]


def test_standardize_values_city_map(spark):
    mapping = {"Austn": "Austin", "Chciago": "Chicago", "Newyork": "New York"}
    df = one_col(spark, ["Austn", "Chciago", "Boston", None])
    out = [r[0] for r in df.select(standardize_values("v", mapping)).collect()]
    assert out == ["Austin", "Chicago", "Boston", None]
    strict = [
        r[0] for r in df.select(standardize_values("v", mapping, keep_unmapped=False)).collect()
    ]
    assert strict == ["Austin", "Chicago", None, None]


def test_valid_numeric_or_sentinel(spark):
    df = one_col(spark, ["123", "INVALID", "ABC987", "007", None])
    out = [r[0] for r in df.select(valid_numeric_or_sentinel("v")).collect()]
    assert out == ["123", "999999", "999999", "007", "999999"]


def test_parse_date_multi_observed_formats(spark):
    # every format observed in the reference fixtures parses; garbage -> NULL
    df = one_col(
        spark,
        ["7/1/25", "1/8/25", "2025-07-01", "01-12-2025", "garbage", "", None],
    )
    out = [r[0] for r in df.select(parse_date_multi("v", PRICE_MONTH_FORMATS)).collect()]
    assert out[0] is not None and out[1] is not None and out[2] is not None
    assert out[3] is not None
    assert out[4] is None and out[5] is None and out[6] is None


def test_parse_date_precedence_ambiguous(spark):
    # '7/1/25' must resolve via the FIRST format (M/d/yy -> July 1) — the
    # reference's coalesce-order semantics (3_pricing_data_processing.py:103-113)
    df = one_col(spark, ["7/1/25"])
    out = df.select(parse_date_multi("v", PRICE_MONTH_FORMATS).alias("d")).collect()[0][0]
    assert (out.month, out.day) == (7, 1)


def test_strip_weekday_prefix_and_parse(spark):
    df = one_col(spark, ["Monday, December 01, 2025", "01-12-2025", "01/12/2025"])
    parsed = df.select(
        parse_date_multi(
            strip_weekday_prefix("v"),
            ["MMMM dd, yyyy", "dd-MM-yyyy", "dd/MM/yyyy"],
        ).alias("d")
    ).collect()
    assert all(r[0] is not None for r in parsed)
    assert all((r[0].year, r[0].month, r[0].day) == (2025, 12, 1) for r in parsed)


def test_sanitize_price(spark):
    df = one_col(spark, ["-8.4", "unknown", "not_available", "12.345", "3", None])
    out = [r[0] for r in df.select(sanitize_price("v")).collect()]
    assert out == [8.4, 0.0, 0.0, 12.35, 3.0, 0.0]
    assert all(v >= 0 for v in out)


def test_surrogate_key_deterministic(spark):
    df = one_col(spark, ["Protein Bar (60g)"])
    a = df.select(surrogate_key("v").alias("k")).collect()[0][0]
    b = df.select(surrogate_key("v").alias("k")).collect()[0][0]
    assert a == b and len(a) == 64


def test_extract_variant(spark):
    df = one_col(spark, ["Protein Bar (60g)", "Shake Mix", None])
    out = [r[0] for r in df.select(extract_variant("v")).collect()]
    assert out == ["60g", "", None]


def test_dedupe_by_keys_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "b", 2), (1, "a", 1), (2, "c", 9)], ["k", "v", "ord"]
    )
    out = dedupe_by_keys(df, ["k"], order_by=["ord"]).orderBy("k").collect()
    assert [(r.k, r.v) for r in out] == [(1, "a"), (2, "c")]
