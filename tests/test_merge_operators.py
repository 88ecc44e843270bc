"""Unit tests for the MERGE fallback (Delta-parity semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.operators.merge import merge_dataframes


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (None, "n", 0.0)], ["k", "v", "x"]
    )


def test_update_all_insert_all(spark, target):
    source = spark.createDataFrame([(2, "B", 99.0), (3, "c", 30.0)], ["k", "v", "x"])
    out = {r.k: r for r in merge_dataframes(target, source, ["k"]).collect()}
    assert out[1].v == "a"  # unmatched target passes through
    assert out[2].v == "B" and out[2].x == 99.0  # matched takes source
    assert out[3].v == "c"  # unmatched source inserted
    assert out[None].v == "n"  # NULL key target row survives (eqNullSafe)
    assert len(out) == 4


def test_null_key_matches_null_key(spark, target):
    source = spark.createDataFrame([(None, "N", 5.0)], "k bigint, v string, x double")
    out = {r.k: r for r in merge_dataframes(target, source, ["k"]).collect()}
    assert out[None].v == "N"  # eqNullSafe: NULL source key updates NULL target key
    assert len(out) == 3


def test_insert_only_never_updates(spark, target):
    source = spark.createDataFrame([(2, "B", 99.0), (3, "c", 30.0)], ["k", "v", "x"])
    out = {r.k: r for r in merge_dataframes(target, source, ["k"], insert_only=True).collect()}
    assert out[2].v == "b"  # existing row untouched
    assert out[3].v == "c"
    assert len(out) == 4


def test_duplicate_source_keys_rejected(spark, target):
    source = spark.createDataFrame([(2, "B", 1.0), (2, "C", 2.0)], ["k", "v", "x"])
    with pytest.raises(ValueError, match="multiple rows per key"):
        merge_dataframes(target, source, ["k"])


def test_mapped_update_and_insert(spark, target):
    source = spark.createDataFrame([(2, "ignored", 99.0), (3, "ignored", 30.0)], ["k", "v", "x"])
    out = {
        r.k: r
        for r in merge_dataframes(
            target,
            source,
            ["k"],
            update_set={"x": F.col("s.x")},
            insert_values={"k": F.col("s.k"), "v": F.lit("new"), "x": F.col("s.x")},
        ).collect()
    }
    assert out[2].v == "b" and out[2].x == 99.0  # only x updated
    assert out[3].v == "new" and out[3].x == 30.0  # insert map applied


def test_multi_key_merge(spark):
    target = spark.createDataFrame([(1, "2024", 10.0), (1, "2025", 11.0)], ["k", "y", "p"])
    source = spark.createDataFrame([(1, "2025", 99.0), (2, "2025", 5.0)], ["k", "y", "p"])
    out = {(r.k, r.y): r.p for r in merge_dataframes(target, source, ["k", "y"]).collect()}
    assert out[(1, "2024")] == 10.0 and out[(1, "2025")] == 99.0 and out[(2, "2025")] == 5.0
