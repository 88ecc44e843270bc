"""Bloom-prefiltered joins: exactness for any sizing, no false negatives,
and plan hygiene (bitmap joins broadcast, probe side never explodes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.operators.bloomjoin import (
    bloom_bitmap,
    bloom_prefilter,
    bloom_semi_join,
)


@pytest.fixture(scope="module")
def sides(spark):
    probe = spark.range(0, 2000).select(
        (F.col("id") % 700).alias("k"), F.col("id").alias("payload")
    )
    build = spark.range(0, 300).select((F.col("id") * 3).alias("k"))
    return probe, build


def test_semi_join_exact_for_any_sizing(sides):
    probe, build = sides
    expected = sorted(
        r.payload for r in probe.join(build, "k", "left_semi").collect()
    )
    for n_bits in (64, 1024, 1 << 16):  # 64 bits => huge FP rate, still exact
        got = sorted(
            r.payload
            for r in bloom_semi_join(probe, build, "k", n_bits=n_bits).collect()
        )
        assert got == expected, f"n_bits={n_bits}"


def test_prefilter_has_no_false_negatives(sides):
    probe, build = sides
    bm = bloom_bitmap(build, "k", n_bits=256, n_hashes=4)
    kept = {r.k for r in bloom_prefilter(probe, "k", bm, n_bits=256, n_hashes=4).collect()}
    members = {r.k for r in probe.join(build, "k", "left_semi").collect()}
    assert members <= kept


def test_prefilter_drops_some_nonmembers(sides):
    """With adequate sizing the prefilter must actually prune (the whole
    point); 8 bits/key, k=3 gives ~3% FP."""
    probe, build = sides
    n_bits = 1 << 12
    bm = bloom_bitmap(build, "k", n_bits=n_bits)
    kept = bloom_prefilter(probe, "k", bm, n_bits=n_bits).count()
    members = probe.join(build, "k", "left_semi").count()
    total = probe.count()
    assert members <= kept < total


def test_null_keys_dropped(spark):
    probe = spark.createDataFrame([(None,), (1,), (2,)], "k int")
    build = spark.createDataFrame([(1,)], "k int")
    got = [r.k for r in bloom_semi_join(probe, build, "k").collect()]
    assert got == [1]


def test_string_keys(spark):
    probe = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    build = spark.createDataFrame([("b",), ("zz",)], "k string")
    got = sorted(r.k for r in bloom_semi_join(probe, build, "k", n_bits=128).collect())
    assert got == ["b"]


def test_bitmap_is_tiny(sides):
    _, build = sides
    n_bits = 1 << 12
    bm = bloom_bitmap(build, "k", n_bits=n_bits)
    assert bm.count() <= n_bits // 64


def test_sizing_validation(sides):
    _, build = sides
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_bitmap(build, "k", n_bits=100)


def test_bad_bitmap_rejected(spark, sides):
    probe, _ = sides
    junk = spark.createDataFrame([(1, 2)], "a int, b int")
    with pytest.raises(ValueError, match="bloom_bitmap"):
        bloom_prefilter(probe, "k", junk)


def test_plan_broadcasts_bitmap_and_keeps_probe_unexploded(sides):
    probe, build = sides
    plan = bloom_semi_join(probe, build, "k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Generate" not in plan  # no explode on the probe side
