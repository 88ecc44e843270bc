"""Collation semantics (round 12): ICU UTF8_LCASE equality classes,
deterministic canonical keys, keep-first dedup — and the unchanged
wire-format position (no collation metadata ever written; foreign
collated tables still refused loudly, pinned by the delta gate tests).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.functions import collations as cl


def test_lcase_groups_merge_case_variants(spark):
    df = spark.createDataFrame(
        [("Apple", 1), ("APPLE", 2), ("apple", 4), ("banana", 8)],
        ["s", "v"],
    )
    out = {
        r.canonical_key: (r.n, r.mass)
        for r in cl.collated_group(
            df, "s", "UTF8_LCASE",
            F.count("*").alias("n"), F.sum("v").alias("mass"),
        ).collect()
    }
    assert out == {"APPLE": (3, 7), "banana": (1, 8)}


def test_binary_collation_keeps_variants_apart(spark):
    df = spark.createDataFrame([("Apple", 1), ("APPLE", 2)], ["s", "v"])
    out = cl.collated_group(
        df, "s", "UTF8_BINARY", F.count("*").alias("n")
    ).collect()
    assert len(out) == 2


def test_lcase_is_icu_not_ascii(spark):
    """UTF8_LCASE must equate beyond ASCII (the reason the semantics
    ride Spark's ICU collation, not a lower() shim)."""
    df = spark.createDataFrame([("Ärger", 1), ("ärger", 2)], ["s", "v"])
    out = cl.collated_group(
        df, "s", "UTF8_LCASE", F.count("*").alias("n")
    ).collect()
    assert len(out) == 1 and out[0].n == 2


def test_dedup_first_is_deterministic(spark):
    df = spark.createDataFrame(
        [("Apple", 3), ("APPLE", 1), ("apple", 2)], ["s", "k"]
    )
    out = cl.collated_dedup_first(df, "s", ["k"], "UTF8_LCASE").collect()
    assert len(out) == 1
    assert (out[0].s, out[0].k) == ("APPLE", 1)  # lowest k survives


def test_unsupported_collation_raises():
    with pytest.raises(ValueError, match="unsupported collation"):
        cl.collated("x", "UNICODE_CI_AI")


def test_collated_equality_predicate(spark):
    df = spark.createDataFrame([("Foo", "foo"), ("Foo", "bar")], ["a", "b"])
    got = df.select(
        cl.collated_equals("a", "b", "UTF8_LCASE").alias("eq")
    ).collect()
    assert [r.eq for r in got] == [True, False]
