"""Unit semantics for the quality-gate and snapshot-diff operators:
NULL predicates count as violations, uniqueness folds into one pass,
diff classifies null-safe and carries pre/postimages correctly."""

from __future__ import annotations

from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.operators.cdc import snapshot_diff
from mergermetrics_lakehouse_pipeline_spark.operators.quality import (
    Expectation,
    check_expectations,
    fk_violations,
)


def test_expectations_null_predicate_is_violation(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, -5)], "id long, v int"
    )
    out = {
        r.rule: (r.n_violations, r.n_checked)
        for r in check_expectations(
            df, [Expectation("v_positive", F.col("v") > 0)]
        ).collect()
    }
    # -5 fails, NULL is unknown -> violation too
    assert out == {"v_positive": (2, 3)}


def test_expectations_uniqueness_same_pass(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "k long, s string"
    )
    rows = check_expectations(
        df,
        [Expectation("s_nonempty", F.length("s") > 0)],
        unique_keys=[["k", "s"]],
    ).collect()
    got = {r.rule: r.n_violations for r in rows}
    assert got == {"s_nonempty": 0, "unique_k_s": 1}


def test_fk_violations_counts_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    row = fk_violations(child, parent, {"fk": "pk"}, rule="fk").collect()[0]
    assert (row.rule, row.n_violations, row.n_checked) == ("fk", 1, 3)


def test_snapshot_diff_classification_and_images(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, None), (5, "e")], "k long, v string"
    )
    rows = {
        r.k: (r.change_type, r.v)
        for r in snapshot_diff(old, new, keys=["k"]).collect()
    }
    # 1 unchanged (absent), 3 null==null unchanged (null-safe compare)
    assert rows == {
        2: ("update", "B"),   # postimage
        4: ("delete", "d"),   # preimage
        5: ("insert", "e"),   # postimage
    }


def test_expectations_rejects_empty_rules(spark):
    import pytest as _pt

    df = spark.createDataFrame([(1,)], "id long")
    with _pt.raises(ValueError, match="no rules"):
        check_expectations(df, [])


def test_ivm_merge_handles_new_and_empty_groups(spark):
    from mergermetrics_lakehouse_pipeline_spark.operators.ivm import (
        aggregate_batch,
        merge_aggregates,
    )

    base_rows = spark.createDataFrame(
        [("a", 10.0), ("a", 5.0), ("b", 1.0)], "g string, v double"
    )
    delta_rows = spark.createDataFrame(
        [("b", 2.0), ("c", 7.0)], "g string, v double"
    )
    base = aggregate_batch(base_rows, keys=["g"], sum_cols={"sv": "v"})
    delta = aggregate_batch(delta_rows, keys=["g"], sum_cols={"sv": "v"})
    out = {
        r.g: (r.n_rows, float(r.sv))
        for r in merge_aggregates(base, delta, keys=["g"], sum_names=["sv"]).collect()
    }
    # groups only in base, shared, and only in delta all survive
    assert out == {"a": (2, 15.0), "b": (2, 3.0), "c": (1, 7.0)}

    empty = aggregate_batch(delta_rows.filter("1=0"), keys=["g"], sum_cols={"sv": "v"})
    out2 = {
        r.g: (r.n_rows, float(r.sv))
        for r in merge_aggregates(base, empty, keys=["g"], sum_names=["sv"]).collect()
    }
    assert out2 == {"a": (2, 15.0), "b": (1, 1.0)}


def test_ivm_distinct_state_exact_and_idempotent(spark):
    """Bitmap distinct state: merged state == from-scratch state for any
    batch split, and re-folding the same delta is a no-op (OR
    idempotence) — the property that makes re-delivered batches safe."""
    from mergermetrics_lakehouse_pipeline_spark.operators.ivm import (
        distinct_from_state,
        distinct_state,
        merge_distinct_state,
    )

    rows = spark.createDataFrame(
        [("a", i % 40) for i in range(100)] + [("b", i % 7) for i in range(30)],
        "g string, uid long",
    )
    base = distinct_state(rows.filter("uid % 3 != 0"), keys=["g"], id_col="uid")
    delta = distinct_state(rows.filter("uid % 3 = 0"), keys=["g"], id_col="uid")
    merged = merge_distinct_state(base, delta, keys=["g"])
    once = {
        r.g: r.n_distinct for r in distinct_from_state(merged, keys=["g"]).collect()
    }
    assert once == {"a": 40, "b": 7}
    twice_state = merge_distinct_state(merged, delta, keys=["g"])
    twice = {
        r.g: r.n_distinct
        for r in distinct_from_state(twice_state, keys=["g"]).collect()
    }
    assert twice == once


def test_sketch_rollup_accuracy(spark):
    """Merged daily HLL sketches estimate per-type distinct users within
    5% of exact, and merging sketches == sketching the raw stream (the
    mergeability property the sketch-table pattern relies on)."""
    from mergermetrics_lakehouse_pipeline_spark import registry

    registry._load_extensions()
    q = next(x for x in registry.QUERIES if x.name == "events_sketch_rollup")
    rows = q.fn(spark, "/root/testdata/sf0.001").collect()
    assert rows, "no event types"
    for r in rows:
        assert r.rel_err <= 0.05, (r.event_type, r.rel_err)


def test_scd2_apply_semantics_and_idempotency(spark):
    from pyspark.sql import functions as F

    from mergermetrics_lakehouse_pipeline_spark.operators.cdc import scd2_apply

    current = spark.createDataFrame(
        [
            # k=1: open row that will change
            (1, "A", "2020-01-01", None),
            # k=1 also has CLOSED history that must pass through untouched
            (1, "OLD", "2019-01-01", "2020-01-01"),
            # k=2: open row with a no-op update
            (2, "B", "2020-01-01", None),
            # k=3: open row with no update at all
            (3, "C", "2020-01-01", None),
        ],
        "k int, attr string, valid_from string, valid_to string",
    ).select(
        "k",
        "attr",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
    )
    updates = spark.createDataFrame(
        [(1, "A2"), (2, "B"), (9, "NEW")], "k int, attr string"
    )

    def apply(cur):
        return scd2_apply(
            cur, updates, keys=["k"], compare_cols=["attr"], effective="2024-06-01"
        )

    out = apply(current)
    rows = {
        (r.k, r.attr): (
            str(r.valid_from)[:10],
            str(r.valid_to)[:10] if r.valid_to else None,
        )
        for r in out.collect()
    }
    assert rows == {
        (1, "OLD"): ("2019-01-01", "2020-01-01"),   # history untouched
        (1, "A"): ("2020-01-01", "2024-06-01"),     # closed
        (1, "A2"): ("2024-06-01", None),            # new version
        (2, "B"): ("2020-01-01", None),             # no-op update
        (3, "C"): ("2020-01-01", None),             # no update
        (9, "NEW"): ("2024-06-01", None),           # brand-new key
    }
    # idempotency: re-applying the same batch changes nothing
    again = apply(out)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, out.collect()))
