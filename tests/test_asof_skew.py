"""Operator-level tests: as-of join semantics and salted-join equivalence.

The registry queries cover both against DuckDB oracles at testdata scale
(asof_join_latest_order vs native ASOF LEFT JOIN; skew_salted_join vs the
plain join); these tests pin the row-level edge semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.operators.asof import asof_join
from mergermetrics_lakehouse_pipeline_spark.operators.skew import (
    salted_join,
    top_frequency_keys,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),   # after r1 -> 100
            (2, "u1", _ts("2024-01-01 12:00:00")),   # exactly at r2 -> 200 (inclusive)
            (3, "u1", _ts("2024-01-01 09:00:00")),   # before any right row -> NULL
            (4, "u2", _ts("2024-01-02 00:00:00")),   # u2 has no right rows -> NULL
        ],
        "event_id int, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:30:00"), 100.0),
            ("u1", _ts("2024-01-01 12:00:00"), 200.0),
        ],
        "key string, rts timestamp, price double",
    )
    return left, right


def test_asof_join_basic(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(
        left, right, on="key", left_ts="ts", right_ts="rts", right_cols=["price"]
    )
    got = {r.event_id: r.price for r in out.collect()}
    assert got == {1: 100.0, 2: 200.0, 3: None, 4: None}
    assert out.count() == left.count()  # every left row survives


def test_asof_join_tolerance(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(
        left,
        right,
        on="key",
        left_ts="ts",
        right_ts="rts",
        right_cols=["price"],
        tolerance_seconds=600,  # 10 min horizon
    )
    got = {r.event_id: r.price for r in out.collect()}
    # event 1 is 30 min after its match -> dropped by tolerance; event 2 is 0s
    assert got == {1: None, 2: 200.0, 3: None, 4: None}


def test_asof_join_matched_row_nulls_not_backfilled(spark):
    """The matched right row's values come through as-is — a NULL payload
    in the latest right row must NOT be back-filled from an older right
    row (pandas merge_asof / DuckDB ASOF JOIN semantics: one row's values,
    never a blend of rows)."""
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 13:00:00"))],
        "event_id int, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:00:00"), 100.0, "EUR"),
            ("u1", _ts("2024-01-01 12:00:00"), None, "USD"),  # latest: NULL price
        ],
        "key string, rts timestamp, price double, ccy string",
    )
    out = asof_join(
        left,
        right,
        on="key",
        left_ts="ts",
        right_ts="rts",
        right_cols=["price", "ccy"],
    ).collect()
    assert len(out) == 1
    # matched row is the 12:00 one: NULL price, USD — not (100.0, USD)
    assert out[0].price is None and out[0].ccy == "USD"


def test_asof_join_rejects_collision(spark):
    left, right = _asof_fixture(spark)
    try:
        asof_join(
            left, right, on="key", left_ts="ts", right_ts="rts", right_cols=["ts"]
        )
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    for salt in (1, 8):
        salted = salted_join(li, o, on="o_orderkey", how="inner", salt=salt)
        plain = li.join(o, "o_orderkey", "inner")
        assert salted.columns == plain.columns
        assert salted.exceptAll(plain).count() == 0
        assert plain.exceptAll(salted).count() == 0


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], "k int, v string")
    right = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, w double")
    out = salted_join(left, right, on="k", how="left", salt=4)
    got = {r.k: r.w for r in out.collect()}
    assert got == {1: 10.0, 2: 20.0, 99: None}


def test_top_frequency_keys(spark):
    df = spark.createDataFrame(
        [(k,) for k in ["hot"] * 8 + ["warm"] * 2], "k string"
    )
    top = top_frequency_keys(df, "k", n=1).collect()
    assert top[0].key == "hot" and top[0].n_rows == 8
    assert abs(top[0].share - 0.8) < 1e-9


def test_asof_join_forward(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(
        left,
        right,
        on="key",
        left_ts="ts",
        right_ts="rts",
        right_cols=["price"],
        direction="forward",
    )
    got = {r.event_id: r.price for r in out.collect()}
    # 1 (10:00) -> next right at 12:00; 2 (12:00) -> inclusive match 200;
    # 3 (09:00) -> 09:30's 100; 4 (u2) -> no right rows
    assert got == {1: 200.0, 2: 200.0, 3: 100.0, 4: None}


def test_asof_join_nearest_tie_resolves_backward(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(
        left,
        right,
        on="key",
        left_ts="ts",
        right_ts="rts",
        right_cols=["price"],
        direction="nearest",
    )
    got = {r.event_id: r.price for r in out.collect()}
    # 1 (10:00): back 09:30 (30m) vs fwd 12:00 (2h) -> 100
    # 2 (12:00): exact both sides -> backward tie resolution -> 200
    # 3 (09:00): no back match, fwd 09:30 -> 100; 4: no rows either side
    assert got == {1: 100.0, 2: 200.0, 3: 100.0, 4: None}


def test_asof_join_nearest_tolerance_is_symmetric(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(
        left,
        right,
        on="key",
        left_ts="ts",
        right_ts="rts",
        right_cols=["price"],
        direction="nearest",
        tolerance_seconds=1800,
    )
    got = {r.event_id: r.price for r in out.collect()}
    # 30-minute horizon: 1's nearest (09:30, 30m) survives exactly;
    # 3's forward match (09:30, 30m) survives too
    assert got == {1: 100.0, 2: 200.0, 3: 100.0, 4: None}


def test_asof_join_rejects_unknown_direction(spark):
    left, right = _asof_fixture(spark)
    try:
        asof_join(
            left,
            right,
            on="key",
            left_ts="ts",
            right_ts="rts",
            right_cols=["price"],
            direction="sideways",
        )
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
