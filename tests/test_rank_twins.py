"""The round-13 count-collapse twins must reproduce their per-row rank
originals EXACTLY on adversarial synthetic tables — tiny groups (every
NTILE remainder class), heavy ties, and single-member segments — not
just on the well-behaved driver testdata (which the shared oracle
already pins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.registry_r11 import (
    q_customer_percentile_bridge,
)
from mergermetrics_lakehouse_pipeline_spark.registry_r12 import (
    q_orders_value_gini_by_priority,
)
from mergermetrics_lakehouse_pipeline_spark.registry_r13 import (
    q_customer_percentile_bridge_distributed,
    q_orders_value_gini_by_priority_distributed,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def tiny_sf_dir(spark, tmp_path_factory):
    """A synthetic sf_dir with only the tables the twins touch:
    customer segments of size 1..13 (every n%4 remainder + the n=1
    degenerate case) and orders with massive value ties inside tiny
    and large priority groups."""
    d = tmp_path_factory.mktemp("rank_twins_sf")
    cust = []
    key = 0
    for n in range(1, 14):
        for i in range(n):
            key += 1
            # balances with deliberate ties (i DIV 3) to stress the
            # tie-broken rank against the collapse
            cust.append((key, f"SEG{n:02d}", float(i // 3) * 7.25))
    spark.createDataFrame(
        cust, "c_custkey long, c_mktsegment string, c_acctbal double"
    ).write.mode("overwrite").parquet(str(d / "customer.parquet"))

    orders = []
    okey = 0
    for p, (size, n_distinct) in {
        "1-TINY": (1, 1),       # single order
        "2-TIED": (400, 3),     # 3 distinct values, huge tie blocks
        "3-WIDE": (500, 500),   # all distinct, crosses $1000 bands
        "4-MIX": (37, 5),
    }.items():
        for i in range(size):
            okey += 1
            v = (i % n_distinct) * 997.13 + 1.0 if n_distinct > 1 else 42.0
            if p == "3-WIDE":
                v = 900.0 + i * 13.37  # spans many v DIV 100000 bands
            orders.append((okey, p, v))
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(str(d / "orders.parquet"))
    return str(d)


def test_gini_twin_equals_per_row_rank_original(spark, tiny_sf_dir):
    got = _rows(q_orders_value_gini_by_priority_distributed(spark, tiny_sf_dir))
    want = _rows(q_orders_value_gini_by_priority(spark, tiny_sf_dir))
    assert got == want  # bit-exact, including the trailing double gini


def test_bridge_twin_equals_windowed_original_all_remainders(
    spark, tiny_sf_dir
):
    got = _rows(q_customer_percentile_bridge_distributed(spark, tiny_sf_dir))
    want = _rows(q_customer_percentile_bridge(spark, tiny_sf_dir))
    assert got == want
    # n=1..13 covers the degenerate segment and every NTILE remainder
    assert len(got) == 13


def test_bridge_identity_against_brute_force(spark, tiny_sf_dir):
    """The interval arithmetic vs a literal python NTILE/iq replay —
    independent of Spark's window implementation entirely."""
    out = {
        r.segment: r
        for r in q_customer_percentile_bridge_distributed(
            spark, tiny_sf_dir
        ).collect()
    }
    for n in range(1, 14):
        q, rem = divmod(n, 4)
        tiles = []
        for t in range(1, 5):
            tiles += [t] * (q + (1 if t <= rem else 0))
        iqs = [
            1 if n == 1 else min(4, ((r - 1) * 4) // (n - 1) + 1)
            for r in range(1, n + 1)
        ]
        row = out[f"SEG{n:02d}"]
        assert row.n_customers == n
        assert row.ntile_mass == sum(tiles)
        assert row.rank_quartile_mass == sum(iqs)
        assert row.n_agree == sum(1 for a, b in zip(tiles, iqs) if a == b)
