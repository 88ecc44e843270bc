"""Unit semantics for the relationship-mining operators: blocked fuzzy
match, integer PageRank, Markov transitions (registry_mining.py's
building blocks; the cross-engine oracle parity itself is covered by
tests/test_registry_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.operators import events as ev
from mergermetrics_lakehouse_pipeline_spark.operators import graph as gr
from mergermetrics_lakehouse_pipeline_spark.operators import linkage as lk


def test_fuzzy_match_best_and_ties(spark):
    dirty = spark.createDataFrame(
        [(1, "cold widge"), (2, "zzz unknown"), (3, "blue rod")],
        ["id", "name"],
    )
    catalog = spark.createDataFrame(
        [("cold widget",), ("cold widgex",), ("blue rod",), ("large bolt",)],
        ["cand"],
    )
    out = lk.blocked_fuzzy_match(
        dirty, catalog, "id", "name", "cand", max_distance=2, block_prefix=3
    )
    rows = {r["id"]: r for r in out.collect()}
    # id=1: both "cold widget" and "cold widgex" are distance 1; tie
    # breaks on candidate name ascending -> "cold widget"
    assert rows[1]["matched_name"] == "cold widget"
    assert rows[1]["distance"] == 1
    # id=2: nothing within distance 2 (and block "zzz" empty) -> dropped
    assert 2 not in rows
    # id=3: exact match, distance 0
    assert rows[3]["matched_name"] == "blue rod"
    assert rows[3]["distance"] == 0


def test_fuzzy_match_blocking_is_equi_join(spark):
    """The expensive levenshtein must run AFTER an equi-join on the
    block key — never as a nested-loop predicate."""
    dirty = spark.createDataFrame([(1, "cold widge")], ["id", "name"])
    catalog = spark.createDataFrame([("cold widget",)], ["cand"])
    plan = (
        lk.blocked_fuzzy_match(dirty, catalog, "id", "name", "cand")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_hand_computed_triangle_plus_leaf(spark):
    # Undirected path graph a-b, b-c: deg(a)=deg(c)=1, deg(b)=2.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")], ["src", "dst"]
    )
    got = {r["node"]: r["rank"] for r in gr.pagerank_int(edges, iterations=2).collect()}

    # replicate with exact Python ints (floor division == BIGINT div)
    S, T_, D = gr.SCALE, gr.TELEPORT, gr.DAMP_NUM
    deg = {"a": 1, "b": 2, "c": 1}
    r = {n: S for n in deg}
    adj_in = {"a": ["b"], "b": ["a", "c"], "c": ["b"]}
    for _ in range(2):
        r = {
            n: T_ + (D * sum(r[u] // deg[u] for u in adj_in[n])) // 100
            for n in deg
        }
    assert got == r


def test_pagerank_symmetric_star_ranks_center_highest(spark):
    edges = []
    for leaf in "bcde":
        edges += [("a", leaf), (leaf, "a")]
    ranks = {
        r["node"]: r["rank"]
        for r in gr.pagerank_int(
            spark.createDataFrame(edges, ["src", "dst"]), iterations=3
        ).collect()
    }
    assert ranks["a"] > max(v for k, v in ranks.items() if k != "a")
    # leaves are symmetric -> identical exact ranks
    assert len({v for k, v in ranks.items() if k != "a"}) == 1


def test_transition_matrix_counts_and_probs(spark):
    rows = [
        # user 1: A -> B -> A   (hops: A->B, B->A)
        (1, 1, "2024-01-01 00:00:00", "A"),
        (2, 1, "2024-01-01 00:01:00", "B"),
        (3, 1, "2024-01-01 00:02:00", "A"),
        # user 2: A -> A        (hop: A->A)
        (4, 2, "2024-01-01 00:00:00", "A"),
        (5, 2, "2024-01-01 00:01:00", "A"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts_s", "event_type"]
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = {
        (r["from_type"], r["to_type"]): r
        for r in ev.transition_matrix(df).collect()
    }
    assert out[("A", "B")]["n_transitions"] == 1
    assert out[("A", "A")]["n_transitions"] == 1
    assert out[("B", "A")]["n_transitions"] == 1
    assert out[("A", "B")]["total_from"] == 2
    assert out[("A", "B")]["p_transition"] == 0.5
    assert out[("B", "A")]["p_transition"] == 1.0


def test_transition_matrix_tie_break_is_deterministic(spark):
    # two events with the SAME timestamp: order must come from event_id
    rows = [
        (10, 1, "2024-01-01 00:00:00", "A"),
        (11, 1, "2024-01-01 00:00:00", "B"),
        (12, 1, "2024-01-01 00:01:00", "C"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts_s", "event_type"]
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    hops = {
        (r["from_type"], r["to_type"])
        for r in ev.transition_matrix(df).collect()
    }
    assert hops == {("A", "B"), ("B", "C")}
