"""Round-14 optimization invariants: every rewrite here must be
bit-identical to the formulation it replaced — these tests pin that
equivalence directly (the oracle sweep pins it end-to-end)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mergermetrics_lakehouse_pipeline_spark.parallel import fan_out


def test_fan_out_noop_when_already_parallel(spark):
    """fan_out must be a NO-OP when the input already has >= the default
    parallelism partitions (the warehouse-scale case) and must raise the
    partition count otherwise — without changing the rows."""
    target = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, 1, target + 4)
    assert fan_out(wide) is wide

    narrow = spark.range(0, 1000, 1, 1)
    fanned = fan_out(narrow)
    assert fanned.rdd.getNumPartitions() == target
    assert sorted(r.id for r in fanned.collect()) == list(range(1000))


def test_ams_conditional_sum_equals_exploded_counters(spark, sf_dir):
    """The r14 one-pass AMS counters must equal the pre-r14
    explode(0..8) -> groupBy(j) counters exactly."""
    from mergermetrics_lakehouse_pipeline_spark.registry_r13b import (
        _AMS_D,
        _h60_spark,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_partkey")
    # reference: the pre-r14 exploded formulation, verbatim
    ex = li.select(
        "l_partkey",
        F.explode(F.array(*[F.lit(j) for j in range(_AMS_D)])).alias("j"),
    )
    h = F.expr(
        _h60_spark("concat('ams', CAST(j AS STRING), '|', CAST(l_partkey AS STRING))")
    )
    sign = F.when(h.bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
    ref = {
        r.j: r.counter
        for r in ex.groupBy("j")
        .agg(F.sum(sign).cast("long").alias("counter"))
        .collect()
    }

    # current: one conditional-sum pass (what the registry row runs)
    def sign_j(j: int):
        hj = F.expr(
            _h60_spark(f"concat('ams', '{j}', '|', CAST(l_partkey AS STRING))")
        )
        return F.when(hj.bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)

    got = li.agg(
        *[F.sum(sign_j(j)).cast("long").alias(f"c{j}") for j in range(_AMS_D)]
    ).collect()[0]
    for j in range(_AMS_D):
        assert got[f"c{j}"] == ref[j], j


def test_salted_join_deterministic_salt_matches_plain_join(spark):
    """The r14 deterministic salt must keep salted_join's contract: the
    result equals the plain join for any salt assignment, and the plan
    carries no nondeterministic expression (retry-safety, guide §2.5 /
    SPARK-38388)."""
    from mergermetrics_lakehouse_pipeline_spark.operators.skew import salted_join

    big = spark.range(0, 5000).select(
        (F.col("id") % 37).alias("k"), (F.col("id") * 3).alias("v")
    )
    small = spark.range(0, 37).select(
        F.col("id").alias("k"), (F.col("id") + 100).alias("w")
    )
    out = salted_join(big, small, on="k", how="inner", salt=8)
    plain = big.join(small, "k", "inner")
    assert out.count() == plain.count()
    assert (
        out.groupBy("k").count().exceptAll(plain.groupBy("k").count()).count() == 0
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rand(" not in plan
