"""Structural guarantees of the round-13 sketch toolbox
(registry_r13b.py) — properties the hash-vs-oracle gate cannot state
directly: Bloom's no-false-negative contract, count-min's
never-undercount contract, and HLL's merge identity (merging per-scope
register tables == building one sketch over the union)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.registry_r13b import (
    _HLL_M,
    _HLL_NUM,
    _HLL_RMAX,
    _hll_rows,
    q_events_countmin_type_census,
    q_lineitem_hll_distinct_sketch,
    q_lineitem_kmv_distinct_sketch,
    q_orders_bloom_probe_census,
    q_orders_hll_monthly_union,
)

SF_DIR = "/root/testdata/sf0.001"


def test_bloom_has_no_false_negatives(spark):
    rows = q_orders_bloom_probe_census(spark, SF_DIR).collect()
    cells = {(r["member_truth"], r["bloom_positive"]): r["n_rows"] for r in rows}
    assert (1, 0) not in cells, "Bloom filter produced a false negative"
    assert cells.get((1, 1), 0) > 0  # members exist and all pass


def test_countmin_never_undercounts(spark):
    rows = q_events_countmin_type_census(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["overcount"] >= 0, r
        assert r["cm_estimate"] >= r["exact_n"], r


def test_hll_merge_equals_direct_build(spark):
    """The 'ALL:merged' row (MAX-merge of monthly register tables) must
    reproduce the estimate of one sketch built over the whole table in
    a single pass — the mergeability property that makes HLL the 100 TB
    distinct-count shape."""
    merged = {
        r["scope"]: r["hll_estimate"]
        for r in q_orders_hll_monthly_union(spark, SF_DIR).collect()
    }
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_custkey")
    regs = (
        _hll_rows(o, "o_custkey", "hllm|")
        .groupBy("register")
        .agg(F.max("rho").alias("m_val"))
    )
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RMAX} - m_val)")
    direct = regs.agg(
        F.round(
            F.lit(_HLL_NUM)
            / (
                F.sum(term)
                + (F.lit(_HLL_M) - F.count("*")) * F.lit(2**_HLL_RMAX)
            ).cast("double"),
            4,
        ).alias("est")
    ).collect()[0]["est"]
    assert merged["ALL:merged"] == direct


def test_kmv_estimate_within_tolerance(spark):
    """k=64 gives ~1/sqrt(k) ≈ 12% typical relative error; assert a
    loose 50% band so the test pins sanity, not luck."""
    row = q_lineitem_kmv_distinct_sketch(spark, SF_DIR).collect()[0]
    est, exact = row["kmv_estimate"], row["exact_distinct"]
    assert exact > 0 and abs(est - exact) / exact < 0.5, (est, exact)


def test_streaming_hll_register_parity(spark, tmp_path):
    """Incremental sketch maintenance: stream orders in micro-batches
    (maxFilesPerTrigger=1 over a 4-file copy), MAX-merge each batch's
    HLL registers into a running store via foreachBatch, and assert the
    final registers equal the batch-built sketch EXACTLY. This is the
    continuous distinct-count shape — per-batch work is register-sized,
    state never grows with keys (unlike streaming dropDuplicates)."""
    src = str(tmp_path / "orders4")
    (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .repartition(4)
        .write.mode("overwrite")
        .parquet(src)
    )
    schema = spark.read.parquet(src).schema
    store: dict[int, int] = {}

    def fold(batch_df, _bid):
        regs = (
            _hll_rows(batch_df.select("o_custkey"), "o_custkey", "hllm|")
            .groupBy("register")
            .agg(F.max("rho").alias("m_val"))
            .collect()
        )
        for r in regs:  # register-sized, not data-sized
            k = int(r["register"])
            store[k] = max(store.get(k, 0), int(r["m_val"]))

    (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
        .awaitTermination(120)
    )

    batch = {
        int(r["register"]): int(r["m_val"])
        for r in _hll_rows(
            spark.read.parquet(src).select("o_custkey"), "o_custkey", "hllm|"
        )
        .groupBy("register")
        .agg(F.max("rho").alias("m_val"))
        .collect()
    }
    assert store == batch


def test_hll_register_census_is_complete(spark):
    rows = q_lineitem_hll_distinct_sketch(spark, SF_DIR).collect()
    assert sum(r["n_registers"] for r in rows) == _HLL_M
    empties = {r["register_value"]: r["n_registers"] for r in rows}.get(0, 0)
    assert empties == rows[0]["empty_registers"]


def test_theta_overlap_is_consistent(spark):
    """Sketch-level invariants: matches <= k_eff, the union estimate is
    monotone vs either year alone, and exact numbers obey set algebra."""
    from mergermetrics_lakehouse_pipeline_spark.registry_r13b import (
        q_orders_theta_sketch_overlap,
    )

    r = q_orders_theta_sketch_overlap(spark, SF_DIR).collect()[0]
    assert 0 <= r["matches"] <= 64
    assert r["exact_inter"] <= r["exact_union"]
    assert r["jaccard_ppm"] == (r["matches"] * 1_000_000) // 64


def test_hdr_median_bucket_contains_exact_median(spark):
    """The HDR containment guarantee, checked on every segment:
    median_lo <= exact lower median < median_hi, and the bucket width
    honors the <=1/8 relative-error design."""
    from mergermetrics_lakehouse_pipeline_spark.registry_r13b import (
        _HDR_SHIFT,
        q_customer_hdr_balance_histogram,
    )

    rows = q_customer_hdr_balance_histogram(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        lo, hi, ex = (
            r["median_lo_cents"],
            r["median_hi_cents"],
            r["exact_median_cents"],
        )
        assert lo <= ex < hi, r
        assert (hi - lo) * 8 <= (lo + _HDR_SHIFT) + 7, r  # width <= base/8


def test_range_partition_plan_is_balanced_and_complete(spark):
    """The planner's loads must cover every row exactly once, ranges
    must be disjoint and ordered, and no partition may exceed ~2x ideal
    (exact boundaries cannot split a single repeated value, so the
    bound is loose only under extreme single-value skew)."""
    from mergermetrics_lakehouse_pipeline_spark.registry_r13b import (
        q_lineitem_range_partition_plan,
    )

    rows = sorted(
        q_lineitem_range_partition_plan(spark, SF_DIR).collect(),
        key=lambda r: r["partition_idx"],
    )
    total = sum(r["n_rows_load"] for r in rows)
    n_src = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    )
    assert total == n_src
    for a, b in zip(rows, rows[1:]):
        assert a["hi_cents"] < b["lo_cents"]
    assert max(r["load_ppm_of_ideal"] for r in rows) < 2_000_000


def test_countmin_join_size_never_undercounts(spark):
    """The dot-product estimate is structurally an overcount: every
    per-depth dot product >= the true join size, so the min is too."""
    from mergermetrics_lakehouse_pipeline_spark.registry_r13b import (
        q_orders_lineitem_join_size_sketch,
    )

    rows = q_orders_lineitem_join_size_sketch(spark, SF_DIR).collect()
    assert rows
    exact = rows[0]["join_size_exact"]
    for r in rows:
        assert r["est_j"] >= exact, r
    assert rows[0]["overcount_ppm"] >= 0


def test_ams_sketch_merges_additively(spark):
    """AMS counters built on two disjoint halves must sum to the
    whole-table counters (+ is the AMS merge operator)."""
    from pyspark.sql import functions as SF

    from mergermetrics_lakehouse_pipeline_spark.registry_r13b import (
        _AMS_D,
        _h60_spark,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_partkey", "l_orderkey"
    )

    def counters(df):
        ex = df.select(
            "l_partkey",
            SF.explode(SF.array(*[SF.lit(j) for j in range(_AMS_D)])).alias("j"),
        )
        h = SF.expr(
            _h60_spark(
                "concat('ams', CAST(j AS STRING), '|', CAST(l_partkey AS STRING))"
            )
        )
        sign = SF.when(h.bitwiseAND(SF.lit(1)) == 1, 1).otherwise(-1)
        return {
            r["j"]: r["c"]
            for r in ex.groupBy("j")
            .agg(SF.sum(sign).cast("long").alias("c"))
            .collect()
        }

    whole = counters(li)
    lo = counters(li.filter(SF.col("l_orderkey") % 2 == 0))
    hi = counters(li.filter(SF.col("l_orderkey") % 2 == 1))
    assert {j: lo.get(j, 0) + hi.get(j, 0) for j in whole} == whole


def test_streaming_countmin_cells_merge_additively(spark, tmp_path):
    """Count-min maintenance under Structured Streaming: cell counts
    folded batch-by-batch (+ is the CM merge) must equal the one-pass
    sketch — the frequency twin of the HLL register parity test."""
    from mergermetrics_lakehouse_pipeline_spark.registry_r13b import _h60_spark

    src = str(tmp_path / "events4")
    (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type")
        .repartition(4)
        .write.mode("overwrite")
        .parquet(src)
    )

    def cells(df):
        ex = df.select(
            "event_type",
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("j"),
        )
        c = F.expr(
            _h60_spark("concat('cm', CAST(j AS STRING), '|', event_type)") + " % 8"
        )
        return {
            (r["j"], r["c"]): r["n"]
            for r in ex.select("j", c.alias("c"))
            .groupBy("j", "c")
            .agg(F.count("*").alias("n"))
            .collect()
        }

    store: dict[tuple, int] = {}

    def fold(batch_df, _bid):
        for k, n in cells(batch_df).items():
            store[k] = store.get(k, 0) + n

    schema = spark.read.parquet(src).schema
    (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
        .awaitTermination(120)
    )
    assert store == cells(spark.read.parquet(src))


def test_bitmap_index_algebra_is_consistent(spark):
    """Bitmap set identities on every priority pair: |A∩B| + |A∪B| =
    |A| + |B|, intersections bounded by the smaller side."""
    from mergermetrics_lakehouse_pipeline_spark.registry_r13b import (
        q_orders_priority_bitmap_index,
    )

    rows = q_orders_priority_bitmap_index(spark, SF_DIR).collect()
    assert len(rows) == 10  # 5 priorities -> C(5,2) pairs
    for r in rows:
        assert (
            r["buckets_both"] + r["buckets_either"]
            == r["buckets_a"] + r["buckets_b"]
        ), r
        assert r["buckets_both"] <= min(r["buckets_a"], r["buckets_b"]), r


def test_vocab_overlap_estimates_track_exact(spark):
    """Across 190 source pairs the sketch Jaccard must correlate with
    the exact Jaccard: mean absolute error under 0.25 (k=32 gives
    ~1/sqrt(32) ≈ 18% standard error) and estimator invariants hold."""
    from mergermetrics_lakehouse_pipeline_spark.registry_r13b import (
        q_docs_vocab_overlap_matrix,
    )

    rows = q_docs_vocab_overlap_matrix(spark, SF_DIR).collect()
    assert len(rows) > 0
    errs = []
    for r in rows:
        assert 0 <= r["matches"] <= r["k_eff"]
        assert r["exact_inter"] <= r["exact_union"]
        errs.append(abs(r["jaccard_ppm"] - r["exact_jaccard_ppm"]) / 1e6)
    assert sum(errs) / len(errs) < 0.25, sum(errs) / len(errs)
