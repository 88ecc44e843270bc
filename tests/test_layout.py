"""Z-order layout: measured per-file min/max narrowing in BOTH
dimensions — the property single-column range layout cannot provide."""

from __future__ import annotations

from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.operators.layout import zorder_write

SF_DIR = "/root/testdata/sf0.001"


def _avg_file_range_frac(spark, path: str, col: str) -> float:
    """Mean per-file (max-min) extent of ``col``, as a fraction of the
    global extent — the data-skipping figure of merit (what parquet
    footer pruning sees)."""
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    per_file = df.groupBy("_f").agg(
        (F.max(col) - F.min(col)).cast("double").alias("ext")
    )
    g = df.agg((F.max(col) - F.min(col)).cast("double").alias("gext")).collect()[0]
    mean_ext = per_file.agg(F.avg("ext")).collect()[0][0]
    return mean_ext / g.gext


def test_zorder_narrows_both_dimensions(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )

    naive = str(tmp_path / "naive")
    li.repartitionByRange(8, "l_partkey").write.mode("overwrite").parquet(naive)

    zpath = str(tmp_path / "zorder")
    zorder_write(li, zpath, cols=("l_partkey", "l_suppkey"), n_files=8)

    # row preservation
    assert spark.read.parquet(zpath).count() == li.count()

    # single-column layout: tight on partkey, blind on suppkey
    assert _avg_file_range_frac(spark, naive, "l_partkey") < 0.30
    assert _avg_file_range_frac(spark, naive, "l_suppkey") > 0.85

    # z-order: bounded extent in BOTH dimensions
    zx = _avg_file_range_frac(spark, zpath, "l_partkey")
    zy = _avg_file_range_frac(spark, zpath, "l_suppkey")
    assert zx < 0.75 and zy < 0.75, (zx, zy)


def test_zorder_three_columns_skips_all_dims(spark, tmp_path):
    """Round 6: N-column Morton — a 3-column z-order layout gives
    footer-range skipping on EVERY clustered dimension."""
    from mergermetrics_lakehouse_pipeline_spark.operators.layout import (
        zorder_write,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    path = str(tmp_path / "z3")
    zorder_write(li, path, cols=("l_orderkey", "l_partkey", "l_suppkey"), n_files=8)

    import pyarrow.parquet as pq
    import os

    files = [
        os.path.join(path, n)
        for n in os.listdir(path)
        if n.endswith(".parquet") and not n.startswith((".", "_"))
    ]
    assert len(files) >= 6

    def intervals(col):
        out = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            out.append((lo, hi))
        return out

    # a probe at the low decile of each dimension must skip files
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        ivs = intervals(col)
        glo = min(lo for lo, _ in ivs)
        ghi = max(hi for _, hi in ivs)
        probe_hi = glo + (ghi - glo) // 10
        skipped = sum(1 for lo, _hi in ivs if lo > probe_hi)
        assert skipped > 0, f"no skipping on {col}"

    # content preserved exactly
    got = {tuple(r) for r in spark.read.parquet(path).collect()}
    want = {tuple(r) for r in li.collect()}
    assert got == want


def test_hilbert_fsm_is_a_hilbert_curve(spark):
    """Exhaustive certification of the PRODUCTION expression: order-8
    hilbert_col over all 65,536 cells is (a) a bijection onto
    [0, 65536) and (b) a unit-step walk — every consecutive pair of
    indices is an edge-adjacent cell. (b) is the locality property that
    separates Hilbert from Morton: Z-order jumps 2^k cells at quadrant
    seams, a Hilbert walk never exceeds Manhattan distance 1."""
    from mergermetrics_lakehouse_pipeline_spark.operators.layout import hilbert_col

    n = 256
    cells = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
        )
        .select("x", "y", hilbert_col(F.col("x"), F.col("y"), 8).alias("d"))
        .collect()
    )
    pos = {r["d"]: (r["x"], r["y"]) for r in cells}
    assert len(pos) == n * n
    assert min(pos) == 0 and max(pos) == n * n - 1
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, pos[d], pos[d + 1])


def test_hilbert_fsm_holds_at_other_orders(spark):
    """The FSM generalizes: bijectivity + unit-step adjacency must hold
    at every curve order, not just the shipped order 8 (a table typo
    that happens to work at one depth would fail at another)."""
    from mergermetrics_lakehouse_pipeline_spark.operators.layout import hilbert_col

    for order in (2, 4, 6):
        n = 1 << order
        cells = (
            spark.range(n * n)
            .select(
                (F.col("id") % n).alias("x"),
                (F.col("id") / n).cast("long").alias("y"),
            )
            .select("x", "y", hilbert_col(F.col("x"), F.col("y"), order).alias("d"))
            .collect()
        )
        pos = {r["d"]: (r["x"], r["y"]) for r in cells}
        assert len(pos) == n * n and min(pos) == 0 and max(pos) == n * n - 1
        for d in range(n * n - 1):
            (x1, y1), (x2, y2) = pos[d], pos[d + 1]
            assert abs(x1 - x2) + abs(y1 - y2) == 1, (order, d)


def test_hilbert_write_narrows_both_dimensions(spark, tmp_path):
    """hilbert_write mirrors the zorder_write contract: every file gets
    a bounded min/max footer range in BOTH clustered dimensions."""
    from mergermetrics_lakehouse_pipeline_spark.operators.layout import (
        hilbert_write,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    hpath = str(tmp_path / "hilbert")
    hilbert_write(li, hpath, xcol="l_partkey", ycol="l_suppkey", n_files=8)

    assert spark.read.parquet(hpath).count() == li.count()
    hx = _avg_file_range_frac(spark, hpath, "l_partkey")
    hy = _avg_file_range_frac(spark, hpath, "l_suppkey")
    assert hx < 0.75 and hy < 0.75, (hx, hy)
