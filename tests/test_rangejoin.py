"""Binned range join: semantics vs Spark's own non-equi join, boundary
inclusivity, bin-width independence, and input validation."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.operators.rangejoin import bin_interval_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(i, _ts("2024-01-01 00:00:00") + dt.timedelta(seconds=37 * i)) for i in range(200)],
        "pid long, pts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (100, _ts("2024-01-01 00:01:00"), _ts("2024-01-01 00:04:00")),
            (101, _ts("2024-01-01 00:03:30"), _ts("2024-01-01 00:03:30")),  # degenerate
            (102, _ts("2024-01-01 01:00:00"), _ts("2024-01-01 02:00:00")),
            (103, _ts("2024-01-02 00:00:00"), _ts("2024-01-02 00:01:00")),  # no points
        ],
        "iid long, istart timestamp, iend timestamp",
    )
    return points, intervals


def _reference(points, intervals):
    return (
        points.join(intervals, F.col("pts").between(F.col("istart"), F.col("iend")))
        .select("pid", "iid")
        .collect()
    )


@pytest.mark.parametrize("bin_seconds", [7, 60, 3600])
def test_matches_nonequi_join_any_bin_width(spark, frames, bin_seconds):
    points, intervals = frames
    got = bin_interval_join(
        points, intervals, point_ts="pts", start_ts="istart", end_ts="iend",
        bin_seconds=bin_seconds,
    ).select("pid", "iid")
    expect = _reference(points, intervals)
    assert sorted((r.pid, r.iid) for r in got.collect()) == sorted(
        (r.pid, r.iid) for r in expect
    )
    assert len(expect) > 0


def test_boundaries_inclusive_no_duplicates(spark):
    points = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:01:00")), (2, _ts("2024-01-01 00:04:00"))],
        "pid long, pts timestamp",
    )
    intervals = spark.createDataFrame(
        [(9, _ts("2024-01-01 00:01:00"), _ts("2024-01-01 00:04:00"))],
        "iid long, istart timestamp, iend timestamp",
    )
    rows = bin_interval_join(
        points, intervals, point_ts="pts", start_ts="istart", end_ts="iend",
        bin_seconds=60,
    ).collect()
    # both boundary points match, each exactly once (a point has one bin)
    assert sorted(r.pid for r in rows) == [1, 2]


def test_rejects_column_collision(spark, frames):
    points, intervals = frames
    with pytest.raises(ValueError, match="disjoint"):
        bin_interval_join(
            points.withColumnRenamed("pid", "iid"), intervals,
            point_ts="pts", start_ts="istart", end_ts="iend", bin_seconds=60,
        )


def test_interval_overlap_join_parity_and_single_survivor(spark):
    """bin_interval_overlap_join == the naive non-equi overlap join,
    including pairs whose overlap spans MANY bins (each must survive
    exactly once via the first-overlap-bin rule)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from mergermetrics_lakehouse_pipeline_spark.operators.rangejoin import (
        bin_interval_overlap_join,
    )

    base = dt.datetime(2024, 1, 1)

    def mk(rows, id_name, s_name, e_name):
        return spark.createDataFrame(
            [
                (i, base + dt.timedelta(minutes=s), base + dt.timedelta(minutes=e))
                for i, s, e in rows
            ],
            f"{id_name} int, {s_name} timestamp, {e_name} timestamp",
        )

    # long intervals (hours) vs a 240s bin: overlaps span dozens of bins
    a = mk([(1, 0, 300), (2, 100, 120), (3, 500, 520)], "a_id", "a_start", "a_end")
    b = mk(
        [(10, 50, 400), (11, 119, 121), (12, 1000, 1001)],
        "b_id",
        "b_start",
        "b_end",
    )
    got = bin_interval_overlap_join(
        a, b, a_start="a_start", a_end="a_end", b_start="b_start", b_end="b_end"
    )
    rows = [(r.a_id, r.b_id) for r in got.collect()]
    naive = (
        a.join(b, (a.a_start <= b.b_end) & (b.b_start <= a.a_end))
        .select("a_id", "b_id")
        .collect()
    )
    assert sorted(rows) == sorted((r.a_id, r.b_id) for r in naive)
    assert len(rows) == len(set(rows))  # exactly-once despite multi-bin overlap
