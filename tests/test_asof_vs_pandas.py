"""Differential test: asof_join vs pandas.merge_asof (the reference
semantics for backward/forward/nearest with tolerance).

Many random cases are packed into ONE composite-keyed frame per
direction, so the whole battery costs three Spark jobs, not hundreds.
Right sides are deduplicated to unique (key, ts) — both implementations
leave same-instant duplicate resolution unspecified."""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.operators.asof import asof_join

N_CASES = 40
BASE = pd.Timestamp("2024-01-01")


def _gen_cases():
    rng = random.Random(20240813)
    left_rows, right_rows = [], []
    expected_frames = []
    for case in range(N_CASES):
        key = f"c{case}"
        n_l, n_r = rng.randint(1, 8), rng.randint(0, 8)
        lts = sorted(rng.sample(range(0, 40), n_l))
        rts = sorted(rng.sample(range(0, 40), n_r))
        lpd = pd.DataFrame(
            {
                "key": key,
                "lid": [case * 100 + i for i in range(n_l)],
                "ts": [BASE + pd.Timedelta(minutes=t) for t in lts],
            }
        )
        rpd = pd.DataFrame(
            {
                "key": pd.Series([key] * n_r, dtype="object"),
                "rts": pd.Series(
                    [BASE + pd.Timedelta(minutes=t) for t in rts],
                    dtype="datetime64[ns]",
                ),
                "price": pd.Series(
                    [float(case * 1000 + t) for t in rts], dtype="float64"
                ),
            }
        )
        left_rows.append(lpd)
        right_rows.append(rpd)
        expected_frames.append((lpd, rpd))
    return pd.concat(left_rows), pd.concat(right_rows), expected_frames


def _expected(expected_frames, direction, tolerance):
    outs = []
    for lpd, rpd in expected_frames:
        out = pd.merge_asof(
            lpd.sort_values("ts"),
            rpd.rename(columns={"rts": "ts"}).sort_values("ts"),
            on="ts",
            by="key",
            direction=direction,
            tolerance=tolerance,
        )
        outs.append(out[["lid", "price"]])
    allout = pd.concat(outs)
    return {
        int(r.lid): (None if pd.isna(r.price) else float(r.price))
        for r in allout.itertuples()
    }


def _actual(spark, lpd, rpd, direction, tolerance_seconds):
    left = spark.createDataFrame(lpd)
    right = spark.createDataFrame(rpd)
    out = asof_join(
        left,
        right,
        on="key",
        left_ts="ts",
        right_ts="rts",
        right_cols=["price"],
        direction=direction,
        tolerance_seconds=tolerance_seconds,
    )
    return {r.lid: r.price for r in out.select("lid", "price").collect()}


def test_asof_matches_pandas_all_directions(spark):
    lpd, rpd, frames = _gen_cases()
    for direction in ("backward", "forward", "nearest"):
        got = _actual(spark, lpd, rpd, direction, None)
        exp = _expected(frames, direction, None)
        assert got == exp, direction


def test_asof_matches_pandas_with_tolerance(spark):
    lpd, rpd, frames = _gen_cases()
    tol_min = 7
    for direction in ("backward", "forward", "nearest"):
        got = _actual(spark, lpd, rpd, direction, tol_min * 60)
        exp = _expected(frames, direction, pd.Timedelta(minutes=tol_min))
        assert got == exp, direction
