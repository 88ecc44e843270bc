"""Model-based property test for the Delta transaction-log engine:
random sequences of overwrite/append/optimize/checkpoint ops applied to
BOTH the real log (sources/delta_log.py) and a trivial in-memory model
must agree on the visible table state at EVERY version — the oracle for
the snapshot-reconstruction algebra (last-action-wins per path,
checkpoint fold, dataChange-false transparency).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
    optimize_delta,
    read_delta,
    write_checkpoint,
    write_delta,
)

SETTINGS = settings(max_examples=8, deadline=None)

# an op is (kind, payload_slice) — slices index into disjoint key ranges
ops = st.lists(
    st.tuples(
        st.sampled_from(["overwrite", "append", "optimize", "checkpoint"]),
        st.integers(min_value=0, max_value=4),
    ),
    min_size=1,
    max_size=6,
)


@SETTINGS
@given(ops)
def test_random_commit_sequences_match_model(spark, tmp_path_factory, seq):
    tbl = str(tmp_path_factory.mktemp("pdelta") / "t")
    base = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )

    def batch(i):
        return base.filter((F.col("k") % 5) == i)

    model: set[tuple] = set()
    versions: dict[int, set[tuple]] = {}
    wrote = False
    for kind, i in seq:
        rows = {tuple(r) for r in batch(i).collect()}
        if kind == "overwrite" or (not wrote and kind == "append"):
            v = write_delta(batch(i), tbl, mode="overwrite")
            model = set(rows)
            wrote = True
        elif kind == "append":
            v = write_delta(batch(i), tbl, mode="append")
            model |= rows
        elif kind == "optimize" and wrote:
            v = optimize_delta(spark, tbl, target_files=2)
        elif kind == "checkpoint" and wrote:
            v = write_checkpoint(spark, tbl)
            continue  # checkpoint is not a commit; no new version row
        else:
            continue
        versions[v] = set(model)

    if not wrote:
        return
    # every committed version reconstructs to the model state AT that version
    for v, expect in versions.items():
        got = {tuple(r) for r in read_delta(spark, tbl, version=v).collect()}
        assert got == expect, f"version {v}: {len(got)} vs {len(expect)} rows"
