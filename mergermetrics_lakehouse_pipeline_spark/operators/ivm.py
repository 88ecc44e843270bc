"""Incremental view maintenance for additive aggregates: fold a delta
batch into an existing rollup without recomputing from the base table.

The reference's incremental path re-aggregates every affected month
from raw data (2_incremental_load_fact.py:246-291 — re-read + re-group
the month's full fact slice); that is the right call when updates can
land anywhere inside a month, and the engine keeps that operator
(operators/incremental.py). This module provides the complementary
append-only shape: when deltas are pure inserts, an additive rollup
(SUM/COUNT, and anything derivable: AVG = SUM/COUNT) folds the delta's
partial aggregate into the stored aggregate — work proportional to the
DELTA, never the base table.

Scale: the delta aggregates with map-side combine first (tiny result),
then one shuffle keyed on the group columns merges it with the stored
rollup. Exactness: measures stay DECIMAL through both aggregation
levels (associative), so incremental == from-scratch bit-for-bit — the
registry query's oracle IS the from-scratch computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_batch(
    df: DataFrame, *, keys: list[str], sum_cols: dict[str, str]
) -> DataFrame:
    """Rollup of one batch: COUNT(*) as ``n_rows`` plus exact DECIMAL
    sums (``sum_cols`` maps output name -> source column)."""
    return df.groupBy(*keys).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        *[
            F.sum(F.col(src).cast("decimal(18,2)")).alias(out)
            for out, src in sum_cols.items()
        ],
    )


def merge_aggregates(
    base: DataFrame, delta: DataFrame, *, keys: list[str], sum_names: list[str]
) -> DataFrame:
    """Fold two rollups of the same shape: groups present in either side
    survive, shared groups add their counts and sums (exact — DECIMAL
    and BIGINT addition are associative)."""
    return (
        base.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            *[F.sum(c).alias(c) for c in sum_names],
        )
    )
