"""Affected-partition incremental recompute.

The reference's one non-trivial algorithm (SURVEY §2.9,
2_incremental_load_fact.py:246-291): when a batch of daily rows arrives,

1. find the distinct months the batch touches,
2. re-aggregate those months *in full* from the daily-grain store,
3. MERGE the recomputed month rows into the monthly fact.

This is manual incremental view maintenance — correct under late and
re-delivered data because a month is always rebuilt from all of its daily
rows, never patched. Here it is a first-class operator.

Scale design (100 TB): the daily store should be partitioned by the
period column so step 2 prunes to the affected partitions (the reference
hand-rolls pruning with a join because its table isn't partitioned; we
keep the semi-join AND get real partition pruning via dynamic partition
pruning when the store is partitioned — see pipeline/fact.py). The month
list is tiny -> broadcast semi join, no shuffle added; the re-aggregation
shuffles only the affected months' rows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def affected_periods(batch: DataFrame, period_col: Column | str) -> DataFrame:
    """Distinct periods (e.g. month-starts) touched by a batch.

    Parity: distinct ``trunc(date,'MM')`` over the staged batch
    (2_incremental_load_fact.py:246-254).
    """
    c = F.col(period_col) if isinstance(period_col, str) else period_col
    return batch.select(c.alias("period")).distinct()


def recompute_affected_periods(
    daily_store: DataFrame,
    batch: DataFrame,
    period_expr: Callable[[DataFrame], Column],
    aggregate: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Recompute the aggregate rows for every period the batch touches.

    - ``period_expr(df)``: Column mapping a daily row to its period
      (e.g. ``lambda df: F.trunc(df["date"], "MM")``)
    - ``aggregate(df)``: the daily->period aggregation, applied only to
      affected periods

    Returns the recomputed period rows, ready to MERGE into the periodic
    fact (operators.merge.upsert_all on the period grain keys).

    Parity: 2_incremental_load_fact.py:258-279 (inner join on
    ``trunc(date,'MM') = start_month`` then groupBy-sum) — expressed as a
    broadcast left-semi join so the month list is never duplicated into
    the output and Catalyst can turn it into a partition-pruning filter.
    """
    periods = affected_periods(batch, period_expr(batch))
    affected = daily_store.join(
        F.broadcast(periods),
        period_expr(daily_store) == F.col("period"),
        "left_semi",
    )
    return aggregate(affected)
