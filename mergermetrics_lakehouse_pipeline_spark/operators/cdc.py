"""Snapshot diff: derive a change-data feed (insert/update/delete rows)
from two table snapshots.

The reference enables Delta Change Data Feed on its tables
(3_pricing_data_processing.py:167-172) but never materializes changes
itself; without Delta in this environment (SCALE.md), the engine
provides the portable equivalent: given yesterday's and today's
snapshots, emit exactly the rows a CDF read would — the operator that
turns plain parquet tables into an incremental-downstream source.

Scale: ONE full-outer shuffle join on the key set; change detection is
a null-safe struct comparison (JVM expression, codegen) so arbitrary
column counts cost no extra passes. Output is the change set only —
unchanged rows never leave the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Rows that changed between ``old`` and ``new``.

    Returns key columns + ``change_type`` ('insert' | 'update' |
    'delete') + the compared columns — postimage values for
    insert/update, preimage values for delete (the minimal CDF
    contract). Rows equal on all ``compare_cols`` (null-safe) are not
    emitted.
    """
    compare = compare_cols or [c for c in new.columns if c not in keys]
    o = old.select(*keys, F.struct(*compare).alias("_old"))
    n = new.select(*keys, F.struct(*compare).alias("_new"))
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("_old").isNull(), F.lit("insert"))
        .when(F.col("_new").isNull(), F.lit("delete"))
        .when(~F.col("_old").eqNullSafe(F.col("_new")), F.lit("update"))
    )
    payload = F.when(F.col("_new").isNull(), F.col("_old")).otherwise(F.col("_new"))
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type", *[payload[c].alias(c) for c in compare])
    )
