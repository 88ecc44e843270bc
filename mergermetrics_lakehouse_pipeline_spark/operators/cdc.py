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


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    *,
    keys: list[str],
    compare_cols: list[str],
    effective: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2: fold a batch of updates into a
    versioned dimension, preserving history.

    ``current`` carries (keys, compare_cols, valid_from, valid_to) with
    ``valid_to`` NULL on the open version of each key; ``updates``
    carries (keys, compare_cols) effective at the ``effective``
    timestamp literal. The result is a pure transformation (no side
    effects — pair with write_table/merge to persist):

    - closed history rows pass through untouched,
    - an open row whose attributes differ from its update is CLOSED
      (``valid_to = effective``) and a NEW open version is emitted,
    - an open row with no update, or an update equal on all
      ``compare_cols`` (null-safe), passes through unchanged,
    - an update for an unseen key INSERTS a new open version.

    The reference's MERGE upserts are SCD Type 1 (overwrite in place,
    history lost — 1_customer_data_processing.py:311-318); this is the
    history-keeping upgrade every dimension with auditing needs.

    Scale: ONE shuffle — a full-outer join of OPEN rows against updates
    on the natural key; closed rows bypass the join entirely (union
    after), and change detection is a null-safe struct compare in
    codegen. Emitted row count is bounded by |open| + 2·|changed|.

    The batch must carry AT MOST ONE row per key — multiple open
    versions of one key would otherwise be emitted, breaking the
    single-open-row invariant. Duplicate keys in ``updates`` are
    collapsed deterministically (lexicographic max over
    ``compare_cols``, a stable last-wins independent of partitioning)
    before the join; pre-aggregate yourself if a different survivor
    rule is needed.
    """
    eff = F.lit(effective).cast("timestamp")
    closed = current.filter(F.col(to_col).isNotNull())
    open_rows = current.filter(F.col(to_col).isNull())

    o = open_rows.select(
        *keys,
        F.col(from_col).alias("__from"),
        F.struct(*compare_cols).alias("_cur"),
    )
    u = (
        updates.select(*keys, F.struct(*compare_cols).alias("_upd"))
        .groupBy(*keys)
        .agg(F.max("_upd").alias("_upd"))
    )
    j = o.join(u, keys, "full_outer")

    differs = ~F.col("_cur").eqNullSafe(F.col("_upd"))
    out_cols = lambda src, vfrom, vto: [  # noqa: E731
        *keys,
        *[src[c].alias(c) for c in compare_cols],
        vfrom.alias(from_col),
        vto.alias(to_col),
    ]
    # open row, no change (or no update): passes through
    unchanged = j.filter(
        F.col("_cur").isNotNull() & (F.col("_upd").isNull() | ~differs)
    ).select(*out_cols(F.col("_cur"), F.col("__from"), F.lit(None).cast("timestamp")))
    # open row superseded: closed at the effective instant
    superseded = j.filter(
        F.col("_cur").isNotNull() & F.col("_upd").isNotNull() & differs
    ).select(*out_cols(F.col("_cur"), F.col("__from"), eff))
    # new version (changed attrs or brand-new key): opens at effective
    opened = j.filter(
        F.col("_upd").isNotNull() & (F.col("_cur").isNull() | differs)
    ).select(*out_cols(F.col("_upd"), eff, F.lit(None).cast("timestamp")))

    return closed.unionByName(unchanged).unionByName(superseded).unionByName(opened)
