"""Scale-adaptive parallelism helpers (optimization guide §2).

``fan_out`` exists because a parquet ROW GROUP is the minimum split
unit: a table written as one row group per file scans as ONE task no
matter how low ``spark.sql.files.maxPartitionBytes`` goes, and every
md5/codegen projection stacked on that scan then runs on a single core
while the rest of the cluster idles. At warehouse scale inputs arrive
as many files/row groups and no repartition is needed — so the helper
is conditional on the *input's* partition count, not on a constant
tuned for either local mode or the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Round-robin-repartition a compute-heavy narrow pipeline up to the
    session's default parallelism; NO-OP when the input already has at
    least that many partitions (guide §2.2/§6: the single-row-group
    scan cannot split, so per-row compute above it serializes).

    Round-robin repartition is retry-safe (sort-before-repartition,
    SPARK-23207) and involves no ``rand()`` key (guide §2.5 hazard).
    Catalyst pushes filters and column pruning through Repartition, so
    scan pushdown is unaffected — still, apply AFTER the narrowest
    projection so the exchange carries only needed columns (§2.3).
    Results are row-order-independent everywhere this is used (exact
    DECIMAL aggregation / fully tie-broken windows), so the repartition
    never changes what a query computes.
    """
    target = parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
