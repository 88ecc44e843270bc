"""Table profiling — the ANALYZE/data-quality surface: per-column null
counts, exact distinct counts, typed min/max, and top-k frequent values
in two passes regardless of column count.

Reference parity: the reference inspects its data manually per notebook
cell (``display(df_silver.filter(...))``, distinct().show() — e.g.
1_customer_data_processing.py:62-90); this operator is that workflow as
one reusable, scalable op.

Scale design:
- pass 1 (narrow, one 1-row aggregate): every per-column scalar —
  nulls, exact distinct, min, max — computed in a SINGLE agg projection
  (map-side partials, one scalar row out). Adding a column adds
  expressions, never a scan.
- pass 2 (stacked): columns unpivot map-side into (column, value)
  rows — explode of a struct array, no shuffle until the ONE
  (column, value) count aggregation; per-column top-k is a window over
  the counted (already collapsed) relation, partitioned by column.
- the two passes join on the column name — a |columns|-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str], *, top_k: int = 3) -> DataFrame:
    """One output row per (column, top-k frequent value): column stats
    (n_rows, n_nulls, n_distinct, min/max as strings) repeated across
    that column's top-``top_k`` non-null values (ties: value ascending).
    """
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in columns:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).cast("bigint").alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).cast("bigint").alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    scalar = df.agg(*aggs)
    melted = scalar.select(
        "n_rows",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"__nn_{c}").alias("n_nulls"),
                        F.col(f"__nd_{c}").alias("n_distinct"),
                        F.col(f"__mn_{c}").alias("min_value"),
                        F.col(f"__mx_{c}").alias("max_value"),
                    )
                    for c in columns
                ]
            )
        ).alias("s"),
    ).select("n_rows", "s.*")

    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in columns
                ]
            )
        ).alias("s")
    ).select("s.*")
    counts = (
        stacked.filter(F.col("value").isNotNull())
        .groupBy("column", "value")
        .agg(F.count("*").cast("bigint").alias("value_count"))
    )
    w = Window.partitionBy("column").orderBy(
        F.col("value_count").desc(), F.col("value").asc()
    )
    topk = counts.withColumn("value_rank", F.row_number().over(w)).filter(
        F.col("value_rank") <= top_k
    )
    # LEFT from the stats side: an all-NULL column has no counted
    # values, but its n_nulls/n_distinct row is exactly what a profiler
    # exists to surface — it must not vanish in the join
    return melted.join(topk, "column", "left").select(
        "column",
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_value",
        "max_value",
        F.col("value").alias("top_value"),
        "value_count",
        "value_rank",
    )
