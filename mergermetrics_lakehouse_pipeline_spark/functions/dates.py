"""Date-dimension generation.

Parity: consolidated_pipeline/1_setup/dim_date_table_creation.py:17-46 —
a month spine built with ``sequence(date, date, interval 1 month)`` +
``explode``, then derived key/name/quarter columns. Entirely JVM-side
expressions; the spine is generated distributed (no driver loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch, tolerant of TIMESTAMP_NTZ inputs.

    Parquet columns written without an ``isAdjustedToUTC`` flag read back
    as TIMESTAMP_NTZ, which ``unix_micros`` rejects outright. The session
    pins ``spark.sql.session.timeZone=UTC`` (session.py:84), so the
    NTZ->TIMESTAMP cast is a wall-clock identity and the difference /
    binning semantics are unchanged for either input type.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def month_spine(spark: SparkSession, start: str, end: str) -> DataFrame:
    """One row per month-start date in [start, end].

    Parity: dim_date_table_creation.py:23-33 (sequence + explode).
    """
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start)),
                F.to_date(F.lit(end)),
                F.expr("interval 1 month"),
            )
        ).alias("month_start_date")
    )


def build_dim_date(spark: SparkSession, start: str = "2024-01-01", end: str = "2025-12-01") -> DataFrame:
    """Month-grain date dimension.

    Columns (parity: dim_date_table_creation.py:40-45):
    month_start_date date, date_key int (yyyyMM), year int,
    month_name string, month_short_name string, quarter 'Q1'..'Q4',
    year_quarter 'yyyy-Qn'.
    """
    d = F.col("month_start_date")
    q = F.quarter(d).cast("string")
    return month_spine(spark, start, end).select(
        d,
        F.date_format(d, "yyyyMM").cast("int").alias("date_key"),
        F.year(d).alias("year"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.date_format(d, "MMM").alias("month_short_name"),
        F.concat(F.lit("Q"), q).alias("quarter"),
        F.concat(F.year(d).cast("string"), F.lit("-Q"), q).alias("year_quarter"),
    )
