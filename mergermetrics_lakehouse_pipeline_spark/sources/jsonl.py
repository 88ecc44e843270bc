"""JSONL (newline-delimited JSON) document source — the interchange
format training corpora actually ship in (one JSON object per line:
text + metadata). Extends the S-family beyond the reference's CSV-only
landing zone with the same tolerance contract: PERMISSIVE parse, bad
lines quarantined into ``_corrupt_record`` instead of failing the batch,
lineage columns from ``_metadata``.

Scale notes: JSONL is line-splittable, so a 100 TB corpus parallelizes
at file-split granularity like CSV/parquet; an explicit schema skips
Spark's schema-inference pre-pass (which reads the data TWICE when
omitted — never let inference touch a large landing zone). The corrupt
quarantine keeps the pipeline total: one malformed crawl record must not
kill a million-file ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    lineage: bool = True,
) -> DataFrame:
    """PERMISSIVE JSONL scan with corrupt-line quarantine + lineage.

    The returned frame has the caller's schema plus ``_corrupt_record``
    (NULL for clean rows, the raw line for garbage) and, with
    ``lineage=True``, the same read_timestamp/file_name/file_size
    columns as the CSV ingest (sources/csv.py:read_csv_with_lineage).
    """
    # NOT schema.add(...): StructType.add mutates the caller's schema in
    # place, so a second read with the same schema object would fail with
    # COLUMN_ALREADY_EXISTS
    full = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if lineage:
        df = (
            df.withColumn("read_timestamp", F.current_timestamp())
            .withColumn("file_name", F.col("_metadata.file_name"))
            .withColumn("file_size", F.col("_metadata.file_size"))
        )
    return df


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) split: clean rows drop the corrupt column;
    quarantine keeps the raw line + lineage for replay/debugging."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad
