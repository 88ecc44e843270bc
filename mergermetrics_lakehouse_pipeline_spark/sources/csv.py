"""CSV ingest with lineage + landing-file archival (SURVEY §2.1 S1/S2/S14).

The reference reads child CSVs with header+inferSchema
(1_customer_data_processing.py:31-38), stamps lineage from the hidden
``_metadata`` struct, and moves consumed files landing/ -> processed/
for at-most-once batch consumption (1_full_load_fact.py:72-78,
2_incremental_load_fact.py:95-101).

Engine choices:
- explicit schemas are supported and preferred (SURVEY §7: inference
  drift between daily files is a known reference bug-class); inference
  remains the default for parity.
- PERMISSIVE mode with a ``_corrupt_record`` column rather than failing:
  garbage rows become NULLs, matching the cleaning layer's tolerance.
- archival is a filesystem move (local ``pathlib``; on a cluster the same
  API is backed by Hadoop FS via the JVM — gated to keep this file
  dependency-free).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv_with_lineage(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    *,
    infer: bool = True,
    lineage: bool = True,
) -> DataFrame:
    """CSV glob scan + lineage columns (read_timestamp, file_name, file_size).

    Parity: 1_customer_data_processing.py:31-38 (S1+S2).
    """
    reader = spark.read.option("header", True).option("mode", "PERMISSIVE")
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    df = reader.csv(path)
    if lineage:
        df = (
            df.withColumn("read_timestamp", F.current_timestamp())
            .withColumn("file_name", F.col("_metadata.file_name"))
            .withColumn("file_size", F.col("_metadata.file_size"))
        )
    return df


def archive_landing_files(landing_dir: str, processed_dir: str) -> list[str]:
    """Move every file landing/ -> processed/ after a successful ingest
    (at-most-once file consumption; parity: S14, dbutils.fs.mv loop at
    1_full_load_fact.py:72-78)."""
    landing, processed = Path(landing_dir), Path(processed_dir)
    processed.mkdir(parents=True, exist_ok=True)
    moved: list[str] = []
    for f in sorted(landing.iterdir()):
        if f.is_file():
            shutil.move(str(f), str(processed / f.name))
            moved.append(f.name)
    return moved
