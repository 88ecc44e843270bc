"""Collation SEMANTICS, engine-side (round 12, VERDICT r11 next-step
#4): comparator keys, collation-aware grouping and keep-first dedup
over Spark 4's native collation expressions (``F.collate`` — ICU-backed
UTF8_LCASE, so 'Ä' = collate('ä', 'UTF8_LCASE') holds, not just ASCII).

Deliberately NOT implemented: the Delta **wire format** for collated
schemas. The exact schema-metadata layout delta-spark stamps for
collation identifiers could not be verified from sources available in
this container, and guessing a wire format is worse than the gap — so
``write_delta`` never writes collation metadata, and the reader gate
keeps naming ``collations-preview`` explicitly so FOREIGN collated
tables fail loudly (sources/delta_log.py protocol gate; the gate tests
pin this). What IS implemented here is everything above the wire:
queries get real collation comparators and group keys, verified against
DuckDB's COLLATE NOCASE in the oracle row ``collated_group_dedup``.

Scale: a collated comparison is a JVM-side expression (whole-stage
codegen, ICU collation keys under the hood) — grouping by a collated
key shuffles exactly like any groupBy; no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: collations this module exposes; UTF8_BINARY is Spark's default
#: byte-order comparison, UTF8_LCASE the ICU lowercase-equality one.
SUPPORTED_COLLATIONS = ("UTF8_BINARY", "UTF8_LCASE")


def _check(collation: str) -> str:
    c = collation.upper()
    if c not in SUPPORTED_COLLATIONS:
        raise ValueError(
            f"unsupported collation {collation!r}; supported: "
            f"{SUPPORTED_COLLATIONS}"
        )
    return c


def collated(col: str | Column, collation: str = "UTF8_LCASE") -> Column:
    """The column under ``collation`` — usable as a join/group/window
    key or in comparisons; equality and ordering follow the collation
    (ICU for UTF8_LCASE, byte order for UTF8_BINARY)."""
    c = _check(collation)
    col = F.col(col) if isinstance(col, str) else col
    return F.collate(col, c)


def collated_equals(
    a: str | Column, b: str | Column, collation: str = "UTF8_LCASE"
) -> Column:
    """Collation-aware equality predicate."""
    return collated(a, collation) == collated(b, collation)


def collated_group(
    df: DataFrame,
    key_col: str,
    collation: str = "UTF8_LCASE",
    *aggs: Column,
) -> DataFrame:
    """Group ``df`` by ``key_col`` under ``collation``. The raw collated
    key is NOT returned (its representative value is whichever variant
    a partition saw first — nondeterministic by definition); callers
    get the deterministic ``canonical_key`` = binary-min of the
    variants, plus their aggregates."""
    return (
        df.groupBy(collated(key_col, collation).alias("__ck"))
        .agg(F.min(key_col).alias("canonical_key"), *aggs)
        .drop("__ck")
    )


def collated_dedup_first(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    collation: str = "UTF8_LCASE",
) -> DataFrame:
    """Keep-first dedup under a collation: one row per collated key,
    the survivor chosen by ``order_cols`` (a FULL tie-break — callers
    must pass a unique ordering so the survivor is deterministic,
    unlike dropDuplicates' partition-order pick)."""
    w = Window.partitionBy(collated(key_col, collation)).orderBy(
        *[F.col(c) for c in order_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
