"""Record linkage: blocked fuzzy matching (entity resolution).

The reference's whole premise is integrating a child company's data into
the parent's catalog after a merger, but it only ever matches entities by
EXACT key equality (e.g. MERGE ON c.customer_id = s.customer_id,
``1_customer_data_processing.py:311-318``). Real merger integration also
needs *fuzzy* matching — the child's free-typed names never line up
exactly with the parent's catalog. This module provides the standard
scale-safe shape: a cheap deterministic **blocking key** turns the
quadratic all-pairs distance problem into an equi-join, and the expensive
edit-distance predicate runs only within blocks.

Scale notes (100 TB): the join is a plain equi-join on the block key —
shuffle/broadcast hash, never a nested loop. Cost is sum over blocks of
|left block| x |right block|; prefix blocking keeps blocks bounded by
catalog-name cardinality, not corpus size. Recall is bounded by the
blocking function (an edit in the first ``block_prefix`` chars escapes
the block) — production systems union several blocking passes; the
single-pass recall trade-off is documented rather than hidden.
``levenshtein`` is a JVM built-in (no Python UDF anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def blocking_key(name_col: str, prefix: int = 3) -> F.Column:
    """Deterministic block: lower-cased first ``prefix`` chars."""
    return F.substring(F.lower(F.col(name_col)), 1, prefix)


def blocked_fuzzy_match(
    dirty: DataFrame,
    catalog: DataFrame,
    dirty_id: str,
    dirty_name: str,
    catalog_name: str,
    max_distance: int = 2,
    block_prefix: int = 3,
) -> DataFrame:
    """Best catalog match per dirty record via blocked edit distance.

    Returns one row per matched dirty record: (dirty_id, dirty_name,
    matched_name, distance), keeping the single best match (minimum
    levenshtein, ties broken by catalog name ascending) — fully
    deterministic, so a DuckDB oracle can replay it exactly.
    """
    d = dirty.select(
        F.col(dirty_id),
        F.col(dirty_name),
        blocking_key(dirty_name, block_prefix).alias("_block"),
    )
    c = catalog.select(
        F.col(catalog_name).alias("_cand"),
        blocking_key(catalog_name, block_prefix).alias("_block"),
    ).dropDuplicates(["_cand"])

    pairs = (
        d.join(c, "_block")
        .withColumn("distance", F.levenshtein(F.col(dirty_name), F.col("_cand")))
        .filter(F.col("distance") <= max_distance)
    )
    best = Window.partitionBy(dirty_id).orderBy(
        F.col("distance").asc(), F.col("_cand").asc()
    )
    return (
        pairs.withColumn("_rn", F.row_number().over(best))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(dirty_id),
            F.col(dirty_name),
            F.col("_cand").alias("matched_name"),
            F.col("distance").cast("int").alias("distance"),
        )
    )


def golden_records(
    sources: DataFrame,
    key_col: str,
    priority_col: str,
    *,
    first_non_null: list[str] = (),
    take_max: list[str] = (),
    take_min: list[str] = (),
) -> DataFrame:
    """Survivorship / golden-record merge — the master-data step AFTER
    entity resolution: duplicate records of one real-world entity (from
    parent + child systems, already linked on ``key_col``) collapse to a
    single best record under per-field rules:

    - ``first_non_null``: value from the highest-priority source that
      has one (``min_by`` over a null-demoting priority) — the standard
      trusted-source rule;
    - ``take_max`` / ``take_min``: extremum across sources — freshness
      or conservative-balance style rules.

    One aggregation on the entity key (map-side partials; no joins, no
    windows): at 100 TB this is a single shuffle regardless of how many
    source systems stack into ``sources``. Every rule is an associative
    aggregate, so results are partitioning-independent and the SQL
    oracle replays them exactly.
    """
    aggs = [F.count("*").cast("bigint").alias("n_sources")]
    for c in first_non_null:
        aggs.append(
            F.expr(
                f"min_by({c}, CASE WHEN {c} IS NULL THEN 999999 "
                f"ELSE {priority_col} END)"
            ).alias(f"golden_{c}")
        )
    for c in take_max:
        aggs.append(F.max(c).alias(f"golden_{c}"))
    for c in take_min:
        aggs.append(F.min(c).alias(f"golden_{c}"))
    return sources.groupBy(key_col).agg(*aggs)
