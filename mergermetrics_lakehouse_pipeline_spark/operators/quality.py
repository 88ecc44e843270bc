"""Declarative data-quality expectations: named rules evaluated in ONE
pass over the table, plus referential-integrity checks as anti-joins.

The reference validates data imperatively cell-by-cell (null fixes and
regex repairs scattered through 1_customer_data_processing.py /
2_products_data_processing.py); an engine wants the declarative shape —
a rule set evaluated in a single aggregation whose output is a small
(rule, violations, checked) table a pipeline can gate on.

Scale: all row-local rules compile into one ``sum(case when ...)``
aggregate — one scan, no shuffle beyond the 1-row global aggregate,
whatever the rule count. Uniqueness folds into the same pass as
``count(*) - count(distinct key)``. Referential integrity needs a join
by nature; it is expressed as a LEFT ANTI join count (broadcast or
shuffle as the optimizer prefers) and unioned in.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """A named row-local rule; ``predicate`` True means the row passes."""

    name: str
    predicate: Column


def _violations(e: Expectation) -> Column:
    # NULL predicate result counts as a violation (unknown != pass)
    return (
        F.sum(F.when(e.predicate, 0).otherwise(1)).cast("bigint").alias(e.name)
    )


def check_expectations(
    df: DataFrame,
    expectations: list[Expectation],
    *,
    unique_keys: list[list[str]] | None = None,
) -> DataFrame:
    """Evaluate all rules in one aggregation pass.

    Returns ``(rule string, n_violations bigint, n_checked bigint)`` —
    one row per rule. ``unique_keys`` adds a duplicate-count rule per
    key list (``count(*) - count(distinct concat(keys))``), still inside
    the same pass.
    """
    if not expectations and not unique_keys:
        raise ValueError("no rules given")
    aggs = [_violations(e) for e in expectations]
    names = [e.name for e in expectations]
    for keys in unique_keys or []:
        name = "unique_" + "_".join(keys)
        key = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
        aggs.append((F.count("*") - F.count_distinct(key)).cast("bigint").alias(name))
        names.append(name)
    wide = df.agg(*aggs, F.count("*").cast("bigint").alias("__n"))
    stack = ", ".join(f"'{n}', {n}" for n in names)
    return wide.select(
        F.expr(f"stack({len(names)}, {stack}) as (rule, n_violations)"),
        F.col("__n").alias("n_checked"),
    )


def fk_violations(
    child: DataFrame, parent: DataFrame, on: dict[str, str], *, rule: str
) -> DataFrame:
    """Referential integrity as a LEFT ANTI join: child rows whose key
    has no parent. Same (rule, n_violations, n_checked) shape so it
    unions with check_expectations output."""
    cond = [child[c] == parent[p] for c, p in on.items()]
    orphans = child.join(parent, cond, "left_anti")
    return (
        orphans.agg(F.count("*").cast("bigint").alias("n_violations"))
        .crossJoin(child.agg(F.count("*").cast("bigint").alias("n_checked")))
        .select(F.lit(rule).alias("rule"), "n_violations", "n_checked")
    )


def partition_checksums(
    df: DataFrame, *, part: Column, row_repr: Column
) -> DataFrame:
    """Order-insensitive per-partition content checksums — the fast-diff
    primitive for replication / migration validation: compare two
    tables' checksum rows instead of their data (anti-entropy the way
    published replica-repair designs do it, at partition granularity).

    ``row_repr`` must be a STRING rendering of the row that is stable
    across engines (integers, ISO dates, decimal-cents — never raw
    double-to-string). The checksum is ``bit_xor`` of a 60-bit md5
    prefix per row: commutative (partition order never matters), no
    overflow semantics to diverge on, one hash aggregation total.
    XOR cancels duplicate PAIRS — the row count is part of the contract
    and catches even-multiplicity tampering's most common case
    (dropped + re-added rows change the count).
    """
    h = F.conv(F.substring(F.md5(row_repr), 1, 15), 16, 10).cast("bigint")
    return (
        df.select(part.alias("part"), h.alias("_h"))
        .groupBy("part")
        .agg(
            F.expr("bit_xor(_h)").alias("checksum"),
            F.count("*").cast("bigint").alias("n_rows"),
        )
    )
