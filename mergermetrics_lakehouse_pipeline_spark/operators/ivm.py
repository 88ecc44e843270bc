"""Incremental view maintenance for additive aggregates: fold a delta
batch into an existing rollup without recomputing from the base table.

The reference's incremental path re-aggregates every affected month
from raw data (2_incremental_load_fact.py:246-291 — re-read + re-group
the month's full fact slice); that is the right call when updates can
land anywhere inside a month, and the engine keeps that operator
(operators/incremental.py). This module provides the complementary
append-only shape: when deltas are pure inserts, an additive rollup
(SUM/COUNT, and anything derivable: AVG = SUM/COUNT) folds the delta's
partial aggregate into the stored aggregate — work proportional to the
DELTA, never the base table.

Scale: the delta aggregates with map-side combine first (tiny result),
then one shuffle keyed on the group columns merges it with the stored
rollup. Exactness: measures stay DECIMAL through both aggregation
levels (associative), so incremental == from-scratch bit-for-bit — the
registry query's oracle IS the from-scratch computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_batch(
    df: DataFrame, *, keys: list[str], sum_cols: dict[str, str]
) -> DataFrame:
    """Rollup of one batch: COUNT(*) as ``n_rows`` plus exact DECIMAL
    sums (``sum_cols`` maps output name -> source column)."""
    return df.groupBy(*keys).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        *[
            F.sum(F.col(src).cast("decimal(18,2)")).alias(out)
            for out, src in sum_cols.items()
        ],
    )


def merge_aggregates(
    base: DataFrame, delta: DataFrame, *, keys: list[str], sum_names: list[str]
) -> DataFrame:
    """Fold two rollups of the same shape: groups present in either side
    survive, shared groups add their counts and sums (exact — DECIMAL
    and BIGINT addition are associative)."""
    return (
        base.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            *[F.sum(c).alias(c) for c in sum_names],
        )
    )


# ---------------------------------------------------------------------------
# non-additive aggregates: EXACT incremental DISTINCT via bitmap state
# ---------------------------------------------------------------------------
#
# COUNT DISTINCT is the canonical aggregate that additive IVM cannot
# maintain (distinct counts don't add across batches). The standard
# engine answer is mergeable state: keep a per-group bitmap of ids
# (Spark's bitmap_construct_agg buckets, 32k bits / 4 KB each); any two
# states OR together, and OR is associative + commutative + idempotent —
# so delta folding, out-of-order arrival, AND re-delivered batches all
# yield the exact same state as a from-scratch build. State size is
# O(groups x occupied buckets), independent of row count.


def distinct_state(df: DataFrame, *, keys: list[str], id_col: str) -> DataFrame:
    """Aggregate one batch into per-(keys, bucket) bitmap state rows."""
    return (
        df.select(
            *keys,
            F.expr(f"bitmap_bucket_number({id_col})").alias("bucket"),
            F.expr(f"bitmap_bit_position({id_col})").alias("pos"),
        )
        .groupBy(*keys, "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )


def merge_distinct_state(
    base: DataFrame, delta: DataFrame, *, keys: list[str]
) -> DataFrame:
    """OR-fold delta state into base state (exact; idempotent on
    re-delivered deltas — unlike additive counts, double-folding the
    same batch cannot corrupt a bitmap)."""
    return (
        base.unionByName(delta)
        .groupBy(*keys, "bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
    )


def distinct_from_state(state: DataFrame, *, keys: list[str]) -> DataFrame:
    """Read off exact distinct counts: SUM of per-bucket popcounts."""
    return state.groupBy(*keys).agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("n_distinct")
    )


def maintain_join_view(
    view: DataFrame,
    a_old: DataFrame,
    b_old: DataFrame,
    delta_a: DataFrame,
    delta_b: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Incrementally maintain a materialized INNER-join view under
    append-only deltas on both sides — the classic delta-join rule:

        V' = V  ∪  (ΔA ⋈ B)  ∪  (A ⋈ ΔB)  ∪  (ΔA ⋈ ΔB)

    with A/B the PRE-delta sides. Every maintenance join has a delta as
    one input, so the work per refresh is O(|Δ| x match rate) — the full
    A ⋈ B recompute never appears, which is the property that makes a
    materialized join view affordable at 100 TB (deltas are
    batch-sized; the stored sides are probed via their join index, and
    Catalyst broadcasts whichever delta side is small).

    Correctness contract (the IVM invariant the registry query
    hash-checks): the maintained view equals the from-scratch join of
    (A ∪ ΔA) ⋈ (B ∪ ΔB) for append-only deltas with no key overlap
    constraints — duplicates on the join key multiply in both
    formulations identically.
    """
    da_b = delta_a.join(b_old, keys)
    a_db = a_old.join(delta_b, keys)
    da_db = delta_a.join(delta_b, keys)
    out = view
    for piece in (da_b, a_db, da_db):
        out = out.unionByName(piece.select(*view.columns))
    return out
