"""As-of (temporal) join: for each left row, the most recent right row
at or before the left row's event time, per key.

Spark has no built-in as-of join, and the naive formulation —
``left JOIN right ON key AND r_ts <= l_ts`` then argmax — is a range
join whose intermediate blows up as |left| x |matching right rows|.
This operator uses the union-and-window formulation instead, the shape
that survives 100 TB:

1. tag both sides and union them on (key, ts),
2. one window sorted by (ts, side-tag) per key carries the latest right
   row forward onto every left row (``last_value(..., ignoreNulls)``),
3. filter back to left rows.

Cost: ONE shuffle on the key (the window partition), state = one right
row per key held in the running frame — no quadratic intermediate, no
range-join planning. Skewed keys degrade to a sort within the hot
partition, not a cross product.

Tolerance semantics: ``allowed_lateness`` optionally drops matches older
than a horizon (NULL match instead), like pandas ``merge_asof``'s
``tolerance``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.dates import epoch_us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every ``left`` row, enriched with ``right_cols``
    from the matched ``right`` row, NULLs when none qualifies.

    ``direction`` mirrors pandas ``merge_asof``:

    - ``"backward"`` (default): latest right row with
      ``right_ts <= left_ts`` (ties: right row at exactly left_ts wins);
    - ``"forward"``: earliest right row with ``right_ts >= left_ts``;
    - ``"nearest"``: whichever of the two is closer in time; an exact
      tie in distance resolves backward, like pandas.

    ``on`` is the equi-key; ``right_cols`` are carried from the matched
    right row. With ``tolerance_seconds``, matches farther than the
    horizon (in the match direction) return NULLs instead.

    Cost is unchanged by direction: ONE shuffle on the key. ``forward``
    sorts the same window descending; ``nearest`` evaluates both window
    passes over the one partition (Spark plans two sorts, zero extra
    exchanges) and picks per row.
    """
    if set(right_cols) & set(left.columns):
        raise ValueError("right_cols must not collide with left column names")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")
    l_types, r_types = dict(left.dtypes), dict(right.dtypes)
    l_rest = [c for c in left.columns if c != on]
    lhs_full = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(r_types[c]).alias(c) for c in right_cols],
        *[F.col(c) for c in l_rest],
    )
    rhs_full = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in right_cols],
        *[F.lit(None).cast(l_types[c]).alias(c) for c in l_rest],
    )
    unioned = lhs_full.unionByName(rhs_full)

    # right rows (side=0) sort before left rows (side=1) at equal ts, so a
    # right row stamped exactly at left_ts is visible to that left row —
    # in both directions (desc order also puts side 0 first at equal ts)
    w_back = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").desc(), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # ONE struct per right row, not per-column lasts: a per-column
    # last(ignorenulls) would back-fill a NULL payload value from an OLDER
    # right row, blending columns of different rows — true as-of semantics
    # (pandas merge_asof, DuckDB ASOF JOIN) return the matched row's
    # values, NULLs included. The struct is non-NULL whenever the row
    # exists, so ignorenulls only skips non-right rows.
    right_struct = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col("__ts").alias("__rts"),
            *[F.col(c) for c in right_cols],
        ),
    )
    if direction == "backward":
        matched = F.last(right_struct, ignorenulls=True).over(w_back)
    elif direction == "forward":
        matched = F.last(right_struct, ignorenulls=True).over(w_fwd)
    else:  # nearest: both passes over the same partition, pick per row
        back = F.last(right_struct, ignorenulls=True).over(w_back)
        fwd = F.last(right_struct, ignorenulls=True).over(w_fwd)
        d_back = epoch_us(F.col("__ts")) - epoch_us(back["__rts"])
        d_fwd = epoch_us(fwd["__rts"]) - epoch_us(F.col("__ts"))
        # distance tie resolves backward (pandas semantics); a missing
        # side makes its distance NULL, so the comparisons below pick
        # whichever side exists
        matched = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(d_fwd < d_back, fwd)
            .otherwise(back)
        )
    result = unioned.select("*", matched.alias("__m")).filter(F.col("__side") == 1)

    in_tolerance = F.lit(True)
    if tolerance_seconds is not None:
        distance = F.abs(epoch_us(F.col("__ts")) - epoch_us(F.col("__m.__rts")))
        in_tolerance = distance <= tolerance_seconds * 1_000_000

    out_cols = [F.col(c) for c in left.columns] + [
        F.when(in_tolerance, F.col(f"__m.{c}")).alias(c) for c in right_cols
    ]
    return result.select(*out_cols)
