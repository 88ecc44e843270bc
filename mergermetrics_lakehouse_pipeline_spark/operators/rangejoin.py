"""Binned range (interval) join: points matched into [start, end] windows
without a nested-loop join.

The reference engine has no interval join (its joins are all equi-key,
SURVEY §2.3), but a complete analytics engine needs one — "events inside
incident/maintenance/price-validity windows" is a standard shape. Spark
plans a bare non-equi predicate (``p.ts BETWEEN i.start AND i.end``) as a
BroadcastNestedLoopJoin: O(|points| * |intervals|) comparisons and a
broadcast requirement on one side, which is exactly the plan you cannot
run when both sides are large.

The classic fix (used by every bin/bucket interval-join implementation,
e.g. the published "range join optimization" technique): quantize time
into fixed bins, replicate each interval into every bin it overlaps,
tag each point with its single containing bin, hash-join on the bin id,
then confirm the exact range predicate.

Scale properties:

- The join becomes a pure equi shuffle join (SortMergeJoin /
  ShuffledHashJoin — broadcast only if the optimizer *chooses* to), so
  it works big-big with no driver-side anything.
- Interval replication factor is ``len(interval)/bin_seconds + 1``;
  choose ``bin_seconds`` near the typical interval length so each
  interval lands in ~2 bins. Replication happens *before* the shuffle
  but is linear in the interval count, never |points| x |intervals|.
- Each point has exactly ONE bin, so a (point, interval) pair can meet
  in at most one bin: no post-join dedup is needed (a subtle but
  important difference from schemes that bin both sides into ranges).
- Skew: a hot bin (event storm) is an AQE skew-join case, same as any
  hash join; salting composes if needed.

Correctness does not depend on ``bin_seconds`` — only the replication
factor does — which makes the knob safely tunable per workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__range_bin"


def _check_disjoint(a: DataFrame, b: DataFrame) -> None:
    """Shared names would make the joined output ambiguous, and the
    reserved bin columns would be silently clobbered — fail loudly."""
    overlap = set(a.columns) & set(b.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint, shared: {sorted(overlap)}")
    reserved = {_BIN, _BIN + "_b"} & (set(a.columns) | set(b.columns))
    if reserved:
        raise ValueError(f"column names {sorted(reserved)} are reserved")


def bin_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_seconds: int,
) -> DataFrame:
    """Inner-join ``points`` to every interval with
    ``start_ts <= point_ts <= end_ts`` (inclusive bounds), via bin
    quantization. Column sets of the two inputs must be disjoint.

    Returns all columns of both inputs (minus the internal bin key).
    """
    _check_disjoint(points, intervals)
    bin_us = bin_seconds * 1_000_000

    # integer `div`, not `/`: epoch-micros (~1.7e15 and growing) cannot
    # round-trip double division exactly forever; div truncates toward
    # zero, which equals floor for the non-negative epochs in play
    # cast-to-timestamp first: parquet NTZ columns otherwise fail
    # unix_micros analysis (session tz is UTC, so the cast is identity)
    p = points.withColumn(
        _BIN, F.expr(f"unix_micros(cast({point_ts} as timestamp)) div {bin_us}")
    )
    i = intervals.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.expr(f"unix_micros(cast({start_ts} as timestamp)) div {bin_us}"),
                F.expr(f"unix_micros(cast({end_ts} as timestamp)) div {bin_us}"),
            )
        ),
    )
    joined = p.join(i, on=_BIN, how="inner").where(
        F.col(point_ts).between(F.col(start_ts), F.col(end_ts))
    )
    return joined.drop(_BIN)


def bin_interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    *,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bin_seconds: int = 240,
) -> DataFrame:
    """Interval-OVERLAP join (both sides are intervals): all (a, b)
    pairs with ``a_start <= b_end AND b_start <= a_end`` — again as an
    equi join on quantized time, never a nested loop.

    Both sides replicate into every bin they touch; a pair can
    therefore meet in several bins, so the join keeps only the bin
    containing the OVERLAP'S START (``greatest(a_start, b_start)``) —
    each qualifying pair survives exactly once, with no distinct pass
    over the (potentially wide) output.

    Same scale properties as ``bin_interval_join``: replication is
    linear in interval count x interval/bin ratio; the join itself is a
    plain shuffle equi join AQE can treat like any other.
    """
    _check_disjoint(a, b)
    bin_us = bin_seconds * 1_000_000

    def binned(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.withColumn(
            _BIN,
            F.explode(
                F.sequence(
                    F.expr(f"unix_micros(cast({start} as timestamp)) div {bin_us}"),
                    F.expr(f"unix_micros(cast({end} as timestamp)) div {bin_us}"),
                )
            ),
        )

    joined = binned(a, a_start, a_end).join(
        binned(b, b_start, b_end).withColumnRenamed(_BIN, _BIN + "_b"),
        F.col(_BIN) == F.col(_BIN + "_b"),
    )
    first_overlap_bin = F.expr(
        f"unix_micros(cast(greatest({a_start}, {b_start}) as timestamp)) div {bin_us}"
    )
    return (
        joined.filter(
            (F.col(a_start) <= F.col(b_end)) & (F.col(b_start) <= F.col(a_end))
        )
        .filter(F.col(_BIN) == first_overlap_bin)
        .drop(_BIN, _BIN + "_b")
    )
