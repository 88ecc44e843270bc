"""Multi-dimensional data layout: Z-order (Morton) clustering for
data-skipping on more than one filter column.

The lakehouse companion to sources/catalog.py:compact_table. Range
partitioning on a single column gives parquet files tight min/max
footers on that column only — a filter on any OTHER column still reads
every file. Interleaving the bits of two columns' bucket numbers
(Morton / Z-order, the published technique behind Delta's OPTIMIZE
ZORDER BY) gives every file a bounded range in BOTH dimensions, so
min/max skipping works for either filter column at the cost of each
being ~sqrt of single-column tightness.

Scale: the bucket mapping needs only a global (min, max) per column —
one tiny broadcast aggregate, no collect of data rows. The z-key is
pure JVM bit arithmetic (codegen), and the layout itself is one
``repartitionByRange`` (a shuffle — unavoidable: re-clustering IS data
movement) followed by a plain write. Nothing driver-side scales with
row count. Measured file-footer narrowing is asserted in
tests/test_layout.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 16
_ZKEY = "__zkey"


def _morton(xs: list[Column], bits: int) -> Column:
    """Interleave N bucket numbers' bits into one z-key (round-robin by
    bit position — the N-dimensional Morton curve)."""
    n = len(xs)
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, x in enumerate(xs):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return out


def _bucket(col: Column, lo: Column, hi: Column, bits: int = _BITS) -> Column:
    """Linear map of col into [0, 2^bits) bucket ids (min-max scaling; a
    percentile mapping would equalize bucket mass under skew — same
    z-key machinery either way)."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    frac = (col.cast("double") - lo) / span
    return F.least(
        F.lit(2**bits - 1),
        F.greatest(F.lit(0), (frac * (2**bits - 1)).cast("long")),
    )


def zorder_key(df: DataFrame, *cols: str) -> DataFrame:
    """Attach the z-order key for N columns (2+); stats come from one
    broadcast 1-row min/max aggregate. Bit budget splits the 63 usable
    long bits across dimensions (16 each up to 3 columns), so skipping
    tightness degrades gracefully as dimensions are added — the
    documented OPTIMIZE ZORDER BY trade."""
    if len(cols) < 2:
        raise ValueError("z-ordering needs at least two columns")
    bits = min(_BITS, 63 // len(cols))
    aggs = []
    for i, c in enumerate(cols):
        aggs.append(F.min(F.col(c).cast("double")).alias(f"_lo{i}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"_hi{i}"))
    with_stats = df.crossJoin(F.broadcast(df.agg(*aggs)))
    zk = _morton(
        [
            _bucket(F.col(c), F.col(f"_lo{i}"), F.col(f"_hi{i}"), bits)
            for i, c in enumerate(cols)
        ],
        bits,
    )
    drop = [f"_lo{i}" for i in range(len(cols))] + [
        f"_hi{i}" for i in range(len(cols))
    ]
    return with_stats.withColumn(_ZKEY, zk).drop(*drop)


def zorder_write(
    df: DataFrame, path: str, *, cols: tuple[str, ...], n_files: int
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered in z-order
    on the given columns: every file then has a bounded min/max footer
    range in EVERY clustered dimension, so scans filtering on any of
    them skip most files."""
    keyed = zorder_key(df, *cols)
    (
        keyed.repartitionByRange(n_files, F.col(_ZKEY))
        .sortWithinPartitions(_ZKEY)
        .drop(_ZKEY)
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Hilbert-curve clustering (round-13 continuation)
# ---------------------------------------------------------------------------

#: Hilbert FSM, packed as digit strings indexed by
#: ``code = state*4 + xbit*2 + ybit`` (0..15): the emitted quadrant
#: digit and the next orientation state. Verified exhaustively in
#: tests/test_layout.py: the order-8 map is a bijection onto
#: [0, 65536) and EVERY consecutive pair of indices is an adjacent
#: cell (the locality property Morton lacks — Z-order has 2^k-sized
#: jumps at quadrant seams, a Hilbert walk never leaves a unit step).
_HILBERT_QUADS = "0132031223102130"
_HILBERT_NEXTS = "1030021121233302"


def hilbert_col(x: Column, y: Column, order: int = 8) -> Column:
    """Hilbert index of integer cell coordinates in ``[0, 2**order)``.

    Implemented as the orientation state machine, NOT the textbook
    rotate-and-swap loop: unrolling that loop into column expressions
    duplicates the (x, y) subtrees ~5x per level (5^order nodes — dead
    on arrival for codegen), while the FSM threads one state value
    through per-level table lookups, so the whole order-8 expression
    stays a few hundred nodes inside WholeStageCodegen. Pure JVM bit
    arithmetic; zero shuffle, zero Python.
    """
    quads = F.array([F.lit(int(c)).cast("long") for c in _HILBERT_QUADS])
    nexts = F.array([F.lit(int(c)).cast("int") for c in _HILBERT_NEXTS])
    xl, yl = x.cast("long"), y.cast("long")
    state = F.lit(0).cast("int")
    d = F.lit(0).cast("long")
    for k in range(order - 1, -1, -1):
        bx = F.shiftright(xl, k).bitwiseAND(F.lit(1)).cast("int")
        by = F.shiftright(yl, k).bitwiseAND(F.lit(1)).cast("int")
        code = state * F.lit(4) + bx * F.lit(2) + by
        d = d * F.lit(4).cast("long") + F.element_at(quads, code + F.lit(1))
        state = F.element_at(nexts, code + F.lit(1))
    return d


_HKEY = "__hkey"


def hilbert_key(df: DataFrame, xcol: str, ycol: str, order: int = 8) -> DataFrame:
    """Attach the Hilbert clustering key for two columns; stats come
    from one broadcast 1-row min/max aggregate (same contract as
    zorder_key). Order 8 = a 256x256 cell grid: file-count-scale
    granularity, not row-scale — the key buckets files, the in-file
    sort handles the rest."""
    stats = df.agg(
        F.min(F.col(xcol).cast("double")).alias("_lox"),
        F.max(F.col(xcol).cast("double")).alias("_hix"),
        F.min(F.col(ycol).cast("double")).alias("_loy"),
        F.max(F.col(ycol).cast("double")).alias("_hiy"),
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    bits = order
    bx = _bucket(F.col(xcol), F.col("_lox"), F.col("_hix"), bits)
    by = _bucket(F.col(ycol), F.col("_loy"), F.col("_hiy"), bits)
    return with_stats.withColumn(_HKEY, hilbert_col(bx, by, order)).drop(
        "_lox", "_hix", "_loy", "_hiy"
    )


def hilbert_write(
    df: DataFrame,
    path: str,
    *,
    xcol: str,
    ycol: str,
    n_files: int,
    order: int = 8,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered along the
    Hilbert curve on (xcol, ycol): like zorder_write, every file gets a
    bounded min/max range in BOTH dimensions, and the curve's unit-step
    locality gives tighter per-file bounding boxes than Morton at the
    same file count (no seam jumps splitting a file across distant
    regions). This is the published layout behind Databricks liquid
    clustering's curve choice. ``order`` tunes cell granularity
    (2^order cells per axis), forwarded to hilbert_key like
    hilbert_col exposes it (ADVICE r13 #4)."""
    keyed = hilbert_key(df, xcol, ycol, order=order)
    (
        keyed.repartitionByRange(n_files, F.col(_HKEY))
        .sortWithinPartitions(_HKEY)
        .drop(_HKEY)
        .write.mode("overwrite")
        .parquet(path)
    )
