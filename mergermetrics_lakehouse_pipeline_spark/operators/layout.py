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


def _morton2(x: Column, y: Column) -> Column:
    """Interleave two 16-bit bucket numbers into one 32-bit z-key."""
    out = F.lit(0).cast("long")
    for i in range(_BITS):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def _bucket(col: Column, lo: Column, hi: Column) -> Column:
    """Linear map of col into [0, 2^16) bucket ids (min-max scaling; a
    percentile mapping would equalize bucket mass under skew — same
    z-key machinery either way)."""
    span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
    frac = (col.cast("double") - lo) / span
    return F.least(
        F.lit(2**_BITS - 1),
        F.greatest(F.lit(0), (frac * (2**_BITS - 1)).cast("long")),
    )


def zorder_key(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """Attach the z-order key for (col_x, col_y); stats come from one
    broadcast 1-row min/max aggregate."""
    stats = df.agg(
        F.min(F.col(col_x).cast("double")).alias("_xlo"),
        F.max(F.col(col_x).cast("double")).alias("_xhi"),
        F.min(F.col(col_y).cast("double")).alias("_ylo"),
        F.max(F.col(col_y).cast("double")).alias("_yhi"),
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    zk = _morton2(
        _bucket(F.col(col_x), F.col("_xlo"), F.col("_xhi")),
        _bucket(F.col(col_y), F.col("_ylo"), F.col("_yhi")),
    )
    return with_stats.withColumn(_ZKEY, zk).drop("_xlo", "_xhi", "_ylo", "_yhi")


def zorder_write(
    df: DataFrame, path: str, *, cols: tuple[str, str], n_files: int
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered in z-order
    on the two columns: every file then has a bounded min/max footer
    range in BOTH dimensions, so scans filtering on either column skip
    most files."""
    keyed = zorder_key(df, *cols)
    (
        keyed.repartitionByRange(n_files, F.col(_ZKEY))
        .sortWithinPartitions(_ZKEY)
        .drop(_ZKEY)
        .write.mode("overwrite")
        .parquet(path)
    )
