"""Bloom-filter join pruning (runtime-filter pattern, made explicit).

The broadcast-hash join stops working when the build side no longer fits
in executor memory, yet shipping the full probe side through a shuffle
is wasteful when only a small fraction of its rows survive the join. The
standard engine answer (Spark's own runtime row-level filtering, bloom
pushdown in Iceberg/Parquet readers) is a Bloom filter of the build-side
keys applied to the probe side *before* the shuffle.

This module implements that pattern with pure DataFrame ops so the plan
is explicit and auditable:

- ``bloom_bitmap`` digests the build side's distinct keys into a tiny
  ``(word_idx, word)`` bitmap table — ``n_bits/64`` rows regardless of
  build-side row count (1M bits = 16,384 rows ≈ 256 KB), produced by one
  aggregation. At 100 TB the build side streams through a map-side
  partial ``bit_or`` and only bitmap words shuffle.
- ``bloom_prefilter`` drops probe rows that cannot match: ``n_hashes``
  chained *broadcast* joins against the bitmap table, each keeping a row
  only when its hash position's bit is set. No explode, no row-ids, no
  Python — everything stays inside whole-stage codegen.
- ``bloom_semi_join`` = prefilter + exact ``left_semi`` confirm. The
  Bloom guarantees no false negatives, so the composition returns
  EXACTLY the plain semi-join result for any (n_bits, n_hashes) — the
  knobs tune shuffle volume, never correctness. The DuckDB oracle for
  the registry query is therefore the plain semi-join.

Sizing: false-positive rate ≈ (1 - e^(-kn/m))^k for n keys, m bits,
k hashes; m/n = 8 bits/key with k = 3 gives ≈ 3% FP — i.e. the exact
confirm join sees ~1.03x the matching rows instead of the full probe
table. Capacity is a caller decision (`n_bits`), as with any bloom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(key_col: F.Column, n_bits: int, n_hashes: int, seed: int) -> list[F.Column]:
    """k independent bit positions per key: pmod(xxhash64(key, seed+i), m).

    xxhash64 is Spark's JVM-side 64-bit hash; distinct literal seeds give
    independent hash functions. Keys are canonicalized to string so the
    same operator serves int and varchar keys identically.
    """
    s = key_col.cast("string")
    return [
        F.pmod(F.xxhash64(s, F.lit(seed + i)), F.lit(n_bits)).alias(f"__pos{i}")
        for i in range(n_hashes)
    ]


def bloom_bitmap(
    build: DataFrame,
    key: str,
    *,
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Digest ``build[key]`` into a bitmap table ``(word_idx int, word bigint)``.

    One distinct + one explode-free union of k position columns + one
    ``bit_or`` aggregation; output is ``<= n_bits/64`` rows (words that
    are all-zero are simply absent — the probe treats a missing word as
    'no bits set', which is exact).
    """
    if n_bits % 64 != 0:
        raise ValueError(f"n_bits must be a multiple of 64, got {n_bits}")
    keys = build.select(F.col(key).alias("__k")).where(F.col("__k").isNotNull()).distinct()
    pos = keys.select(
        F.explode(F.array(*_positions(F.col("__k"), n_bits, n_hashes, seed))).alias(
            "__pos"
        )
    )
    return (
        pos.select(
            (F.col("__pos") / 64).cast("int").alias("word_idx"),
            F.expr("shiftleft(1L, cast(__pos % 64 as int))").alias("__bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__bit").alias("word"))
    )


def bloom_prefilter(
    probe: DataFrame,
    key: str,
    bitmap: DataFrame,
    *,
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Keep only probe rows whose key *might* be in the bloom.

    ``n_hashes`` chained inner broadcast joins, one per hash function:
    each join's condition requires the addressed bit to be set, and a
    missing word_idx row (all-zero word) drops the row outright. Null
    keys are dropped (a null never matches an equi-join anyway). Output
    columns are exactly ``probe``'s.
    """
    if "word_idx" not in bitmap.columns or "word" not in bitmap.columns:
        raise ValueError("bitmap must be a bloom_bitmap() result (word_idx, word)")
    out = probe.where(F.col(key).isNotNull())
    for i, pos in enumerate(_positions(F.col(key), n_bits, n_hashes, seed)):
        bm = F.broadcast(
            bitmap.select(
                F.col("word_idx").alias(f"__w{i}"), F.col("word").alias(f"__word{i}")
            )
        )
        out = (
            out.withColumn(f"__pos{i}", pos)
            .join(bm, (F.col(f"__pos{i}") / 64).cast("int") == F.col(f"__w{i}"), "inner")
            .where(
                F.expr(
                    f"(shiftright(__word{i}, cast(__pos{i} % 64 as int)) & 1L) = 1L"
                )
            )
            .drop(f"__pos{i}", f"__w{i}", f"__word{i}")
        )
    return out


def materialized_bitmap(bitmap: DataFrame) -> DataFrame:
    """Compute a bloom bitmap once and pin it as a driver-local relation.

    ``bloom_prefilter`` references the bitmap ``n_hashes`` times; left
    lazy, Spark would recompute the build-side digest under every
    broadcast exchange. The bitmap is a BOUNDED digest (``n_bits/64``
    rows — 16,384 for the 1M-bit default — independent of build-side row
    count), so collecting it is the same model-sized-collect pattern as
    k-means centroids: one distributed aggregation, then every broadcast
    is a free LocalRelation. Guarded at 2^20 rows (64M bits / ~8 MB).
    """
    rows = bitmap.limit((1 << 20) + 1).collect()
    if len(rows) > (1 << 20):
        raise ValueError("bitmap too large to materialize (> 2^20 words)")
    return bitmap.sparkSession.createDataFrame(rows, "word_idx int, word bigint")


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    *,
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Exact ``probe SEMI JOIN build ON key`` with a bloom prefilter.

    Equivalent to ``probe.join(build, key, "left_semi")`` for every
    parameter choice (no false negatives); the prefilter shrinks what
    reaches the semi-join's shuffle. Use when ``build`` is too large to
    broadcast but its bitmap digest is not.
    """
    bm = materialized_bitmap(
        bloom_bitmap(build, key, n_bits=n_bits, n_hashes=n_hashes, seed=seed)
    )
    pre = bloom_prefilter(probe, key, bm, n_bits=n_bits, n_hashes=n_hashes, seed=seed)
    return pre.join(build.select(key).distinct(), key, "left_semi")
