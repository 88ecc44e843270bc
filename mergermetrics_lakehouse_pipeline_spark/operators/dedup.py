"""Deduplication operators for training-data pipelines.

Five strategies, all shuffle-conscious and driver-loop-free:

- **exact**: md5 content key -> groupBy (one shuffle on the 128-bit key;
  at 100 TB the key is tiny compared to the text it stands for).
- **MinHash + LSH**: word shingles -> k minhashes -> b bands -> bucket
  join. Hash function is ``md5(i || '|' || shingle)`` taken as a *string*
  minimum — lexicographic MIN over fixed-width hex equals numeric MIN,
  is portable to the SQL oracle, and needs no bigint conversion.
- **SimHash**: 32-bit sign-aggregated token hashes (Hamming-style
  near-dup key), JVM expressions only.
- **n-gram Jaccard**: exact set similarity on candidate pairs (array
  intersect/union), used to confirm LSH candidates.
- **embedding cosine**: near-dup by vector similarity (see
  operators/similarity.py for the dot-product kernel).

Scale notes: LSH candidate generation is a self-join per band bucket —
the classic quadratic-blowup risk is bounded by banding (buckets are
small when r is large enough); the confirm step runs only on candidates.
Everything partitions by hash keys, so skew is statistical, not data-
driven.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens, word_shingles


def content_key(col: Column | str, *, normalize: bool = True) -> Column:
    """Exact-dup grouping key: md5 of (optionally whitespace-normalized)
    text."""
    c = F.col(col) if isinstance(col, str) else col
    if normalize:
        c = F.concat_ws(" ", tokens(c))
    return F.md5(c)


def exact_duplicate_groups(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Groups of byte-identical (normalized) documents: one row per
    duplicated content key with member count and the canonical (min) id."""
    return (
        df.select(content_key(text_col).alias("content_key"), F.col(id_col))
        .groupBy("content_key")
        .agg(F.count("*").alias("n_members"), F.min(id_col).alias("canonical_id"))
        .filter(F.col("n_members") > 1)
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep exactly one row (min id) per distinct normalized content."""
    ranked = df.withColumn("__ck", content_key(text_col)).withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy("__ck").orderBy(F.col(id_col))),
    )
    return ranked.filter(F.col("__rn") == 1).drop("__ck", "__rn")


def minhash_signature(
    col: Column | str, *, num_hashes: int = 12, shingle_n: int = 3
) -> Column:
    """Array of ``num_hashes`` minhash values (hex strings) over word
    shingles. h_i(doc) = MIN(md5(i || '|' || shingle))."""
    sh = word_shingles(col, shingle_n)
    return F.array(
        *[
            F.array_min(
                F.transform(sh, lambda s, i=i: F.md5(F.concat_ws("|", F.lit(str(i)), s)))
            )
            for i in range(num_hashes)
        ]
    )


def lsh_band_keys(sig: Column, *, bands: int, rows: int) -> Column:
    """Fold a minhash signature into ``bands`` bucket keys:
    band_key_j = md5(j || '|' || sig[j*r] || ... || sig[j*r + r-1])."""
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(str(b)),
                    *[F.element_at(sig, b * rows + r + 1) for r in range(rows)],
                )
            )
            for b in range(bands)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) sharing >= 1 LSH band.

    Pipeline: signature -> band keys -> explode -> self-join per bucket.
    Distinct at the end removes multi-band rematches.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sig = minhash_signature(text_col, num_hashes=num_hashes, shingle_n=shingle_n)
    banded = (
        df.select(F.col(id_col).alias("doc_id"), sig.alias("sig"))
        .select("doc_id", F.posexplode(lsh_band_keys(F.col("sig"), bands=bands, rows=rows)).alias("band", "band_key"))
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Jaccard similarity over distinct word shingles for the given
    candidate ``pairs`` (columns id_a, id_b). Returns pairs with
    ``jaccard`` >= threshold, rounded to 6dp."""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(text_col, shingle_n).alias("sh"),
    )
    joined = (
        pairs.join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        joined.select(
            "id_a",
            "id_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash32(col: Column | str) -> Column:
    """32-bit SimHash over whitespace tokens.

    bit_j = sign of sum over tokens of (+1 if bit j of xxhash64(token)
    else -1); packed into a bigint. Near-dups share most bits (compare
    via Hamming distance). JVM-only expressions; no SQL oracle (xxhash64
    is Spark-specific) — verified by property tests instead.
    """
    toks = tokens(col)

    def vote(j: int):
        def step(acc, t):
            bit = F.shiftright(F.xxhash64(t), j).bitwiseAND(F.lit(1))
            return acc + F.when(bit == 1, 1).otherwise(-1)

        return step

    bit_votes = [F.aggregate(toks, F.lit(0), vote(j)) for j in range(32)]
    out = F.lit(0).cast("bigint")
    for j, vote in enumerate(bit_votes):
        out = out + F.when(vote > 0, F.lit(2**j).cast("bigint")).otherwise(F.lit(0))
    return out


def hamming32(a: Column, b: Column) -> Column:
    """Hamming distance between two 32-bit simhash keys."""
    return F.bit_count(a.bitwiseXOR(b))
