"""Multimodal (image/audio/video) column handling.

Media travels as opaque ``binary`` columns plus a typed metadata struct —
the Spark-native shape for 100 TB multimodal corpora (payload stays
columnar/compressed, metadata prunes without touching bytes).

The decode kernels themselves (JPEG/PNG/audio codecs) are STUBBED: the
image/audio libraries are not available in this container. Every stub is
clearly marked and either raises NotImplementedError (strict mode) or
produces a deterministic fake derived from the payload bytes (plumbing
mode, default) so the Spark-side contract — schema, Arrow batch shape,
partitioning — is real and tested end-to-end.

The distributed plumbing here is production-shaped: ``mapInPandas`` with
Arrow batches, bounded batch memory via
``spark.sql.execution.arrow.maxRecordsPerBatch``, no driver collection.
Swap `_decode_image_batch` for a real PIL/libvips call on a cluster with
the codec installed and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical media-row schema: opaque payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("format", StringType(), True),  # jpeg|png|wav|mp4|...
        StructField("content", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def _fake_decode(payload: bytes) -> list[float]:
    """STUB decode: deterministic pseudo-feature from the payload digest.

    Stands in for decode->resize->embed; replace with a real codec call
    in production. Deterministic so tests and oracles are stable.
    """
    digest = hashlib.sha256(payload or b"").digest()
    return [
        int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65535.0
        for i in range(FEATURE_DIM)
    ]


def extract_features(
    media: DataFrame, *, strict: bool = False, batch_limit: int = 1024
) -> DataFrame:
    """Decode + feature-extract every media row via Arrow-batched
    ``mapInPandas``. ``strict=True`` raises NotImplementedError (no real
    codec in this environment) instead of using the stub."""
    if strict:
        raise NotImplementedError(
            "real image/audio decode requires codec libraries not present "
            "in this container; run with strict=False for the stubbed "
            "deterministic kernel"
        )

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature": pdf["content"].map(
                        lambda b: _fake_decode(bytes(b) if b is not None else b"")
                    ),
                }
            )
            yield out

    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_limit))
    return media.select("media_id", "media_type", "content").mapInPandas(
        decode_batches, schema=_FEATURE_SCHEMA
    )


def resize_metadata(media: DataFrame, *, max_side: int = 512) -> DataFrame:
    """Resize PLAN (pure metadata math — no pixels touched): target
    dimensions preserving aspect ratio with ``max_side`` cap. The actual
    pixel resample is part of the stubbed decode kernel."""
    scale = F.when(
        F.greatest("width", "height") <= max_side, F.lit(1.0)
    ).otherwise(max_side / F.greatest("width", "height").cast("double"))
    return media.withColumn(
        "target_width", F.round(F.col("width") * scale).cast("int")
    ).withColumn("target_height", F.round(F.col("height") * scale).cast("int"))


def sample_frame_offsets(media: DataFrame, *, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling PLAN for video rows: one output row per sampled
    timestamp (sequence + explode — distributed, no driver loop). Frame
    extraction itself is the stubbed decode kernel."""
    video = media.filter(F.col("media_type") == "video")
    return video.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_offset_ms"),
    )


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents testdata
    (text bytes as payload) so the multimodal plumbing is exercised
    against driver-provided inputs."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.element_at(
            F.array(F.lit("png"), F.lit("wav"), F.lit("mp4")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("format"),
        F.encode("text", "UTF-8").alias("content"),
        (F.col("n_chars") % 1000 + 1).cast("int").alias("width"),
        (F.col("n_chars") % 800 + 1).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
    )


def payload_dedup_groups(media: DataFrame, *, id_col: str = "media_id") -> DataFrame:
    """Exact duplicate groups over the opaque binary payload: md5 of the
    raw bytes (no decode needed — byte-identical media dedups regardless
    of type). One shuffle on the 128-bit key; the payload bytes
    themselves never shuffle."""
    return (
        media.select(F.md5(F.col("content")).alias("payload_key"), F.col(id_col))
        .groupBy("payload_key")
        .agg(
            F.count("*").alias("n_members"),
            F.min(id_col).alias("canonical_id"),
        )
        .filter(F.col("n_members") > 1)
    )
