"""Progressive JPEG (T.81 Annex G: spectral selection + successive
approximation). The decisive oracle: successive approximation transmits
the full quantized coefficients by the final Al=0 passes, so a
progressive round trip must reconstruct EXACTLY the bytes the
sequential baseline codec produces for the same image."""

from __future__ import annotations

import numpy as np
import pytest

from mergermetrics_lakehouse_pipeline_spark.operators.jpeg import (
    jpeg_color_decode,
    jpeg_color_encode,
    jpeg_frame_marker,
    jpeg_gray_decode,
    jpeg_gray_encode,
)
from mergermetrics_lakehouse_pipeline_spark.operators.jpeg_progressive import (
    jpeg_progressive_decode,
    jpeg_progressive_encode,
)


@pytest.mark.parametrize(
    "dims", [(8, 8), (16, 16), (17, 35), (21, 16), (1, 1), (40, 56)]
)
def test_gray_progressive_equals_baseline(dims):
    rng = np.random.default_rng(dims[0] * 100 + dims[1])
    img = rng.integers(0, 256, dims, dtype=np.uint8)
    pw, ph, pdec = jpeg_progressive_decode(jpeg_progressive_encode(img))
    bw, bh, bdec = jpeg_gray_decode(jpeg_gray_encode(img))
    assert (pw, ph) == (bw, bh)
    assert np.array_equal(pdec, bdec)


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("dims", [(8, 8), (17, 35), (24, 33), (9, 25)])
def test_color_progressive_equals_baseline(sub, dims):
    rng = np.random.default_rng(dims[0] * 100 + dims[1])
    img = rng.integers(0, 256, dims + (3,), dtype=np.uint8)
    pw, ph, pdec = jpeg_progressive_decode(jpeg_progressive_encode(img, sub))
    bw, bh, bdec = jpeg_color_decode(jpeg_color_encode(img, sub))
    assert (pw, ph) == (bw, bh)
    assert np.array_equal(pdec, bdec)


def test_frame_markers():
    g = jpeg_gray_encode(np.full((8, 8), 100, np.uint8))
    p = jpeg_progressive_encode(np.full((8, 8), 100, np.uint8))
    assert jpeg_frame_marker(g) == 0xC0
    assert jpeg_frame_marker(p) == 0xC2


def test_progressive_stream_structure():
    img = np.full((16, 16, 3), 90, np.uint8)
    payload = jpeg_progressive_encode(img, "420")
    assert payload.startswith(b"\xff\xd8") and payload.endswith(b"\xff\xd9")
    assert b"\xff\xc2" in payload  # SOF2
    assert payload.count(b"\xff\xda") >= 8  # the multi-scan script
    # cross-decoder rejections stay loud
    with pytest.raises(ValueError, match="SOF2"):
        jpeg_color_decode(payload)
    with pytest.raises(ValueError, match="SOF0"):
        jpeg_progressive_decode(jpeg_color_encode(img))


def test_router_dispatches_progressive():
    from mergermetrics_lakehouse_pipeline_spark.operators.multimodal import (
        _decode_payload,
    )

    img = np.zeros((16, 24, 3), np.uint8)
    img[..., 1] = 40 + 2 * np.arange(24)[None, :] + np.arange(16)[:, None]
    out = _decode_payload(jpeg_progressive_encode(img, "420"), strict=True)
    assert out["decoder"] == "jpeg"
    assert (out["dec_width"], out["dec_height"]) == (24, 16)
    # progressive and baseline agree on the features too (same coeffs)
    base = _decode_payload(jpeg_color_encode(img, "420"), strict=True)
    assert out["phash"] == base["phash"]
    assert out["feature"] == base["feature"]


def test_encode_deterministic():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    assert jpeg_progressive_encode(img) == jpeg_progressive_encode(img)


def test_sparse_and_saturated_content():
    # mostly-zero blocks exercise long EOB runs; saturated blocks
    # exercise ZRL chains and refinement corrections
    img = np.zeros((48, 48, 3), np.uint8)
    img[20:28, 20:28] = 255
    img[40, 5] = 200
    for sub in ("444", "420"):
        _w, _h, pdec = jpeg_progressive_decode(
            jpeg_progressive_encode(img, sub)
        )
        _w, _h, bdec = jpeg_color_decode(jpeg_color_encode(img, sub))
        assert np.array_equal(pdec, bdec)


@pytest.mark.parametrize("sub", ["444", "420"])
def test_per_component_dc_scans_decode(sub):
    """Review r10 pass-2 finding #2: ns=1 DC scans are non-interleaved
    and traverse the component's own block grid (mozjpeg-style scan
    scripts) — smaller than the MCU-padded grid for subsampled luma."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 33, 3), dtype=np.uint8)
    prog = jpeg_progressive_encode(img, sub, dc_scans="per-component")
    base = jpeg_color_decode(jpeg_color_encode(img, sub))[2]
    assert np.array_equal(jpeg_progressive_decode(prog)[2], base)
    # the per-component script has two extra DC scans (3 first + 3
    # refine vs 1 + 1)
    inter = jpeg_progressive_encode(img, sub, dc_scans="interleaved")
    assert prog.count(b"\xff\xda") == inter.count(b"\xff\xda") + 4


def test_vacuum_corrupt_retained_commit_aborts(spark, tmp_path):
    """Review r10 pass-2 finding #1: a corrupt retained commit must
    ABORT the vacuum (JSONDecodeError propagates), not skip-and-delete
    that snapshot's files."""
    import glob
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from mergermetrics_lakehouse_pipeline_spark.sources.delta_log import (
        vacuum_delta,
        write_delta,
    )

    tbl = str(tmp_path / "t")
    kv = lambda lo, hi: spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("g")
    )
    write_delta(kv(0, 10), tbl, mode="overwrite")
    write_delta(kv(10, 20), tbl, mode="append")
    write_delta(kv(20, 30), tbl, mode="append")
    # corrupt a retained (non-head) commit
    c1 = os.path.join(tbl, "_delta_log", f"{1:020d}.json")
    with open(c1, "a", encoding="utf-8") as fh:
        fh.write('{"add": {"path": truncated\n')
    n_files = len(glob.glob(os.path.join(tbl, "*.parquet")))
    with _pytest.raises(Exception, match="Expecting|JSON|value"):
        vacuum_delta(spark, tbl, retain_last=3)
    assert len(glob.glob(os.path.join(tbl, "*.parquet"))) == n_files
