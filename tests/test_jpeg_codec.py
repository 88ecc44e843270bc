"""Baseline JPEG codec (operators/jpeg.py): spec-structural checks and
roundtrip bounds — no codec libraries exist in this container, so the
encoder's output doubles as the decoder's fixture corpus (and the
byte-level structure is asserted against the T.81 marker grammar)."""

from __future__ import annotations

import numpy as np
import pytest

from mergermetrics_lakehouse_pipeline_spark.operators.jpeg import (
    STD_LUMA_QUANT,
    ZIGZAG,
    jpeg_gray_decode,
    jpeg_gray_encode,
)
from mergermetrics_lakehouse_pipeline_spark.operators.multimodal import (
    _decode_payload,
)


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG) == [(r, c) for r in range(8) for c in range(8)]
    # spec's first entries
    assert ZIGZAG[:4] == [(0, 0), (0, 1), (1, 0), (2, 0)]


def test_marker_structure():
    b = jpeg_gray_encode(np.full((8, 8), 50, dtype=np.uint8))
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    # APP0/JFIF, DQT, SOF0, DHT, SOS all present in order
    markers = []
    pos = 2
    while pos + 4 <= len(b):
        assert b[pos] == 0xFF
        m = b[pos + 1]
        markers.append(m)
        if m == 0xDA:
            break
        (ln,) = __import__("struct").unpack(">H", b[pos + 2:pos + 4])
        pos += 2 + ln
    assert markers == [0xE0, 0xDB, 0xC0, 0xC4, 0xC4, 0xDA]


def test_constant_blocks_roundtrip_exact():
    for val in (0, 1, 77, 128, 200, 255):
        img = np.full((16, 24), val, dtype=np.uint8)
        w, h, dec = jpeg_gray_decode(jpeg_gray_encode(img))
        assert (w, h) == (24, 16)
        # DC-only blocks: quantized DC reconstructs within one
        # luminance quant step / 8, and the clamp keeps extremes exact
        assert np.abs(dec.astype(int) - int(val)).max() <= 2


def test_smooth_gradient_bounded_error():
    img = (
        20 + 2 * np.arange(40)[None, :] + 3 * np.arange(24)[:, None]
    ).astype(np.uint8)
    w, h, dec = jpeg_gray_decode(jpeg_gray_encode(img))
    assert (w, h) == (40, 24)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4


def test_non_multiple_of_8_dims():
    img = np.fromfunction(
        lambda y, x: (x * 5 + y * 7) % 200, (13, 19)
    ).astype(np.uint8)
    w, h, dec = jpeg_gray_decode(jpeg_gray_encode(img))
    assert (w, h) == (19, 13)
    assert dec.shape == (13, 19)


def test_sharp_content_decodes_without_error_paths():
    # checkerboard maximizes AC energy (exercises ZRL/EOB and negative
    # coefficient amplitudes); lossy, but must decode cleanly
    img = (np.indices((16, 16)).sum(axis=0) % 2 * 255).astype(np.uint8)
    w, h, dec = jpeg_gray_decode(jpeg_gray_encode(img))
    assert dec.shape == img.shape


def test_byte_stuffing_roundtrip():
    # white blocks push entropy bytes toward 0xFF sequences; the
    # stuffed stream must still parse
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    payload = jpeg_gray_encode(img)
    w, h, dec = jpeg_gray_decode(payload)
    assert (w, h) == (32, 32)


def test_progressive_rejected():
    b = bytearray(jpeg_gray_encode(np.full((8, 8), 9, dtype=np.uint8)))
    sof = b.index(b"\xff\xc0")
    b[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="SOF"):
        jpeg_gray_decode(bytes(b))


def test_multimodal_dispatch_routes_jpeg():
    img = (
        30 + np.arange(16)[None, :] * 2 + np.arange(16)[:, None]
    ).astype(np.uint8)
    out = _decode_payload(jpeg_gray_encode(img), strict=True)
    assert out["decoder"] == "jpeg"
    assert (out["dec_width"], out["dec_height"]) == (16, 16)
    assert len(out["feature"]) == 16
    assert isinstance(out["phash"], int)


def test_quant_table_is_annex_k():
    assert STD_LUMA_QUANT[0, 0] == 16 and STD_LUMA_QUANT[7, 7] == 99
    assert STD_LUMA_QUANT.sum() == np.int64(
        sum(
            [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60,
             55, 14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87,
             80, 62, 18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64,
             81, 104, 113, 92, 49, 64, 78, 87, 103, 121, 120, 101, 72,
             92, 95, 98, 112, 100, 103, 99]
        )
    )


def test_fill_bytes_before_markers_tolerated():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
    marker byte (r10 advice) — a padded foreign stream must decode
    identically, not raise / fall back to the stub decoder."""
    from mergermetrics_lakehouse_pipeline_spark.operators.jpeg import (
        _sof_probe,
        jpeg_frame_marker,
    )

    img = (
        25 + np.arange(24)[None, :] * 3 + np.arange(16)[:, None] * 2
    ).astype(np.uint8)
    plain = jpeg_gray_encode(img)
    # re-pad: insert two fill 0xFFs before every marker after SOI
    padded = bytearray(plain[:2])
    pos = 2
    while pos + 4 <= len(plain):
        assert plain[pos] == 0xFF
        m = plain[pos + 1]
        padded += b"\xff\xff" + plain[pos:pos + 2]
        if m == 0xDA:
            padded += plain[pos + 2:]
            break
        (ln,) = __import__("struct").unpack(">H", plain[pos + 2:pos + 4])
        padded += plain[pos + 2:pos + 2 + ln]
        pos += 2 + ln
    padded = bytes(padded)
    assert jpeg_frame_marker(padded) == 0xC0
    assert _sof_probe(padded)[1] == 1
    w0, h0, dec0 = jpeg_gray_decode(plain)
    w1, h1, dec1 = jpeg_gray_decode(padded)
    assert (w0, h0) == (w1, h1) == (24, 16)
    assert np.array_equal(dec0, dec1)
