"""Color JPEG (round 10, VERDICT r9 next-step #1): 3-component YCbCr
encode+decode at 4:4:4 and 4:2:0, Annex-K chroma tables, interleaved
MCUs, JFIF BT.601 color transform. Bounds below are deterministic —
the codec is pure numpy float64, so a measured error is a stable one."""

from __future__ import annotations

import numpy as np
import pytest

from mergermetrics_lakehouse_pipeline_spark.operators.jpeg import (
    jpeg_color_decode,
    jpeg_color_encode,
    jpeg_gray_decode,
    jpeg_gray_encode,
    jpeg_sof_components,
)


def _ramp(h, w, seed=0):
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = (40 + 2 * np.arange(w)[None, :] + 3 * np.arange(h)[:, None] + seed) % 200
    img[..., 1] = (90 + np.arange(w)[None, :] + np.arange(h)[:, None] + seed) % 200
    img[..., 2] = (10 + 2 * np.arange(w)[None, :] + seed) % 200
    return img


@pytest.mark.parametrize("sub", ["444", "420"])
def test_constant_tile_roundtrip(sub):
    img = np.zeros((16, 16, 3), np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 200, 100, 50
    w, h, dec = jpeg_color_decode(jpeg_color_encode(img, sub))
    assert (w, h) == (16, 16)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("dims", [(21, 35), (8, 8), (17, 16), (16, 17), (1, 1)])
def test_smooth_ramp_roundtrip_bounded(sub, dims):
    img = _ramp(*dims)
    w, h, dec = jpeg_color_decode(jpeg_color_encode(img, sub))
    assert (w, h) == (dims[1], dims[0])
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 14


def test_sof_structure():
    img = _ramp(16, 16)
    p420 = jpeg_color_encode(img, "420")
    p444 = jpeg_color_encode(img, "444")
    assert jpeg_sof_components(p420) == 3
    assert jpeg_sof_components(p444) == 3
    # SOF sampling byte of component Y: 0x22 for 4:2:0, 0x11 for 4:4:4
    i420 = p420.find(b"\xff\xc0")
    i444 = p444.find(b"\xff\xc0")
    assert p420[i420 + 11] == 0x22
    assert p444[i444 + 11] == 0x11
    # 4:2:0 spends fewer bytes on the same image (3/4 fewer chroma blocks)
    assert len(p420) < len(p444)


def test_gray_input_decodes_gray():
    g = np.tile(np.arange(64, 192, 8, dtype=np.uint8), (16, 1))
    img = np.stack([g, g, g], axis=-1)
    _w, _h, dec = jpeg_color_decode(jpeg_color_encode(img, "420"))
    # channels stay equal within the chroma-quantization wiggle
    assert np.abs(dec[..., 0].astype(int) - dec[..., 1].astype(int)).max() <= 3
    assert np.abs(dec[..., 0].astype(int) - dec[..., 2].astype(int)).max() <= 3


def test_saturated_patches_keep_channel_order():
    img = np.zeros((16, 32, 3), np.uint8)
    img[:, :16, 0] = 220  # red left half
    img[:, 16:, 2] = 220  # blue right half
    _w, _h, dec = jpeg_color_decode(jpeg_color_encode(img, "420"))
    left, right = dec[4:12, 4:12], dec[4:12, 20:28]
    assert left[..., 0].mean() > left[..., 2].mean() + 100
    assert right[..., 2].mean() > right[..., 0].mean() + 100


def test_encode_is_deterministic():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    for sub in ("444", "420"):
        a = jpeg_color_encode(img, sub)
        assert a == jpeg_color_encode(img, sub)
        w, h, dec = jpeg_color_decode(a)
        assert (w, h) == (24, 24) and dec.shape == img.shape


def test_cross_dispatch_rejections():
    gray = jpeg_gray_encode(np.full((8, 8), 128, np.uint8))
    with pytest.raises(ValueError, match="1-component"):
        jpeg_color_decode(gray)
    color = jpeg_color_encode(_ramp(8, 8))
    with pytest.raises(ValueError, match="multi-component"):
        jpeg_gray_decode(color)
    assert jpeg_sof_components(gray) == 1


def test_multimodal_router_dispatches_color():
    from mergermetrics_lakehouse_pipeline_spark.operators.multimodal import (
        _decode_payload,
    )

    out = _decode_payload(jpeg_color_encode(_ramp(16, 24), "420"), strict=True)
    assert out["decoder"] == "jpeg"
    assert (out["dec_width"], out["dec_height"]) == (24, 16)
    assert out["phash"] is not None
    # grayscale routing unchanged
    g = _decode_payload(
        jpeg_gray_encode(np.full((8, 8), 128, np.uint8)), strict=True
    )
    assert g["decoder"] == "jpeg"


def test_bad_subsampling_rejected():
    with pytest.raises(ValueError, match="subsampling"):
        jpeg_color_encode(_ramp(8, 8), "411")
    with pytest.raises(ValueError, match="HxWx3"):
        jpeg_color_encode(np.zeros((8, 8), np.uint8))


def test_422_encode_roundtrip():
    """4:2:2 (horizontal-only chroma subsampling): sampling byte 0x21,
    the decoder's general MCU walk handles the 2x1 layout."""
    img = np.zeros((17, 35, 3), np.uint8)
    img[..., 0] = 40 + 2 * np.arange(35)[None, :] + 3 * np.arange(17)[:, None]
    img[..., 1] = 90 + np.arange(35)[None, :] + np.arange(17)[:, None]
    img[..., 2] = 10 + 2 * np.arange(35)[None, :]
    p = jpeg_color_encode(img, "422")
    i = p.find(b"\xff\xc0")
    assert p[i + 11] == 0x21
    w, h, dec = jpeg_color_decode(p)
    assert (w, h) == (35, 17)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 14
    # chroma cost sits between 4:2:0 and 4:4:4 (strict on noise, where
    # chroma blocks actually carry data; smooth ramps converge)
    noisy = np.random.default_rng(4).integers(
        0, 256, (32, 32, 3), dtype=np.uint8
    )
    assert (
        len(jpeg_color_encode(noisy, "420"))
        < len(jpeg_color_encode(noisy, "422"))
        < len(jpeg_color_encode(noisy, "444"))
    )


def _splice_app14(payload: bytes, transform: int) -> bytes:
    """Insert an APP14 Adobe segment right after SOI."""
    import struct

    body = b"Adobe" + b"\x00\x64" + b"\x00\x00" + b"\x00\x00" + bytes(
        [transform]
    )
    seg = struct.pack(">HH", 0xFFEE, len(body) + 2) + body
    return payload[:2] + seg + payload[2:]


def test_app14_transform0_skips_color_transform():
    """Review r10 finding #4: APP14 transform=0 declares the components
    are straight R,G,B — the BT.601 inverse must NOT run."""
    img = np.zeros((8, 8, 3), np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 200, 100, 50
    payload = jpeg_color_encode(img, "444")
    # what the encoder actually stored per plane (the YCbCr values)
    y = 0.299 * 200 + 0.587 * 100 + 0.114 * 50
    cb = 128 - 0.168736 * 200 - 0.331264 * 100 + 0.5 * 50
    cr = 128 + 0.5 * 200 - 0.418688 * 100 - 0.081312 * 50

    _w, _h, as_rgbmode = jpeg_color_decode(_splice_app14(payload, 0))
    # plane pass-through: channel k ~= the stored plane value
    assert abs(int(as_rgbmode[4, 4, 0]) - y) <= 2
    assert abs(int(as_rgbmode[4, 4, 1]) - cb) <= 2
    assert abs(int(as_rgbmode[4, 4, 2]) - cr) <= 2

    # transform=1 (explicit YCbCr) matches the default decode
    _w, _h, as_ycbcr = jpeg_color_decode(_splice_app14(payload, 1))
    _w, _h, default = jpeg_color_decode(payload)
    assert np.array_equal(as_ycbcr, default)
    assert np.abs(default[4, 4].astype(int) - [200, 100, 50]).max() <= 2


def test_app14_ycck_rejected():
    payload = jpeg_color_encode(_ramp(8, 8), "444")
    with pytest.raises(ValueError, match="YCCK"):
        jpeg_color_decode(_splice_app14(payload, 2))


def test_rgb_component_ids_skip_color_transform():
    """Component ids 'R','G','B' (no APP14) also mean straight RGB."""
    img = np.zeros((8, 8, 3), np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 200, 100, 50
    payload = bytearray(jpeg_color_encode(img, "444"))
    sof = bytes(payload).index(b"\xff\xc0")
    # component ids live at sof+10, +13, +16 (cid, hv, tq triplets)
    assert payload[sof + 10] == 1 and payload[sof + 13] == 2
    for off, cid in ((10, 0x52), (13, 0x47), (16, 0x42)):
        payload[sof + off] = cid
    sos = bytes(payload).index(b"\xff\xda")
    # SOS component selectors at sos+5, +7, +9
    assert payload[sos + 5] == 1
    for off, cid in ((5, 0x52), (7, 0x47), (9, 0x42)):
        payload[sos + off] = cid
    _w, _h, dec = jpeg_color_decode(bytes(payload))
    y = 0.299 * 200 + 0.587 * 100 + 0.114 * 50
    assert abs(int(dec[4, 4, 0]) - y) <= 2  # plane passed through raw


@pytest.mark.parametrize("ri", [1, 3, 7])
def test_restart_markers_roundtrip(ri):
    """DRI/RSTn streams (camera layout): decode must equal the
    restart-free stream bit-for-bit — markers only segment the entropy
    data and reset DC predictors."""
    rng = np.random.default_rng(21)
    g = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    from mergermetrics_lakehouse_pipeline_spark.operators.jpeg import (
        jpeg_gray_decode as gdec,
        jpeg_gray_encode as genc,
    )

    with_rst = genc(g, restart_interval=ri)
    assert b"\xff\xdd" in with_rst  # DRI present
    assert any(bytes([0xFF, 0xD0 | m]) in with_rst for m in range(8))
    assert np.array_equal(gdec(with_rst)[2], gdec(genc(g))[2])

    c = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    for sub in ("444", "420", "422"):
        with_rst = jpeg_color_encode(c, sub, restart_interval=ri)
        assert np.array_equal(
            jpeg_color_decode(with_rst)[2],
            jpeg_color_decode(jpeg_color_encode(c, sub))[2],
        )


def test_restart_marker_out_of_sequence_raises():
    g = np.full((24, 40), 77, np.uint8)
    from mergermetrics_lakehouse_pipeline_spark.operators.jpeg import (
        jpeg_gray_decode as gdec,
        jpeg_gray_encode as genc,
    )

    payload = bytearray(genc(g, restart_interval=2))
    i = bytes(payload).find(b"\xff\xd0")
    assert i > 0
    payload[i + 1] = 0xD5  # wrong counter
    with pytest.raises(ValueError, match="out of sequence"):
        gdec(bytes(payload))
