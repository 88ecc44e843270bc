"""Multimodal decode kernels: the REAL stdlib decoders (WAV via ``wave``,
gray8 PNG via zlib inflate + de-filter) exercised end-to-end through the
Arrow mapInPandas plumbing, plus stub-fallback determinism and strict
mode. Payloads are generated in-test so expected values are exact."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import pytest

from mergermetrics_lakehouse_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    _fake_decode,
    extract_features,
)


def make_wav(n_frames: int = 8000, rate: int = 8000) -> bytes:
    """Mono 16-bit PCM: a deterministic ramp so segment means are known."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        frames = b"".join(
            struct.pack("<h", (i * 7) % 16384) for i in range(n_frames)
        )
        w.writeframes(frames)
    return buf.getvalue()


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def make_png_gray8(width: int, height: int) -> bytes:
    """Non-interlaced 8-bit grayscale PNG with mixed scanline filters
    (None/Sub/Up) so the de-filter paths are all exercised."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b""
    prev = [0] * width
    for y in range(height):
        pixels = [(x + y * 3) % 256 for x in range(width)]
        ftype = y % 3
        if ftype == 0:
            body = bytes(pixels)
        elif ftype == 1:  # Sub: delta vs left neighbor
            body = bytes(
                [(pixels[x] - (pixels[x - 1] if x else 0)) & 0xFF for x in range(width)]
            )
        else:  # Up: delta vs previous scanline
            body = bytes([(pixels[x] - prev[x]) & 0xFF for x in range(width)])
        raw += bytes([ftype]) + body
        prev = pixels
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _media_df(spark, rows):
    return spark.createDataFrame(
        rows, "media_id long, media_type string, content binary"
    )


def test_wav_decodes_for_real(spark):
    df = _media_df(spark, [(1, "audio", make_wav(n_frames=8000, rate=8000))])
    [row] = extract_features(df).collect()
    assert row.decoder == "wav"
    assert row.dec_duration_ms == 1000  # 8000 frames @ 8 kHz
    assert len(row.feature) == FEATURE_DIM
    # ramp amplitudes: every segment mean is positive and bounded
    assert all(0.0 < f < 0.5 for f in row.feature)


def test_png_decodes_for_real(spark):
    df = _media_df(spark, [(2, "image", make_png_gray8(64, 48))])
    [row] = extract_features(df).collect()
    assert row.decoder == "png"
    assert (row.dec_width, row.dec_height) == (64, 48)
    # exact expected features: mean intensity per 16-way pixel split
    pixels = [
        ((x + y * 3) % 256) / 255.0 for y in range(48) for x in range(64)
    ]
    n = len(pixels)
    expected = [
        sum(pixels[i * n // 16 : (i + 1) * n // 16])
        / len(pixels[i * n // 16 : (i + 1) * n // 16])
        for i in range(16)
    ]
    for got, want in zip(row.feature, expected):
        assert abs(got - want) < 1e-6


def test_unknown_format_uses_deterministic_stub(spark):
    payload = b"not a media file"
    df = _media_df(spark, [(3, "video", payload)])
    [row] = extract_features(df).collect()
    assert row.decoder == "stub"
    assert row.dec_width is None and row.dec_duration_ms is None
    for got, want in zip(row.feature, _fake_decode(payload)):
        assert abs(got - want) < 1e-6


def test_corrupt_png_falls_back_to_stub(spark):
    # valid magic, truncated body -> decoder error -> stub, not task failure
    payload = b"\x89PNG\r\n\x1a\n" + b"\x00" * 10
    df = _media_df(spark, [(4, "image", payload)])
    [row] = extract_features(df).collect()
    assert row.decoder == "stub"


def test_strict_mode_fails_on_stub_fallback(spark):
    df = _media_df(spark, [(5, "video", b"not a media file")])
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        extract_features(df, strict=True).collect()


def test_wav_container_expression_is_valid_wav(spark):
    """The pure-JVM RIFF wrapper produces bytes the stdlib wave module
    parses — so the registry's media query exercises the REAL decoder."""
    from pyspark.sql import functions as F

    from mergermetrics_lakehouse_pipeline_spark.operators.multimodal import (
        wav_container,
    )

    df = spark.createDataFrame([("abcdef12",)], "txt string").select(
        wav_container(F.encode("txt", "UTF-8")).alias("content")
    )
    payload = bytes(df.collect()[0].content)
    with wave.open(io.BytesIO(payload), "rb") as w:
        assert w.getnchannels() == 1
        assert w.getframerate() == 8000
        assert w.getsampwidth() == 2
        assert w.getnframes() == 4  # 8 bytes of PCM @ 2 bytes/frame
        assert w.readframes(4) == b"abcdef12"


def test_synthesized_audio_rows_really_decode(spark, sf_dir):
    from mergermetrics_lakehouse_pipeline_spark.operators.multimodal import (
        synthesize_decodable_media,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    media = synthesize_decodable_media(docs)
    rows = extract_features(media).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.media_type, set()).add(r.decoder)
    assert by_type["audio"] == {"wav"}  # every audio row really decoded
    # image rows carry REAL containers: gray8 PNG (even ids) and
    # grayscale GIF89a (odd ids) since round 6
    assert by_type["image"] == {"png", "gif"}
    assert by_type["video"] == {"stub"}
    audio = [r for r in rows if r.media_type == "audio"]
    assert all(r.dec_duration_ms is not None and r.dec_duration_ms >= 0 for r in audio)


def test_mixed_batch_routes_per_row(spark):
    rows = [
        (10, "audio", make_wav(n_frames=800, rate=8000)),
        (11, "image", make_png_gray8(8, 8)),
        (12, "video", b"opaque-mp4-ish-bytes"),
    ]
    got = {
        r.media_id: r.decoder for r in extract_features(_media_df(spark, rows)).collect()
    }
    assert got == {10: "wav", 11: "png", 12: "stub"}


def test_png_payload_roundtrip_and_phash(spark):
    from mergermetrics_lakehouse_pipeline_spark.operators.multimodal import (
        _decode_png,
        png_gray8_payload,
    )

    data = bytes((50 + (i * 7) % 100) for i in range(256))
    d = _decode_png(png_gray8_payload(data, width=16))
    assert (d["decoder"], d["dec_width"], d["dec_height"]) == ("png", 16, 16)
    assert d["phash"] is not None


def test_dhash_brightness_invariant_and_noise_tolerant(spark):
    from mergermetrics_lakehouse_pipeline_spark.operators.multimodal import (
        _decode_png,
        png_gray8_payload,
    )

    base = bytes((60 + (i % 16) * 5 + (i // 16) * 3) for i in range(256))

    def ph(b):
        return _decode_png(png_gray8_payload(b, width=16))["phash"]

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    brighter = bytes(v + 30 for v in base)  # no clipping: max 60+75+45+30 < 256
    assert ph(base) == ph(brighter)  # gradient signs unchanged
    noisy = bytearray(base)
    noisy[40] = 255  # one hot pixel
    assert ham(ph(base), ph(bytes(noisy))) <= 8
    inverted = bytes(255 - v for v in base)
    assert ham(ph(base), ph(inverted)) >= 40  # gradients all flip


def test_hamming_neardup_pairs_64bit_with_sign_bit(spark):
    from mergermetrics_lakehouse_pipeline_spark.operators.dedup import (
        hamming_neardup_pairs,
    )

    def signed(u):
        return u - (1 << 64) if u >= 1 << 63 else u

    a = 0xFFFF0000FFFF0000
    rows = [
        (1, signed(a)),
        (2, signed(a ^ 0b101)),          # hamming 2 from a
        (3, signed(a ^ ((1 << 63) | 1))),  # hamming 2, flips the sign bit
        (4, signed(~a & (2**64 - 1))),   # hamming 64
    ]
    keyed = spark.createDataFrame(rows, "media_id long, phash long")
    pairs = hamming_neardup_pairs(
        keyed, id_col="media_id", key_col="phash", max_hamming=6, key_bits=64
    )
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    # (2,3): xor of their deltas = 0b101 ^ (1<<63|1) -> bits 2 and 63
    assert got == {(1, 2): 2, (1, 3): 2, (2, 3): 2}


def test_media_phash_pairs_finds_exact_payload_dups(spark):
    """Byte-identical synthesized images (the corpus has exact text
    dups) must appear as hamming-0 pairs."""
    from mergermetrics_lakehouse_pipeline_spark import registry

    registry._load_extensions()
    q = next(x for x in registry.QUERIES if x.name == "media_phash_pairs")
    rows = q.fn(spark, "/root/testdata/sf0.001").collect()
    assert rows, "expected at least the exact-duplicate image pairs"
    assert any(r.hamming == 0 for r in rows)


def test_png_rgb_all_filters_decode_identically():
    """The five PNG filter types are encodings of the SAME pixels — the
    de-filter branches must all reconstruct the identical luminance
    matrix (features + dhash equal across filter types)."""
    from mergermetrics_lakehouse_pipeline_spark.operators.multimodal import (
        _decode_png,
        png_payload,
    )

    import random

    rng = random.Random(7)
    pixels = [
        [(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(12)]
        for _ in range(9)
    ]
    decoded = [
        _decode_png(png_payload(pixels, color_type=2, filter_type=ft))
        for ft in range(5)
    ]
    base = decoded[0]
    assert base["decoder"] == "png"
    assert (base["dec_width"], base["dec_height"]) == (12, 9)
    for d in decoded[1:]:
        assert d["feature"] == base["feature"]
        assert d["phash"] == base["phash"]
    # luminance convention: integer channel mean
    expected_first = sum(pixels[0][0]) // 3 / 255.0
    assert abs(base["feature"][0] - expected_first) < 0.25  # segment mean sanity


def test_png_rgba_ignores_alpha_and_bmp_matches_png():
    from mergermetrics_lakehouse_pipeline_spark.operators.multimodal import (
        _decode_bmp,
        _decode_png,
        bmp24_payload,
        png_payload,
    )

    import random

    rng = random.Random(11)
    rgb = [
        [(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(8)]
        for _ in range(8)
    ]
    rgba = [[(r, g, b, rng.randrange(256)) for (r, g, b) in row] for row in rgb]
    d_rgb = _decode_png(png_payload(rgb, color_type=2, filter_type=4))
    d_rgba = _decode_png(png_payload(rgba, color_type=6, filter_type=3))
    assert d_rgba["feature"] == d_rgb["feature"]  # alpha ignored

    d_bmp = _decode_bmp(bmp24_payload(rgb))
    assert d_bmp["decoder"] == "bmp"
    assert d_bmp["feature"] == d_rgb["feature"]  # same luminance pipeline
    assert d_bmp["phash"] == d_rgb["phash"]


def test_unsupported_png_falls_back_to_stub_and_strict_raises(spark):
    """Palette PNG (color type 3) is outside the stdlib decoder: the
    mapInPandas pipeline must mark it decoder='stub' (lenient) and fail
    the task in strict mode."""
    import struct as st
    import zlib as zl

    from mergermetrics_lakehouse_pipeline_spark.operators.multimodal import (
        _PNG_MAGIC,
        extract_features,
    )

    def chunk(ctype, body):
        return st.pack(">I", len(body)) + ctype + body + st.pack(
            ">I", zl.crc32(ctype + body) & 0xFFFFFFFF
        )

    ihdr = st.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)  # palette
    payload = (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", b"\x00\x00\x00\xff\xff\xff")
        + chunk(b"IDAT", zl.compress(b"\x00\x00\x01"))
        + chunk(b"IEND", b"")
    )
    media = spark.createDataFrame(
        [(1, "image", "png", bytearray(payload), None, None, None)],
        "media_id long, media_type string, format string, content binary,"
        "width int, height int, duration_ms long",
    )
    out = extract_features(media).collect()
    assert out[0].decoder == "stub"
    import pytest as pt

    with pt.raises(Exception):
        extract_features(media, strict=True).collect()


def test_gif_payload_roundtrip_known_pixels(spark):
    """REAL GIF decode (round 6): LZW + color table + interlace against
    known pixels, matching the PNG path's feature/phash conventions."""
    from mergermetrics_lakehouse_pipeline_spark.operators.multimodal import (
        _decode_gif,
        _dhash64,
        _segment_means,
        gif_payload,
    )

    px = [[(x * 7 + y * 13) % 256 for x in range(23)] for y in range(17)]
    for interlaced in (False, True):
        d = _decode_gif(gif_payload(px, interlaced=interlaced))
        assert (d["decoder"], d["dec_width"], d["dec_height"]) == ("gif", 23, 17)
        flat = [v / 255.0 for row in px for v in row]
        assert d["feature"] == _segment_means(flat)
        assert d["phash"] == _dhash64(px, 23, 17)


def test_gif_lzw_table_growth_and_reset(spark):
    from mergermetrics_lakehouse_pipeline_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    # long repetitive stream: forces width growth to 12 bits and a
    # CLEAR-code table reset mid-stream
    stream = ([1, 2, 3] * 4000) + list(range(256)) * 30
    assert _gif_lzw_decode(8, _gif_lzw_encode(8, stream)) == stream


def test_gif_routes_in_mixed_batch(spark):
    from mergermetrics_lakehouse_pipeline_spark.operators.multimodal import (
        gif_gray8_payload,
    )

    rows = [
        (20, "image", gif_gray8_payload(bytes(range(64)), width=8)),
        (21, "image", make_png_gray8(8, 8)),
        (22, "video", b"not-an-image"),
    ]
    got = {
        r.media_id: (r.decoder, r.dec_width)
        for r in extract_features(_media_df(spark, rows)).collect()
    }
    assert got[20] == ("gif", 8)
    assert got[21][0] == "png"
    assert got[22][0] == "stub"
