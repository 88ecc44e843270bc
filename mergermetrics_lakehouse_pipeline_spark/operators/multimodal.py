"""Multimodal (image/audio/video) column handling.

Media travels as opaque ``binary`` columns plus a typed metadata struct —
the Spark-native shape for 100 TB multimodal corpora (payload stays
columnar/compressed, metadata prunes without touching bytes).

Decode kernels: WAV audio, non-interlaced 8-bit PNG (grayscale, RGB,
RGBA; all five spec filters), uncompressed 24-bit BMP, GIF, and
JPEG — grayscale baseline (round 9), 3-component YCbCr color with
4:4:4/4:2:2/4:2:0 subsampling, AND progressive SOF2 with spectral
selection + successive approximation (round 10) — decode for REAL via
the stdlib + numpy (operators/jpeg.py + jpeg_progressive.py: the full
T.81 marker/Huffman/DCT pipeline, encode AND decode); magic bytes are
sniffed per payload. Formats still needing codec libraries absent from
this container (arithmetic-coded/hierarchical JPEG, MP4, compressed
audio) fall back to a clearly-marked deterministic stub derived from
the payload digest (or raise NotImplementedError in strict mode), so
the Spark-side contract — schema, Arrow batch shape, partitioning — is
identical on every path and tested end-to-end.

The distributed plumbing is production-shaped: ``mapInPandas`` with
Arrow batches, bounded batch memory via
``spark.sql.execution.arrow.maxRecordsPerBatch``, no driver collection.
Swap the stub branch for a real PIL/libvips/ffmpeg call on a cluster
with the codecs installed and nothing else changes.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
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
        StructField("decoder", StringType(), True),  # wav|png|stub
        StructField("dec_width", IntegerType(), True),
        StructField("dec_height", IntegerType(), True),
        StructField("dec_duration_ms", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
        # 64-bit perceptual dHash (images only): gradient-sign bits over a
        # 9x8 block-mean downsample — brightness-shift invariant
        StructField("phash", LongType(), True),
    ]
)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


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


def _segment_means(values: list[float]) -> list[float]:
    """FEATURE_DIM equal segments, mean per segment (zero-padded)."""
    if not values:
        return [0.0] * FEATURE_DIM
    n = len(values)
    out = []
    for i in range(FEATURE_DIM):
        lo, hi = i * n // FEATURE_DIM, (i + 1) * n // FEATURE_DIM
        seg = values[lo:hi]
        out.append(sum(seg) / len(seg) if seg else 0.0)
    return out


def _dhash64(rows: list[list[int]], width: int, height: int) -> int | None:
    """64-bit difference hash of a grayscale pixel matrix: 9x8 block
    means, one bit per horizontally adjacent mean comparison. Gradient
    signs survive brightness/contrast shifts and mild noise — the
    standard cheap perceptual key for image near-dup detection."""
    if width < 2 or height < 1:
        return None
    gw, gh = 9, 8
    means = []
    for gy in range(gh):
        y0 = gy * height // gh
        y1 = max(y0 + 1, (gy + 1) * height // gh)
        row_ms = []
        for gx in range(gw):
            x0 = gx * width // gw
            x1 = max(x0 + 1, (gx + 1) * width // gw)
            s = n = 0
            for y in range(y0, min(y1, height)):
                r = rows[y]
                for x in range(x0, min(x1, width)):
                    s += r[x]
                    n += 1
            row_ms.append(s / n if n else 0.0)
        means.append(row_ms)
    bits = 0
    for gy in range(gh):
        for gx in range(8):
            bits = (bits << 1) | (1 if means[gy][gx] > means[gy][gx + 1] else 0)
    if bits >= 1 << 63:  # two's-complement into a Spark LongType
        bits -= 1 << 64
    return bits


def png_gray8_payload(data: bytes, *, width: int = 16) -> bytes:
    """A VALID non-interlaced 8-bit grayscale PNG whose pixels are the
    input bytes, row-major at the given width (zero-padded final row).
    Pure stdlib (zlib + struct); the twin of ``wav_container`` for
    images — but built Python-side (Arrow zone) because PNG's
    zlib/Adler32/CRC framing has no JVM-expression form."""
    if not data:
        data = b"\x00"
    height = (len(data) + width - 1) // width
    padded = data.ljust(width * height, b"\x00")
    raw = b"".join(
        b"\x00" + padded[y * width : (y + 1) * width] for y in range(height)
    )

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _decode_wav(payload: bytes) -> dict:
    """REAL audio decode via stdlib ``wave``: PCM frames -> per-segment
    mean absolute amplitude (normalized), duration from frames/rate."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_frames, rate, width = w.getnframes(), w.getframerate(), w.getsampwidth()
        raw = w.readframes(n_frames)
    if width == 2:
        samples = [s / 32768.0 for (s,) in struct.iter_unpack("<h", raw)]
    elif width == 1:  # 8-bit WAV is unsigned
        samples = [(b - 128) / 128.0 for b in raw]
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return {
        "decoder": "wav",
        "dec_width": None,
        "dec_height": None,
        "dec_duration_ms": int(n_frames * 1000 // rate) if rate else 0,
        "feature": _segment_means([abs(s) for s in samples]),
    }


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(payload: bytes) -> dict:
    """REAL image decode for non-interlaced 8-bit PNG via the stdlib:
    IHDR parse -> IDAT zlib inflate -> full de-filter (None/Sub/Up/
    Average/Paeth, per the PNG spec §9) -> per-segment mean luminance.
    Color types: 0 (grayscale), 2 (RGB), 6 (RGBA) — luminance is the
    integer channel mean ((r+g+b)//3, alpha ignored), so features and
    the dhash stay byte-deterministic. Other flavors (palette, 16-bit,
    interlaced) raise and the caller falls back to the stub."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, width, height, idat = 8, None, None, b""
    bit_depth = color_type = interlace = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if width is None or bit_depth != 8 or interlace != 0 or channels is None:
        raise ValueError(
            "only non-interlaced 8-bit gray/RGB/RGBA PNG supported"
        )
    raw = zlib.decompress(idat)
    stride = width * channels + 1  # leading filter byte per scanline
    pixels: list[float] = []
    matrix: list[list[int]] = []
    prev = [0] * (width * channels)
    for y in range(height):
        line = raw[y * stride : (y + 1) * stride]
        ftype, body = line[0], list(line[1:])
        if ftype == 1:  # Sub
            for x in range(channels, len(body)):
                body[x] = (body[x] + body[x - channels]) & 0xFF
        elif ftype == 2:  # Up
            body = [(body[x] + prev[x]) & 0xFF for x in range(len(body))]
        elif ftype == 3:  # Average
            for x in range(len(body)):
                left = body[x - channels] if x >= channels else 0
                body[x] = (body[x] + (left + prev[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(len(body)):
                left = body[x - channels] if x >= channels else 0
                ul = prev[x - channels] if x >= channels else 0
                body[x] = (body[x] + _paeth(left, prev[x], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unsupported PNG filter {ftype}")
        prev = body
        if channels == 1:
            lum = body
        else:
            lum = [
                (body[i] + body[i + 1] + body[i + 2]) // 3
                for i in range(0, len(body), channels)
            ]
        matrix.append(lum)
        pixels.extend(v / 255.0 for v in lum)
    return {
        "decoder": "png",
        "dec_width": width,
        "dec_height": height,
        "dec_duration_ms": None,
        "feature": _segment_means(pixels),
        "phash": _dhash64(matrix, width, height),
    }


def _decode_jpeg(payload: bytes) -> dict:
    """REAL image decode for baseline sequential JPEG (operators/
    jpeg.py: marker parse -> Huffman entropy decode -> dequantize ->
    IDCT, from the public T.81 spec). Grayscale landed round 9; round
    10 adds 3-component YCbCr with 4:4:4/4:2:2/4:2:0 subsampling —
    dispatch reads the SOF component count, the color path upsamples
    chroma and applies the JFIF BT.601 inverse, and luminance for the
    feature/phash uses the same (r+g+b)//3 convention as the PNG path.
    Round 10 also decodes PROGRESSIVE streams (SOF2 — spectral
    selection + successive approximation; operators/jpeg_progressive.py)
    and round 11 ARITHMETIC-CODED streams (SOF9 — T.81 Annex-D
    QM-coder; operators/jpeg_arith.py) for real: the stub now covers
    only hierarchical JPEG, MP4, and compressed audio."""
    from .jpeg import (
        jpeg_color_decode,
        jpeg_frame_marker,
        jpeg_gray_decode,
        jpeg_sof_components,
    )

    frame = jpeg_frame_marker(payload)
    if frame == 0xC2:
        from .jpeg_progressive import jpeg_progressive_decode

        width, height, decoded = jpeg_progressive_decode(payload)
        matrix = (
            decoded
            if decoded.ndim == 2
            else decoded.astype("int64").sum(axis=2) // 3
        )
    elif frame == 0xC9:  # arithmetic-coded sequential (round 11)
        from .jpeg_arith import jpeg_arith_decode

        width, height, decoded = jpeg_arith_decode(payload)
        matrix = (
            decoded
            if decoded.ndim == 2
            else decoded.astype("int64").sum(axis=2) // 3
        )
    elif jpeg_sof_components(payload) == 1:
        width, height, matrix = jpeg_gray_decode(payload)
    else:
        width, height, rgb = jpeg_color_decode(payload)
        matrix = rgb.astype("int64").sum(axis=2) // 3
    rows = matrix.tolist()
    pixels = (matrix.ravel() / 255.0).tolist()
    return {
        "decoder": "jpeg",
        "dec_width": width,
        "dec_height": height,
        "dec_duration_ms": None,
        "feature": _segment_means(pixels),
        "phash": _dhash64(rows, width, height),
    }


def _decode_bmp(payload: bytes) -> dict:
    """REAL image decode for uncompressed 24-bit BMP (BITMAPINFOHEADER,
    BI_RGB) via struct alone: bottom-up BGR rows, 4-byte row padding.
    Same luminance convention as the PNG path ((r+g+b)//3)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise ValueError("BMP core header not supported")
    width, height = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0 or width <= 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    matrix: list[list[int]] = []
    pixels: list[float] = []
    for row in range(height):
        src_row = (height - 1 - row) if bottom_up else row
        base = data_off + src_row * row_bytes
        line = payload[base : base + width * 3]
        lum = [
            (line[x * 3] + line[x * 3 + 1] + line[x * 3 + 2]) // 3
            for x in range(width)
        ]
        matrix.append(lum)
        pixels.extend(v / 255.0 for v in lum)
    return {
        "decoder": "bmp",
        "dec_width": width,
        "dec_height": height,
        "dec_duration_ms": None,
        "feature": _segment_means(pixels),
        "phash": _dhash64(matrix, width, height),
    }


def _gif_lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    """GIF-variant LZW: LSB-first bit packing, variable code width
    starting at min+1, CLEAR/END codes, deferred width growth at table
    size 2^width, 12-bit cap (the published GIF89a spec, appendix F)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            bits -= code_size
            if code == clear:
                table = [[i] for i in range(clear)] + [[], []]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + [entry[0]])
            elif code == len(table):
                entry = prev + [prev[0]]
                if len(table) < 4096:
                    table.append(entry)
            else:
                raise ValueError("LZW code out of range")
            out.extend(entry)
            prev = entry
            if len(table) >= (1 << code_size) and code_size < 12:
                code_size += 1
    return out


def _gif_lzw_encode(min_code_size: int, stream: list[int]) -> bytes:
    """Dict-based GIF LZW encoder, width-synchronized with the decoder
    above (grow after assigning code 2^width; CLEAR + reset at 4096)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += size
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    code_size = min_code_size + 1
    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    emit(clear, code_size)
    prev: tuple = ()
    for s in stream:
        cur = prev + (s,)
        if cur in table:
            prev = cur
            continue
        emit(table[prev], code_size)
        if next_code <= 4095:
            table[cur] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        else:  # table full: reset, as real encoders do
            emit(clear, code_size)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        prev = (s,)
    if prev:
        emit(table[prev], code_size)
    emit(end, code_size)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_interlace_order(height: int) -> list[int]:
    # GIF89a appendix E: four passes (every 8th from 0, every 8th from
    # 4, every 4th from 2, every 2nd from 1)
    return (
        list(range(0, height, 8))
        + list(range(4, height, 8))
        + list(range(2, height, 4))
        + list(range(1, height, 2))
    )


def _decode_gif(payload: bytes) -> dict:
    """REAL image decode for GIF87a/GIF89a via pure stdlib struct + the
    LZW kernel above: logical screen descriptor, global/local color
    tables, extension-block skipping, interlace reordering; the FIRST
    image frame becomes the luminance matrix ((r+g+b)//3 through the
    color table), same feature/phash convention as the PNG/BMP paths."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    _sw, _sh, flags = struct.unpack("<HHB", payload[6:11])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 ** ((flags & 7) + 1)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label byte + data sub-blocks
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _left, _top, w, h, iflags = struct.unpack(
                "<HHHHB", payload[pos : pos + 9]
            )
            pos += 9
            ct = gct
            if iflags & 0x80:
                n = 2 ** ((iflags & 7) + 1)
                ct = payload[pos : pos + 3 * n]
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF image has no color table")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _gif_lzw_decode(min_code, bytes(data))
            if len(idx) < w * h:
                raise ValueError("truncated GIF image data")
            rows_seq = [idx[y * w : (y + 1) * w] for y in range(h)]
            if iflags & 0x40:  # interlaced: rows arrive in pass order
                matrix_rows: list[list[int] | None] = [None] * h
                for src, y in enumerate(_gif_interlace_order(h)):
                    matrix_rows[y] = rows_seq[src]
                rows_seq = matrix_rows  # type: ignore[assignment]
            matrix = [
                [(ct[i * 3] + ct[i * 3 + 1] + ct[i * 3 + 2]) // 3 for i in row]
                for row in rows_seq
            ]
            pixels = [v / 255.0 for row in matrix for v in row]
            return {
                "decoder": "gif",
                "dec_width": w,
                "dec_height": h,
                "dec_duration_ms": None,
                "feature": _segment_means(pixels),
                "phash": _dhash64(matrix, w, h),
            }
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contained no image block")


def gif_payload(
    pixels: list[list[int]], *, interlaced: bool = False
) -> bytes:
    """A VALID single-frame GIF89a whose pixels are the given grayscale
    matrix (256-entry grayscale global color table, real LZW, optional
    interlacing) — the fixture builder twin of ``png_payload``."""
    h, w = len(pixels), len(pixels[0])
    gct = bytes(v for i in range(256) for v in (i, i, i))
    header = (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)
        + gct
    )
    rows = (
        [pixels[y] for y in _gif_interlace_order(h)] if interlaced else pixels
    )
    stream = [v for row in rows for v in row]
    min_code = 8
    data = _gif_lzw_encode(min_code, stream)
    sub = b"".join(
        bytes([len(data[i : i + 255])]) + data[i : i + 255]
        for i in range(0, len(data), 255)
    )
    img = (
        b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlaced else 0)
        + bytes([min_code])
        + sub
        + b"\x00"
    )
    return header + img + b"\x3b"


def _decode_payload(payload: bytes, *, strict: bool = False) -> dict:
    """Sniff magic bytes and decode for real where the stdlib can (WAV,
    8-bit gray/RGB/RGBA PNG, 24-bit BMP); otherwise the deterministic
    stub (or raise when strict)."""
    try:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _decode_wav(payload)
        if payload[:8] == _PNG_MAGIC:
            return _decode_png(payload)
        if payload[:2] == b"BM":
            return _decode_bmp(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return _decode_gif(payload)
        if payload[:2] == b"\xff\xd8":
            return _decode_jpeg(payload)
    except Exception:
        if strict:
            raise
    if strict:
        raise NotImplementedError(
            "payload format needs codec libraries not present in this "
            "container (arithmetic/hierarchical JPEG, MP4, compressed "
            "audio); run "
            "with strict=False for the stubbed deterministic kernel"
        )
    return {
        "decoder": "stub",
        "dec_width": None,
        "dec_height": None,
        "dec_duration_ms": None,
        "feature": _fake_decode(payload),
    }


def extract_features(
    media: DataFrame, *, strict: bool = False, batch_limit: int | None = None
) -> DataFrame:
    """Decode + feature-extract every media row via Arrow-batched
    ``mapInPandas``. Payload magic bytes pick the kernel per row: WAV,
    8-bit gray/RGB/RGBA PNG and 24-bit BMP decode for REAL (stdlib),
    other formats use the deterministic stub. ``strict=True`` makes the stub fallback raise
    NotImplementedError (task failure) instead.

    ``batch_limit`` caps rows per Arrow batch (payload bytes x batch rows
    is the executor-memory unit here). It sets the SESSION-wide
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` — an execution-time
    conf that cannot be scoped to this one lazy plan — so it is only
    touched when a caller explicitly asks, and the change is deliberate
    and visible to later pandas-UDF operators in the session."""

    # round 14 (guide §2.2/§4): the decode kernels are per-row Python —
    # fan the media rows out so mapInPandas runs one task per core
    # instead of the single task a one-row-group upstream scans as
    # (no-op on split inputs).
    from ..parallel import fan_out

    media = fan_out(media)

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            decoded = [
                _decode_payload(bytes(b) if b is not None else b"", strict=strict)
                for b in pdf["content"]
            ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "decoder": [d["decoder"] for d in decoded],
                    "dec_width": [d["dec_width"] for d in decoded],
                    "dec_height": [d["dec_height"] for d in decoded],
                    "dec_duration_ms": [d["dec_duration_ms"] for d in decoded],
                    "feature": [d["feature"] for d in decoded],
                    "phash": [d.get("phash") for d in decoded],
                }
            )
            yield out

    if batch_limit is not None:
        media.sparkSession.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_limit)
        )
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


def _le_bytes(v: F.Column, n: int) -> F.Column:
    """``v`` as ``n`` little-endian bytes (pure JVM: hex per byte + unhex)."""
    return F.unhex(
        F.concat_ws(
            "",
            *[
                F.format_string("%02x", F.shiftright(v, 8 * i).bitwiseAND(F.lit(255)))
                for i in range(n)
            ],
        )
    )


def wav_container(data: F.Column) -> F.Column:
    """Wrap arbitrary bytes as a VALID mono 16-bit 8 kHz PCM WAV (RIFF
    header computed with JVM expressions — no UDF): the payload becomes
    genuinely decodable by any WAV reader, with the input bytes as PCM
    samples. Used to synthesize real audio payloads from testdata text."""
    dl = F.octet_length(data).cast("int")
    header = F.concat(
        F.lit(b"RIFF"),
        _le_bytes(dl + F.lit(36), 4),
        F.lit(b"WAVEfmt "),
        _le_bytes(F.lit(16), 4),  # fmt chunk size
        _le_bytes(F.lit(1), 2),  # PCM
        _le_bytes(F.lit(1), 2),  # mono
        _le_bytes(F.lit(8000), 4),  # sample rate
        _le_bytes(F.lit(16000), 4),  # byte rate
        _le_bytes(F.lit(2), 2),  # block align
        _le_bytes(F.lit(16), 2),  # bits per sample
        F.lit(b"data"),
        _le_bytes(dl, 4),
    )
    return F.concat(header, data)


def gif_gray8_payload(data: bytes, *, width: int = 16) -> bytes:
    """A VALID grayscale GIF89a whose pixels are the input bytes,
    row-major at the given width — the GIF twin of
    ``png_gray8_payload``."""
    if not data:
        data = b"\x00"
    height = (len(data) + width - 1) // width
    padded = data.ljust(width * height, b"\x00")
    matrix = [
        list(padded[y * width : (y + 1) * width]) for y in range(height)
    ]
    return gif_payload(matrix)


def synthesize_decodable_media(docs: DataFrame) -> DataFrame:
    """Like ``synthesize_media_from_documents`` but audio rows carry REAL
    WAV payloads (text bytes as PCM samples inside a valid RIFF header)
    and image rows REAL containers — gray8 PNG for even media ids, gray
    GIF89a for odd (round 6) — so the per-row decoder routing runs
    against driver testdata across three real formats, not only against
    unit-test fixtures."""
    from ..parallel import fan_out

    # round 14: payload synthesis is per-row Python (PNG/GIF/WAV
    # container building) — fan out ahead of the mapInPandas so it
    # parallelizes (guide §2.2; no-op on split inputs)
    base = fan_out(synthesize_media_from_documents(docs))

    def _img_batches(batches):
        for pdf in batches:
            is_img = pdf["media_type"] == "image"
            sub = pdf.loc[is_img]
            pdf.loc[is_img, "content"] = [
                png_gray8_payload(bytes(b))
                if mid % 2 == 0
                else gif_gray8_payload(bytes(b))
                for mid, b in zip(sub["media_id"], sub["content"])
            ]
            yield pdf

    # image rows: REAL containers (Python-side — PNG/GIF framing has no
    # JVM-expression form, unlike the WAV RIFF header below)
    as_img = base.mapInPandas(_img_batches, schema=base.schema)
    return as_img.withColumn(
        "content",
        F.when(
            F.col("media_type") == "audio", wav_container(F.col("content"))
        ).otherwise(F.col("content")),
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


def png_payload(
    pixels: list[list[tuple]] | list[list[int]],
    *,
    color_type: int = 2,
    filter_type: int = 0,
) -> bytes:
    """A VALID non-interlaced 8-bit PNG from a pixel matrix — gray
    (color_type 0, int pixels), RGB (2) or RGBA (6) tuples — with every
    scanline FORWARD-filtered using ``filter_type`` (0-4), so tests can
    exercise each de-filter branch of ``_decode_png`` against known
    pixels. Pure stdlib."""
    channels = {0: 1, 2: 3, 6: 4}[color_type]
    height, width = len(pixels), len(pixels[0])

    def flat(row):
        if channels == 1:
            return list(row)
        return [c for px in row for c in px]

    raw = b""
    prev = [0] * (width * channels)
    for row in pixels:
        body = flat(row)
        filt = list(body)
        if filter_type == 1:
            for x in range(len(body) - 1, channels - 1, -1):
                filt[x] = (body[x] - body[x - channels]) & 0xFF
        elif filter_type == 2:
            filt = [(body[x] - prev[x]) & 0xFF for x in range(len(body))]
        elif filter_type == 3:
            for x in range(len(body)):
                left = body[x - channels] if x >= channels else 0
                filt[x] = (body[x] - (left + prev[x]) // 2) & 0xFF
        elif filter_type == 4:
            for x in range(len(body)):
                left = body[x - channels] if x >= channels else 0
                ul = prev[x - channels] if x >= channels else 0
                filt[x] = (body[x] - _paeth(left, prev[x], ul)) & 0xFF
        raw += bytes([filter_type]) + bytes(filt)
        prev = body

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def bmp24_payload(pixels: list[list[tuple]]) -> bytes:
    """A VALID uncompressed bottom-up 24-bit BMP from an RGB pixel
    matrix (BITMAPINFOHEADER, BGR byte order, 4-byte row padding)."""
    height, width = len(pixels), len(pixels[0])
    row_bytes = (width * 3 + 3) & ~3
    body = b""
    for row in reversed(pixels):  # bottom-up storage
        line = b"".join(bytes((b_, g, r)) for (r, g, b_) in row)
        body += line.ljust(row_bytes, b"\x00")
    data_off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
        )
    )
    return header + body
