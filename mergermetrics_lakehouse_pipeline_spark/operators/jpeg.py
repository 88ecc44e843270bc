"""Baseline JPEG codec (grayscale, sequential DCT) from the public spec
(ITU-T T.81 / ISO 10918-1) — no codec libraries.

Round-9 closes the r7/r8 verdicts' biggest multimodal gap: a real
corpus is mostly JPEG, and operators/multimodal.py previously stubbed
it. This module implements the ENCODE and DECODE paths for the baseline
process on single-component (luminance) images:

    encode: level shift -> 8x8 FDCT (exact float matrix form) ->
            quantize (Annex-K luminance table) -> zigzag -> DC
            difference + AC run-length categories -> canonical Huffman
            (Annex-K K.3.1/K.3.2 tables) -> JFIF byte stream with byte
            stuffing.
    decode: marker parse (DQT/SOF0/DHT/SOS/DRI) -> entropy decode ->
            dequantize -> de-zigzag -> IDCT -> level unshift/clamp.

Both run EXECUTOR-side inside the multimodal Arrow batches
(operators/multimodal.py routes the FFD8 magic here); everything is
numpy-vectorized per block row, deterministic for a given payload.

Round-10 closes the color gap (VERDICT r9 next-step #1): 3-component
YCbCr encode+decode with 4:4:4 and 4:2:0 chroma subsampling —
interleaved MCUs (data units per component per the SOF sampling
factors), separate DC predictors per component, the Annex-K chrominance
quantization (K.2) and Huffman (K.3.2.x) tables, box-filter chroma
downsampling on encode, pixel-replication upsampling on decode, and the
JFIF/BT.601 full-range color transform — plus 4:2:2 and RESTART
MARKERS (DRI/RSTn with per-interval DC predictor resets, the camera
streams' error-resilience layout) on both encode and decode.
Progressive JPEG (SOF2, spectral selection + successive approximation)
lives in the sibling jpeg_progressive.py; arithmetic coding (SOF9, the
T.81 Annex-D QM-coder) lives in jpeg_arith.py (round 11).
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 luminance quantization table, raster order
STD_LUMA_QUANT = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# Annex K.2 chrominance quantization table, raster order
STD_CHROMA_QUANT = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

#: zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
def _zigzag_order() -> list[tuple[int, int]]:
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(s + 1) if i < 8 and s - i < 8]
        order.extend(diag if s % 2 else diag[::-1])
    return order


ZIGZAG = _zigzag_order()

# Annex K.3.1: luminance DC Huffman spec (BITS, HUFFVAL)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
# Annex K.3.2: luminance AC Huffman spec
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Annex K.3.2.1: chrominance DC Huffman spec (BITS, HUFFVAL)
DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALS_C = list(range(12))
# Annex K.3.2.2: chrominance AC Huffman spec
AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per the spec's canonical assignment
    (C.2: codes of each length are consecutive, lengths ascending)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        c = (1 / np.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_DCT_M = _dct_matrix()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec

    def emit_restart(self, m: int) -> None:
        """Byte-align and write RSTm (E.1.4) — markers are raw bytes,
        never stuffed."""
        self.flush()
        self.out.append(0xFF)
        self.out.append(0xD0 | (m & 7))


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _amplitude_bits(v: int, size: int) -> int:
    # positive: the value itself; negative: one's complement (F.1.2.1)
    return v if v >= 0 else v + (1 << size) - 1


def _encode_block(
    writer: _BitWriter,
    zz: list[int],
    prev_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Entropy-encode one zigzagged quantized block (F.1.2: DC
    difference category + AC run/size with ZRL and EOB); returns the
    block's DC for the component's predictor."""
    diff = zz[0] - prev_dc
    size = _category(diff)
    code, length = dc_codes[size]
    writer.put(code, length)
    writer.put(_amplitude_bits(diff, size), size)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k] != 0), default=0)
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            zcode, zlen = ac_codes[0xF0]  # ZRL
            writer.put(zcode, zlen)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        writer.put(code, length)
        writer.put(_amplitude_bits(v, size), size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.put(code, length)
    return zz[0]


def jpeg_gray_encode(
    pixels: np.ndarray, restart_interval: int = 0
) -> bytes:
    """Encode an HxW uint8 grayscale matrix as a baseline JFIF JPEG
    (single luminance component, Annex-K quant + Huffman tables).
    Blocks on the right/bottom edge pad by edge replication.
    ``restart_interval`` > 0 emits a DRI segment and an RSTm marker
    every that-many MCUs (camera streams use them for error
    resilience); the DC predictor resets at each marker."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(px, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")

    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    writer = _BitWriter()
    q = STD_LUMA_QUANT.astype(np.float64)
    prev_dc = 0
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.emit_restart(mcu // restart_interval - 1)
                prev_dc = 0
            mcu += 1
            block = padded[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
            shifted = block.astype(np.float64) - 128.0
            coeffs = _DCT_M @ shifted @ _DCT_M.T
            quant = np.rint(coeffs / q).astype(np.int64)
            zz = [int(quant[r, c]) for r, c in ZIGZAG]
            prev_dc = _encode_block(writer, zz, prev_dc, dc_codes, ac_codes)
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = seg(
        0xFFDB,
        b"\x00" + bytes(int(STD_LUMA_QUANT[r][c]) for r, c in ZIGZAG),
    )
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]),
    )
    dht = seg(
        0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
    ) + seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    sos = dri + seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    app0 = seg(
        0xFF_E0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    return (
        b"\xff\xd8" + app0 + dqt + sof + dht + sos
        + bytes(writer.out) + b"\xff\xd9"
    )


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream underrun")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("unexpected marker in entropy data")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> int:
        """Consume an RSTm marker at the current byte boundary (E.1.4):
        drop any partial bits (the encoder 1-padded to align), expect
        0xFF 0xD0..0xD7, return m."""
        self.acc = 0
        self.n = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            raise ValueError(
                f"expected restart marker at byte {self.pos}"
            )
        m = self.data[self.pos + 1] & 7
        self.pos += 2
        return m


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value decoding map."""
    out: dict[tuple[int, int], int] = {}
    for v, (code, length) in _canonical_codes(bits, vals).items():
        out[(length, code)] = v
    return out


def _read_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    # F.2.2.1 EXTEND: map the size-bit amplitude back to signed
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1



def _parse_headers(payload: bytes) -> dict:
    """The ONE T.81 marker walk every decoder entry point shares
    (review r10 finding #7 — three independent copies diverge): parses
    DQT/DHT/SOF0/SOS/DRI/APP14 up to the entropy data. Returns
    {width, height, comps: [(cid, h, v, tq)], scan: [(cid, td, ta)],
    quant, huff, restart_interval, data_start, adobe_transform}.
    ``adobe_transform`` is the APP14 color-transform flag (None when
    absent): 0 = components are straight R,G,B (Photoshop-style
    streams), 1 = YCbCr — review r10 finding #4: assuming YCbCr for
    every 3-component stream silently garbles Adobe-RGB payloads."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    comps: list[tuple[int, int, int, int]] = []
    scan: list[tuple[int, int, int]] = []
    restart_interval = 0
    adobe_transform = None
    data_start = None
    frame = None
    arith_cond: dict[tuple[int, int], int] = {}
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # B.1.1.2: any number of 0xFF fill bytes may pad before the
        # marker byte (r10 advice) — skip them so padded streams parse
        while pos + 4 <= len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (length,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + length]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for k, (r, c) in enumerate(ZIGZAG):
                    tbl[r, c] = body[i + 1 + k]
                quant[tq] = tbl
                i += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"only baseline sequential (SOF0) and arithmetic "
                f"sequential (SOF9) supported, got SOF{marker - 0xC0}"
            )
        elif marker in (0xC0, 0xC9):  # SOF0 / SOF9 (arithmetic)
            frame = marker
            _prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                hf, vf = hv >> 4, hv & 0x0F
                if not (1 <= hf <= 2 and 1 <= vf <= 2):
                    raise ValueError(
                        f"sampling factor {hf}x{vf} out of the 1-2 range"
                    )
                comps.append((cid, hf, vf, tq))
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                huff[(tc, th)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xCC:  # DAC (B.2.4.3, arithmetic conditioning)
            i = 0
            while i + 1 < len(body):
                arith_cond[(body[i] >> 4, body[i] & 0x0F)] = body[i + 1]
                i += 2
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xEE and body[:5] == b"Adobe" and len(body) >= 12:
            adobe_transform = body[11]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != len(comps):
                raise ValueError("non-interleaved multi-scan unsupported")
            for si in range(ns):
                cid = body[1 + 2 * si]
                tt = body[2 + 2 * si]
                scan.append((cid, tt >> 4, tt & 0x0F))
            data_start = pos + 2 + length
            break
        pos += 2 + length
    if data_start is None or width is None or not comps:
        raise ValueError("missing SOS/SOF0")
    return {
        "width": width,
        "height": height,
        "comps": comps,
        "scan": scan,
        "quant": quant,
        "huff": huff,
        "restart_interval": restart_interval,
        "adobe_transform": adobe_transform,
        "data_start": data_start,
        "frame": frame,
        "arith_cond": arith_cond,
    }


def _decode_block_zz(
    reader: _BitReader,
    dc_tab: dict[tuple[int, int], int],
    ac_tab: dict[tuple[int, int], int],
    dc_pred: int,
) -> tuple[list[int], int]:
    """Entropy-decode one block into its zigzag coefficient list
    (F.2.2: DC difference + AC run/size with ZRL and EOB); returns
    (zz, new DC predictor). Shared by the gray and color walks."""
    zz = [0] * 64
    size = _read_huff(reader, dc_tab)
    dc_pred += _extend(reader.bits(size), size)
    zz[0] = dc_pred
    k = 1
    while k < 64:
        rs = _read_huff(reader, ac_tab)
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += rs >> 4
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(reader.bits(rs & 0x0F), rs & 0x0F)
        k += 1
    return zz, dc_pred


def jpeg_gray_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline single-component JPEG; returns
    (width, height, HxW uint8 matrix). Raises on multi-component
    (use jpeg_color_decode), progressive, or arithmetic-coded streams.
    The IDCT stays the per-block matrix form (bit-identical to the
    round-9 decoder the oracle row pinned its error bound against)."""
    hdr = _parse_headers(payload)
    if hdr["frame"] == 0xC9:
        raise ValueError(
            "arithmetic-coded stream: use jpeg_arith.jpeg_arith_decode"
        )
    if len(hdr["comps"]) != 1:
        raise ValueError(
            "multi-component stream: use jpeg_color_decode "
            "(jpeg_gray_decode is the single-component fast path)"
        )
    width, height = hdr["width"], hdr["height"]
    ri = hdr["restart_interval"]
    _cid, _hf, _vf, qid = hdr["comps"][0]
    _scid, dc_id, ac_id = hdr["scan"][0]
    reader = _BitReader(payload[hdr["data_start"]:])
    q = hdr["quant"][qid].astype(np.float64)
    dc_tab, ac_tab = hdr["huff"][(0, dc_id)], hdr["huff"][(1, ac_id)]
    bh, bw = -(-height // 8), -(-width // 8)
    out = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    prev_dc = 0
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if ri and mcu and mcu % ri == 0:
                m = reader.restart()
                if m != (mcu // ri - 1) & 7:
                    raise ValueError(
                        f"restart marker out of sequence: RST{m}"
                    )
                prev_dc = 0
            mcu += 1
            zz, prev_dc = _decode_block_zz(reader, dc_tab, ac_tab, prev_dc)
            coeffs = np.zeros((8, 8))
            for i, (r, c) in enumerate(ZIGZAG):
                coeffs[r, c] = zz[i]
            block = _DCT_M.T @ (coeffs * q) @ _DCT_M
            out[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = np.clip(
                np.rint(block + 128.0), 0, 255
            ).astype(np.uint8)
    return width, height, out[:height, :width]


# ---------------------------------------------------------------------------
# color (3-component YCbCr, 4:4:4 / 4:2:0) — round 10
# ---------------------------------------------------------------------------

#: zigzag order as parallel index arrays for vectorized gather/scatter
_ZZ_ROWS = np.array([r for r, _c in ZIGZAG])
_ZZ_COLS = np.array([c for _r, c in ZIGZAG])


def _rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JFIF full-range BT.601 forward transform, float64 planes."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """JFIF full-range BT.601 inverse transform -> HxWx3 uint8."""
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


def _plane_zigzag_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """FDCT + quantize a padded (multiple-of-8) float plane in ONE
    vectorized pass: returns (nby, nbx, 64) int64 zigzagged
    coefficients. The per-block math is the matrix-DCT form the
    grayscale path uses, batched with einsum."""
    h, w = plane.shape
    nby, nbx = h // 8, w // 8
    blocks = (
        plane.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3) - 128.0
    )
    coeffs = np.einsum("ux,nbxy,vy->nbuv", _DCT_M, blocks, _DCT_M)
    quant = np.rint(coeffs / q).astype(np.int64)
    return quant[..., _ZZ_ROWS, _ZZ_COLS]


def jpeg_color_encode(
    rgb: np.ndarray, subsampling: str = "420", restart_interval: int = 0
) -> bytes:
    """Encode an HxWx3 uint8 RGB image as a baseline 3-component YCbCr
    JFIF JPEG. ``subsampling`` is ``"420"`` (2x2 luma blocks per MCU,
    box-filtered chroma — the dominant real-corpus layout), ``"422"``
    (horizontal-only chroma subsampling, the camera/video favorite) or
    ``"444"`` (full-resolution chroma). Luma uses the Annex-K K.1/K.3.1
    tables, chroma the K.2/K.3.2 tables; edges pad by replication."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("jpeg_color_encode expects an HxWx3 RGB array")
    if subsampling == "420":
        hs, vs = 2, 2
    elif subsampling == "422":
        hs, vs = 2, 1
    elif subsampling == "444":
        hs, vs = 1, 1
    else:
        raise ValueError("subsampling must be '420', '422' or '444'")
    h, w = rgb.shape[:2]
    ph = -(-h // (8 * vs)) * (8 * vs)
    pw = -(-w // (8 * hs)) * (8 * hs)
    padded = np.pad(rgb, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    y, cb, cr = _rgb_to_ycbcr(padded)
    if hs == 2 or vs == 2:
        # box-filter downsample (the standard's suggested filter):
        # 2x2 for 4:2:0, horizontal-only for 4:2:2
        cb = cb.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))
        cr = cr.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))

    ql = STD_LUMA_QUANT.astype(np.float64)
    qc = STD_CHROMA_QUANT.astype(np.float64)
    zz_y = _plane_zigzag_blocks(y, ql)
    zz_cb = _plane_zigzag_blocks(cb, qc)
    zz_cr = _plane_zigzag_blocks(cr, qc)

    dc_y = _canonical_codes(DC_BITS, DC_VALS)
    ac_y = _canonical_codes(AC_BITS, AC_VALS)
    dc_c = _canonical_codes(DC_BITS_C, DC_VALS_C)
    ac_c = _canonical_codes(AC_BITS_C, AC_VALS_C)

    writer = _BitWriter()
    prev = [0, 0, 0]  # per-component DC predictors
    mcux, mcuy = pw // (8 * hs), ph // (8 * vs)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.emit_restart(mcu // restart_interval - 1)
                prev = [0, 0, 0]
            mcu += 1
            for by in range(vs):
                for bx in range(hs):
                    zz = zz_y[my * vs + by, mx * hs + bx]
                    prev[0] = _encode_block(
                        writer, [int(v) for v in zz], prev[0], dc_y, ac_y
                    )
            prev[1] = _encode_block(
                writer, [int(v) for v in zz_cb[my, mx]], prev[1], dc_c, ac_c
            )
            prev[2] = _encode_block(
                writer, [int(v) for v in zz_cr[my, mx]], prev[2], dc_c, ac_c
            )
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    app0 = seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    dqt = seg(
        0xFFDB,
        b"\x00" + bytes(int(STD_LUMA_QUANT[r][c]) for r, c in ZIGZAG),
    ) + seg(
        0xFFDB,
        b"\x01" + bytes(int(STD_CHROMA_QUANT[r][c]) for r, c in ZIGZAG),
    )
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (hs << 4) | vs, 0])  # Y
        + bytes([2, 0x11, 1])  # Cb
        + bytes([3, 0x11, 1]),  # Cr
    )
    dht = (
        seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
        + seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
        + seg(0xFFC4, b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C))
        + seg(0xFFC4, b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALS_C))
    )
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    sos = dri + seg(
        0xFFDA,
        bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]),
    )
    return (
        b"\xff\xd8" + app0 + dqt + sof + dht + sos
        + bytes(writer.out) + b"\xff\xd9"
    )


def _sof_probe(payload: bytes) -> tuple[int, int]:
    """(SOFn marker byte, component count) from ONE cheap segment walk
    — no table construction, no entropy work: the multimodal router's
    dispatch cost (review r10 pass-2 finding #5 flagged the router
    running the FULL header parse just to read ncomp)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # B.1.1.2 fill bytes (r10 advice) — same skip as _parse_headers
        while pos + 4 <= len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return marker, payload[pos + 4 + 5]
        if marker in (0xD9, 0xDA):
            break
        (length,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        pos += 2 + length
    raise ValueError("no SOF header found")


def jpeg_frame_marker(payload: bytes) -> int:
    """The stream's SOFn marker byte (0xC0 baseline, 0xC2 progressive,
    ...) — how the multimodal router picks a decoder without decoding."""
    return _sof_probe(payload)[0]


def jpeg_sof_components(payload: bytes) -> int:
    """Component count from the SOF header — how the multimodal router
    dispatches gray vs color without decoding."""
    return _sof_probe(payload)[1]


def jpeg_color_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline 3-component JPEG (sampling factors 1-2 per
    axis; 4:4:4, 4:2:2, and 4:2:0 layouts all fall out of the general
    MCU walk); returns (width, height, HxWx3 uint8 RGB).
    Entropy decode is the sequential Huffman walk the format forces;
    dequantize + IDCT run as ONE vectorized einsum per component.
    Chroma upsampling is pixel replication. The color transform is the
    JFIF full-range BT.601 inverse — unless the stream's APP14 Adobe
    marker declares transform=0 or the component ids spell 'R','G','B',
    in which case the planes are already RGB and pass through (review
    r10 finding #4). Restart markers (DRI/RSTn) decode with the
    modulo-8 sequence verified; progressive streams route to
    jpeg_progressive_decode and arithmetic coding raises."""
    hdr = _parse_headers(payload)
    if hdr["frame"] == 0xC9:
        raise ValueError(
            "arithmetic-coded stream: use jpeg_arith.jpeg_arith_decode"
        )
    comps = hdr["comps"]
    if len(comps) != 3:
        raise ValueError(
            f"{len(comps)}-component stream: use jpeg_gray_decode for "
            "single-component baselines"
        )
    width, height = hdr["width"], hdr["height"]
    ri = hdr["restart_interval"]
    quant, huff, scan = hdr["quant"], hdr["huff"], hdr["scan"]

    by_cid = {c[0]: c for c in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    reader = _BitReader(payload[hdr["data_start"]:])
    # per-component zigzag coefficient grids, filled by the scan walk
    grids: dict[int, np.ndarray] = {
        cid: np.zeros((mcuy * vf, mcux * hf, 64), dtype=np.int32)
        for cid, hf, vf, _tq in comps
    }
    prev_dc = {cid: 0 for cid, *_rest in comps}
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu and mcu % ri == 0:
                m = reader.restart()
                if m != (mcu // ri - 1) & 7:
                    raise ValueError(
                        f"restart marker out of sequence: RST{m}"
                    )
                prev_dc = {cid: 0 for cid, *_rest in comps}
            mcu += 1
            for cid, td, ta in scan:
                _cid, hf, vf, _tq = by_cid[cid]
                dc_tab, ac_tab = huff[(0, td)], huff[(1, ta)]
                for by in range(vf):
                    for bx in range(hf):
                        zz, prev_dc[cid] = _decode_block_zz(
                            reader, dc_tab, ac_tab, prev_dc[cid]
                        )
                        grids[cid][my * vf + by, mx * hf + bx] = zz

    planes: dict[int, np.ndarray] = {}
    for cid, hf, vf, tq in comps:
        zz = grids[cid].astype(np.float64)
        q = quant[tq].astype(np.float64)
        coeffs = np.zeros(zz.shape[:2] + (8, 8))
        coeffs[..., _ZZ_ROWS, _ZZ_COLS] = zz
        blocks = np.einsum("ux,nbuv,vy->nbxy", _DCT_M, coeffs * q, _DCT_M)
        nby, nbx = blocks.shape[:2]
        plane = np.clip(
            np.rint(blocks + 128.0), 0, 255
        ).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        # replicate up to full resolution, crop to the image
        plane = np.repeat(
            np.repeat(plane, vmax // vf, axis=0), hmax // hf, axis=1
        )
        planes[cid] = plane[:height, :width]

    c0, c1, c2 = (c[0] for c in comps)
    ids = tuple(c[0] for c in comps)
    is_rgb = hdr["adobe_transform"] == 0 or ids == (0x52, 0x47, 0x42)
    if hdr["adobe_transform"] == 2:
        raise ValueError("APP14 YCCK transform unsupported")
    if is_rgb:
        rgb = np.clip(
            np.rint(np.stack([planes[c0], planes[c1], planes[c2]], axis=-1)),
            0, 255,
        ).astype(np.uint8)
        return width, height, rgb
    return width, height, _ycbcr_to_rgb(planes[c0], planes[c1], planes[c2])
