"""Progressive JPEG (ITU-T T.81 Annex G, Huffman coding) — encode AND
decode, pure numpy, closing the last JPEG gap after round 10's color
baseline: real web corpora are full of progressive streams (libjpeg's
default scan script), and the multimodal stub previously swallowed
them.

Both spectral selection AND successive approximation are implemented:

    decode: SOF2 multi-scan parse -> per-scan entropy decode
            (DC first/refine, AC first with EOB runs, AC refinement
            with correction bits — the G.1.2.2/G.1.2.3 algorithms) into
            per-component coefficient grids -> the same dequantize +
            batched-IDCT + upsample + color-transform tail as the
            baseline color decoder.
    encode: the libjpeg-style scan script (DC Al=1 interleaved, AC
            bands at Al=2/1, then DC/AC refinement passes down to
            Al=0), two passes per scan — a statistics pass builds a
            canonical Huffman table over exactly the symbols the scan
            emits (the Annex-K tables lack the EOBn symbols progressive
            needs), then the emission pass writes DHT+SOS+entropy.

Because successive approximation transmits the full quantized
coefficient by the final Al=0 passes, a progressive round trip
reconstructs EXACTLY the coefficients the sequential baseline codec
produces for the same image — the test suite pins progressive-decode
output equal, byte-for-byte, to the baseline decoder's.

Out of scope (loud errors): restart markers, arithmetic coding,
12-bit precision.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import (
    STD_CHROMA_QUANT,
    STD_LUMA_QUANT,
    ZIGZAG,
    _amplitude_bits,
    _BitReader,
    _BitWriter,
    _category,
    _DCT_M,
    _decode_table,
    _extend,
    _plane_zigzag_blocks,
    _read_huff,
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
    _ZZ_COLS,
    _ZZ_ROWS,
)

# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _SymbolCounter:
    """Statistics-pass sink: counts Huffman symbols, ignores raw bits."""

    def __init__(self):
        self.counts: dict[int, int] = {}

    def symbol(self, sym: int) -> None:
        self.counts[sym] = self.counts.get(sym, 0) + 1

    def bits(self, value: int, length: int) -> None:  # noqa: ARG002
        pass


class _SymbolWriter:
    """Emission-pass sink: Huffman-codes symbols into the bit writer."""

    def __init__(self, writer: _BitWriter, codes: dict[int, tuple[int, int]]):
        self.writer = writer
        self.codes = codes

    def symbol(self, sym: int) -> None:
        code, length = self.codes[sym]
        self.writer.put(code, length)

    def bits(self, value: int, length: int) -> None:
        if length:
            self.writer.put(value, length)


def _balanced_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """(BITS, HUFFVAL) for a fixed-length canonical table over exactly
    ``symbols``: every code gets length L = ceil(log2(n+1)), which
    keeps the all-ones code of length L unassigned (T.81 C.2 reserves
    it so marker-alignment padding can never alias a code). Compression
    is secondary to correctness here; a decoder sees a perfectly
    ordinary DHT."""
    syms = sorted(set(symbols))
    n = len(syms)
    if n == 0:
        syms, n = [0], 1  # a scan may emit no symbols; DHT must be valid
    length = max(1, (n + 1 - 1).bit_length())
    while (1 << length) - 1 < n:  # need n codes, all-ones reserved
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, syms


def _codes_from_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
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


def _comp_grids(img: np.ndarray, subsampling: str):
    """Quantized zigzag coefficient grids per component at interleaved
    (MCU-padded) size — identical math to the baseline color encoder,
    so progressive and sequential streams carry the same data."""
    if img.ndim == 2:
        ph = -(-img.shape[0] // 8) * 8
        pw = -(-img.shape[1] // 8) * 8
        padded = np.pad(
            img, ((0, ph - img.shape[0]), (0, pw - img.shape[1])), mode="edge"
        ).astype(np.float64)
        ql = STD_LUMA_QUANT.astype(np.float64)
        # per-block FDCT, NOT the batched einsum: jpeg_gray_encode
        # quantizes per block, and the two float summation orders can
        # rint a borderline coefficient differently — the progressive
        # stream must carry the SAME quantized coefficients as the
        # sequential baseline for the exact-equality contract
        nby, nbx = ph // 8, pw // 8
        grid = np.zeros((nby, nbx, 64), dtype=np.int64)
        for by in range(nby):
            for bx in range(nbx):
                block = padded[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                coeffs = _DCT_M @ (block - 128.0) @ _DCT_M.T
                quant = np.rint(coeffs / ql).astype(np.int64)
                grid[by, bx] = quant[_ZZ_ROWS, _ZZ_COLS]
        return [(1, 1, 1, 0, grid)], 1, 1
    if subsampling == "420":
        hs, vs = 2, 2
    elif subsampling == "422":
        hs, vs = 2, 1
    elif subsampling == "444":
        hs, vs = 1, 1
    else:
        raise ValueError("subsampling must be '420', '422' or '444'")
    h, w = img.shape[:2]
    ph = -(-h // (8 * vs)) * (8 * vs)
    pw = -(-w // (8 * hs)) * (8 * hs)
    padded = np.pad(img, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    y, cb, cr = _rgb_to_ycbcr(padded)
    if hs == 2 or vs == 2:
        cb = cb.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))
        cr = cr.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))
    ql = STD_LUMA_QUANT.astype(np.float64)
    qc = STD_CHROMA_QUANT.astype(np.float64)
    return (
        [
            (1, hs, vs, 0, _plane_zigzag_blocks(y, ql)),
            (2, 1, 1, 1, _plane_zigzag_blocks(cb, qc)),
            (3, 1, 1, 1, _plane_zigzag_blocks(cr, qc)),
        ],
        hs,
        vs,
    )


def _nonint_grid_dims(width, height, hf, vf, hmax, vmax):
    """Block grid of a NON-interleaved scan: ceil(component dims / 8),
    which can be smaller than the MCU-padded interleaved grid (G.1:
    single-component scans traverse the component's own grid)."""
    cw = -(-width * hf // hmax)
    ch = -(-height * vf // vmax)
    return -(-ch // 8), -(-cw // 8)


def _dc_first_scan(sink, comps, grids, mcux, mcuy, al):
    preds = {cid: 0 for cid, *_ in comps}
    for my in range(mcuy):
        for mx in range(mcux):
            for cid, hf, vf, _tq in comps:
                g = grids[cid]
                for by in range(vf):
                    for bx in range(hf):
                        dc = int(g[my * vf + by, mx * hf + bx, 0]) >> al
                        diff = dc - preds[cid]
                        preds[cid] = dc
                        size = _category(diff)
                        sink.symbol(size)
                        sink.bits(_amplitude_bits(diff, size), size)


def _dc_first_scan_nonint(sink, grid, nbh, nbw, al):
    """Single-component (non-interleaved) DC first scan: the walk is
    the component's own block grid, fresh predictor."""
    pred = 0
    for by in range(nbh):
        for bx in range(nbw):
            dc = int(grid[by, bx, 0]) >> al
            diff = dc - pred
            pred = dc
            size = _category(diff)
            sink.symbol(size)
            sink.bits(_amplitude_bits(diff, size), size)


def _dc_refine_scan_nonint(writer, grid, nbh, nbw, al):
    for by in range(nbh):
        for bx in range(nbw):
            writer.put((abs(int(grid[by, bx, 0])) >> al) & 1, 1)


def _dc_refine_scan(writer, comps, grids, mcux, mcuy, al):
    # raw bits only — no Huffman symbols, no statistics pass needed
    for my in range(mcuy):
        for mx in range(mcux):
            for cid, hf, vf, _tq in comps:
                g = grids[cid]
                for by in range(vf):
                    for bx in range(hf):
                        dc = int(g[my * vf + by, mx * hf + bx, 0])
                        writer.put((abs(dc) >> al) & 1, 1)


def _ac_first_scan(sink, grid, nbh, nbw, ss, se, al):
    state = {"eobrun": 0}

    def flush_eob():
        if state["eobrun"]:
            e = state["eobrun"].bit_length() - 1
            sink.symbol(e << 4)
            sink.bits(state["eobrun"] & ((1 << e) - 1), e)
            state["eobrun"] = 0

    for by in range(nbh):
        for bx in range(nbw):
            zz = grid[by, bx]
            band = []
            for k in range(ss, se + 1):
                v = int(zz[k])
                band.append(
                    (v >> al) if v >= 0 else -((-v) >> al)
                )  # G.1.2.1: AC point transform truncates toward zero
            last = max(
                (i for i, v in enumerate(band) if v != 0), default=-1
            )
            if last < 0:
                state["eobrun"] += 1
                if state["eobrun"] == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            r = 0
            for i in range(last + 1):
                v = band[i]
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    sink.symbol(0xF0)  # ZRL
                    r -= 16
                size = _category(v)
                sink.symbol((r << 4) | size)
                sink.bits(_amplitude_bits(v, size), size)
                r = 0
            if last < se - ss:
                state["eobrun"] += 1
                if state["eobrun"] == 0x7FFF:
                    flush_eob()
    flush_eob()


def _ac_refine_scan(sink, grid, nbh, nbw, ss, se, al):
    """G.1.2.3 — newly-significant coefficients plus correction bits
    for history, buffered across EOB runs (the jcphuff algorithm)."""
    state = {"eobrun": 0, "be": []}

    def flush_eob():
        if state["eobrun"]:
            e = state["eobrun"].bit_length() - 1
            sink.symbol(e << 4)
            sink.bits(state["eobrun"] & ((1 << e) - 1), e)
            state["eobrun"] = 0
        for b in state["be"]:
            sink.bits(b, 1)
        state["be"] = []

    for by in range(nbh):
        for bx in range(nbw):
            zz = grid[by, bx]
            coefs = [int(zz[k]) for k in range(ss, se + 1)]
            mags = [abs(c) >> al for c in coefs]
            eob = max((i for i, m in enumerate(mags) if m == 1), default=-1)
            r = 0
            br: list[int] = []
            for i, c in enumerate(coefs):
                m = mags[i]
                if m == 0:
                    r += 1
                    continue
                # pending ZRLs flush at EVERY nonzero-magnitude position
                # (corrections included) so the wire keeps the decoder
                # walk's positional order: ZRL, then the correction bits
                # of the span it covers, in coefficient order
                while r > 15 and i <= eob:
                    flush_eob()
                    sink.symbol(0xF0)
                    r -= 16
                    for b in br:
                        sink.bits(b, 1)
                    br = []
                if m > 1:
                    br.append((abs(c) >> al) & 1)
                    continue
                # newly significant (magnitude becomes 1 at this Al)
                flush_eob()
                sink.symbol((r << 4) | 1)
                sink.bits(1 if c >= 0 else 0, 1)
                for b in br:
                    sink.bits(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                state["eobrun"] += 1
                state["be"].extend(br)
                if state["eobrun"] == 0x7FFF:
                    flush_eob()
    flush_eob()


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _scan_bytes(comps_in_scan, ss, se, ah, al, encode, dc_class) -> bytes:
    """Two-pass scan assembly: count symbols -> build the table -> emit
    DHT + SOS + entropy. ``encode(sink)`` must be deterministic."""
    counter = _SymbolCounter()
    encode(counter)
    bits, vals = _balanced_table(list(counter.counts))
    writer = _BitWriter()
    encode(_SymbolWriter(writer, _codes_from_table(bits, vals)))
    writer.flush()
    tc = 0 if dc_class else 1
    dht = _seg(0xFFC4, bytes([tc << 4]) + bytes(bits) + bytes(vals))
    sos_body = bytes([len(comps_in_scan)])
    for cid in comps_in_scan:
        sos_body += bytes([cid, 0x00])  # td=0, ta=0 (just redefined)
    sos_body += bytes([ss, se, (ah << 4) | al])
    return dht + _seg(0xFFDA, sos_body) + bytes(writer.out)


def _raw_scan_bytes(comps_in_scan, ss, se, ah, al, fill) -> bytes:
    """A scan with no Huffman symbols (DC refinement): SOS + raw bits."""
    writer = _BitWriter()
    fill(writer)
    writer.flush()
    sos_body = bytes([len(comps_in_scan)])
    for cid in comps_in_scan:
        sos_body += bytes([cid, 0x00])
    sos_body += bytes([ss, se, (ah << 4) | al])
    return _seg(0xFFDA, sos_body) + bytes(writer.out)


def jpeg_progressive_encode(
    img: np.ndarray, subsampling: str = "420", dc_scans: str = "interleaved"
) -> bytes:
    """Encode a grayscale HxW or RGB HxWx3 uint8 image as a PROGRESSIVE
    JPEG (SOF2) with the libjpeg-style scan script: interleaved DC at
    Al=1, AC bands per component at Al=2 (luma) / Al=1 (chroma), an AC
    luma refinement to Al=1, then DC and AC refinements down to Al=0.
    The quantized coefficients are identical to the sequential
    encoder's, so a full decode reconstructs the same image bytes.
    ``dc_scans="per-component"`` emits the mozjpeg-style variant — one
    non-interleaved DC scan (and refinement) per component over its own
    block grid — exercising the other legal G.1 traversal."""
    if dc_scans not in ("interleaved", "per-component"):
        raise ValueError("dc_scans must be 'interleaved' or 'per-component'")
    img = np.asarray(img, dtype=np.uint8)
    comps, hs, vs = _comp_grids(img, subsampling)
    h, w = img.shape[:2]
    grids = {cid: g for cid, _hf, _vf, _tq, g in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_hdr = [(cid, hf, vf, tq) for cid, hf, vf, tq, _g in comps]
    gray = len(comps) == 1

    out = b"\xff\xd8" + _seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    out += _seg(
        0xFFDB, b"\x00" + bytes(int(STD_LUMA_QUANT[r][c]) for r, c in ZIGZAG)
    )
    if not gray:
        out += _seg(
            0xFFDB,
            b"\x01" + bytes(int(STD_CHROMA_QUANT[r][c]) for r, c in ZIGZAG),
        )
    sof_body = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hf, vf, tq in comp_hdr:
        sof_body += bytes([cid, (hf << 4) | vf, tq])
    out += _seg(0xFFC2, sof_body)  # SOF2 = progressive, Huffman

    all_cids = [c[0] for c in comp_hdr]
    per_comp_dims = {
        cid: _nonint_grid_dims(w, h, hf, vf, hmax, vmax)
        for cid, hf, vf, _tq in comp_hdr
    }
    if dc_scans == "per-component":
        for cid in all_cids:
            nbh, nbw = per_comp_dims[cid]
            out += _scan_bytes(
                [cid], 0, 0, 0, 1,
                lambda sink, g=grids[cid], a=nbh, b=nbw:
                    _dc_first_scan_nonint(sink, g, a, b, 1),
                dc_class=True,
            )
    else:
        # scan 1: DC of every component, interleaved, Al=1
        out += _scan_bytes(
            all_cids, 0, 0, 0, 1,
            lambda sink: _dc_first_scan(sink, comp_hdr, grids, mcux, mcuy, 1),
            dc_class=True,
        )

    def ac(cid, hf, vf, ss, se, ah, al):
        nbh, nbw = _nonint_grid_dims(w, h, hf, vf, hmax, vmax)
        fn = _ac_first_scan if ah == 0 else _ac_refine_scan
        return _scan_bytes(
            [cid], ss, se, ah, al,
            lambda sink: fn(sink, grids[cid], nbh, nbw, ss, se, al),
            dc_class=False,
        )

    y_cid, y_hf, y_vf = comp_hdr[0][0], comp_hdr[0][1], comp_hdr[0][2]
    out += ac(y_cid, y_hf, y_vf, 1, 5, 0, 2)
    if not gray:
        for cid, hf, vf, _tq in comp_hdr[1:]:
            out += ac(cid, hf, vf, 1, 63, 0, 1)
    out += ac(y_cid, y_hf, y_vf, 6, 63, 0, 2)
    out += ac(y_cid, y_hf, y_vf, 1, 63, 2, 1)  # luma AC refine 2 -> 1
    # DC refinement Ah=1 -> Al=0 (raw bits)
    if dc_scans == "per-component":
        for cid in all_cids:
            nbh, nbw = per_comp_dims[cid]
            out += _raw_scan_bytes(
                [cid], 0, 0, 1, 0,
                lambda wtr, g=grids[cid], a=nbh, b=nbw:
                    _dc_refine_scan_nonint(wtr, g, a, b, 0),
            )
    else:
        out += _raw_scan_bytes(
            all_cids, 0, 0, 1, 0,
            lambda wtr: _dc_refine_scan(wtr, comp_hdr, grids, mcux, mcuy, 0),
        )
    if not gray:
        for cid, hf, vf, _tq in comp_hdr[1:]:
            out += ac(cid, hf, vf, 1, 63, 1, 0)
    out += ac(y_cid, y_hf, y_vf, 1, 63, 1, 0)
    return out + b"\xff\xd9"


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _parse_progressive(payload: bytes) -> dict:
    """Segment walk for SOF2 streams: tables accumulate, every SOS
    yields (scan header, entropy byte range) — entropy data runs to the
    next marker (stuffed 0xFF00 bytes skipped)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    width = height = None
    comps: list[tuple[int, int, int, int]] = []
    scans: list[dict] = []
    tables: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    adobe_transform = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        # B.1.1.2 fill bytes (r10 advice) — same skip as the baseline
        # walks in jpeg.py
        while pos + 4 <= len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (length,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + length]
        if marker == 0xDB:
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
        elif marker == 0xC2:
            _prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                hf, vf = hv >> 4, hv & 0x0F
                if not (1 <= hf <= 2 and 1 <= vf <= 2):
                    raise ValueError(
                        f"sampling factor {hf}x{vf} out of the 1-2 range"
                    )
                comps.append((cid, hf, vf, tq))
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "jpeg_progressive_decode handles SOF2 only "
                f"(got SOF{marker - 0xC0}; use the baseline decoders)"
            )
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                tables[(tc, th)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xEE and body[:5] == b"Adobe" and len(body) >= 12:
            adobe_transform = body[11]
        elif marker == 0xDA:
            ns = body[0]
            scomps = []
            for si in range(ns):
                cid = body[1 + 2 * si]
                tt = body[2 + 2 * si]
                scomps.append((cid, tt >> 4, tt & 0x0F))
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            data_start = pos + 2 + length
            # entropy data runs to the next non-stuffing marker
            p = data_start
            while p + 1 < len(payload):
                if payload[p] == 0xFF and payload[p + 1] not in (0x00,):
                    break
                p += 1
            scans.append(
                {
                    "comps": scomps,
                    "ss": ss,
                    "se": se,
                    "ah": ahal >> 4,
                    "al": ahal & 0x0F,
                    "data": payload[data_start:p],
                    "tables": dict(tables),  # snapshot at scan time
                }
            )
            pos = p
            continue
        pos += 2 + length
    if width is None or not comps or not scans:
        raise ValueError("missing SOF2/SOS")
    if restart_interval:
        raise ValueError("restart markers unsupported")
    return {
        "width": width,
        "height": height,
        "comps": comps,
        "quant": quant,
        "scans": scans,
        "adobe_transform": adobe_transform,
    }


def _decode_dc_scan(
    scan, comps, grids, preds, mcux, mcuy, width, height, hmax, vmax
):
    """DC scan walk: ns>1 traverses the interleaved MCU grid; ns=1 is a
    NON-interleaved scan and traverses the component's own
    ceil(dims/8) block grid (T.81 G.1 / A.2 — review r10 pass-2
    finding #2: mozjpeg-style scan scripts emit per-component DC scans,
    and the MCU-padded grid is bigger for subsampled layouts)."""
    reader = _BitReader(scan["data"])
    al, ah = scan["al"], scan["ah"]
    in_scan = {cid for cid, _td, _ta in scan["comps"]}
    members = [c for c in comps if c[0] in in_scan]
    if ah == 0:
        tabs = {cid: scan["tables"][(0, td)] for cid, td, _ta in scan["comps"]}

    def one(cid, by, bx):
        g = grids[cid]
        if ah == 0:
            size = _read_huff(reader, tabs[cid])
            preds[cid] += _extend(reader.bits(size), size)
            g[by, bx, 0] = preds[cid] << al
        elif reader.bit():
            g[by, bx, 0] |= 1 << al

    if len(scan["comps"]) == 1:
        cid, hf, vf, _tq = members[0]
        nbh, nbw = _nonint_grid_dims(width, height, hf, vf, hmax, vmax)
        for by in range(nbh):
            for bx in range(nbw):
                one(cid, by, bx)
        return
    for my in range(mcuy):
        for mx in range(mcux):
            for cid, hf, vf, _tq in members:
                for by in range(vf):
                    for bx in range(hf):
                        one(cid, my * vf + by, mx * hf + bx)


def _decode_ac_first(scan, grid, nbh, nbw):
    reader = _BitReader(scan["data"])
    ss, se, al = scan["ss"], scan["se"], scan["al"]
    _cid, _td, ta = scan["comps"][0]
    ac_tab = scan["tables"][(1, ta)]
    eobrun = 0
    for by in range(nbh):
        for bx in range(nbw):
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _read_huff(reader, ac_tab)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError("AC run past band end")
                grid[by, bx, k] = _extend(reader.bits(s), s) << al
                k += 1


def _decode_ac_refine(scan, grid, nbh, nbw):
    """G.1.2.3 / jdphuff: corrections to already-nonzero coefficients,
    insertions of newly-significant ±1<<Al."""
    reader = _BitReader(scan["data"])
    ss, se, al = scan["ss"], scan["se"], scan["al"]
    _cid, _td, ta = scan["comps"][0]
    ac_tab = scan["tables"][(1, ta)]
    p1, m1 = 1 << al, -1 << al
    eobrun = 0

    def correct(by, bx, k):
        c = int(grid[by, bx, k])
        if reader.bit() and (abs(c) >> al) & 1 == 0:
            grid[by, bx, k] = c + (p1 if c >= 0 else m1)

    for by in range(nbh):
        for bx in range(nbw):
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _read_huff(reader, ac_tab)
                    r, s = rs >> 4, rs & 0x0F
                    newval = 0
                    if s:
                        if s != 1:
                            raise ValueError(
                                "refinement scan with size > 1"
                            )
                        newval = p1 if reader.bit() else m1
                    elif r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.bits(r)
                        break
                    # advance over r zero-history positions (with
                    # corrections for nonzero-history ones passed)
                    while k <= se:
                        if int(grid[by, bx, k]) != 0:
                            correct(by, bx, k)
                        else:
                            if r == 0:
                                if newval:
                                    grid[by, bx, k] = newval
                                k += 1
                                break
                            r -= 1
                        k += 1
            if eobrun > 0:
                while k <= se:
                    if int(grid[by, bx, k]) != 0:
                        correct(by, bx, k)
                    k += 1
                eobrun -= 1


def jpeg_progressive_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a progressive (SOF2, Huffman) JPEG; returns
    (width, height, HxW uint8) for single-component streams or
    (width, height, HxWx3 uint8 RGB) for 3-component ones. APP14
    transform=0 / R,G,B component ids pass planes through untransformed
    (as in the baseline color decoder)."""
    hdr = _parse_progressive(payload)
    width, height = hdr["width"], hdr["height"]
    comps = hdr["comps"]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    grids = {
        cid: np.zeros((mcuy * vf, mcux * hf, 64), dtype=np.int32)
        for cid, hf, vf, _tq in comps
    }
    preds = {cid: 0 for cid, *_ in comps}
    by_cid = {c[0]: c for c in comps}

    for scan in hdr["scans"]:
        if scan["ss"] == 0:
            if scan["se"] != 0:
                raise ValueError("scan mixing DC and AC bands")
            _decode_dc_scan(
                scan, comps, grids, preds, mcux, mcuy,
                width, height, hmax, vmax,
            )
            continue
        if len(scan["comps"]) != 1:
            raise ValueError("interleaved AC scan is not legal progressive")
        cid = scan["comps"][0][0]
        _c, hf, vf, _tq = by_cid[cid]
        nbh, nbw = _nonint_grid_dims(width, height, hf, vf, hmax, vmax)
        if scan["ah"] == 0:
            _decode_ac_first(scan, grids[cid], nbh, nbw)
        else:
            _decode_ac_refine(scan, grids[cid], nbh, nbw)

    planes: dict[int, np.ndarray] = {}
    gray = len(comps) == 1
    for cid, hf, vf, tq in comps:
        zz = grids[cid].astype(np.float64)
        q = hdr["quant"][tq].astype(np.float64)
        coeffs = np.zeros(zz.shape[:2] + (8, 8))
        coeffs[..., _ZZ_ROWS, _ZZ_COLS] = zz
        nby, nbx = coeffs.shape[:2]
        # IDCT path mirrors the matching BASELINE decoder exactly —
        # per-block matrix form for gray, batched einsum for color —
        # because the two differ in float summation order by a last
        # ulp, which can cross an rint boundary; the test suite and the
        # oracle row pin progressive output EQUAL to the baseline's.
        if gray:
            blocks = np.empty((nby, nbx, 8, 8))
            for by in range(nby):
                for bx in range(nbx):
                    blocks[by, bx] = _DCT_M.T @ (coeffs[by, bx] * q) @ _DCT_M
        else:
            blocks = np.einsum(
                "ux,nbuv,vy->nbxy", _DCT_M, coeffs * q, _DCT_M
            )
        plane = np.clip(
            np.rint(blocks + 128.0), 0, 255
        ).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        plane = np.repeat(
            np.repeat(plane, vmax // vf, axis=0), hmax // hf, axis=1
        )
        planes[cid] = plane[:height, :width]

    if len(comps) == 1:
        return width, height, planes[comps[0][0]].astype(np.uint8)
    if len(comps) != 3:
        raise ValueError(f"{len(comps)}-component progressive unsupported")
    c0, c1, c2 = (c[0] for c in comps)
    ids = tuple(c[0] for c in comps)
    if hdr["adobe_transform"] == 2:
        raise ValueError("APP14 YCCK transform unsupported")
    if hdr["adobe_transform"] == 0 or ids == (0x52, 0x47, 0x42):
        return width, height, np.clip(
            np.rint(np.stack([planes[c0], planes[c1], planes[c2]], axis=-1)),
            0, 255,
        ).astype(np.uint8)
    return width, height, _ycbcr_to_rgb(planes[c0], planes[c1], planes[c2])
