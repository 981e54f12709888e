"""JPEG codec — stdlib ``struct`` + numpy only (r11, VERDICT r10 Next
#4: the single biggest remaining real-corpora gap). Baseline
sequential (SOF0/SOF1) AND progressive (SOF2).

Implements the PUBLIC ITU-T T.81 spec directly: marker segments, Annex
K standard Huffman + quantization machinery (canonical code
construction from BITS/HUFFVAL), zigzag order, level-shifted 2-D
DCT-II via an orthonormal 8x8 matrix product (numpy), entropy-coded
byte stuffing (FF 00) and DRI/RSTn restart intervals.

Decoder surface: baseline sequential DCT and progressive DCT (spectral
selection + successive approximation, T.81 G.2 — DC first/refinement
scans, per-component AC band scans with EOBn runs, AC refinement with
correction bits), Huffman entropy coding, 8-bit precision, 1 or 3
components, per-component sampling factors in {1, 2} (4:4:4, 4:2:2,
4:2:0), multi-table DQT/DHT segments (8- and 16-bit quantizer
precision, mid-file overrides), restart markers. Honest refusals:
lossless (SOF3), hierarchical, arithmetic coding (SOF9+), 12-bit
precision — each names the shape it refuses.

Encoders exist for fixtures and tests: baseline (4:4:4 or 4:2:0,
grayscale or RGB, selectable uniform quantizer, restart intervals) and
progressive (libjpeg-style scan script: interleaved DC first at Al=1,
per-component AC band scans, DC refinement, AC refinement). Both
produce IDENTICAL quantized coefficients for the same input, so a
correct decoder returns byte-identical rasters for the two encodings —
the progressive paths are validated against the independent baseline
path, not just against themselves. With the all-ones quantizer a
block-CONSTANT image round-trips EXACTLY (the only nonzero
coefficient is the DC term, which quantizes losslessly and inverse-
transforms back to the constant), which is what makes the d98/d99
oracle rows byte-free: the arithmetic oracle derives the decoded sums
without ever seeing the bitstream, through REAL Huffman/DCT pipelines.

Reference parity: the reference repo (datafusion-federation) has no
media decode at all — this is north-star multimodal surface for
100 TB training-data pipelines (SURVEY.md §6); the decode runs inside
the same Arrow-batched mapInPandas seam as the PNG/BMP/WAV decoders.
"""

from __future__ import annotations

import math
import struct

import numpy as np

#: zigzag scan order (T.81 Figure 5): zz index -> raster index
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

# Annex K standard Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
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
    0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
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
    0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix M: coefficients = M @ s @ M.T,
    samples = M.T @ C @ M (T.81 A.3.3 with the 1/2 C(u)C(v) scale
    folded in)."""
    m = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u
                                          * math.pi / 16)
    return m


_M = _dct_matrix()


def _build_codes(bits, vals):
    """Canonical Huffman codes (T.81 C.2): symbol -> (code, length)."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_lut(bits, vals):
    """(length, code) -> symbol, with overfull-table validation (a
    hostile DHT whose canonical construction overflows a length's
    code space would otherwise alias symbols)."""
    if sum(bits) != len(vals):
        raise ValueError("JPEG DHT BITS/HUFFVAL count mismatch")
    if sum(bits) > 256:
        raise ValueError("JPEG DHT declares more than 256 symbols")
    lut = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        if code >= (1 << ln) and bits[ln - 1]:
            raise ValueError("JPEG DHT canonical code overflow")
        for _ in range(bits[ln - 1]):
            if code >= (1 << ln):
                raise ValueError("JPEG DHT canonical code overflow")
            lut[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return lut


def _cat(v: int) -> int:
    """Magnitude category (T.81 F.1.2.1): bits needed for |v|."""
    a = abs(v)
    s = 0
    while a:
        s += 1
        a >>= 1
    return s


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        for i in reversed(range(length)):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:        # byte stuffing (F.1.2.3)
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def pad_to_byte(self) -> None:
        while self.n:
            self.write(1, 1)


class _BitReader:
    """Entropy-coded-segment reader: unstuffs FF 00, refuses a bare
    marker mid-codeword (a truncated/hostile stream must not read
    past its segment)."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.i = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.i >= len(self.d):
                raise ValueError("JPEG scan data truncated")
            byte = self.d[self.i]
            self.i += 1
            if byte == 0xFF:
                if self.i >= len(self.d):
                    raise ValueError("JPEG scan data truncated at FF")
                nxt = self.d[self.i]
                if nxt == 0x00:
                    self.i += 1
                else:
                    raise ValueError(
                        f"JPEG marker FF{nxt:02X} inside entropy "
                        f"data (truncated scan?)")
            self.acc = byte
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_expect_rst(self, idx: int) -> None:
        """Byte-align and consume the RSTn marker (T.81 F.2.2.5)."""
        self.n = 0
        if (self.i + 1 >= len(self.d) or self.d[self.i] != 0xFF
                or self.d[self.i + 1] != 0xD0 + (idx & 7)):
            raise ValueError(
                f"JPEG restart marker RST{idx & 7} missing at byte "
                f"{self.i}")
        self.i += 2


def _decode_symbol(br: _BitReader, lut) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        sym = lut.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code (>16 bits)")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits to the signed value."""
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


# ---------------------------------------------------------------------------
# encoder (fixtures/tests)
# ---------------------------------------------------------------------------

def encode_jpeg_baseline(width: int, height: int,
                         raster: bytes | None = None,
                         gray: bytes | None = None,
                         quant: int = 1,
                         subsample: bool = False,
                         restart_interval: int = 0) -> bytes:
    """Baseline JFIF encoder. ``raster`` = RGB row-major top-down
    (3 components, 4:4:4 or 4:2:0 when ``subsample``) or ``gray`` =
    one byte per pixel (1 component). ``quant`` fills both quantizer
    tables uniformly — 1 keeps block-constant images EXACT."""
    if (raster is None) == (gray is None):
        raise ValueError("pass exactly one of raster= or gray=")
    if quant < 1 or quant > 255:
        raise ValueError("quant must be in [1, 255]")
    if width <= 0 or height <= 0:
        raise ValueError("zero-dimension JPEG")

    qtab = [quant] * 64
    if gray is not None:
        if len(gray) != width * height:
            raise ValueError("gray length != width*height")
        plane = np.frombuffer(gray, np.uint8).reshape(height, width)
        comps = [(1, 1, 1, 0, plane.astype(np.float64))]
        n_q = 1
    else:
        if len(raster) != width * height * 3:
            raise ValueError("raster length != width*height*3")
        rgb = np.frombuffer(raster, np.uint8).reshape(
            height, width, 3).astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
        y, cb, cr = (np.clip(np.round(p), 0, 255) for p in (y, cb, cr))
        if subsample:
            he = height + (height & 1)
            we = width + (width & 1)

            def half(p):
                p2 = np.pad(p, ((0, he - height), (0, we - width)),
                            mode="edge")
                return np.round((p2[0::2, 0::2] + p2[0::2, 1::2]
                                 + p2[1::2, 0::2] + p2[1::2, 1::2])
                                / 4.0)
            comps = [(1, 2, 2, 0, y), (2, 1, 1, 1, half(cb)),
                     (3, 1, 1, 1, half(cr))]
        else:
            comps = [(1, 1, 1, 0, y), (2, 1, 1, 1, cb),
                     (3, 1, 1, 1, cr)]
        n_q = 2

    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcux = (width + 8 * max_h - 1) // (8 * max_h)
    mcuy = (height + 8 * max_v - 1) // (8 * max_v)

    padded = []
    for (cid, ch, cv, tq, plane) in comps:
        ph, pw = 8 * cv * mcuy, 8 * ch * mcux
        plane = np.pad(plane,
                       ((0, ph - plane.shape[0]),
                        (0, pw - plane.shape[1])), mode="edge")
        padded.append((cid, ch, cv, tq, plane))

    dc_codes = (_build_codes(*_DC_LUMA), _build_codes(*_DC_CHROMA))
    ac_codes = (_build_codes(*_AC_LUMA), _build_codes(*_AC_CHROMA))
    qarr = np.array(qtab, np.float64)[np.argsort(ZIGZAG)].reshape(8, 8)

    bw = _BitWriter()
    preds = [0] * len(padded)
    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                bw.pad_to_byte()
                bw.buf += bytes([0xFF, 0xD0 + (rst_idx & 7)])
                rst_idx += 1
                preds = [0] * len(padded)
            for ci, (cid, ch, cv, tq, plane) in enumerate(padded):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        blk = plane[y0:y0 + 8, x0:x0 + 8] - 128.0
                        coef = _M @ blk @ _M.T
                        qz = np.round(coef / qarr).astype(np.int64)
                        zz = [int(qz.flat[ZIGZAG[i]])
                              for i in range(64)]
                        t = 0 if tq == 0 else 1
                        diff = zz[0] - preds[ci]
                        preds[ci] = zz[0]
                        s = _cat(diff)
                        c, ln = dc_codes[t][s]
                        bw.write(c, ln)
                        if s:
                            bw.write(diff if diff >= 0
                                     else diff + (1 << s) - 1, s)
                        last = 0
                        for i in range(63, 0, -1):
                            if zz[i]:
                                last = i
                                break
                        run = 0
                        for i in range(1, last + 1):
                            v = zz[i]
                            if v == 0:
                                run += 1
                                continue
                            while run >= 16:
                                c, ln = ac_codes[t][0xF0]
                                bw.write(c, ln)
                                run -= 16
                            s = _cat(v)
                            c, ln = ac_codes[t][(run << 4) | s]
                            bw.write(c, ln)
                            bw.write(v if v >= 0
                                     else v + (1 << s) - 1, s)
                            run = 0
                        if last < 63:
                            c, ln = ac_codes[t][0x00]
                            bw.write(c, ln)
            mcu_count += 1
    bw.pad_to_byte()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker,
                           len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")                      # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq in range(n_q):
        out += seg(0xDB, bytes([tq]) + bytes(qtab))   # DQT (Pq=0)
    sof = struct.pack(">BHHB", 8, height, width, len(padded))
    for (cid, ch, cv, tq, _p) in padded:
        sof += bytes([cid, (ch << 4) | cv, tq])
    out += seg(0xC0, sof)                             # SOF0
    for tc, (bits, vals) in ((0, _DC_LUMA), (1, _AC_LUMA)):
        out += seg(0xC4, bytes([tc << 4]) + bytes(bits) + bytes(vals))
    if n_q == 2:
        for tc, (bits, vals) in ((0, _DC_CHROMA), (1, _AC_CHROMA)):
            out += seg(0xC4, bytes([(tc << 4) | 1])
                       + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    sos = bytes([len(padded)])
    for (cid, _ch, _cv, tq, _p) in padded:
        t = 0 if tq == 0 else 1
        sos += bytes([cid, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)                             # SOS
    out += bw.buf
    out += b"\xFF\xD9"                                # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


_SOF_REFUSE = {
    0xC3: "lossless JPEG (SOF3)",
    0xC5: "differential sequential JPEG (SOF5)",
    0xC6: "differential progressive JPEG (SOF6)",
    0xC7: "differential lossless JPEG (SOF7)",
    0xC9: "arithmetic-coded JPEG (SOF9)",
    0xCA: "arithmetic progressive JPEG (SOF10)",
    0xCB: "arithmetic lossless JPEG (SOF11)",
    0xCD: "differential arithmetic JPEG (SOF13)",
    0xCE: "differential arithmetic progressive JPEG (SOF14)",
    0xCF: "differential arithmetic lossless JPEG (SOF15)",
}


def _next_marker(b: bytes, j: int) -> int:
    """Position of the FF that starts the next marker at/after j
    (skipping entropy bytes, stuffed FF 00 pairs, and FF fill)."""
    n = len(b)
    while j + 1 < n:
        if b[j] == 0xFF and b[j + 1] != 0x00:
            while j + 1 < n and b[j + 1] == 0xFF:   # fill bytes
                j += 1
            return j
        j += 1
    raise ValueError("JPEG truncated inside/after scan data")


def decode_jpeg(b: bytes) -> dict:
    """Baseline (SOF0/SOF1) AND progressive (SOF2, r11) JPEG decode ->
    meta dict + ``raster`` (RGB row-major top-down), the decode_image
    contract. One unified path: every scan — a baseline full-band
    scan, a progressive DC first/refinement scan, or a progressive AC
    spectral-selection / successive-approximation scan (T.81 G.2,
    EOBn runs and correction bits included) — accumulates into
    per-component quantized-coefficient buffers; dequantization +
    IDCT run once at EOI. See module docstring for refusals."""
    if b[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    n = len(b)
    qtabs: dict[int, np.ndarray] = {}
    dc_luts: dict[int, dict] = {}
    ac_luts: dict[int, dict] = {}
    sof = None
    progressive = False
    restart = 0
    comps = None           # [cid, ch, cv, tq] per component
    coefs = None           # per comp: np.int32 (nby, nbx, 64) zz order
    preds_grid = None
    mcux = mcuy = max_h = max_v = 0
    w = h = 0
    scans = 0

    def decode_dc_first(br, dlut, blk, al, ci, preds):
        s = _decode_symbol(br, dlut)
        if s > 11:
            raise ValueError(f"JPEG DC category {s} out of range")
        diff = _extend(br.bits(s), s) if s else 0
        preds[ci] += diff
        blk[0] = preds[ci] << al

    def decode_ac_first(br, alut, blk, ss, se, al, state):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = _decode_symbol(br, alut)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16          # ZRL
                    continue
                if not progressive and r:
                    raise ValueError(
                        "JPEG baseline scan carries a progressive "
                        "EOBn symbol")
                state["eobrun"] = (1 << r)
                if r:
                    state["eobrun"] += br.bits(r)
                state["eobrun"] -= 1
                return
            k += r
            if k > se:
                raise ValueError("JPEG AC run past band end")
            blk[k] = _extend(br.bits(s), s) << al
            k += 1

    def decode_ac_refine(br, alut, blk, ss, se, al, state):
        p1 = 1 << al
        m1 = -p1

        def correct(k_):
            if br.bits(1) and (int(blk[k_]) & p1) == 0:
                blk[k_] += p1 if blk[k_] >= 0 else m1

        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = _decode_symbol(br, alut)
                r, s = rs >> 4, rs & 0x0F
                val = 0
                if s == 0:
                    if r != 15:
                        state["eobrun"] = (1 << r)
                        if r:
                            state["eobrun"] += br.bits(r)
                        break
                    # r == 15: pass over 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError(
                            "JPEG AC refinement magnitude != 1")
                    val = p1 if br.bits(1) else m1
                while k <= se:
                    if blk[k] != 0:
                        correct(k)
                    else:
                        r -= 1
                        if r < 0:
                            break
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                k += 1
            state["eobrun"] -= 1

    while i + 2 <= n:
        if b[i] != 0xFF:
            raise ValueError(f"JPEG expected marker at byte {i}")
        marker = b[i + 1]
        if marker == 0xD9:                            # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2                                    # standalone
            continue
        if i + 4 > n:
            raise ValueError("JPEG segment header truncated")
        ln = struct.unpack_from(">H", b, i + 2)[0]
        if ln < 2 or i + 2 + ln > n:
            raise ValueError("JPEG segment length runs past EOF")
        seg = b[i + 4:i + 2 + ln]
        if marker == 0xDB:                            # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq not in (0, 1):
                    raise ValueError(f"JPEG DQT precision {pq}")
                cnt = 64 * (2 if pq else 1)
                if p + cnt > len(seg):
                    raise ValueError("JPEG DQT table truncated")
                if pq:
                    vals = struct.unpack_from(">64H", seg, p)
                else:
                    vals = seg[p:p + 64]
                p += cnt
                tab = np.zeros(64, np.float64)
                for zi, v in enumerate(vals):
                    if v == 0:
                        raise ValueError("JPEG zero quantizer entry")
                    tab[ZIGZAG[zi]] = v
                qtabs[tq] = tab.reshape(8, 8)
        elif marker == 0xC4:                          # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                if tc > 1:
                    raise ValueError(f"JPEG DHT class {tc} invalid")
                bits = list(seg[p + 1:p + 17])
                cnt = sum(bits)
                vals = list(seg[p + 17:p + 17 + cnt])
                if len(vals) != cnt:
                    raise ValueError("JPEG DHT values truncated")
                p += 17 + cnt
                lut = _build_decode_lut(bits, vals)
                (dc_luts if tc == 0 else ac_luts)[th] = lut
        elif marker in (0xC0, 0xC1, 0xC2):            # SOF0/1/2
            if sof is not None:
                raise ValueError("JPEG duplicate SOF")
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(
                    f"JPEG {prec}-bit precision (baseline/progressive "
                    f"here is 8-bit)")
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"JPEG with {nc} components (1=gray, 3=YCbCr "
                    f"supported; CMYK refuses honestly)")
            if h == 0:
                # legal JPEG: height 0 defers the line count to a DNL
                # marker after the first scan (T.81 B.2.5) — a named
                # refusal, not a generic reject (r12 review)
                raise NotImplementedError(
                    "JPEG with SOF height 0 (DNL-deferred line count, "
                    "T.81 B.2.5) is not supported — re-encode with "
                    "explicit dimensions")
            if w == 0:
                raise ValueError("zero-width JPEG")
            if w * h * 3 > 256 * 1024 * 1024:
                raise ValueError(
                    "JPEG dimensions exceed the 256 MiB decode cap")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + c * 3:9 + c * 3]
                ch, cv = hv >> 4, hv & 0x0F
                if ch not in (1, 2) or cv not in (1, 2):
                    raise NotImplementedError(
                        f"JPEG sampling factor {ch}x{cv} (1-2 each "
                        f"supported: 4:4:4 / 4:2:2 / 4:2:0)")
                comps.append([cid, ch, cv, tq])
            max_h = max(c[1] for c in comps)
            max_v = max(c[2] for c in comps)
            mcux = (w + 8 * max_h - 1) // (8 * max_h)
            mcuy = (h + 8 * max_v - 1) // (8 * max_v)
            coefs = [np.zeros((c[2] * mcuy, c[1] * mcux, 64),
                              np.int32) for c in comps]
            sof = (w, h)
        elif marker in _SOF_REFUSE:
            raise NotImplementedError(f"JPEG: {_SOF_REFUSE[marker]}")
        elif marker == 0xDD:                          # DRI
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:                          # SOS
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if not 1 <= ns <= 4:
                raise ValueError(f"JPEG SOS component count {ns} "
                                 f"outside 1..4")
            if len(seg) < 4 + ns * 2:
                raise ValueError("JPEG SOS header truncated")
            smap = []
            for c in range(ns):
                cid, tt = seg[1 + c * 2:3 + c * 2]
                smap.append((cid, tt >> 4, tt & 0x0F))
            ss, se, a = seg[1 + ns * 2:4 + ns * 2]
            ah, al = a >> 4, a & 0x0F
            by_idx = {c[0]: ci for ci, c in enumerate(comps)}
            if progressive:
                if ss == 0 and se != 0:
                    raise ValueError(
                        "JPEG progressive scan cannot carry both DC "
                        "and AC coefficients")
                if ss > 0 and ns != 1:
                    raise ValueError(
                        "JPEG progressive AC scan must be single-"
                        "component")
                if se > 63 or ss > 63 or (ss > 0 and se < ss):
                    raise ValueError("JPEG invalid spectral band")
            else:
                if (ss, se, ah, al) != (0, 63, 0, 0):
                    raise ValueError(
                        "JPEG baseline scan with progressive "
                        "parameters")
            order = []
            for (cid, td, ta) in smap:
                if cid not in by_idx:
                    raise ValueError(
                        f"JPEG SOS names unknown component {cid}")
                ci = by_idx[cid]
                need_dc = ss == 0 and ah == 0
                need_ac = se > 0
                if need_dc and td not in dc_luts:
                    raise ValueError("JPEG SOS references missing "
                                     "DC DHT table")
                if need_ac and ta not in ac_luts:
                    raise ValueError("JPEG SOS references missing "
                                     "AC DHT table")
                order.append((ci, dc_luts.get(td), ac_luts.get(ta)))
            data_pos = i + 2 + ln
            br = _BitReader(b, data_pos)
            state = {"eobrun": 0}
            preds = [0] * len(comps)

            # data-unit traversal for this scan
            if ns == 1:
                ci, dlut, alut = order[0]
                _cid, cch, ccv, _tq = comps[ci]
                cw = (w * cch + max_h - 1) // max_h
                chh = (h * ccv + max_v - 1) // max_v
                nbx = (cw + 7) // 8
                nby = (chh + 7) // 8
                units = (((ci, by, bx, dlut, alut),)
                         for by in range(nby) for bx in range(nbx))
            else:
                def mcu_units():
                    for my in range(mcuy):
                        for mx in range(mcux):
                            group = []
                            for (ci, dlut, alut) in order:
                                _cid, cch, ccv, _tq = comps[ci]
                                for byy in range(ccv):
                                    for bxx in range(cch):
                                        group.append(
                                            (ci, my * ccv + byy,
                                             mx * cch + bxx,
                                             dlut, alut))
                            yield tuple(group)
                units = mcu_units()

            mcu_count = 0
            rst_idx = 0
            for group in units:
                if restart and mcu_count and mcu_count % restart == 0:
                    br.align_expect_rst(rst_idx)
                    rst_idx += 1
                    preds = [0] * len(comps)
                    state["eobrun"] = 0
                for (ci, by, bx, dlut, alut) in group:
                    blk = coefs[ci][by, bx]
                    if ss == 0:
                        if ah == 0:
                            decode_dc_first(br, dlut, blk, al, ci,
                                            preds)
                        elif br.bits(1):
                            blk[0] = int(blk[0]) | (1 << al)
                        if se > 0:     # baseline full-band scan
                            decode_ac_first(br, alut, blk, 1, se,
                                            0, state)
                    elif ah == 0:
                        decode_ac_first(br, alut, blk, ss, se, al,
                                        state)
                    else:
                        decode_ac_refine(br, alut, blk, ss, se, al,
                                         state)
                mcu_count += 1
            scans += 1
            i = _next_marker(b, br.i)
            continue
        # APPn / COM / others: skip
        i += 2 + ln

    if sof is None or scans == 0:
        raise ValueError("JPEG missing SOF/SOS")

    planes = []
    for ci, (cid, cch, ccv, tq) in enumerate(comps):
        if tq not in qtabs:
            raise ValueError("JPEG SOF references missing DQT table")
        qarr = qtabs[tq]
        nby, nbx, _ = coefs[ci].shape
        plane = np.zeros((nby * 8, nbx * 8), np.float64)
        zz = list(ZIGZAG)
        for by in range(nby):
            for bx in range(nbx):
                coef = np.zeros((8, 8), np.float64)
                coef.flat[zz] = coefs[ci][by, bx]
                coef *= qarr
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                    _M.T @ coef @ _M + 128.0
        up = np.repeat(np.repeat(plane, max_v // ccv, axis=0),
                       max_h // cch, axis=1)
        planes.append(up[:h, :w])

    kind = "progressive" if progressive else "baseline"
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        rgb = np.stack([g, g, g], axis=-1)
        codec = f"jpeg/{kind}-gray"
    else:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
        bl = y + 1.772 * (cb - 128.0)
        rgb = np.stack([np.clip(np.round(p), 0, 255).astype(np.uint8)
                        for p in (r, g, bl)], axis=-1)
        codec = (f"jpeg/{kind}-420" if (max_h, max_v) == (2, 2)
                 else f"jpeg/{kind}-422"
                 if (max_h, max_v) in ((2, 1), (1, 2))
                 else f"jpeg/{kind}")
    return {"media_type": "image", "n_bytes": len(b),
            "width": w, "height": h, "duration_ms": None,
            "codec": codec, "raster": rgb.tobytes()}


# ---------------------------------------------------------------------------
# progressive encoder (fixtures/tests)
# ---------------------------------------------------------------------------

def _mshift(v: int, al: int) -> int:
    """Successive-approximation magnitude shift (T.81 G.1.2.2): shift
    |v| — NOT two's complement — so -3 >> 1 is -1, not -2. DC uses the
    arithmetic shift instead (G.1.2.1)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def encode_jpeg_progressive(width: int, height: int,
                            raster: bytes | None = None,
                            gray: bytes | None = None,
                            quant: int = 1,
                            subsample: bool = False,
                            band_split: int | None = None) -> bytes:
    """Progressive (SOF2) JFIF encoder for fixtures and tests:
    grayscale, 4:4:4, or 4:2:0 color; libjpeg-style scan script —
    (1) interleaved DC first scan at Al=1 (h x v luma blocks per MCU
    when subsampled), (2) per-component AC spectral scans over the
    component's REAL block grid at Al=1 (EOBn runs + ZRL; optionally
    split at ``band_split`` into 1..split / split+1..63 bands, the
    way libjpeg's default script splits luma), (3) DC refinement to
    Al=0, (4) per-component AC refinement Ah=1 -> Al=0
    (newly-significant symbols, buffered correction bits, EOB-folded
    runs — T.81 G.1.2.3). The quantized coefficients are IDENTICAL to
    ``encode_jpeg_baseline``'s for the same input, so a correct
    decoder must return byte-identical rasters for both encodings
    (after the w x h crop, which discards the MCU padding where the
    two scans' coverage legitimately differs)."""
    if (raster is None) == (gray is None):
        raise ValueError("pass exactly one of raster= or gray=")
    if quant < 1 or quant > 255:
        raise ValueError("quant must be in [1, 255]")
    if width <= 0 or height <= 0:
        raise ValueError("zero-dimension JPEG")
    if subsample and gray is not None:
        raise ValueError("subsample applies to color input")
    qtab = [quant] * 64
    if gray is not None:
        if len(gray) != width * height:
            raise ValueError("gray length != width*height")
        plane = np.frombuffer(gray, np.uint8).reshape(
            height, width).astype(np.float64)
        comps = [(1, 1, 1, 0, plane)]
        n_q = 1
    else:
        if len(raster) != width * height * 3:
            raise ValueError("raster length != width*height*3")
        rgb = np.frombuffer(raster, np.uint8).reshape(
            height, width, 3).astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
        y, cb, cr = (np.clip(np.round(p), 0, 255) for p in (y, cb, cr))
        if subsample:
            he = height + (height & 1)
            we = width + (width & 1)

            def half(p):
                p2 = np.pad(p, ((0, he - height), (0, we - width)),
                            mode="edge")
                return np.round((p2[0::2, 0::2] + p2[0::2, 1::2]
                                 + p2[1::2, 0::2] + p2[1::2, 1::2])
                                / 4.0)
            comps = [(1, 2, 2, 0, y), (2, 1, 1, 1, half(cb)),
                     (3, 1, 1, 1, half(cr))]
        else:
            comps = [(1, 1, 1, 0, y), (2, 1, 1, 1, cb),
                     (3, 1, 1, 1, cr)]
        n_q = 2
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcux = (width + 8 * max_h - 1) // (8 * max_h)
    mcuy = (height + 8 * max_v - 1) // (8 * max_v)
    qarr = np.array(qtab, np.float64)[np.argsort(ZIGZAG)].reshape(8, 8)
    zz = list(ZIGZAG)
    # quantized zz-order coefficient blocks per component, over the
    # MCU-padded grid; AC scans cover only the REAL sub-grid
    zblocks = []
    real_grid = []
    for (_cid, cch, ccv, _tq, plane) in comps:
        ph, pw = 8 * ccv * mcuy, 8 * cch * mcux
        p = np.pad(plane, ((0, ph - plane.shape[0]),
                           (0, pw - plane.shape[1])), mode="edge")
        rows = []
        for by in range(ccv * mcuy):
            row = []
            for bx in range(cch * mcux):
                blk = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                qz = np.round((_M @ blk @ _M.T) / qarr).astype(np.int64)
                row.append([int(qz.flat[zz[i]]) for i in range(64)])
            rows.append(row)
        zblocks.append(rows)
        cw = (width * cch + max_h - 1) // max_h
        chh = (height * ccv + max_v - 1) // max_v
        real_grid.append(((chh + 7) // 8, (cw + 7) // 8))

    dc_codes = (_build_codes(*_DC_LUMA), _build_codes(*_DC_CHROMA))
    # progressive AC scans need EOBn symbols (r<<4 for r=1..14), which
    # the Annex-K SEQUENTIAL tables do not contain (libjpeg computes
    # custom tables for exactly this reason). Emit a flat canonical
    # table carrying every symbol (255 codes of length 9 + one of 10)
    # for the AC scans — bigger bitstream, simple, and it exercises
    # the decoder's mid-file DHT-override path the way real
    # progressive files do.
    flat_bits = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
    flat_vals = list(range(256))
    ac_flat = _build_codes(flat_bits, flat_vals)
    ac_codes = (ac_flat, ac_flat)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker,
                           len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq in range(n_q):
        out += seg(0xDB, bytes([tq]) + bytes(qtab))
    sof = struct.pack(">BHHB", 8, height, width, len(comps))
    for (cid, cch, ccv, tq, _p) in comps:
        sof += bytes([cid, (cch << 4) | ccv, tq])
    out += seg(0xC2, sof)                             # SOF2
    for tc, (bits, vals) in ((0, _DC_LUMA), (1, _AC_LUMA)):
        out += seg(0xC4, bytes([tc << 4]) + bytes(bits) + bytes(vals))
    if n_q == 2:
        for tc, (bits, vals) in ((0, _DC_CHROMA), (1, _AC_CHROMA)):
            out += seg(0xC4, bytes([(tc << 4) | 1])
                       + bytes(bits) + bytes(vals))

    def sos_header(sel, ss, se, ah, al):
        body = bytes([len(sel)])
        for (cid, t) in sel:
            body += bytes([cid, (t << 4) | t])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    # scan 1: interleaved DC first, Al=1 (h x v blocks per comp/MCU)
    bw = _BitWriter()
    preds = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (_cid, cch, ccv, tq, _p) in enumerate(comps):
                t = 0 if tq == 0 else 1
                for byy in range(ccv):
                    for bxx in range(cch):
                        v = zblocks[ci][my * ccv + byy][
                            mx * cch + bxx][0] >> 1
                        diff = v - preds[ci]
                        preds[ci] = v
                        s = _cat(diff)
                        c, ln = dc_codes[t][s]
                        bw.write(c, ln)
                        if s:
                            bw.write(diff if diff >= 0
                                     else diff + (1 << s) - 1, s)
    bw.pad_to_byte()
    out += sos_header([(cid, 0 if tq == 0 else 1)
                       for (cid, _h, _v, tq, _p) in comps], 0, 0, 0, 1)
    out += bw.buf

    def enc_ac_first(blocks, t, ss, se, al):
        bw = _BitWriter()
        eobrun = 0

        def flush():
            nonlocal eobrun
            if eobrun:
                nb = eobrun.bit_length() - 1
                c, ln = ac_codes[t][nb << 4]
                bw.write(c, ln)
                if nb:
                    bw.write(eobrun - (1 << nb), nb)
                eobrun = 0
        for blk in blocks:
            tv = [_mshift(v, al) for v in blk]
            last = 0
            for k in range(se, ss - 1, -1):
                if tv[k]:
                    last = k
                    break
            if last < ss:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
                continue
            flush()
            r = 0
            for k in range(ss, last + 1):
                v = tv[k]
                if v == 0:
                    r += 1
                    continue
                while r >= 16:
                    c, ln = ac_codes[t][0xF0]
                    bw.write(c, ln)
                    r -= 16
                s = _cat(v)
                c, ln = ac_codes[t][(r << 4) | s]
                bw.write(c, ln)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                r = 0
            if last < se:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
        flush()
        bw.pad_to_byte()
        return bw.buf

    def enc_ac_refine(blocks, t, ss, se, al):
        bw = _BitWriter()
        eobrun = 0
        be: list[int] = []

        def flush():
            nonlocal eobrun, be
            if eobrun:
                nb = eobrun.bit_length() - 1
                c, ln = ac_codes[t][nb << 4]
                bw.write(c, ln)
                if nb:
                    bw.write(eobrun - (1 << nb), nb)
            for bit in be:
                bw.write(bit, 1)
            eobrun = 0
            be = []
        for blk in blocks:
            tv = [abs(v) >> al for v in blk]
            eobpos = ss - 1
            for k in range(ss, se + 1):
                if tv[k] == 1:
                    eobpos = k
            r = 0
            br_bits: list[int] = []
            for k in range(ss, se + 1):
                temp = tv[k]
                if temp == 0:
                    r += 1
                    continue
                while r > 15 and k <= eobpos:
                    flush()
                    c, ln = ac_codes[t][0xF0]
                    bw.write(c, ln)
                    r -= 16
                    for bit in br_bits:
                        bw.write(bit, 1)
                    br_bits = []
                if temp > 1:
                    br_bits.append(temp & 1)
                    continue
                flush()
                c, ln = ac_codes[t][(r << 4) | 1]
                bw.write(c, ln)
                bw.write(1 if blk[k] >= 0 else 0, 1)
                for bit in br_bits:
                    bw.write(bit, 1)
                br_bits = []
                r = 0
            if r > 0 or br_bits:
                eobrun += 1
                be.extend(br_bits)
                if eobrun == 0x7FFF or len(be) > 900:
                    flush()
        flush()
        bw.pad_to_byte()
        return bw.buf

    def comp_blocks(ci):
        nby, nbx = real_grid[ci]
        for by in range(nby):
            for bx in range(nbx):
                yield zblocks[ci][by][bx]

    # override the AC tables with the flat all-symbol table before the
    # AC scans (classes re-keyed mid-file, like real progressive files)
    for th in range(n_q):
        out += seg(0xC4, bytes([(1 << 4) | th]) + bytes(flat_bits)
                   + bytes(flat_vals))
    # scans 2..: per-component AC first at Al=1, optionally band-split
    bands = ([(1, band_split), (band_split + 1, 63)]
             if band_split else [(1, 63)])
    for ci, (cid, _h, _v, tq, _p) in enumerate(comps):
        t = 0 if tq == 0 else 1
        for (ss, se) in bands:
            out += sos_header([(cid, t)], ss, se, 0, 1)
            out += enc_ac_first(comp_blocks(ci), t, ss, se, 1)
    # DC refinement to Al=0 (no Huffman coding — raw bits)
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (_cid, cch, ccv, _tq, _p) in enumerate(comps):
                for byy in range(ccv):
                    for bxx in range(cch):
                        bw.write(zblocks[ci][my * ccv + byy][
                            mx * cch + bxx][0] & 1, 1)
    bw.pad_to_byte()
    body = bytes([len(comps)])
    for (cid, _h, _v, _tq, _p) in comps:
        body += bytes([cid, 0])
    body += bytes([0, 0, 0x10])
    out += seg(0xDA, body)
    out += bw.buf
    # per-component AC refinement Ah=1 -> Al=0 (same bands)
    for ci, (cid, _h, _v, tq, _p) in enumerate(comps):
        t = 0 if tq == 0 else 1
        for (ss, se) in bands:
            out += sos_header([(cid, t)], ss, se, 1, 0)
            out += enc_ac_refine(comp_blocks(ci), t, ss, se, 0)
    out += b"\xFF\xD9"
    return bytes(out)
