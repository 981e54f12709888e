"""Adversarial fuzzing of the stdlib binary decoders (r10; VERDICT r9
Next #5). The d93-d96 parsers are hand-written ``struct``/``zlib``
walkers with index arithmetic — stride padding, bottom-up rows, nested
LIST recursion, word alignment, scanline filters. Round-trips prove the
happy path; this suite drives DRAWN MALFORMED inputs (truncations, byte
flips, lying size fields, zero dimensions, sizes past EOF) and pins the
failure contract:

  every decode either SUCCEEDS with its structural invariants intact
  (raster length == w*h*3, frames consistent) or raises a clean
  ValueError / NotImplementedError — never a hang, a wrong-size
  raster, an arithmetic error, or an allocation beyond what the
  actual payload justifies.

No SparkSession needed: the decoders are plain functions under the
mapInPandas seam, so the properties run at hypothesis speed."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_federation_spark.operators.multimodal import (
    decode_avi_dib, decode_image, decode_wav, encode_avi_dib,
    encode_bmp24, encode_png, encode_ppm_p6, encode_wav_pcm16)

ALLOWED = (ValueError, NotImplementedError)
N_EXAMPLES = 60          # >= 50 per format (the VERDICT's bar)


# ---------------------------------------------------------------------------
# payload builders (valid by construction, drawn shapes)
# ---------------------------------------------------------------------------

@st.composite
def ppm_payload(draw):
    w = draw(st.integers(1, 9))
    h = draw(st.integers(1, 7))
    ras = draw(st.binary(min_size=w * h * 3, max_size=w * h * 3))
    return encode_ppm_p6(w, h, ras)


@st.composite
def bmp_payload(draw):
    w = draw(st.integers(1, 9))
    h = draw(st.integers(1, 7))
    ras = draw(st.binary(min_size=w * h * 3, max_size=w * h * 3))
    return encode_bmp24(w, h, ras)


@st.composite
def png_payload(draw):
    w = draw(st.integers(1, 8))
    h = draw(st.integers(1, 6))
    ras = draw(st.binary(min_size=w * h * 3, max_size=w * h * 3))
    alpha = None
    if draw(st.booleans()):
        alpha = draw(st.binary(min_size=w * h, max_size=w * h))
    filters = draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    # r11: interlace + 16-bit draws fuzz the scatter decoder too
    depth = draw(st.sampled_from([8, 16]))
    interlace = draw(st.booleans())
    return encode_png(w, h, ras, alpha=alpha, row_filters=filters,
                      depth=depth, interlace=interlace)


@st.composite
def jpeg_payload(draw):
    # r11: baseline JPEG as the sixth fuzzed format — gray or color,
    # 4:4:4 / 4:2:0, quantizer and restart interval drawn too
    from datafusion_federation_spark.operators.jpeg import (
        encode_jpeg_baseline, encode_jpeg_progressive)
    w = draw(st.integers(1, 18))
    h = draw(st.integers(1, 14))
    quant = draw(st.sampled_from([1, 2, 8, 40]))
    rst = draw(st.sampled_from([0, 0, 1, 2]))
    progressive = draw(st.booleans())     # r11: SOF2 multi-scan draws
    if draw(st.booleans()):
        g = draw(st.binary(min_size=w * h, max_size=w * h))
        if progressive:
            return encode_jpeg_progressive(w, h, gray=g, quant=quant)
        return encode_jpeg_baseline(w, h, gray=g, quant=quant,
                                    restart_interval=rst)
    ras = draw(st.binary(min_size=w * h * 3, max_size=w * h * 3))
    if progressive:
        return encode_jpeg_progressive(
            w, h, raster=ras, quant=quant,
            subsample=draw(st.booleans()),
            band_split=draw(st.sampled_from([None, 8])))
    return encode_jpeg_baseline(w, h, raster=ras, quant=quant,
                                subsample=draw(st.booleans()),
                                restart_interval=rst)


@st.composite
def wav_payload(draw):
    ch = draw(st.integers(1, 2))
    nframes = draw(st.integers(1, 40))
    samples = draw(st.lists(st.integers(-32768, 32767),
                            min_size=nframes * ch,
                            max_size=nframes * ch))
    rate = draw(st.sampled_from([8000, 16000, 44100]))
    return encode_wav_pcm16(rate, ch, samples)


@st.composite
def avi_payload(draw):
    w = draw(st.integers(1, 6))
    h = draw(st.integers(1, 5))
    nf = draw(st.integers(1, 4))
    rasters = [draw(st.binary(min_size=w * h * 3, max_size=w * h * 3))
               for _ in range(nf)]
    fps = draw(st.sampled_from([5, 10, 30]))
    return encode_avi_dib(w, h, fps, rasters)


# ---------------------------------------------------------------------------
# mutation: truncate / flip bytes / splice lying little- or big-endian
# size words / zero a dword (dimension or size fields live in dwords)
# ---------------------------------------------------------------------------

@st.composite
def mutated(draw, payload_strategy):
    b = bytearray(draw(payload_strategy))
    kind = draw(st.sampled_from(
        ["truncate", "flip", "lie_le", "lie_be", "zero_dword",
         "extend"]))
    if kind == "truncate":
        cut = draw(st.integers(0, max(0, len(b) - 1)))
        b = b[:cut]
    elif kind == "flip":
        for _ in range(draw(st.integers(1, 4))):
            i = draw(st.integers(0, len(b) - 1))
            b[i] ^= 1 << draw(st.integers(0, 7))
    elif kind in ("lie_le", "lie_be"):
        i = draw(st.integers(0, max(0, len(b) - 4)))
        v = draw(st.sampled_from(
            [0, 1, 0xFFFF, 0x7FFFFFFF, 0xFFFFFFFF,
             draw(st.integers(0, 2 ** 32 - 1))]))
        b[i:i + 4] = struct.pack(
            "<I" if kind == "lie_le" else ">I", v)
    elif kind == "zero_dword":
        i = draw(st.integers(0, max(0, len(b) - 4)))
        b[i:i + 4] = b"\x00\x00\x00\x00"
    elif kind == "extend":
        b += draw(st.binary(min_size=1, max_size=64))
    return bytes(b)


def _decode_bounded(decode, payload, budget_bytes=None):
    """Run a decode and enforce the failure contract. Successful
    decodes must not have allocated rasters beyond what the payload
    plus headers could justify (allocation amplification guard)."""
    try:
        return decode(payload)
    except ALLOWED:
        return None
    # anything else (struct.error, ZeroDivisionError, MemoryError,
    # IndexError, RecursionError...) propagates and fails the test


# ---------------------------------------------------------------------------
# properties — one per format
# ---------------------------------------------------------------------------

@settings(max_examples=N_EXAMPLES, deadline=None)
@given(mutated(ppm_payload()))
def test_fuzz_ppm(payload):
    d = _decode_bounded(decode_image, payload)
    if d is not None:
        assert len(d["raster"]) == d["width"] * d["height"] * 3
        # the parser may only hand back bytes it actually read
        assert len(d["raster"]) <= len(payload)


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(mutated(bmp_payload()))
def test_fuzz_bmp(payload):
    d = _decode_bounded(decode_image, payload)
    if d is not None:
        assert len(d["raster"]) == d["width"] * d["height"] * 3
        # stride padding means raster <= payload body
        assert len(d["raster"]) <= len(payload)


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(mutated(png_payload()))
def test_fuzz_png(payload):
    d = _decode_bounded(decode_image, payload)
    if d is not None:
        assert len(d["raster"]) == d["width"] * d["height"] * 3
        # DEFLATE can compress, so raster may exceed payload — but the
        # decode cap bounds it absolutely
        assert len(d["raster"]) <= 256 * 1024 * 1024


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(mutated(jpeg_payload()))
def test_fuzz_jpeg(payload):
    d = _decode_bounded(decode_image, payload)
    if d is not None:
        assert len(d["raster"]) == d["width"] * d["height"] * 3
        # SOF dims bound the allocation absolutely (decode cap)
        assert len(d["raster"]) <= 256 * 1024 * 1024


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(mutated(wav_payload()))
def test_fuzz_wav(payload):
    d = _decode_bounded(decode_wav, payload)
    if d is not None:
        assert d["n_frames"] * d["channels"] >= len(d["samples"]) - \
            d["channels"] + 1
        assert len(d["samples"]) * 2 <= len(payload)
        assert d["duration_ms"] >= 0


@settings(max_examples=N_EXAMPLES, deadline=None)
@given(mutated(avi_payload()))
def test_fuzz_avi(payload):
    d = _decode_bounded(decode_avi_dib, payload)
    if d is not None:
        for f in d["frames"]:
            assert len(f) == d["width"] * d["height"] * 3
        # un-padding means every frame fits inside the payload
        assert all(len(f) <= len(payload) for f in d["frames"])


# ---------------------------------------------------------------------------
# directed corner cases the random mutator may miss
# ---------------------------------------------------------------------------

def test_fuzz_directed_riff_size_past_eof():
    good = encode_avi_dib(2, 2, 10, [bytes(12)])
    b = bytearray(good)
    # declare the movi LIST larger than the file
    i = good.find(b"movi") - 8
    b[i + 4:i + 8] = struct.pack("<I", len(good) * 10)
    with pytest.raises(ValueError):
        decode_avi_dib(bytes(b))


def test_fuzz_directed_wav_zero_rate_and_channels():
    good = bytearray(encode_wav_pcm16(8000, 1, [1, 2, 3]))
    i = bytes(good).find(b"fmt ") + 8
    zero_rate = bytearray(good)
    zero_rate[i + 4:i + 8] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="Hz"):
        decode_wav(bytes(zero_rate))
    zero_ch = bytearray(good)
    zero_ch[i + 2:i + 4] = b"\x00\x00"
    with pytest.raises(ValueError, match="channels"):
        decode_wav(bytes(zero_ch))


def test_fuzz_directed_bmp_lying_dimensions():
    good = bytearray(encode_bmp24(2, 2, bytes(12)))
    # width dword at offset 18: claim 2^20 pixels wide — must refuse
    # BEFORE allocating a 3 MiB raster the 70-byte payload can't back
    good[18:22] = struct.pack("<i", 1 << 20)
    with pytest.raises(ValueError):
        decode_image(bytes(good))
    neg = bytearray(encode_bmp24(2, 2, bytes(12)))
    neg[18:22] = struct.pack("<i", -5)
    with pytest.raises(ValueError):
        decode_image(bytes(neg))


def test_fuzz_directed_avi_zero_usec_per_frame():
    good = encode_avi_dib(2, 2, 10, [bytes(12)])
    i = good.find(b"avih") + 8
    b = bytearray(good)
    b[i:i + 4] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="microseconds"):
        decode_avi_dib(bytes(b))


def test_fuzz_directed_avi_deep_list_nesting():
    # 64 nested LISTs: must refuse at the depth cap, not RecursionError
    inner = b"hdrl"
    for _ in range(64):
        inner = b"LIST" + struct.pack("<I", len(inner) + 4) + \
            b"xxxx" + inner[: len(inner)]
    body = b"AVI " + inner
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="nesting|truncated|scope|avih"):
        decode_avi_dib(payload)


def test_fuzz_directed_png_idat_split_across_chunks():
    # multiple IDAT chunks concatenate (spec) — split mid-stream
    ras = bytes(range(48))
    good = encode_png(4, 4, ras)
    sig, rest = good[:8], good[8:]
    # find IDAT chunk and split its data into two chunks
    ln = struct.unpack(">I", rest[0:4])[0]
    ihdr = rest[:12 + ln]
    rest2 = rest[12 + ln:]
    ln2 = struct.unpack(">I", rest2[0:4])[0]
    idat_data = rest2[8:8 + ln2]
    iend = rest2[12 + ln2:]
    half = len(idat_data) // 2

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    split = (sig + ihdr + chunk(b"IDAT", idat_data[:half])
             + chunk(b"IDAT", idat_data[half:]) + iend)
    d = decode_image(split)
    assert d["raster"] == ras


def test_fuzz_directed_png_overlong_idat_rejected():
    # ADVICE r10 #3: an IDAT stream inflating PAST the IHDR-implied
    # size used to slip through when the surplus compressed input was
    # parked in decompressobj.unconsumed_tail by the bounded inflate —
    # dec.decompress(b"", 1) then returned empty and the image was
    # silently accepted truncated. Both surplus shapes must refuse:
    ras = bytes(range(48))
    good = encode_png(4, 4, ras)
    # rebuild the IDAT with 64 junk bytes appended to the RAW stream
    filtered = bytearray()
    prev = bytes(12)
    for r in range(4):
        row = ras[r * 12:(r + 1) * 12]
        filtered += b"\x00" + row
        prev = row
    overlong = zlib.compress(bytes(filtered) + b"\xAB" * 64)

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    sig, rest = good[:8], good[8:]
    ln = struct.unpack(">I", rest[0:4])[0]
    ihdr = rest[:12 + ln]
    bad = sig + ihdr + chunk(b"IDAT", overlong) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IHDR dims|pixel data"):
        decode_image(bad)


def _png_with_idat(idat_payload: bytes) -> bytes:
    ras = bytes(range(48))
    good = encode_png(4, 4, ras)

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    sig, rest = good[:8], good[8:]
    ln = struct.unpack(">I", rest[0:4])[0]
    ihdr = rest[:12 + ln]
    return sig + ihdr + chunk(b"IDAT", idat_payload) + chunk(b"IEND", b"")


def _png_filtered_rows() -> bytes:
    ras = bytes(range(48))
    filtered = bytearray()
    for r in range(4):
        filtered += b"\x00" + ras[r * 12:(r + 1) * 12]
    return bytes(filtered)


def test_fuzz_directed_png_garbage_after_zlib_stream_rejected():
    # ADVICE r10 #3 family: a COMPLETE zlib stream followed by junk
    # bytes inside the IDAT used to be silently accepted (probe
    # returned empty, surplus sat in unused_data)
    bad = _png_with_idat(zlib.compress(_png_filtered_rows()) + b"JUNK5678")
    with pytest.raises(ValueError, match="IHDR dims|pixel data"):
        decode_image(bad)


def test_fuzz_directed_png_truncated_zlib_trailer_rejected():
    # stream yields exactly the expected bytes but is cut before its
    # adler32 trailer: eof never fires — corrupt, must refuse
    bad = _png_with_idat(zlib.compress(_png_filtered_rows())[:-4])
    with pytest.raises(ValueError, match="IHDR dims|pixel data|inflate"):
        decode_image(bad)
