"""Real media codecs on stdlib + numpy only: PNG (zlib inflate + scanline
unfilter), baseline JPEG (huffman + dequant + IDCT), and WAV (RIFF PCM via
the stdlib wave module).

No PIL/opencv/ffmpeg exists in this environment, so these are complete
from-scratch implementations of the three formats decodable without binary
wheels: PNG bit-depth 8 in grayscale/RGB/RGBA (non-interlaced), JPEG in
grayscale/YCbCr with arbitrary sampling factors — both baseline (SOF0,
with restart markers) and progressive (SOF2: spectral selection +
successive approximation, round 4) — and 16-bit PCM WAV. Anything else
(arithmetic/hierarchical JPEG, MP3, video) raises NotImplementedError
with the format named — the multimodal operators surface that per-payload.

Perf posture (round 4, vectorized): PNG unfilter batches runs of
None/Sub/Up rows through 2D uint8-wraparound cumsums (Sub is a per-channel
prefix sum along the row; a run of Up rows is a prefix sum down the rows)
and decodes the sequential Average/Paeth rows with tight Python-list loops
(~10× faster than numpy scalar indexing). JPEG entropy decode uses a
sliding-window bit reader with a cached 16-bit-lookahead huffman LUT (one
list index per symbol instead of one dict probe per *bit*), and all
dequantize/IDCT/plane-scatter math is batched across every block of a
component in single numpy matmul/transpose calls. Measured vs the round-3
scalar decoders (tests/test_codecs.py microbench, byte-identical outputs):
PNG ~10-13×, JPEG ~4× (the entropy loop is at the CPython per-coefficient
floor, ~0.7µs/coeff), combined payload mix ~5.5×. Still well off a native
codec — if a binary wheel (PIL) ever lands in the image, swap it in behind
the same function signatures; every caller goes through this module.
"""

from __future__ import annotations

import io
import re
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_COLOR_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == PNG_MAGIC


def is_wav(data: bytes) -> bool:
    return bytes(data[:4]) == b"RIFF" and bytes(data[8:12]) == b"WAVE"


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H, W, C). Supports bit depth 8, color
    types 0/2/6, no interlace — the subset a from-scratch training
    pipeline produces; others raise NotImplementedError."""
    data = bytes(data)
    if not is_png(data):
        raise NotImplementedError("unsupported image format (PNG only)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _COLOR_CHANNELS:
        raise NotImplementedError(
            f"unsupported PNG variant (depth={depth} color={color} interlace={interlace})"
        )
    ch = _COLOR_CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    lines = rows[:, 1:]
    if filters.max(initial=0) > 4:
        raise ValueError(f"bad PNG filter {int(filters.max())}")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    y = 0
    while y < h:
        f = int(filters[y])
        if f <= 2:
            # None/Sub/Up rows vectorize; batch a run of the same filter.
            # uint8 cumsum wraps mod 256, which is exactly the filter math.
            y2 = y + 1
            while y2 < h and filters[y2] == f:
                y2 += 1
            run = lines[y:y2]
            if f == 0:  # None
                out[y:y2] = run
            elif f == 1:  # Sub: per-channel prefix sum along each row
                out[y:y2] = np.cumsum(
                    run.reshape(y2 - y, w, ch), axis=1, dtype=np.uint8
                ).reshape(y2 - y, stride)
            else:  # Up: prefix sum down the rows, seeded by prev
                out[y:y2] = np.cumsum(run, axis=0, dtype=np.uint8) + prev
            y = y2
        else:
            # Average/Paeth have a true left-pixel dependency: tight
            # Python-list loop (plain-int ops beat numpy scalar indexing
            # ~10×; see tests/test_codecs.py equivalence + microbench).
            line = lines[y].tolist()
            pv = prev.tolist()
            cur = [0] * stride
            if f == 3:  # Average
                for i in range(ch):
                    cur[i] = (line[i] + (pv[i] >> 1)) & 0xFF
                for i in range(ch, stride):
                    cur[i] = (line[i] + ((cur[i - ch] + pv[i]) >> 1)) & 0xFF
            else:  # Paeth
                for i in range(ch):
                    # a = c = 0 → predictor reduces to b
                    cur[i] = (line[i] + pv[i]) & 0xFF
                for i in range(ch, stride):
                    a = cur[i - ch]
                    b = pv[i]
                    c = pv[i - ch]
                    p = a + b - c
                    pa = p - a if p >= a else a - p
                    pb = p - b if p >= b else b - p
                    pc = p - c if p >= c else c - p
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (line[i] + pred) & 0xFF
            out[y] = cur
            y += 1
        prev = out[y - 1]
    return out.reshape(h, w, ch)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (H, W) or (H, W, C in {1,3,4}) -> PNG bytes (filter 0
    rows, single IDAT). Deterministic: fixed zlib level 6."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise NotImplementedError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (floor index sampling)."""
    h, w = arr.shape[:2]
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return arr[ys][:, xs]


def luma(arr: np.ndarray) -> np.ndarray:
    """Integer mean-luma plane: BT.601 for color, identity for gray."""
    if arr.shape[2] == 1:
        return arr[:, :, 0].astype(np.float64)
    r, g, b = (arr[:, :, i].astype(np.float64) for i in range(3))
    return 0.299 * r + 0.587 * g + 0.114 * b  # alpha (if any) ignored


# --------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81). Decoder: SOI/APPn/DQT/SOF0/DHT/DRI/SOS/EOI
# marker parse, canonical-huffman entropy decode with byte unstuffing and
# restart markers, dequantize, float64 separable IDCT, per-component
# nearest-replication upsample, JFIF full-range YCbCr->RGB. Progressive
# (SOF2), arithmetic, hierarchical and 12-bit variants raise
# NotImplementedError. Encoder: 4:4:4 baseline with the T.81 Annex K
# example quantization + huffman tables — enough to produce real JPEG
# bytes for tests and sinks without PIL.
# --------------------------------------------------------------------------

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Orthonormal DCT-II basis: block_spatial = C.T @ coeffs @ C
_DCT_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)

# T.81 Annex K.1 example quantization tables (luminance, chrominance).
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# T.81 Annex K.3 example huffman tables: (bits[1..16], huffval).
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def is_jpeg(data: bytes) -> bool:
    return bytes(data[:2]) == b"\xff\xd8"


def _build_huff_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical huffman per T.81 C.2: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_huff_decoder(bits: tuple[int, ...], huffval: tuple[int, ...]) -> list[int]:
    """16-bit-lookahead LUT: index = next 16 bits of the stream (MSB
    first), value = (symbol << 5) | code_length. Entry 0 marks an invalid
    prefix (a real symbol always has length >= 1). One list index replaces
    one dict probe per *bit* of the old decoder. Cached per table content
    (the build touches all 65536 slots; numpy slice-assign keeps it fast,
    and JPEGs overwhelmingly reuse the 4 T.81 Annex K tables)."""
    key = (tuple(bits), tuple(huffval))
    cached = _HUFF_LUT_CACHE.get(key)
    if cached is not None:
        return cached
    lut = np.zeros(1 << 16, dtype=np.uint32)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = huffval[k]
            base = code << (16 - length)
            lut[base : base + (1 << (16 - length))] = (sym << 5) | length
            code += 1
            k += 1
        code <<= 1
    as_list = lut.tolist()  # python-int list: fastest indexing in the loop
    if len(_HUFF_LUT_CACHE) > 64:
        _HUFF_LUT_CACHE.clear()
    _HUFF_LUT_CACHE[key] = as_list
    return as_list


_HUFF_LUT_CACHE: dict[tuple, list[int]] = {}

# window &= _MASKS[wbits] — one list index instead of shift+sub per consume
_MASKS = [(1 << i) - 1 for i in range(96)]


def _build_ac_lut2(bits: list[int], huffval: list[int]) -> list[int]:
    """Combined AC LUT (libjpeg-turbo style fast path): index = next 16
    bits, value packs the *fully decoded coefficient* when code+magnitude
    fit in 16 bits:

        bits 0-4   total consumed bits (code + magnitude)
        bits 5-10  zero run (0-15)
        bits 11-22 value + 2048  (0 marks a slow-path entry, 2048 marks a
                   zero value — EOB/ZRL, which have no magnitude bits)
        bits 23-26 magnitude size s (slow-path entries only)

    One list index replaces symbol decode + magnitude read + sign
    extension for the overwhelming majority of coefficients; codes whose
    code+magnitude exceed 16 bits (rare by canonical-huffman construction)
    fall back to the two-step path. The +2048 bias lets the decode loop
    append ``(flat_index << 12) | value_field`` without re-biasing — one
    list append per coefficient. Entry 0 = invalid prefix."""
    key = ("ac2", tuple(bits), tuple(huffval))
    cached = _HUFF_LUT_CACHE.get(key)
    if cached is not None:
        return cached
    lut = np.zeros(1 << 16, dtype=np.uint32)
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = huffval[k]
            base = code << (16 - length)
            span = 1 << (16 - length)
            run, s = sym >> 4, sym & 0xF
            if s == 0:  # EOB / ZRL: no magnitude bits
                lut[base : base + span] = length | (run << 5) | (2048 << 11)
            elif length + s <= 16:
                tl = length + s
                mag = (np.arange(span, dtype=np.int64) >> (16 - tl)) & ((1 << s) - 1)
                val = np.where(mag < 1 << (s - 1), mag + 1 - (1 << s), mag)
                lut[base : base + span] = (
                    tl | (run << 5) | ((val + 2048).astype(np.uint32) << 11)
                )
            else:  # slow path: symbol consumed, magnitude read separately
                lut[base : base + span] = length | (run << 5) | (s << 23)
            code += 1
            k += 1
        code <<= 1
    as_list = lut.tolist()
    if len(_HUFF_LUT_CACHE) > 64:
        _HUFF_LUT_CACHE.clear()
    _HUFF_LUT_CACHE[key] = as_list
    return as_list


class _BitReader:
    """MSB-first sliding-window reader over entropy-coded JPEG data.

    Byte unstuffing (FF 00 -> FF) and restart-marker handling are done by
    the caller, which hands over clean segments. The window holds up to 23
    bits (refilled a byte at a time); peeks past end-of-data see zero fill
    but *consuming* past the end raises, matching the bit-at-a-time
    semantics of the scalar reader this replaced.
    """

    __slots__ = ("data", "n", "pos", "window", "wbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.window = 0
        self.wbits = 0

    def _fill16(self) -> None:
        while self.wbits < 16 and self.pos < self.n:
            self.window = (self.window << 8) | self.data[self.pos]
            self.pos += 1
            self.wbits += 8

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill16()
        w = self.wbits
        if n > w:
            raise ValueError("JPEG entropy data truncated")
        w -= n
        v = self.window >> w
        self.window &= (1 << w) - 1
        self.wbits = w
        return v

    def decode_symbol(self, lut: list[int]) -> int:
        self._fill16()
        w = self.wbits
        peek = (self.window << (16 - w)) & 0xFFFF if w < 16 else self.window >> (w - 16)
        v = lut[peek]
        length = v & 31
        if length == 0:
            # No 16-bit prefix matches. With a full window this is a bad
            # code; with a zero-padded window the data ran out mid-code —
            # report exactly what the scalar reader reported.
            if w < 16:
                raise ValueError("JPEG entropy data truncated")
            raise ValueError("invalid JPEG huffman code")
        if length > w:
            raise ValueError("JPEG entropy data truncated")
        w -= length
        self.window &= (1 << w) - 1
        self.wbits = w
        return v >> 5


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a SIZE-bit magnitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 array (H, W, C) with C=1 (grayscale) or C=3
    (RGB via JFIF full-range YCbCr). Supports 8-bit baseline (SOF0) and
    progressive (SOF2 — spectral selection + successive approximation,
    round 4) with arbitrary sampling factors; baseline also handles
    restart intervals. Arithmetic / hierarchical / 12-bit raise
    NotImplementedError.

    Spark-side callers (operators/multimodal.py) run this executor-side
    inside mapInPandas — the driver never sees payload bytes.
    """
    data = bytes(data)
    if not is_jpeg(data):
        raise NotImplementedError("unsupported image format (PNG/JPEG only)")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(comp_id, hi, vi, tq)])
    restart_interval = 0
    scan = None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte before marker (T.81 B.1.1.2)
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i).astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, i).astype(np.int64)
                    i += 128
                nat = np.empty(64, dtype=np.int64)
                nat[_ZIGZAG] = tbl
                quant[tq] = nat.reshape(8, 8)
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if precision != 8:
                raise NotImplementedError(f"unsupported JPEG precision {precision}")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker == 0xC2:  # SOF2 progressive: its own multi-scan decoder
            return _decode_progressive(data)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG frame type SOF{marker - 0xC0} (SOF0/SOF2 only)"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nsym = sum(bits)
                huffval = list(seg[i + 17 : i + 17 + nsym])
                if tc == 0:
                    huff_dc[th] = _build_huff_decoder(bits, huffval)
                else:
                    # symbol LUT for the slow path + combined fast LUT
                    huff_ac[th] = _build_ac_lut2(bits, huffval)
                i += 17 + nsym
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = [(seg[1 + 2 * c], seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0xF) for c in range(ns)]
            break  # entropy-coded data follows
        # APPn / COM / others: skipped
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, comps = frame

    # Split entropy data into restart segments, unstuffing FF00 — all with
    # C-speed bytes ops (regex end-scan, split on RSTn, replace for
    # unstuffing) instead of the old per-byte Python loop. A real marker is
    # FF followed by anything but 00/RSTn; a lone FF at end-of-data is data
    # (positive lookahead requires a following byte, matching the scalar
    # loop's i+1 < len guard).
    m = re.search(rb"\xff(?=[^\x00\xd0-\xd7])", data[pos:])
    entropy = data[pos : pos + m.start()] if m else data[pos:]
    segments = [s.replace(b"\xff\x00", b"\xff") for s in re.split(rb"\xff[\xd0-\xd7]", entropy)]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    scan_by_comp = {s[0]: s for s in scan}
    n_mcus = mcux * mcuy
    # Entropy decode collects (flat_index, value) pairs per component;
    # ALL coefficient scatter, dequant, IDCT and plane-scatter math is
    # batched afterwards in a handful of whole-array numpy calls instead
    # of one 8×8 matmul per block. The bit-window state lives in plain
    # locals (not a reader object): attribute access + method-call
    # overhead was the round-4 profile's top cost, worth ~2.5× here.
    # Per-MCU block layout: for each comp, vi*hi blocks; huffman decode via
    # the 16-bit-lookahead LUTs (see _build_huff_decoder).
    # Each decoded coefficient is ONE list append of (flat_idx << 12) |
    # (value + 2048) — unpacked into a numpy scatter after the scan.
    comp_meta = []  # (cid, n_blocks_per_mcu, dc_lut, ac_lut2, packed.append, packed)
    for cid, hi, vi, _tq in comps:
        _, td, ta = scan_by_comp[cid]
        packed: list[int] = []
        comp_meta.append((cid, vi * hi, huff_dc[td], huff_ac[ta], packed.append, packed))
    preds = [0] * len(comps)
    blk_base = [0] * len(comps)  # running flat offset (bi * 64) per comp
    seg_idx = 0
    seg = segments[0]
    seg_n = len(seg)
    spos = 0
    window = 0
    wbits = 0
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            seg = segments[seg_idx]
            seg_n = len(seg)
            spos = 0
            window = 0
            wbits = 0
            preds = [0] * len(comps)
        for ci, (_cid, nblk, dc_lut, ac2, app, _packed) in enumerate(comp_meta):
            for _blk in range(nblk):
                base = blk_base[ci] << 12
                blk_base[ci] += 64
                # --- DC: size symbol + magnitude (two-step; 1 per block) ---
                if wbits < 27:  # refill 6 bytes at once (max code+mag = 27)
                    chunk = seg[spos : spos + 6]
                    if chunk:
                        nb8 = len(chunk) << 3
                        spos += 6
                        window = (window << nb8) | int.from_bytes(chunk, "big")
                        wbits += nb8
                peek = (
                    window >> (wbits - 16) if wbits >= 16 else (window << (16 - wbits)) & 0xFFFF
                )
                v = dc_lut[peek]
                size = v & 31
                if size == 0 or size > wbits:
                    raise ValueError(
                        "JPEG entropy data truncated" if wbits < 16 else "invalid JPEG huffman code"
                    )
                s = v >> 5
                wbits -= size
                window &= _MASKS[wbits]
                if s:
                    if s > wbits:
                        raise ValueError("JPEG entropy data truncated")
                    wbits -= s
                    mag = window >> wbits
                    window &= _MASKS[wbits]
                    if mag < 1 << (s - 1):
                        mag += 1 - (1 << s)
                    preds[ci] += mag
                # T.81 F.1.1.5.1: for 8-bit precision the DC difference sum
                # must stay in [-2048, 2047]. A hostile/corrupt stream can
                # drift the predictor outside that range (DC size codes up
                # to 15 decode fine) — raise instead of wrapping silently in
                # the 12-bit packing below, matching every other
                # malformed-input path in this decoder.
                if not -2048 <= preds[ci] <= 2047:
                    raise ValueError("JPEG DC predictor out of range")
                app(base | ((preds[ci] + 2048) & 4095))
                # --- AC: one combined-LUT hit per coefficient ---
                k = 1
                while k < 64:
                    if wbits < 26:
                        chunk = seg[spos : spos + 6]
                        if chunk:
                            nb8 = len(chunk) << 3
                            spos += 6
                            window = (window << nb8) | int.from_bytes(chunk, "big")
                            wbits += nb8
                    peek = (
                        window >> (wbits - 16)
                        if wbits >= 16
                        else (window << (16 - wbits)) & 0xFFFF
                    )
                    v = ac2[peek]
                    tl = v & 31
                    if tl == 0 or tl > wbits:
                        if tl == 0 and wbits >= 16:
                            raise ValueError("invalid JPEG huffman code")
                        raise ValueError("JPEG entropy data truncated")
                    wbits -= tl
                    window &= _MASKS[wbits]
                    vf = (v >> 11) & 4095
                    if vf:
                        if vf != 2048:  # fast path: value fully decoded
                            k += (v >> 5) & 63
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            app(base + (k << 12) + vf)
                            k += 1
                            continue
                        if (v >> 5) & 63 == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB (and undefined run|0 symbols, per T.81)
                    # slow path: code consumed, read the magnitude bits
                    s = (v >> 23) & 15
                    if wbits < 16:
                        chunk = seg[spos : spos + 6]
                        if chunk:
                            nb8 = len(chunk) << 3
                            spos += 6
                            window = (window << nb8) | int.from_bytes(chunk, "big")
                            wbits += nb8
                    if s > wbits:
                        raise ValueError("JPEG entropy data truncated")
                    wbits -= s
                    mag = window >> wbits
                    window &= _MASKS[wbits]
                    if mag < 1 << (s - 1):
                        mag += 1 - (1 << s)
                    k += (v >> 5) & 63
                    if k > 63:
                        raise ValueError("JPEG AC run overflow")
                    app(base + (k << 12) + (mag + 2048))
                    k += 1
    zz_of = {}
    for (cid, hi, vi, _tq), (_c, _nb, _d, _a, _app, packed) in zip(comps, comp_meta):
        nb = n_mcus * vi * hi
        pk = np.array(packed, np.int64)
        zz_flat = np.zeros(nb * 64, np.int32)
        zz_flat[pk >> 12] = (pk & 4095) - 2048  # ONE scatter per component
        zz_of[cid] = zz_flat.reshape(nb, 64)
    return _assemble_image(comps, quant, zz_of, h, w, mcux, mcuy, hmax, vmax)


def _assemble_image(comps, quant, zz_of, h, w, mcux, mcuy, hmax, vmax) -> np.ndarray:
    """Shared reconstruction tail for baseline + progressive decode:
    per-component zigzag coefficient matrices (nb, 64) → un-zigzag,
    dequantize, batched IDCT, plane scatter, upsample, color convert."""
    out_planes = []
    for cid, hi, vi, tq in comps:
        zz_mat = zz_of[cid]
        nb = zz_mat.shape[0]
        nat = np.zeros((nb, 64), np.int32)
        nat[:, _ZIGZAG] = zz_mat  # un-zigzag every block at once
        deq = nat.reshape(-1, 8, 8).astype(np.float64) * quant[tq]
        blocks = _DCT_C.T @ deq @ _DCT_C  # batched IDCT (matmul broadcasts)
        p = (
            blocks.reshape(mcuy, mcux, vi, hi, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcuy * vi * 8, mcux * hi * 8)
        )
        if hi != hmax or vi != vmax:  # nearest-replication upsample
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(np.round(out_planes[0] + 128), 0, 255).astype(np.uint8)
        return y[:, :, None]
    if len(out_planes) != 3:
        raise NotImplementedError(f"unsupported JPEG component count {len(out_planes)}")
    y, cb, cr = (p + 128 for p in out_planes)
    cb, cr = cb - 128, cr - 128
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=2
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded span starting at ``pos``: returns (RST-split,
    FF00-unstuffed segments, position of the terminating marker)."""
    m = re.search(rb"\xff(?=[^\x00\xd0-\xd7])", data[pos:])
    end = pos + m.start() if m else len(data)
    entropy = data[pos:end]
    segs = [s.replace(b"\xff\x00", b"\xff") for s in re.split(rb"\xff[\xd0-\xd7]", entropy)]
    return segs, end


def _decode_progressive(data: bytes) -> np.ndarray:
    """Progressive JPEG (SOF2): spectral-selection + successive-
    approximation scans per ITU-T T.81 G.2, including DC/AC refinement
    and EOB-run coding. Coefficients accumulate across scans in zigzag
    order; reconstruction shares the baseline tail (_assemble_image).

    Perf posture: progressive is the honest slow path (a _BitReader per
    scan, per-coefficient Python) — the multi-scan structure defeats the
    baseline decoder's single-pass combined LUT. Roughly baseline-scalar
    speed; fine for thumbnail/feature payloads, and the PIL swap-in seam
    applies here too.
    """
    quant: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, list[int]] = {}
    ac_tabs: dict[int, list[int]] = {}
    frame = None
    restart_interval = 0
    scans = []  # (scomps=[(cid, dc_lut|None, ac_lut|None)], Ss, Se, Ah, Al, ri, segments)
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, i).astype(np.int64)
                    i += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, i).astype(np.int64)
                    i += 128
                nat = np.empty(64, dtype=np.int64)
                nat[_ZIGZAG] = tbl
                quant[tq] = nat.reshape(8, 8)
        elif marker == 0xC2:
            precision, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if precision != 8:
                raise NotImplementedError(f"unsupported JPEG precision {precision}")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nsym = sum(bits)
                huffval = list(seg[i + 17 : i + 17 + nsym])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _build_huff_decoder(bits, huffval)
                i += 17 + nsym
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            ns = seg[0]
            scomps = []
            for c in range(ns):
                cs = seg[1 + 2 * c]
                td, ta = seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0xF
                scomps.append((cs, dc_tabs.get(td), ac_tabs.get(ta)))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0xF
            segments, pos = _entropy_segments(data, pos)
            scans.append((scomps, ss, se, ah, al, restart_interval, segments))
    if frame is None or not scans:
        raise ValueError("JPEG missing SOF2/SOS")
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_cid = {cid: (hi, vi) for cid, hi, vi, _ in comps}
    # zigzag-order coefficient store per comp (Python list: the scan loops
    # are per-coefficient Python; numpy scalar writes would be slower)
    coef = {cid: [0] * (mcux * hi * mcuy * vi * 64) for cid, hi, vi, _ in comps}

    for scomps, ss, se, ah, al, ri, segments in scans:
        if ss == 0 and se != 0:
            raise ValueError("bad progressive scan: DC scan with Se != 0")
        if ss > 0 and len(scomps) != 1:
            raise ValueError("bad progressive scan: interleaved AC scan")
        reader = _BitReader(segments[0])
        seg_idx = 0
        eobrun = 0
        preds = {cid: 0 for cid, _d, _a in scomps}
        p1, m1 = 1 << al, -1 << al

        def restart():
            nonlocal reader, seg_idx, eobrun, preds
            seg_idx += 1
            reader = _BitReader(segments[seg_idx])
            eobrun = 0
            preds = {cid: 0 for cid, _d, _a in scomps}

        if len(scomps) > 1:  # interleaved: DC scans only (enforced above)
            for mcu in range(mcux * mcuy):
                if ri and mcu and mcu % ri == 0:
                    restart()
                my, mx = divmod(mcu, mcux)
                for cid, dc_lut, _ac in scomps:
                    hi, vi = by_cid[cid]
                    cf = coef[cid]
                    for blk in range(vi * hi):
                        base = (mcu * vi * hi + blk) * 64
                        if ah == 0:  # DC first
                            size = reader.decode_symbol(dc_lut)
                            preds[cid] += _extend(reader.read_bits(size), size)
                            cf[base] = preds[cid] << al
                        elif reader.read_bits(1):  # DC refinement bit
                            cf[base] |= p1
        else:  # non-interleaved: the component's own block grid
            cid, dc_lut, ac_lut = scomps[0]
            hi, vi = by_cid[cid]
            cf = coef[cid]
            wb = (-(-(w * hi) // hmax) + 7) // 8
            hb = (-(-(h * vi) // vmax) + 7) // 8
            unit = 0
            for by in range(hb):
                for bx in range(wb):
                    if ri and unit and unit % ri == 0:
                        restart()
                    unit += 1
                    bi = ((by // vi) * mcux + bx // hi) * (vi * hi) + (by % vi) * hi + bx % hi
                    base = bi * 64
                    if ss == 0:
                        if ah == 0:
                            size = reader.decode_symbol(dc_lut)
                            preds[cid] += _extend(reader.read_bits(size), size)
                            cf[base] = preds[cid] << al
                        elif reader.read_bits(1):
                            cf[base] |= p1
                    elif ah == 0:  # AC first (T.81 G.2.2 / EOB-run coding)
                        if eobrun > 0:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            rs = reader.decode_symbol(ac_lut)
                            r, s = rs >> 4, rs & 15
                            if s:
                                k += r
                                if k > se:
                                    raise ValueError("JPEG AC band overflow")
                                cf[base + k] = _extend(reader.read_bits(s), s) << al
                                k += 1
                            else:
                                if r != 15:
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += reader.read_bits(r)
                                    eobrun -= 1  # counts this block
                                    break
                                k += 16  # ZRL
                    else:  # AC refinement (T.81 G.2.3)
                        k = ss
                        if eobrun == 0:
                            while k <= se:
                                rs = reader.decode_symbol(ac_lut)
                                r, s = rs >> 4, rs & 15
                                val = 0
                                if s:
                                    # magnitude in a refinement scan is 1
                                    val = p1 if reader.read_bits(1) else m1
                                elif r != 15:
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += reader.read_bits(r)
                                    break
                                # advance: correct already-nonzero coeffs,
                                # count r zero-history positions
                                while k <= se:
                                    c = cf[base + k]
                                    if c:
                                        if reader.read_bits(1) and not (c & p1):
                                            cf[base + k] = c + (p1 if c >= 0 else m1)
                                    else:
                                        r -= 1
                                        if r < 0:
                                            break
                                    k += 1
                                if s and k <= se:
                                    cf[base + k] = val
                                k += 1
                        if eobrun > 0:
                            # EOB-run tail: correction bits only
                            while k <= se:
                                c = cf[base + k]
                                if c and reader.read_bits(1) and not (c & p1):
                                    cf[base + k] = c + (p1 if c >= 0 else m1)
                                k += 1
                            eobrun -= 1

    zz_of = {
        cid: np.array(coef[cid], np.int32).reshape(-1, 64) for cid, *_ in comps
    }
    return _assemble_image(comps, quant, zz_of, h, w, mcux, mcuy, hmax, vmax)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per T.81 F.1.2.3


def _csize(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(arr: np.ndarray, quality: int = 75, restart_interval: int = 0) -> bytes:
    """uint8 (H, W), (H, W, 1) or (H, W, 3 RGB) -> baseline JPEG bytes.

    4:4:4 sampling, T.81 Annex K example quant (scaled by IJG-style
    quality 1-100) + huffman tables; optional DRI/RSTn restart markers
    every ``restart_interval`` MCUs. Deterministic.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in (1, 3):
        raise NotImplementedError(f"unsupported channel count {ch}")
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qtabs = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA)[: (1 if ch == 1 else 2)]:
        q = np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)
        qtabs.append(q.reshape(8, 8))

    if ch == 3:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b - 128.0,
            -0.168736 * r - 0.331264 * g + 0.5 * b,
            0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        comp_q = [0, 1, 1]
        comp_h = [0, 1, 1]  # huffman table ids (dc/ac pair index)
    else:
        planes = [a[:, :, 0].astype(np.float64) - 128.0]
        comp_q = [0]
        comp_h = [0]

    dc_codes = [_build_huff_codes(*_HUFF_DC_LUMA), _build_huff_codes(*_HUFF_DC_CHROMA)]
    ac_codes = [_build_huff_codes(*_HUFF_AC_LUMA), _build_huff_codes(*_HUFF_AC_CHROMA)]

    by, bx = (h + 7) // 8, (w + 7) // 8
    padded = []
    for p in planes:
        pp = np.empty((by * 8, bx * 8))
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]  # edge-replicate padding
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)

    writer = _BitWriter()
    pred = [0] * len(planes)
    mcu = 0
    for yb in range(by):
        for xb in range(bx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
                pred = [0] * len(planes)
            mcu += 1
            for ci, p in enumerate(padded):
                q = qtabs[comp_q[ci]]
                block = p[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8]
                coeffs = _DCT_C @ block @ _DCT_C.T
                quantized = np.round(coeffs / q).astype(np.int64)
                zz = quantized.reshape(-1)[_ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                size = _csize(diff)
                code, ln = dc_codes[comp_h[ci]][size]
                writer.write(code, ln)
                if size:
                    mag = diff if diff >= 0 else diff + (1 << size) - 1
                    writer.write(mag, size)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if k > last_nz:
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[comp_h[ci]][0xF0]
                        writer.write(code, ln)
                        run -= 16
                    size = _csize(v)
                    code, ln = ac_codes[comp_h[ci]][(run << 4) | size]
                    writer.write(code, ln)
                    mag = v if v >= 0 else v + (1 << size) - 1
                    writer.write(mag, size)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_codes[comp_h[ci]][0x00]  # EOB
                    writer.write(code, ln)
    writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate(qtabs):
        zz = q.reshape(-1)[_ZIGZAG].astype(np.uint8)
        out += seg(0xDB, bytes([tq]) + zz.tobytes())
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, comp_q[ci]])  # 4:4:4
    out += seg(0xC0, sof)
    tables = [(_HUFF_DC_LUMA, 0x00), (_HUFF_AC_LUMA, 0x10)]
    if nc == 3:
        tables += [(_HUFF_DC_CHROMA, 0x01), (_HUFF_AC_CHROMA, 0x11)]
    for (bits, huffval), tclass in tables:
        out += seg(0xC4, bytes([tclass]) + bytes(bits) + bytes(huffval))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        tid = comp_h[ci]
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])  # spectral selection (baseline fixed)
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# libjpeg-style default progression: coarse DC first (Al=1), low AC bands,
# then successive-approximation refinements, DC refine, AC refines.
_PROG_SCRIPT_3 = [
    ([0, 1, 2], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([2], 1, 63, 0, 1),
    ([1], 1, 63, 0, 1),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0, 1, 2], 0, 0, 1, 0),
    ([2], 1, 63, 1, 0),
    ([1], 1, 63, 1, 0),
    ([0], 1, 63, 1, 0),
]
_PROG_SCRIPT_1 = [
    ([0], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0], 0, 0, 1, 0),
    ([0], 1, 63, 1, 0),
]


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 75, scans: list | None = None
) -> bytes:
    """uint8 (H, W), (H, W, 1) or (H, W, 3 RGB) -> progressive (SOF2)
    JPEG bytes, 4:4:4, with a libjpeg-style default scan script (spectral
    selection + successive approximation, EOB-run coding, buffered
    refinement bits per T.81 G.3). ``scans`` overrides the script as
    [(comp_indices, Ss, Se, Ah, Al), ...].

    The quantized coefficients are computed with the EXACT per-block
    sequence of the baseline encoder, so a progressive stream of an image
    decodes byte-identically to its baseline stream (pinned in
    tests/test_codecs.py) — progressive coding is a lossless reordering
    of the same coefficients. Deterministic; no restart markers.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in (1, 3):
        raise NotImplementedError(f"unsupported channel count {ch}")
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qtabs = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA)[: (1 if ch == 1 else 2)]:
        q = np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)
        qtabs.append(q.reshape(8, 8))

    if ch == 3:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b - 128.0,
            -0.168736 * r - 0.331264 * g + 0.5 * b,
            0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        comp_q = [0, 1, 1]
        comp_h = [0, 1, 1]
    else:
        planes = [a[:, :, 0].astype(np.float64) - 128.0]
        comp_q = [0]
        comp_h = [0]
    scans = scans if scans is not None else (_PROG_SCRIPT_3 if ch == 3 else _PROG_SCRIPT_1)

    by, bx = (h + 7) // 8, (w + 7) // 8
    padded = []
    for p in planes:
        pp = np.empty((by * 8, bx * 8))
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)

    # Quantized zigzag coefficients, same per-block math as encode_jpeg
    # (bit-identical coefficients are what make the equivalence test valid)
    zz_comp = []
    for ci, p in enumerate(padded):
        q = qtabs[comp_q[ci]]
        rows = []
        for yb in range(by):
            for xb in range(bx):
                block = p[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8]
                coeffs = _DCT_C @ block @ _DCT_C.T
                quantized = np.round(coeffs / q).astype(np.int64)
                rows.append(quantized.reshape(-1)[_ZIGZAG])
        zz_comp.append([r.tolist() for r in rows])
    nb = by * bx

    dc_codes = [_build_huff_codes(*_HUFF_DC_LUMA), _build_huff_codes(*_HUFF_DC_CHROMA)]
    ac_codes = [_build_huff_codes(*_HUFF_AC_LUMA), _build_huff_codes(*_HUFF_AC_CHROMA)]

    def scan_bytes(comp_idx: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        wtr = _BitWriter()
        if ss == 0 and ah == 0:  # DC first (interleaved in comp order)
            pred = {ci: 0 for ci in comp_idx}
            for bi in range(nb):
                for ci in comp_idx:
                    t = zz_comp[ci][bi][0] >> al  # arithmetic shift, T.81 G.1.2.1
                    diff = t - pred[ci]
                    pred[ci] = t
                    size = _csize(diff)
                    code, ln = dc_codes[comp_h[ci]][size]
                    wtr.write(code, ln)
                    if size:
                        mag = diff if diff >= 0 else diff + (1 << size) - 1
                        wtr.write(mag, size)
        elif ss == 0:  # DC refinement: one raw bit per block
            for bi in range(nb):
                for ci in comp_idx:
                    wtr.write((zz_comp[ci][bi][0] >> al) & 1, 1)
        elif ah == 0:  # AC first: EOB-run coded band
            (ci,) = comp_idx
            codes = ac_codes[comp_h[ci]]
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun:
                    n = eobrun.bit_length() - 1
                    code, ln = codes[n << 4]
                    wtr.write(code, ln)
                    if n:
                        wtr.write(eobrun - (1 << n), n)
                    eobrun = 0

            for bi in range(nb):
                blk = zz_comp[ci][bi]
                run = 0
                for k in range(ss, se + 1):
                    v = blk[k]
                    mag = (v if v >= 0 else -v) >> al
                    if mag == 0:
                        run += 1
                        continue
                    flush_eob()
                    while run > 15:
                        code, ln = codes[0xF0]
                        wtr.write(code, ln)
                        run -= 16
                    size = mag.bit_length()
                    code, ln = codes[(run << 4) | size]
                    wtr.write(code, ln)
                    sval = mag if v >= 0 else -mag
                    wtr.write(sval if sval >= 0 else sval + (1 << size) - 1, size)
                    run = 0
                if run:
                    # Cap runs at 1 (plain EOB0): the Annex K tables carry
                    # no EOBn (n>0) symbols — longer runs need custom
                    # huffman tables. The decoder handles full EOBn runs
                    # (tests craft them with a custom table).
                    eobrun += 1
                    flush_eob()
            flush_eob()
        else:  # AC refinement (T.81 G.3 / buffered correction bits)
            (ci,) = comp_idx
            codes = ac_codes[comp_h[ci]]
            eobrun = 0
            # Two buffers, as in the reference algorithm: bits owned by the
            # pending EOB run flush WITH the EOB symbol; bits accrued in
            # the current block since the last symbol flush AFTER the next
            # symbol. Conflating them desynchronizes the decoder.
            be_bits: list[int] = []  # owned by the pending EOB run
            br_bits: list[int] = []  # current block, since last symbol

            def flush_eob_refine():
                nonlocal eobrun
                if eobrun:
                    n = eobrun.bit_length() - 1
                    code, ln = codes[n << 4]
                    wtr.write(code, ln)
                    if n:
                        wtr.write(eobrun - (1 << n), n)
                    eobrun = 0
                for bit in be_bits:
                    wtr.write(bit, 1)
                be_bits.clear()

            def flush_br():
                for bit in br_bits:
                    wtr.write(bit, 1)
                br_bits.clear()

            for bi in range(nb):
                blk = zz_comp[ci][bi]
                absval = [((v if v >= 0 else -v) >> al) for v in blk[ss : se + 1]]
                eob_pos = -1  # index into the band of the last newly-significant
                for j, t in enumerate(absval):
                    if t == 1:
                        eob_pos = j
                run = 0
                for j, t in enumerate(absval):
                    if t == 0:
                        run += 1
                        continue
                    while run > 15 and j <= eob_pos:
                        flush_eob_refine()
                        code, ln = codes[0xF0]
                        wtr.write(code, ln)
                        run -= 16
                        flush_br()
                    if t > 1:  # significant in an earlier scan: correction bit
                        br_bits.append(t & 1)
                        continue
                    # newly significant (magnitude exactly 1 in this scan)
                    flush_eob_refine()
                    code, ln = codes[(run << 4) | 1]
                    wtr.write(code, ln)
                    wtr.write(1 if blk[ss + j] >= 0 else 0, 1)
                    flush_br()
                    run = 0
                if run or br_bits:
                    eobrun += 1
                    be_bits.extend(br_bits)
                    br_bits.clear()
                    flush_eob_refine()  # EOB0 only: Annex K has no EOBn codes
            flush_eob_refine()
        wtr.flush()
        return bytes(wtr.out)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    for tq, q in enumerate(qtabs):
        zzq = q.reshape(-1)[_ZIGZAG].astype(np.uint8)
        out += seg(0xDB, bytes([tq]) + zzq.tobytes())
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, comp_q[ci]])
    out += seg(0xC2, sof)
    tables = [(_HUFF_DC_LUMA, 0x00), (_HUFF_AC_LUMA, 0x10)]
    if nc == 3:
        tables += [(_HUFF_DC_CHROMA, 0x01), (_HUFF_AC_CHROMA, 0x11)]
    for (bits, huffval), tclass in tables:
        out += seg(0xC4, bytes([tclass]) + bytes(bits) + bytes(huffval))
    for comp_idx, ss, se, ah, al in scans:
        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            tid = comp_h[ci]
            sos += bytes([ci + 1, (tid << 4) | tid])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        out += scan_bytes(comp_idx, ss, se, ah, al)
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# GIF (87a/89a): LZW decode per the public GIF89a specification — very
# common in web-scraped training corpora. Decoder: global/local color
# tables, interlace, multi-frame composition (disposal none/keep/restore-
# background), GCE transparency. Encoder: palettized images (<=256 unique
# colors — no quantizer), full frames, optional interlace; variable-width
# LZW with clear-code dict resets.
# --------------------------------------------------------------------------


def is_gif(data: bytes) -> bool:
    return bytes(data[:6]) in (b"GIF87a", b"GIF89a")


def _lzw_decode(min_code_size: int, data: bytes) -> bytearray:
    """GIF variable-width LZW, LSB-first bit packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    dictionary: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return out  # missing EOI: tolerate (common in the wild)
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dictionary = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code < len(dictionary):
            entry = dictionary[code]
        elif code == len(dictionary) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        if prev is not None and len(dictionary) < 4096:
            dictionary.append(prev + entry[:1])
            if len(dictionary) == 1 << width and width < 12:
                width += 1
        prev = entry


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """GIF variable-width LZW encoder (emits clear up front and on reset)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    run = b""
    for byte in indices:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code <= 4095:
            table[cand] = next_code
            if next_code == 1 << width and width < 12:
                width += 1
            next_code += 1
        else:  # dict full: reset (decoder mirrors on the clear code)
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            width = min_code_size + 1
            next_code = eoi + 1
        run = bytes([byte])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_frames(data: bytes) -> list[np.ndarray]:
    """GIF bytes -> list of composed uint8 (H, W, 3) frames (full-canvas,
    disposal + transparency applied)."""
    data = bytes(data)
    if not is_gif(data):
        raise NotImplementedError("unsupported image format (not a GIF)")
    w, h = struct.unpack("<HH", data[6:10])
    flags, bg_idx, _ar = data[10], data[11], data[12]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:, :] = gct[bg_idx]
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    prev_canvas = canvas.copy()
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                blk_len = data[pos]
                gflags = data[pos + 1]
                disposal = (gflags >> 2) & 7
                transparent = data[pos + 4] if gflags & 1 else None
                pos += blk_len + 1
            # skip remaining sub-blocks (and the whole block for other labels)
            while data[pos] != 0:
                pos += data[pos] + 1
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        left, top, fw, fh = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
        iflags = data[pos + 9]
        pos += 10
        ct = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 7)
            ct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF frame without a color table")
        min_code = data[pos]
        pos += 1
        sub = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            sub += data[pos + 1 : pos + 1 + ln]
            pos += ln + 1
        pos += 1
        idx = np.frombuffer(_lzw_decode(min_code, bytes(sub)), np.uint8, fh * fw).reshape(fh, fw)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            deinter = np.empty_like(idx)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                rows = range(start, fh, step)
                for r in rows:
                    deinter[r] = idx[src]
                    src += 1
            idx = deinter
        prev_canvas = canvas.copy()
        region = canvas[top : top + fh, left : left + fw]
        rgb = ct[np.minimum(idx, len(ct) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore background
            bg = ct[bg_idx] if bg_idx < len(ct) else 0
            canvas[top : top + fh, left : left + fw] = bg
        elif disposal == 3:  # restore previous
            canvas = prev_canvas.copy()
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> first composed frame as uint8 (H, W, 3)."""
    return decode_gif_frames(data)[0]


def encode_gif(
    frames: np.ndarray | list[np.ndarray], interlace: bool = False
) -> bytes:
    """uint8 (H, W, 3) frame or list of frames -> GIF89a bytes.

    Palettized: the global color table is built from the distinct colors
    across all frames (<= 256, else NotImplementedError — this encoder has
    no quantizer). Full-canvas frames, optional interlace. Deterministic:
    palette sorted lexicographically."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, ch = frames[0].shape
    if ch != 3 or any(f.shape != (h, w, 3) for f in frames):
        raise NotImplementedError("encode_gif needs same-size (H, W, 3) frames")
    colors = np.unique(np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0)
    if len(colors) > 256:
        raise NotImplementedError(
            f"encode_gif is palettized-only: {len(colors)} distinct colors > 256"
        )
    # palette size = power of two >= max(2, n_colors)
    depth = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    pal = np.zeros((1 << depth, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0])
    out += pal.tobytes()
    if len(frames) > 1:  # netscape loop extension (loop forever)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = max(2, depth)
    for f in frames:
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x40 if interlace else 0])
        idx = np.array([[lut[tuple(px)] for px in row] for row in f], dtype=np.uint8)
        if interlace:
            order = [r for start, step in _GIF_INTERLACE_PASSES for r in range(start, h, step)]
            idx = idx[order]
        out += bytes([min_code])
        lzw = _lzw_encode(min_code, idx.tobytes())
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_image_bytes(data: bytes) -> np.ndarray:
    """Dispatch PNG/JPEG/GIF by magic bytes -> uint8 (H, W, C)."""
    if is_png(data):
        return decode_png(data)
    if is_jpeg(data):
        return decode_jpeg(data)
    if is_gif(data):
        return decode_gif(data)
    raise NotImplementedError("unsupported image format (PNG/JPEG/GIF only)")


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, int16 samples of shape (n, channels)).
    16-bit PCM only; other widths/containers raise NotImplementedError."""
    data = bytes(data)
    if not is_wav(data):
        raise NotImplementedError("unsupported audio format (WAV only)")
    with wave.open(io.BytesIO(data)) as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError(
                f"unsupported WAV sample width {wf.getsampwidth()} (16-bit PCM only)"
            )
        rate = wf.getframerate()
        n = wf.getnframes()
        ch = wf.getnchannels()
        frames = wf.readframes(n)
    samples = np.frombuffer(frames, dtype="<i2").reshape(-1, ch)
    return rate, samples


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 samples (n,) or (n, channels) -> WAV bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(s.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(s.tobytes())
    return buf.getvalue()
