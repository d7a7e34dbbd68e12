"""Real media codecs on stdlib + numpy only: PNG (zlib inflate + scanline
unfilter) and WAV (RIFF PCM via the stdlib wave module).

No PIL/opencv/ffmpeg exists in this environment, so these are complete
from-scratch implementations of the two formats whose containers are
stdlib-decodable: PNG bit-depth 8 in grayscale/RGB/RGBA (non-interlaced)
and 16-bit PCM WAV. Anything else raises NotImplementedError with the
format named — the multimodal operators surface that per-payload.

Perf posture: the unfilter loop is per-scanline numpy (vectorized across
the row for Up/None, per-pixel-column for Sub/Average/Paeth) — fine for
the thumbnail/feature-extract payload sizes these pipelines carry. If a
binary wheel codec ever lands in the image (PIL), swap it in behind the
same function signatures; every caller goes through this module.
"""

from __future__ import annotations

import io
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
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:  # None
            cur = line
        elif f == 1:  # Sub
            cur = line.copy()
            for i in range(ch, stride):
                cur[i] = (cur[i] + cur[i - ch]) & 0xFF
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
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
