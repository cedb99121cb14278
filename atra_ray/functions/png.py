"""Pure-stdlib PNG codec (zlib + numpy scanline (un)filtering).

Real-format image decode for the multimodal stages (VERDICT r3 item 2 —
no image library exists in this container, so the baseline PNG spec is
implemented directly: RFC 2083 / ISO 15948). Supported: 8-bit depth,
color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
non-interlaced, all five scanline filters. Unsupported shapes raise
``ValueError`` — callers surface that as a decode-error row, never a
poisoned batch.

The encoder writes filter-0 scanlines (sufficient for fixtures and
round-trip tests; the decoder is exercised on filters 1-4 by dedicated
tests that hand-build filtered streams).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_png", "encode_png", "PNG_MAGIC"]

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (before palette expansion)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        yield ctype, body
        pos += 12 + length  # length + type + body + crc (crc not verified)
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters. ``raw`` is the decompressed
    stream reshaped to (h, 1 + stride); returns (h, stride) uint8.

    Filter math is defined on bytes mod 256 (int intermediates for the
    Paeth/Average predictors). Rows depend on the previous row, so the
    outer loop is per scanline. Within a row: None/Up are whole-row numpy
    ops, Sub is an exact per-channel cumulative sum mod 256 (vectorized —
    cur[x] = row[x] + cur[x-bpp] unrolls to a prefix sum per bpp-strided
    channel), while Average/Paeth carry a true left-to-right dependency
    through the predictor and stay per-byte Python loops (they are rare
    in encoder output compared to Sub/Up; vectorizing Paeth exactly needs
    a scan primitive numpy lacks)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        row = raw[y, 1:].copy()
        if ftype == 0:  # None
            cur = row
        elif ftype == 1:  # Sub: prefix sum mod 256 per channel
            cur = row
            for o in range(bpp):
                lane = cur[o::bpp]
                np.copyto(lane, np.cumsum(lane, dtype=np.uint64) & 0xFF)
        elif ftype == 2:  # Up
            cur = (row.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = row
            p = prev.astype(np.int16)
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((left + int(p[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row
            p = prev.astype(np.int16)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(p[x])
                c = int(p[x - bpp]) if x >= bpp else 0
                pp = a + b - c
                pa_, pb_, pc_ = abs(pp - a), abs(pp - b), abs(pp - c)
                if pa_ <= pb_ and pa_ <= pc_:
                    pred = a
                elif pb_ <= pc_:
                    pred = b
                else:
                    pred = c
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, c) uint8 (c = 1 gray, 2 gray+alpha, 3 RGB,
    4 RGBA; palette images expand to RGB)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    width = height = None
    bit_depth = color_type = interlace = None
    palette: np.ndarray | None = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            try:
                width, height, bit_depth, color_type, _comp, _filt, interlace = (
                    struct.unpack(">IIBBBBB", body)
                )
            except struct.error as e:  # truncated IHDR is DATA, not a crash
                raise ValueError("truncated PNG IHDR") from e
        elif ctype == b"PLTE":
            if len(body) % 3:
                raise ValueError("bad PLTE length")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth}")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if width <= 0 or height <= 0:
        raise ValueError("bad PNG dimensions")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel stream length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    px = _unfilter(rows, height, stride, ch).reshape(height, width, ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        px = palette[idx]
    return px


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w) or (h, w, c) uint8 -> PNG bytes (filter 0, one IDAT)."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    flat = np.ascontiguousarray(pixels, dtype=np.uint8).reshape(h, w * c)
    scan = np.concatenate([np.zeros((h, 1), dtype=np.uint8), flat], axis=1)
    idat = zlib.compress(scan.tobytes(), level=6)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )
