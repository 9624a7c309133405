"""Minimal pure-Python PNG codec (stdlib zlib + numpy) — the real
image-decode kernel behind ``operators.multimodal``'s ``decoder='png'``
path, so the multimodal tier works in containers that ship no media
libraries (pillow remains the fast path when importable).

Scope (deliberately minimal, loudly enforced): 8-bit depth, color
types 0 (grayscale), 2 (RGB), and 6 (RGBA), no interlace — which is
exactly what the pipeline's synthetic fixtures and feature extractors
need.  All five PNG filter types (None/Sub/Up/Average/Paeth) are
decoded, since real-world encoders (including pillow) choose filters
per scanline.

Scale: the codec runs inside mapInPandas workers on executor-local
Arrow batches — per-image cost is the decode itself; nothing here
touches the driver or adds a shuffle.  The unfilter loop is O(bytes)
with None/Up/Sub fully vectorized (Sub is a per-channel prefix sum mod
256); Average/Paeth carry a true per-pixel dependency on the
already-unfiltered left neighbor, so they run as a Python loop over
the row — fine for feature-extraction thumbnails, and swappable for a
C codec without touching the plan.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    """Encode a uint8 array as PNG: 2-D ``(h, w)`` → grayscale, 3-D
    ``(h, w, 3)`` → RGB, ``(h, w, 4)`` → RGBA.  Every scanline uses
    filter 0 (None) — simple, deterministic, and valid for any
    decoder."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        color_type = 0
    elif px.ndim == 3 and px.shape[2] == 3:
        color_type = 2
    elif px.ndim == 3 and px.shape[2] == 4:
        color_type = 6
    else:
        raise ValueError(f"unsupported array shape for PNG: {px.shape}")
    h, w = px.shape[0], px.shape[1]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Undo per-scanline PNG filtering → (h, w*bpp) uint8 matrix."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos)
        pos += stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 2:  # Up (vectorized: no intra-row dependency)
            out[y] = line + prev  # uint8 wraps mod 256, as the spec says
        elif ftype == 1:  # Sub: per-channel prefix sum (vectorized)
            cols = stride // bpp
            out[y] = (
                line.reshape(cols, bpp)
                .astype(np.int64)
                .cumsum(axis=0)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif ftype in (3, 4):  # Average / Paeth: left-dependent loop
            cur = out[y]
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                if ftype == 3:
                    v = line[x] + ((a + int(prev[x])) >> 1)
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    v = line[x] + _paeth(a, int(prev[x]), c)
                cur[x] = v & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype} on row {y}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to uint8 pixels: ``(h, w)`` for grayscale,
    ``(h, w, c)`` for RGB/RGBA.  Supports 8-bit depth, color types
    0/2/6, no interlace; anything else raises ValueError (honest
    failure, never silent garbage)."""
    data = bytes(data)
    if data[: len(_SIGNATURE)] != _SIGNATURE:
        raise ValueError("PNG: bad signature")
    pos = len(_SIGNATURE)
    width = height = None
    color_type = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            if len(body) != 13:
                # A corrupt chunk-length truncates the body slice; without
                # this gate struct.unpack raises struct.error, which is
                # outside the documented error contract.
                raise ValueError(f"PNG: IHDR body is {len(body)} bytes, want 13")
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise ValueError(f"PNG: only 8-bit depth supported, got {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(
                    f"PNG: unsupported color type {color_type} "
                    "(supported: 0 gray, 2 RGB, 6 RGBA)"
                )
            if interlace != 0:
                raise ValueError("PNG: interlaced images not supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(idat)
    expected = height * (1 + width * channels)
    if len(raw) != expected:
        raise ValueError(
            f"PNG: decompressed size {len(raw)} != expected {expected}"
        )
    mat = _unfilter(raw, width, height, channels)
    if channels == 1:
        return mat
    return mat.reshape(height, width, channels)


def luma(px: np.ndarray) -> np.ndarray:
    """Collapse decoded pixels to 8-bit luminance with the same
    fixed-point ITU-R 601-2 transform pillow uses for
    ``convert("L")`` (L = (R*19595 + G*38470 + B*7471 + 0x8000) >> 16,
    i.e. 299/587/114 weights with round-half-up), so the pure-Python
    path and the pillow path produce identical features.  Alpha is
    ignored, as pillow's L conversion does."""
    if px.ndim == 2:
        return px
    r = px[..., 0].astype(np.uint32)
    g = px[..., 1].astype(np.uint32)
    b = px[..., 2].astype(np.uint32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(
        np.uint8
    )


def split_png_concat(data: bytes) -> list[bytes]:
    """Split a concatenated-PNG stream (the synthetic video container:
    frame k's complete PNG followed immediately by frame k+1's) into
    the individual PNG byte strings, by walking each image's chunk
    list to its IEND.  Raises ValueError on anything that is not a
    clean concatenation — a corrupt container must fail loudly, not
    yield a garbage frame."""
    data = bytes(data)
    frames: list[bytes] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + len(_SIGNATURE)] != _SIGNATURE:
            raise ValueError(
                f"png-concat: bad signature at offset {pos} "
                f"(frame {len(frames)})"
            )
        start = pos
        pos += len(_SIGNATURE)
        while True:
            if pos + 8 > n:
                raise ValueError(
                    f"png-concat: truncated chunk header in frame "
                    f"{len(frames)}"
                )
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            pos += 12 + length  # length + tag + body + crc
            if pos > n:
                raise ValueError(
                    f"png-concat: truncated {tag!r} chunk in frame "
                    f"{len(frames)}"
                )
            if tag == b"IEND":
                break
        frames.append(data[start:pos])
    return frames
