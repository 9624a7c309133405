"""Pure-Python PNG codec (operators/png.py): roundtrip, all five
scanline filters, pillow-parity luma, and honest failures on
unsupported formats.  This is the real decode kernel behind
multimodal's decoder='png' — the container ships no pillow, so these
tests ARE the image-decode coverage."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from omim_spark.operators.png import (
    _SIGNATURE,
    _chunk,
    decode_png,
    encode_png,
    luma,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


class TestRoundtrip:
    @pytest.mark.parametrize(
        "shape",
        [(1, 1), (8, 8), (5, 13), (16, 3), (3, 16, 3), (7, 9, 3), (4, 4, 4)],
    )
    def test_encode_decode_identity(self, shape):
        px = _rng(sum(shape)).integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_png(encode_png(px))
        assert out.shape == px.shape
        assert np.array_equal(out, px)

    def test_rejects_bad_shapes(self):
        with pytest.raises(ValueError):
            encode_png(np.zeros((4, 4, 2), dtype=np.uint8))


def _forward_filter(raw: np.ndarray, ftypes: list[int], bpp: int) -> bytes:
    """Reference implementation of PNG's FORWARD filters (spec §9), so
    the decoder's unfilter is tested against an independent source of
    truth, not against itself."""

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    h, stride = raw.shape
    out = b""
    for y in range(h):
        ft = ftypes[y % len(ftypes)]
        prev = raw[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        line = bytearray()
        for x in range(stride):
            v = int(raw[y][x])
            a = int(raw[y][x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if ft == 0:
                f = v
            elif ft == 1:
                f = v - a
            elif ft == 2:
                f = v - b
            elif ft == 3:
                f = v - ((a + b) >> 1)
            else:
                f = v - paeth(a, b, c)
            line.append(f & 0xFF)
        out += bytes([ft]) + bytes(line)
    return out


def _build_png(raw_filtered: bytes, w: int, h: int, color_type: int) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw_filtered))
        + _chunk(b"IEND", b"")
    )


class TestAllFilters:
    """Real encoders (pillow, libpng) pick filters per scanline; the
    decoder must undo every one of them."""

    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    def test_single_filter_gray(self, ftype):
        px = _rng(ftype).integers(0, 256, size=(9, 11), dtype=np.uint8)
        data = _build_png(_forward_filter(px, [ftype], 1), 11, 9, 0)
        assert np.array_equal(decode_png(data), px)

    @pytest.mark.parametrize("ftype", [1, 2, 3, 4])
    def test_single_filter_rgb(self, ftype):
        px = _rng(10 + ftype).integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
        flat = px.reshape(6, 15)
        data = _build_png(_forward_filter(flat, [ftype], 3), 5, 6, 2)
        assert np.array_equal(decode_png(data), px)

    def test_mixed_filters_per_row(self):
        px = _rng(42).integers(0, 256, size=(10, 7, 4), dtype=np.uint8)
        flat = px.reshape(10, 28)
        data = _build_png(_forward_filter(flat, [0, 1, 2, 3, 4], 4), 7, 10, 6)
        assert np.array_equal(decode_png(data), px)

    def test_multiple_idat_chunks(self):
        """IDAT payload may be split arbitrarily across chunks."""
        px = _rng(3).integers(0, 256, size=(4, 6), dtype=np.uint8)
        comp = zlib.compress(_forward_filter(px, [0], 1))
        ihdr = struct.pack(">IIBBBBB", 6, 4, 8, 0, 0, 0, 0)
        mid = len(comp) // 2
        data = (
            _SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", comp[:mid])
            + _chunk(b"IDAT", comp[mid:])
            + _chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(data), px)


class TestLuma:
    def test_gray_passthrough(self):
        px = np.arange(64, dtype=np.uint8).reshape(8, 8)
        assert luma(px) is px

    def test_rgb_matches_pillow_fixed_point(self):
        # pillow convert("L"): (R*19595 + G*38470 + B*7471 + 0x8000) >> 16
        px = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]]],
                      dtype=np.uint8)
        got = luma(px)[0]
        assert list(got) == [76, 150, 29, 18]

    def test_alpha_ignored(self):
        rgb = _rng(5).integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
        rgba = np.dstack([rgb, np.full((3, 3), 128, dtype=np.uint8)])
        assert np.array_equal(luma(rgba), luma(rgb))


class TestHonestFailures:
    def test_bad_signature(self):
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"JFIF" + b"\x00" * 64)

    def test_16bit_depth_rejected(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
        data = _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="8-bit"):
            decode_png(data)

    def test_palette_rejected(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
        data = _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="color type"):
            decode_png(data)

    def test_interlace_rejected(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
        data = _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="interlaced"):
            decode_png(data)

    def test_truncated_idat_rejected(self):
        px = np.zeros((4, 4), dtype=np.uint8)
        comp = zlib.compress(_forward_filter(px, [0], 1)[: -3])
        data = _build_png(b"", 4, 4, 0)  # empty IDAT entirely
        with pytest.raises((ValueError, zlib.error)):
            decode_png(data)
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
        data = (
            _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", comp)
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="size"):
            decode_png(data)


@pytest.mark.skipif(
    not pytest.importorskip("importlib").util.find_spec("PIL"),
    reason="pillow absent — cross-codec parity auto-activates with it",
)
class TestPillowParity:
    """If the environment ever gains pillow: our encode must decode
    identically under pillow, and pillow's encode (its own filter
    heuristics) must decode identically under our decoder."""

    def test_cross_codec(self):
        import io

        from PIL import Image

        px = _rng(1).integers(0, 256, size=(32, 17, 3), dtype=np.uint8)
        theirs = np.asarray(Image.open(io.BytesIO(encode_png(px))))
        assert np.array_equal(theirs, px)
        buf = io.BytesIO()
        Image.fromarray(px, mode="RGB").save(buf, format="PNG")
        assert np.array_equal(decode_png(buf.getvalue()), px)
