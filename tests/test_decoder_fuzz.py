"""Fuzz-safety of the three pure-stdlib codecs (png/wav/y4m): on
ARBITRARY bytes every decoder must either return a valid result or
raise its documented error types (ValueError for malformed input,
NotImplementedError at an honest feature boundary, zlib.error from
the stdlib inflater on corrupt PNG streams) — never IndexError /
struct.error / UnboundLocalError / infinite loop.  At 100 TB these
decoders run inside mapInPandas workers over untrusted corpus bytes;
an undocumented exception type means a task failure whose retry can
never succeed, and a hang means a stuck executor core.

Three input families per codec: pure random bytes, random bytes
behind a valid magic (exercises the header parser), and a valid
stream with a random slice corrupted (exercises mid-stream checks).
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from omim_spark.operators.png import decode_png, encode_png
from omim_spark.operators.wav import decode_wav, encode_wav
from omim_spark.operators.y4m import decode_y4m, encode_y4m

_PNG_OK = (ValueError, NotImplementedError, zlib.error)
_WAV_OK = (ValueError, NotImplementedError)
_Y4M_OK = (ValueError, NotImplementedError)


def _valid_png() -> bytes:
    return encode_png(np.arange(48, dtype=np.uint8).reshape(6, 8))


def _valid_wav() -> bytes:
    return encode_wav(
        np.arange(-50, 50, dtype=np.int16), sample_rate=8000, n_channels=1
    )


def _valid_y4m() -> bytes:
    return encode_y4m([bytes(range(32))] * 2, width=8, height=4)


class TestFuzzRandomBytes:
    @settings(max_examples=120, deadline=None)
    @given(st.binary(min_size=0, max_size=300))
    def test_png_random(self, data):
        try:
            decode_png(data)
        except _PNG_OK:
            pass

    @settings(max_examples=120, deadline=None)
    @given(st.binary(min_size=0, max_size=300))
    def test_wav_random(self, data):
        try:
            decode_wav(data)
        except _WAV_OK:
            pass

    @settings(max_examples=120, deadline=None)
    @given(st.binary(min_size=0, max_size=300))
    def test_y4m_random(self, data):
        try:
            decode_y4m(data)
        except _Y4M_OK:
            pass


class TestFuzzBehindMagic:
    @settings(max_examples=120, deadline=None)
    @given(st.binary(min_size=0, max_size=200))
    def test_png_magic(self, tail):
        try:
            decode_png(b"\x89PNG\r\n\x1a\n" + tail)
        except _PNG_OK:
            pass

    @settings(max_examples=120, deadline=None)
    @given(st.binary(min_size=0, max_size=200))
    def test_wav_magic(self, tail):
        try:
            decode_wav(b"RIFF\x24\x00\x00\x00WAVE" + tail)
        except _WAV_OK:
            pass

    @settings(max_examples=120, deadline=None)
    @given(st.binary(min_size=0, max_size=200))
    def test_y4m_magic(self, tail):
        try:
            decode_y4m(b"YUV4MPEG2 " + tail)
        except _Y4M_OK:
            pass


class TestFuzzCorruptedValidStream:
    @settings(max_examples=80, deadline=None)
    @given(st.data())
    def test_png_corrupted(self, data):
        base = bytearray(_valid_png())
        pos = data.draw(st.integers(0, len(base) - 1))
        base[pos] ^= data.draw(st.integers(1, 255))
        try:
            decode_png(bytes(base))
        except _PNG_OK:
            pass

    @settings(max_examples=80, deadline=None)
    @given(st.data())
    def test_wav_corrupted(self, data):
        base = bytearray(_valid_wav())
        pos = data.draw(st.integers(0, len(base) - 1))
        base[pos] ^= data.draw(st.integers(1, 255))
        try:
            decode_wav(bytes(base))
        except _WAV_OK:
            pass

    @settings(max_examples=80, deadline=None)
    @given(st.data())
    def test_y4m_corrupted(self, data):
        base = bytearray(_valid_y4m())
        pos = data.draw(st.integers(0, len(base) - 1))
        base[pos] ^= data.draw(st.integers(1, 255))
        try:
            decode_y4m(bytes(base))
        except _Y4M_OK:
            pass


class TestFuzzDoubleCorruption:
    """Two independent bit-flips: reaches states a single flip can't
    (e.g. a corrupt chunk LENGTH plus a corrupt field behind it — the
    family that exposed the r10 decode_png struct.error hole)."""

    @settings(max_examples=80, deadline=None)
    @given(st.data())
    def test_png_double(self, data):
        base = bytearray(_valid_png())
        for _ in range(2):
            pos = data.draw(st.integers(0, len(base) - 1))
            base[pos] ^= data.draw(st.integers(1, 255))
        try:
            decode_png(bytes(base))
        except _PNG_OK:
            pass

    @settings(max_examples=80, deadline=None)
    @given(st.data())
    def test_wav_double(self, data):
        base = bytearray(_valid_wav())
        for _ in range(2):
            pos = data.draw(st.integers(0, len(base) - 1))
            base[pos] ^= data.draw(st.integers(1, 255))
        try:
            decode_wav(bytes(base))
        except _WAV_OK:
            pass

    @settings(max_examples=80, deadline=None)
    @given(st.data())
    def test_y4m_double(self, data):
        base = bytearray(_valid_y4m())
        for _ in range(2):
            pos = data.draw(st.integers(0, len(base) - 1))
            base[pos] ^= data.draw(st.integers(1, 255))
        try:
            decode_y4m(bytes(base))
        except _Y4M_OK:
            pass


class TestTruncationExhaustive:
    """EVERY prefix of a valid stream (a few hundred cases per codec —
    cheap and deterministic, so no sampling): a mid-stream cut is what
    an interrupted object-store read hands the decoder."""

    def test_png_all_prefixes(self):
        base = _valid_png()
        for cut in range(len(base)):
            try:
                decode_png(base[:cut])
            except _PNG_OK:
                pass

    def test_wav_all_prefixes(self):
        base = _valid_wav()
        for cut in range(len(base)):
            try:
                decode_wav(base[:cut])
            except _WAV_OK:
                pass

    def test_y4m_all_prefixes(self):
        base = _valid_y4m()
        for cut in range(len(base)):
            try:
                decode_y4m(base[:cut])
            except _Y4M_OK:
                pass


def test_png_corrupt_ihdr_length_is_valueerror():
    """Regression pin for the r10 verdict defect: a corrupted IHDR
    chunk-length truncates the 13-byte body slice, which used to
    surface as struct.error (outside the contract).  Build the case
    deterministically instead of hoping a draw finds it."""
    base = bytearray(_valid_png())
    # bytes 8..12 are the IHDR chunk length (big-endian 13); force a
    # huge length so the body slice runs past end-of-stream
    base[8:12] = (2**31 - 1).to_bytes(4, "big")
    with pytest.raises(ValueError):
        decode_png(bytes(base))
    # and a SHORT length: body present but not 13 bytes
    base[8:12] = (5).to_bytes(4, "big")
    with pytest.raises(ValueError):
        decode_png(bytes(base))


def test_error_types_are_the_documented_contract():
    """The allow-lists above ARE the contract: pin one representative
    per documented family so the lists can't silently widen."""
    with pytest.raises(ValueError):
        decode_png(b"notapng")
    with pytest.raises(ValueError):
        decode_wav(b"notawav")
    with pytest.raises(ValueError):
        decode_y4m(b"notay4m")
    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W2 H2 C410\nFRAME\n" + bytes(6))
