"""Pure-codec tests for operators/wav.py (no Spark session): the
RIFF/PCM parser must handle real-encoder quirks (unknown chunks, word
alignment), round-trip exactly, and fail loudly on what it cannot
decode."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from omim_spark.operators.wav import decode_wav, encode_wav


def test_roundtrip_mono():
    s = np.array([0, 1, -1, 32767, -32768, 1234], dtype=np.int16)
    out, rate, ch = decode_wav(encode_wav(s, 44100))
    assert rate == 44100 and ch == 1
    assert (out == s).all()


def test_roundtrip_stereo():
    s = np.arange(-6, 6, dtype=np.int16)  # 6 frames x 2 channels
    out, rate, ch = decode_wav(encode_wav(s, 8000, n_channels=2))
    assert rate == 8000 and ch == 2
    assert out.shape == (6, 2)
    assert (out.reshape(-1) == s).all()


def _inject_chunk(wav: bytes, tag: bytes, body: bytes) -> bytes:
    """Insert an extra chunk right after the WAVE id, fixing up the
    RIFF size — the shape LIST/INFO metadata takes in the wild."""
    chunk = tag + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"  # word alignment pad
    out = wav[:12] + chunk + wav[12:]
    return out[:4] + struct.pack("<I", len(out) - 8) + out[8:]


def test_unknown_chunks_skipped():
    s = np.array([7, -7, 7], dtype=np.int16)
    wav = _inject_chunk(encode_wav(s, 16000), b"LIST", b"INFOsoftware")
    out, rate, _ = decode_wav(wav)
    assert rate == 16000
    assert (out == s).all()


def test_odd_size_chunk_alignment():
    s = np.array([42], dtype=np.int16)
    wav = _inject_chunk(encode_wav(s, 8000), b"junk", b"\x01\x02\x03")
    out, _, _ = decode_wav(wav)
    assert (out == s).all()


def test_non_pcm_raises():
    s = np.zeros(4, dtype=np.int16)
    wav = bytearray(encode_wav(s, 8000))
    # fmt chunk starts at offset 20; audio_format is its first u16
    struct.pack_into("<H", wav, 20, 3)  # IEEE float
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(wav))


def test_not_riff_raises():
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + b"\x00" * 40)


def test_truncated_data_raises():
    wav = encode_wav(np.arange(100, dtype=np.int16), 8000)
    with pytest.raises(ValueError):
        decode_wav(wav[:-10])


class TestCodecProperties:
    """Property tests: the codecs must round-trip EVERY input in their
    declared domain, not just the fixtures."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        samples=st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=0,
            max_size=400,
        ),
        rate=st.sampled_from([8000, 16000, 22050, 44100]),
    )
    @settings(max_examples=60, deadline=None)
    def test_wav_roundtrip_any_mono_signal(self, samples, rate):
        s = np.array(samples, dtype=np.int16)
        out, r, ch = decode_wav(encode_wav(s, rate))
        assert r == rate and ch == 1
        assert out.dtype == np.int16
        assert list(out) == samples

    @given(
        frames=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=12),  # h
                st.integers(min_value=1, max_value=12),  # w
                st.integers(min_value=0, max_value=255),  # seed byte
            ),
            min_size=0,
            max_size=6,
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_png_concat_split_any_frame_sequence(self, frames):
        from omim_spark.operators.png import (
            decode_png,
            encode_png,
            split_png_concat,
        )

        mats = [
            ((np.arange(h * w) * 7 + seed) % 256)
            .astype(np.uint8)
            .reshape(h, w)
            for h, w, seed in frames
        ]
        blob = b"".join(encode_png(m) for m in mats)
        parts = split_png_concat(blob)
        assert len(parts) == len(mats)
        for p, m in zip(parts, mats):
            assert (decode_png(p) == m).all()
