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
