"""Minimal pure-stdlib WAV (RIFF/PCM) codec — the real audio-decode
kernel behind ``operators.multimodal``'s ``decoder='wav'`` path, the
audio sibling of ``operators.png`` (round 7's image codec).  No
external media library: struct for the container, numpy for samples.

Scope (deliberately minimal, loudly enforced): canonical RIFF/WAVE
with a PCM ``fmt `` chunk, 16-bit signed little-endian samples, any
channel count / sample rate.  The chunk walk skips unknown chunks
(LIST/INFO/fact...) like a real parser must, so WAVs produced by
common encoders decode, not just our own round-trips.

Scale: the codec runs inside mapInPandas workers on executor-local
Arrow batches; per-clip cost is O(bytes) with the sample conversion a
single ``np.frombuffer`` view — nothing touches the driver or adds a
shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM = 1


def encode_wav(
    samples: np.ndarray, sample_rate: int = 8000, n_channels: int = 1
) -> bytes:
    """int16 samples (interleaved if multi-channel) → canonical
    RIFF/WAVE bytes (fmt + data, PCM 16-bit LE)."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim != 1:
        s = s.reshape(-1)
    data = s.tobytes()
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", _PCM, n_channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int, int]:
    """RIFF/WAVE bytes → (int16 sample array [n_frames, n_channels]
    squeezed to 1-D when mono, sample_rate, n_channels).  Walks the
    chunk list, skipping non-fmt/data chunks; raises ValueError on a
    malformed container, NotImplementedError on non-PCM-16."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != _PCM or bits != 16:
        raise NotImplementedError(
            f"only PCM 16-bit supported (format={audio_format}, bits={bits})"
        )
    # A zero channel count / sample rate is a malformed container, not a
    # feature gap — reject it up front (ValueError per the contract)
    # rather than letting the truncation arithmetic divide by zero.
    if n_channels < 1 or sample_rate < 1:
        raise ValueError(
            f"malformed fmt chunk (channels={n_channels}, rate={sample_rate})"
        )
    samples = np.frombuffer(pcm[: (len(pcm) // (2 * n_channels)) * 2 * n_channels],
                            dtype="<i2")
    if n_channels > 1:
        samples = samples.reshape(-1, n_channels)
    return samples, sample_rate, n_channels
