"""Round-trip and malformed-container semantics of the pure-stdlib
Y4M (yuv4mpeg2) codec — operators/y4m.py, the video sibling of
test_wav.py / test_png.py."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from omim_spark.operators.y4m import decode_y4m, encode_y4m


class TestRoundTrip:
    def test_mono_roundtrip(self):
        frames = [bytes(range(32)), bytes(range(32, 64))]
        data = encode_y4m(frames, width=8, height=4, fps=(30, 1))
        hdr, got = decode_y4m(data)
        assert got == frames
        assert hdr == {
            "width": 8,
            "height": 4,
            "fps": (30, 1),
            "colorspace": "mono",
            "frame_size": 32,
        }

    def test_c420_roundtrip(self):
        # 4x2 C420: 4*2*3//2 = 12 bytes per frame (Y 8 + Cb 2 + Cr 2)
        frames = [bytes(12), bytes(range(12))]
        data = encode_y4m(frames, width=4, height=2, colorspace="420")
        hdr, got = decode_y4m(data)
        assert got == frames and hdr["frame_size"] == 12

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(st.integers(0, 255), min_size=32, max_size=32),
        st.integers(1, 4),
    )
    def test_property_roundtrip(self, pixels, n_frames):
        fr = bytes(pixels)
        data = encode_y4m([fr] * n_frames, width=8, height=4)
        _, got = decode_y4m(data)
        assert got == [fr] * n_frames

    @settings(max_examples=40, deadline=None)
    @given(
        st.sampled_from(["mono", "420", "420jpeg", "420paldv", "420mpeg2", "422", "444"]),
        st.integers(1, 8).map(lambda x: x * 2),  # even dims: chroma subsample
        st.integers(1, 6).map(lambda x: x * 2),
        st.integers(0, 3),
        st.randoms(use_true_random=False),
    )
    def test_property_roundtrip_all_colorspaces(
        self, cs, width, height, n_frames, rng
    ):
        # every supported colorspace round-trips at its own
        # frame-size arithmetic (w*h, *3/2, *2, *3), including the
        # zero-frame stream
        num, den = {"mono": (1, 1), "422": (2, 1), "444": (3, 1)}.get(
            cs, (3, 2)
        )
        size = width * height * num // den
        frames = [
            bytes(rng.getrandbits(8) for _ in range(size))
            for _ in range(n_frames)
        ]
        hdr, got = decode_y4m(
            encode_y4m(frames, width=width, height=height, colorspace=cs)
        )
        assert got == frames and hdr["frame_size"] == size

    def test_empty_stream_has_header_no_frames(self):
        hdr, frames = decode_y4m(encode_y4m([], width=2, height=2))
        assert frames == [] and hdr["width"] == 2


class TestRealParserBehaviors:
    def test_frame_params_are_skipped(self):
        # encoders may emit per-frame parameters after FRAME
        data = (
            b"YUV4MPEG2 W2 H2 F25:1 Cmono\n"
            b"FRAME Xsome=param\n" + bytes(4) + b"FRAME\n" + bytes(range(4))
        )
        _, frames = decode_y4m(data)
        assert frames == [bytes(4), bytes(range(4))]

    def test_default_colorspace_is_420(self):
        data = b"YUV4MPEG2 W2 H2 F25:1\n" + b"FRAME\n" + bytes(6)
        hdr, frames = decode_y4m(data)
        assert hdr["colorspace"] == "420" and hdr["frame_size"] == 6
        assert frames == [bytes(6)]

    def test_unknown_header_tags_skipped(self):
        data = b"YUV4MPEG2 W2 H1 F25:1 Ip A128:117 XYSCSS=444 Cmono\n"
        hdr, frames = decode_y4m(data + b"FRAME\n" + b"ab")
        assert hdr["width"] == 2 and frames == [b"ab"]


class TestMalformed:
    def test_bad_magic(self):
        with pytest.raises(ValueError):
            decode_y4m(b"RIFF....WAVE")

    def test_missing_dimensions(self):
        with pytest.raises(ValueError):
            decode_y4m(b"YUV4MPEG2 F25:1 Cmono\nFRAME\nxx")

    def test_truncated_frame(self):
        with pytest.raises(ValueError):
            decode_y4m(b"YUV4MPEG2 W4 H4 Cmono\nFRAME\n" + bytes(7))

    def test_garbage_between_frames(self):
        data = b"YUV4MPEG2 W2 H1 Cmono\nFRAME\nab" + b"JUNK\nxy"
        with pytest.raises(ValueError):
            decode_y4m(data)

    def test_corrupted_frame_marker(self):
        # The spec requires FRAME followed by space or newline; a
        # corrupted marker that merely STARTS with FRAME must raise,
        # not parse as a frame header (r9 ADVICE).
        data = b"YUV4MPEG2 W2 H1 Cmono\nFRAMEXJUNK\nab"
        with pytest.raises(ValueError):
            decode_y4m(data)

    def test_unsupported_colorspace(self):
        with pytest.raises(NotImplementedError):
            decode_y4m(b"YUV4MPEG2 W2 H2 C410\nFRAME\n" + bytes(6))

    def test_malformed_header_token(self):
        with pytest.raises(ValueError):
            decode_y4m(b"YUV4MPEG2 Wtwo H2 Cmono\nFRAME\n" + bytes(4))

    def test_encode_rejects_wrong_frame_size(self):
        with pytest.raises(ValueError):
            encode_y4m([bytes(31)], width=8, height=4)


class TestSparkIntegration:
    def test_sample_video_frames_y4m(self, spark):
        from omim_spark.operators.multimodal import sample_video_frames

        frames = [bytes([i] * 32) for i in range(4)]
        payload = encode_y4m(frames, width=8, height=4)
        media = spark.createDataFrame(
            [(1, "video", payload, "y4m", 8, 4, 4000)],
            "media_id long, modality string, payload binary, "
            "format string, width int, height int, duration_ms long",
        )
        got = (
            sample_video_frames(media, every_ms=1000, container="y4m")
            .orderBy("frame_index")
            .collect()
        )
        assert [bytes(r.frame_bytes) for r in got] == frames
        assert [r.frame_index for r in got] == [0, 1, 2, 3]
