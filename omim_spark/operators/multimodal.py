"""Multimodal column processing: image/audio/video as opaque
``binary`` columns with typed metadata structs.

The Spark-side plumbing is real and tested — schemas, Arrow batch
shapes, mapInPandas partitioning, metadata propagation.  Decoders:

- ``decoder='png'`` — REAL image decode via the pure-Python PNG codec
  (``operators.png``: stdlib zlib + all five scanline filters; 8-bit
  gray/RGB/RGBA), so the image path needs no external library;
- ``decoder='pillow'`` — the fast path when PIL is importable (raises
  NotImplementedError otherwise);
- ``decoder='auto'`` — pillow if available, else the pure-Python PNG
  codec;
- ``decoder='fake'`` — deterministic synthetic pixels derived from the
  payload bytes, for plumbing tests and non-image payloads.

Audio/video decode remains stubbed (no codec libs in the container);
their plumbing (frame sampling, batch shapes) is real.

Scale notes:
- media bytes stay in the executor: mapInPandas streams Arrow batches,
  nothing collects to the driver;
- batch size is bounded by spark.sql.execution.arrow.maxRecordsPerBatch
  — set it low (e.g. 64) for large blobs so a batch fits in memory;
- derived features (small fixed-size arrays) are returned instead of
  decoded media wherever possible, so the shuffle after feature
  extraction carries KB not MB per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real decoder availability, probed once at import
    import PIL  # noqa: F401

    HAS_PILLOW = True
except ImportError:  # container ships no media libs — fake decoder only
    HAS_PILLOW = False

# Canonical multimodal row schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("format", StringType(), True),  # png|wav|mp4|...
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_luma", DoubleType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("frame_png", BinaryType(), True),
    ]
)


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic synthetic decode: pixels derived from the payload
    bytes, repeated/truncated to (height, width).  Stands in for a
    real decoder so batching/schema paths are exercised end to end."""
    if payload is None or width is None or height is None:
        return None
    buf = np.frombuffer(payload, dtype=np.uint8)
    n = int(width) * int(height)
    if len(buf) == 0:
        buf = np.zeros(1, dtype=np.uint8)
    return np.resize(buf, n).reshape(int(height), int(width))


def _decode(payload, width, height, decoder: str):
    if decoder == "fake":
        return _fake_decode(payload, width, height)
    if payload is None:
        return None
    if decoder == "auto":
        decoder = "pillow" if HAS_PILLOW else "png"
    if decoder == "png":
        from .png import decode_png, luma

        return luma(decode_png(bytes(payload)))
    if decoder == "pillow":
        try:
            import io

            from PIL import Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - lib not in container
            raise NotImplementedError(
                "pillow decoder requires PIL; install pillow or use decoder='png'"
            ) from e
        img = Image.open(io.BytesIO(payload)).convert("L")  # pragma: no cover
        return np.asarray(img)  # pragma: no cover
    raise NotImplementedError(f"unknown decoder: {decoder}")


def extract_image_features(
    media: DataFrame, n_features: int = 16, decoder: str = "fake"
) -> DataFrame:
    """Decode each image and emit fixed-size luminance-histogram
    features via mapInPandas (Arrow-batched; media bytes never leave
    the executor)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                px = _decode(row["payload"], row["width"], row["height"], decoder)
                if px is None:
                    out.append((row["media_id"], row["width"], row["height"], None, None))
                    continue
                hist, _ = np.histogram(px, bins=n_features, range=(0, 255))
                total = max(int(hist.sum()), 1)
                out.append(
                    (
                        int(row["media_id"]),
                        int(px.shape[1]),
                        int(px.shape[0]),
                        float(px.mean()),
                        [float(h) / total for h in hist],
                    )
                )
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "mean_luma", "features"]
            )

    return media.filter(F.col("modality") == "image").mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )


def resize_images(
    media: DataFrame, out_width: int, out_height: int, decoder: str = "fake"
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-emit payload bytes
    (schema unchanged, width/height updated)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                px = _decode(row["payload"], row["width"], row["height"], decoder)
                if px is None:
                    rows.append(row)
                    continue
                ys = (np.arange(out_height) * px.shape[0] // out_height).clip(
                    0, px.shape[0] - 1
                )
                xs = (np.arange(out_width) * px.shape[1] // out_width).clip(
                    0, px.shape[1] - 1
                )
                resized = px[np.ix_(ys, xs)]
                row = row.copy()
                row["payload"] = resized.tobytes()
                row["width"], row["height"] = out_width, out_height
                rows.append(row)
            yield pd.DataFrame(rows, columns=pdf.columns)

    return media.mapInPandas(run, media.schema)


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, decoder: str = "fake"
) -> DataFrame:
    """Video → one row per sampled frame (frame decode stubbed: frame
    bytes are deterministic slices of the payload).  The explode
    happens executor-side inside the Arrow batch, so a 2-hour video
    never materializes as one giant row downstream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                if row["payload"] is None or row["duration_ms"] is None:
                    continue
                n_frames = max(int(row["duration_ms"]) // every_ms, 1)
                payload = bytes(row["payload"])
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    out.append(
                        (
                            int(row["media_id"]),
                            i,
                            payload[i * step : (i + 1) * step] or b"\x00",
                        )
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_index", "frame_png"])

    return media.filter(F.col("modality") == "video").mapInPandas(
        run, FRAME_SAMPLE_SCHEMA
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-expression metadata rollup (no decode): per modality ×
    format, count / payload bytes / avg duration."""
    return (
        media.groupBy("modality", "format")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.avg("duration_ms").alias("avg_duration_ms"),
        )
        .orderBy("modality", "format")
    )
