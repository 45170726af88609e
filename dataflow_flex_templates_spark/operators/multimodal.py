"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The audio path is REAL (functions/audio.py decodes PCM in this
container). Image/video decode needs external codec libraries that are
not installed here, so those kernels are deterministic STUBS behind the
same Spark plumbing — schema, partitioning, mapInPandas batch shape,
and Arrow transfer are all production-shaped; swap `_decode_image_stub`
for a PIL/ffmpeg call on a real cluster and nothing else changes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("format", T.StringType()),      # e.g. jpeg/png (stub)
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("format", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("feat", T.ArrayType(T.FloatType())),
])


def _decode_image_stub(buf: bytes, fmt: str, width: int, height: int) -> np.ndarray:
    """STUB decode: no image codecs in this container.

    Deterministic fake: derives an 8-dim feature from byte statistics
    so tests are repeatable. Replace with e.g.::

        from PIL import Image; arr = np.asarray(Image.open(io.BytesIO(buf)))

    on a cluster with codecs installed. Raises on empty payloads the
    way a real decoder would."""
    if not buf:
        raise ValueError("empty media payload")
    a = np.frombuffer(buf, dtype=np.uint8).astype(np.float32)
    return np.array([
        a.mean(), a.std(), a.min(), a.max(),
        float(len(a)), float(width or 0), float(height or 0),
        float(a[: 16].sum()),
    ], dtype=np.float32)


def extract_media_features(df: DataFrame,
                           batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Arrow-batched: each partition streams pandas batches through the
    decode kernel; bad rows are skipped (null feat) rather than failing
    the task — at 10^12-row scale a poison payload must not kill the
    stage."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes = [], []
            widths = (pdf["width"] if "width" in pdf
                      else pd.Series([None] * len(pdf)))
            heights = (pdf["height"] if "height" in pdf
                       else pd.Series([None] * len(pdf)))
            # column zip, not iterrows(): per-row Series construction
            # costs more than the stub kernel itself
            for buf, fmt, w, h in zip(pdf["bytes"], pdf["format"],
                                      widths, heights):
                sizes.append(len(buf) if buf is not None else 0)
                try:
                    feats.append(
                        _decode_image_stub(buf, fmt, w, h).tolist())
                except Exception:
                    feats.append(None)
            yield pd.DataFrame({"media_id": pdf["media_id"].values,
                                "format": pdf["format"].values,
                                "n_bytes": sizes, "feat": feats})

    return df.mapInPandas(fn, schema=FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: computes the frame indices to decode
    per clip from metadata only (no codec needed) — the cheap pre-pass
    that bounds decode work before the expensive kernel runs."""
    return df.select(
        "media_id",
        F.sequence(
            F.lit(0),
            F.greatest((F.col("dur_ms") / every_ms).cast("int") - 1, F.lit(0)),
        ).alias("frame_idx"),
    ).withColumn("n_frames", F.size("frame_idx"))
