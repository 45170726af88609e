"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The audio path is REAL (functions/audio.py decodes PCM in this
container). The image path is now REAL for the uncompressed public
container formats — PPM (P6), PGM (P5), and 24-bit BI_RGB BMP are
fully specified byte layouts decodable with numpy alone
(:func:`decode_image_np`), plus nearest-neighbour resize and per-
channel statistics, all in one Arrow pass. Compressed codecs
(JPEG/PNG-class) still need external libraries that are not installed
here, so those fall back to the clearly-labeled deterministic stub
behind the same Spark plumbing — on a real cluster
:func:`register_codec` plugs a PIL/libjpeg decoder into
:func:`image_stats` / :func:`extract_media_features` (one line, see
the registry docs; contract-tested with an injected fake decoder) and
nothing else changes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------- codecs
# Public byte layouts (netpbm spec; Windows BMP spec). Encoders exist
# so the deterministic test fixtures produce REAL files; decoders are
# the production kernels.


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6, maxval 255)."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def encode_pgm(gray: np.ndarray) -> bytes:
    """(h, w) uint8 → binary PGM (P5, maxval 255)."""
    h, w = gray.shape
    return b"P5\n%d %d\n255\n" % (w, h) + gray.astype(np.uint8).tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BI_RGB BMP
    (BGR pixel order, bottom-up rows, rows padded to 4 bytes)."""
    import struct

    h, w, _ = img.shape
    row_size = (w * 3 + 3) & ~3
    data_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                       2835, 2835, 0, 0)
    body = bytearray()
    bgr = img[:, :, ::-1].astype(np.uint8)
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):      # bottom-up
        body += bgr[y].tobytes() + pad
    return header + info + bytes(body)


#: Pluggable compressed-codec registry — THE swap point for JPEG/PNG
#: on a cluster with codec libs installed. Each entry maps a lowercase
#: format name to ``fn(buf: bytes) -> (h, w, 3) uint8 RGB ndarray``::
#:
#:     from PIL import Image
#:     register_codec("jpeg", lambda b: np.asarray(
#:         Image.open(io.BytesIO(b)).convert("RGB")))
#:
#: Nothing is pre-registered in this sandbox (no PIL/libjpeg).
#: IMPORTANT: registration must happen on the DRIVER before building
#: the plan — image_stats/extract_media_features snapshot the registry
#: into their mapInPandas closure so it ships to Python workers (a
#: module global alone would be empty in the worker processes).
_CODECS: dict = {}


def register_codec(fmt: str, fn) -> None:
    _CODECS[fmt.lower()] = fn


def unregister_codec(fmt: str) -> None:
    _CODECS.pop(fmt.lower(), None)


def decode_image_np(buf: bytes, fmt: str,
                    codecs: dict | None = None) -> np.ndarray:
    """Decode an image payload → (h, w, 3) uint8 RGB.

    Real decoders for ppm/pgm/bmp (grayscale is replicated across
    channels); ``codecs`` (a registry snapshot) supplies compressed
    decoders; raises ValueError for anything else — unknown formats
    route to the stub fallback in extract_media_features."""
    import struct

    if not buf:
        raise ValueError("empty media payload")
    fmt = (fmt or "").lower()
    reg = _CODECS if codecs is None else codecs
    if fmt in reg:
        img = np.asarray(reg[fmt](buf))
        if img.ndim == 2:
            img = np.repeat(img[:, :, None], 3, axis=2)
        return img.astype(np.uint8, copy=False)
    if fmt in ("ppm", "pgm"):
        magic_want = b"P6" if fmt == "ppm" else b"P5"
        # header: magic, whitespace-separated w, h, maxval, single ws
        pos = 0

        def token():
            nonlocal pos
            while buf[pos:pos + 1].isspace():
                pos += 1
            start = pos
            while pos < len(buf) and not buf[pos:pos + 1].isspace():
                pos += 1
            return buf[start:pos]

        magic = token()
        if magic != magic_want:
            raise ValueError(f"bad magic {magic!r} for {fmt}")
        w, h, maxval = int(token()), int(token()), int(token())
        if maxval != 255:
            raise ValueError("only maxval 255 supported")
        pos += 1                         # single whitespace after maxval
        ch = 3 if fmt == "ppm" else 1
        arr = np.frombuffer(buf, dtype=np.uint8, count=w * h * ch,
                            offset=pos).reshape(h, w, ch)
        return np.repeat(arr, 3, axis=2) if ch == 1 else arr.copy()
    if fmt == "bmp":
        if buf[:2] != b"BM":
            raise ValueError("bad BMP magic")
        data_off = struct.unpack_from("<I", buf, 10)[0]
        hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
        planes, bpp, compression = struct.unpack_from("<HHI", buf, 26)
        if bpp != 24 or compression != 0:
            raise ValueError("only 24-bit BI_RGB BMP supported")
        row_size = (w * 3 + 3) & ~3
        out = np.empty((abs(h), w, 3), dtype=np.uint8)
        flip = h > 0                     # positive height = bottom-up
        for i in range(abs(h)):
            row = np.frombuffer(buf, np.uint8, w * 3,
                                data_off + i * row_size).reshape(w, 3)
            out[abs(h) - 1 - i if flip else i] = row[:, ::-1]  # BGR→RGB
        return out
    raise ValueError(f"no uncompressed decoder for format {fmt!r}")


def resize_nearest_np(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour resize (source index = floor(i*in/out)) —
    deterministic integer index math, so the resized statistics remain
    SQL-derivable for the oracle."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys[:, None], xs[None, :]]

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
    codecs = dict(_CODECS)  # driver-side snapshot, shipped in closure

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
                    # real decoders first (ppm/pgm/bmp + registered
                    # compressed codecs); unknown formats fall back to
                    # the labeled stub
                    try:
                        img = decode_image_np(buf, fmt, codecs)
                        ih, iw = img.shape[:2]
                        m = img.reshape(-1, 3).mean(axis=0,
                                                    dtype=np.float64)
                        feats.append([float(m[0]), float(m[1]),
                                      float(m[2]), float(img.std()),
                                      float(iw * ih), float(iw),
                                      float(ih), float(img[0, 0, 0])])
                    except ValueError:
                        feats.append(
                            _decode_image_stub(buf, fmt, w, h).tolist())
                except Exception:
                    feats.append(None)
            yield pd.DataFrame({"media_id": pdf["media_id"].values,
                                "format": pdf["format"].values,
                                "n_bytes": sizes, "feat": feats})

    return df.mapInPandas(fn, schema=FEATURES_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
])


def image_stats(df: DataFrame, resize_to: tuple[int, int] | None = None
                ) -> DataFrame:
    """REAL image decode (+ optional nearest resize) → per-channel
    means, one Arrow pass per partition. Input columns: (media_id,
    bytes, format). Bad/unsupported payloads yield null means rather
    than failing the task (poison-row tolerance at scale)."""
    codecs = dict(_CODECS)  # driver-side snapshot, shipped in closure

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf, fmt in zip(pdf["media_id"], pdf["bytes"],
                                     pdf["format"]):
                try:
                    img = decode_image_np(buf, fmt, codecs)
                    if resize_to is not None:
                        img = resize_nearest_np(img, *resize_to)
                    h, w = img.shape[:2]
                    m = img.reshape(-1, 3).mean(axis=0, dtype=np.float64)
                    rows.append((mid, fmt, w, h,
                                 float(m[0]), float(m[1]), float(m[2])))
                except Exception:
                    rows.append((mid, fmt, None, None, None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_STATS_SCHEMA.fields])

    return df.mapInPandas(fn, schema=IMAGE_STATS_SCHEMA)


VIDEO_FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("mean_v", T.DoubleType()),
    T.StructField("motion", T.DoubleType()),
])


def decode_video_frame_np(buf: bytes, w: int, h: int, frame: int
                          ) -> np.ndarray:
    """REAL raw-video frame extraction: the payload is concatenated
    8-bit grayscale frames (the 'rawvideo' layout), so frame k lives at
    byte offset k*w*h — pure offset math, no codec."""
    off = frame * w * h
    if off + w * h > len(buf):
        raise ValueError(f"frame {frame} beyond payload "
                         f"({len(buf)} bytes, {w}x{h})")
    return np.frombuffer(buf, np.uint8, w * h, off).reshape(h, w)


def video_frame_stats(df: DataFrame, every_n: int = 1) -> DataFrame:
    """Frame-sampled video statistics in one Arrow pass: decode every
    ``every_n``-th frame (offset math over the rawvideo layout), emit
    per sampled frame its mean value and the motion metric (mean
    absolute difference vs the previously SAMPLED frame; first sample
    → 0). Input columns: (media_id, bytes, width, height, n_frames).

    The production shape for compressed video swaps the offset-math
    decode for an ffmpeg seek at the same per-frame granularity;
    everything else — sampling plan, Arrow batching, stats — is
    unchanged."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf, w, h, nf in zip(
                    pdf["media_id"], pdf["bytes"], pdf["width"],
                    pdf["height"], pdf["n_frames"]):
                try:
                    w, h, nf = int(w), int(h), int(nf)
                    prev = None
                    for k in range(0, nf, max(every_n, 1)):
                        fr = decode_video_frame_np(buf, w, h, k)
                        mean_v = float(fr.mean(dtype=np.float64))
                        motion = (0.0 if prev is None else float(
                            np.abs(fr.astype(np.int16)
                                   - prev.astype(np.int16))
                            .mean(dtype=np.float64)))
                        rows.append((mid, k, mean_v, motion))
                        prev = fr
                except Exception:
                    rows.append((mid, -1, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              VIDEO_FRAME_SCHEMA.fields])

    return df.mapInPandas(fn, schema=VIDEO_FRAME_SCHEMA)


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
