"""Deterministic synthetic images derived from the `documents` table.

Every pixel is closed-form arithmetic over (doc_id, x, y), and the
payload is a REAL uncompressed file (PPM/PGM/BMP — public byte
layouts), so the full decode → stats pipeline gets a genuine DuckDB
SQL oracle: the engine parses actual image bytes while the oracle
re-derives the channel means from the construction formula.

Per doc_id:
  w   = 16 + doc_id % 16            (16..31)
  h   = 8 + doc_id % 8              (8..15)
  fmt = ['ppm', 'bmp', 'pgm'][doc_id % 3]
  r[y][x] = (x * 255) // (w - 1)    (horizontal gradient)
  g[y][x] = (y * 255) // (h - 1)    (vertical gradient)
  b[y][x] = x + y                   (< 256 for these sizes)
  pgm: single gray channel = r (decoder replicates to 3 channels)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from dataflow_flex_templates_spark.operators.multimodal import (
    encode_bmp,
    encode_pgm,
    encode_ppm,
)

IMG_FORMATS = ["ppm", "bmp", "pgm"]


def doc_image_np(doc_id: int) -> tuple[np.ndarray, int, int, str]:
    w = 16 + doc_id % 16
    h = 8 + doc_id % 8
    fmt = IMG_FORMATS[doc_id % 3]
    x = np.arange(w)
    y = np.arange(h)
    img = np.empty((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = (x * 255) // (w - 1)
    img[:, :, 1] = ((y * 255) // (h - 1))[:, None]
    img[:, :, 2] = (x[None, :] + y[:, None])
    return img, w, h, fmt


def encode_doc_image(doc_id: int) -> tuple[bytes, str]:
    img, w, h, fmt = doc_image_np(doc_id)
    if fmt == "ppm":
        return encode_ppm(img), fmt
    if fmt == "bmp":
        return encode_bmp(img), fmt
    return encode_pgm(img[:, :, 0]), fmt


def make_doc_images_pdf(doc_ids) -> pd.DataFrame:
    rows = []
    for d in doc_ids:
        d = int(d)
        buf, fmt = encode_doc_image(d)
        rows.append((f"img_{d:06d}", buf, fmt))
    return pd.DataFrame(rows, columns=["media_id", "bytes", "format"])


def make_doc_images_df(spark, docs_df):
    ids = [r["doc_id"] for r in
           docs_df.select("doc_id").orderBy("doc_id").collect()]
    return spark.createDataFrame(
        make_doc_images_pdf(ids),
        "media_id string, bytes binary, format string")


#: SQL fragments shared with the driver oracle (DuckDB `//` = integer
#: division, matching the numpy construction exactly).
IMG_DIMS_SQL = "16 + doc_id % 16"  # w ; h = 8 + doc_id % 8


# ------------------------------------------------------------------
# Document-derived raw videos: concatenated 8-bit grayscale frames,
# every pixel closed-form over (doc_id, frame, x, y) — no value wraps
# (max 56 < 256), so per-frame means and motion are SQL-derivable:
#   w = 8 + doc_id % 8,  h = 4 + doc_id % 4,  n_frames = 4 + doc_id % 5
#   gray[f][y][x] = x + y*f
#   frame mean   = (w-1)/2 + f*(h-1)/2
#   motion(f←f') = (f-f') * (h-1)/2
# ------------------------------------------------------------------

def doc_video_np(doc_id: int) -> tuple[np.ndarray, int, int, int]:
    w = 8 + doc_id % 8
    h = 4 + doc_id % 4
    nf = 4 + doc_id % 5
    x = np.arange(w)[None, None, :]
    y = np.arange(h)[None, :, None]
    f = np.arange(nf)[:, None, None]
    return (x + y * f).astype(np.uint8), w, h, nf


def make_doc_videos_pdf(doc_ids) -> pd.DataFrame:
    rows = []
    for d in doc_ids:
        d = int(d)
        vid, w, h, nf = doc_video_np(d)
        rows.append((f"vid_{d:06d}", vid.tobytes(), w, h, nf))
    return pd.DataFrame(rows, columns=["media_id", "bytes", "width",
                                       "height", "n_frames"])


def make_doc_videos_df(spark, docs_df):
    ids = [r["doc_id"] for r in
           docs_df.select("doc_id").orderBy("doc_id").collect()]
    return spark.createDataFrame(
        make_doc_videos_pdf(ids),
        "media_id string, bytes binary, width int, height int, "
        "n_frames int")
