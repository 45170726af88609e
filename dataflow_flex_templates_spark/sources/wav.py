"""WAV/RIFF ingest source: a directory of .wav files → clip-table rows.

The reference's sources are text/inline/metadata (SURVEY §2.1); raw
container ingest is how an audio corpus actually enters the clip table
(BASELINE input_hint shape), so this is a first-class extension source.

Spark-first shape:
- `spark.read.format("binaryFile")` does the distributed file listing
  and byte loading (one task per file group, no driver-side IO).
- Header parsing + downmix runs in `mapInPandas` over the in-memory
  bytes — one Arrow batch in, one out, no per-row Python UDF.
- Poison files (truncated/malformed containers) degrade to ok=false
  rows instead of failing the task — the engine-wide convention.

At 100 TB the scan parallelism is the file count; binaryFile splits
listing across executors and prunes on path/modificationTime, and the
parse stage is embarrassingly parallel. A production variant points
the same parser at an object-store manifest instead of a glob; nothing
else changes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WAV_ROW_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("sr_hz", T.IntegerType()),
    T.StructField("dur_ms", T.IntegerType()),
    T.StructField("codec", T.StringType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("sum_abs", T.LongType()),
    T.StructField("ok", T.BooleanType()),
])


def _parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from dataflow_flex_templates_spark.testing.wavio import parse_wav_bytes

    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            name = path.rsplit("/", 1)[-1]
            clip_id = name[:-4] if name.endswith(".wav") else name
            try:
                parsed = parse_wav_bytes(bytes(content))
                pcm = parsed["pcm"]
                sr = parsed["sr_hz"]
                rows.append((
                    clip_id, pcm.astype("<i2").tobytes(), sr,
                    int(round(parsed["n_frames"] * 1000.0 / sr)),
                    "pcm_s16le", parsed["n_channels"],
                    parsed["n_frames"],
                    int(np.abs(pcm.astype(np.int64)).sum()), True))
            except Exception:
                rows.append((clip_id, None, None, None, None,
                             None, None, None, False))
        yield pd.DataFrame(rows, columns=[f.name for f in WAV_ROW_SCHEMA])


def read_wav_dir(spark: SparkSession, path: str) -> DataFrame:
    """Ingest `path/*.wav` as clip-table rows (mono pcm_s16le payloads;
    stereo downmixed by exact integer mean in the parser). Malformed
    containers become ok=false rows with null payloads."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.wav")
             .load(path)
             .select("path", "content"))
    return files.mapInPandas(_parse_batch, schema=WAV_ROW_SCHEMA)
