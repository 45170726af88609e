"""Duration-bucketed batch assembly for ASR/audio training.

Speech-training pipelines batch variable-length clips and pad every
clip in a batch to the batch's longest clip — padding is pure wasted
GPU time, so loaders sort by duration first ("sorted batching" /
bucketed sampling) and cut fixed-size batches from the sorted order.
This operator does the assignment at corpus scale and reports the
exact padding economics per batch, so a curation run can quantify the
padding-waste reduction before any GPU is involved.

Scale: ONE shuffle, on ``shard`` (= id mod n_shards — deterministic
and engine-independent); the sort is per-shard inside the window, so
no global ordering exists anywhere and shard count is sized to the
cluster (10^5 shards at petabyte scale). Batches never cross shards,
which makes incremental re-packing after new ingest a per-shard job.
All arithmetic is exact integers — a SQL oracle reproduces the
assignment and the waste metric bit-for-bit.

The reference engine has no audio machinery; this is a §2.11
extension motivated by the audio+transcript input shape
(BASELINE.json input_hint), mirroring ``text.pack_chunks`` (the token
budget analogue for text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_clip_batches(df: DataFrame, batch_size: int = 32,
                      n_shards: int = 8, id_col: str = "clip_id",
                      dur_col: str = "dur_ms") -> DataFrame:
    """Assign clips to fixed-count training batches in per-shard
    duration-sorted order; return one row per batch:
    (shard, batch_id, n_clips, max_dur_ms, sum_dur_ms, padded_ms,
    waste_permille) where ``padded_ms = max_dur_ms * n_clips`` is the
    GPU time actually spent and ``waste_permille`` the padding share
    of it. ``id_col`` must be numeric (mod-sharding keeps the oracle
    engine-independent); tie-break inside a shard is (dur, id), so the
    assignment is total-order deterministic.
    """
    shard = (F.col(id_col) % n_shards).alias("shard")
    w = Window.partitionBy("shard").orderBy(dur_col, id_col)
    batch_id = F.floor((F.row_number().over(w) - 1) / batch_size)
    per_clip = (df.select(shard, F.col(id_col), F.col(dur_col))
                .withColumn("batch_id", batch_id))
    agg = (per_clip.groupBy("shard", "batch_id")
           .agg(F.count("*").alias("n_clips"),
                F.max(dur_col).cast("long").alias("max_dur_ms"),
                F.sum(dur_col).cast("long").alias("sum_dur_ms")))
    padded = (F.col("max_dur_ms") * F.col("n_clips")).alias("padded_ms")
    return (agg.withColumn("padded_ms", padded)
            .withColumn(
                "waste_permille",
                F.when(F.col("padded_ms") == 0, F.lit(0).cast("long"))
                 .otherwise(F.expr(
                     "(padded_ms - sum_dur_ms) * 1000L div padded_ms"))))


def segment_clips(df: DataFrame, max_ms: int = 30_000,
                  overlap_ms: int = 1_000, id_col: str = "clip_id",
                  dur_col: str = "dur_ms") -> DataFrame:
    """Split long clips into fixed-length decode windows with overlap
    — the ≤30 s segmentation every ASR encoder (and forced aligner)
    imposes; the overlap preserves words that straddle a cut.

    Pure metadata planning (like multimodal.frame_sample_plan): only
    (id, dur) flow through sequence+explode inside whole-stage codegen
    — zero shuffle, no audio bytes touched; the decode stage later
    slices the payload per planned segment. Segments step by
    ``stride = max_ms - overlap_ms``; the last one ends exactly at the
    clip end (it may be shorter); clips within ``max_ms`` yield one
    whole segment. All integer arithmetic — an identical SQL oracle
    reproduces every boundary.
    """
    if overlap_ms >= max_ms:
        raise ValueError("overlap_ms must be < max_ms")
    stride = max_ms - overlap_ms
    dur = F.col(dur_col)
    n_segs = (F.when(dur <= max_ms, F.lit(1))
              .otherwise(1 + F.ceil((dur - max_ms) / stride))
              .cast("long"))
    seg = F.explode(F.sequence(F.lit(0), n_segs - 1)).alias("seg_idx")
    out = df.select(F.col(id_col), dur.alias("dur_ms_total"), seg)
    start = (F.col("seg_idx") * stride).cast("long")
    end = F.least(start + max_ms, F.col("dur_ms_total")).cast("long")
    return (out.withColumn("start_ms", start)
            .withColumn("end_ms", end)
            .withColumn("seg_ms", (end - start).cast("long")))
