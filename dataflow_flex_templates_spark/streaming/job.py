"""The continuous clip→graph pipeline (the north_rule's flagship job).

Re-expresses the reference's whole run loop (GcpToNeo4j.run:164-295) as
ONE Structured Streaming query over the clip table:

  readStream(parquet/iceberg clip table)
    → withWatermark(event_time)
    → foreachBatch:
        decode audio (vectorized pandas UDF) + normalize transcript
        per-target plans (the same batch compiler — apply_target)
        nodes MERGE-committed BEFORE edges (D2 ordering) into
        ExactlyOnceTables, batchId-idempotent (exactly-once), with
        per-partition lineage in each commit record

MERGE last-writer-wins is event-time-dominant: the sink order key is
unix_micros(event_time) (ties → arrival ordinal), so replays and
parallelism changes produce identical committed rows — the correctness
contract (BASELINE.json north_rule). Cross-batch dedup happens at
MERGE-on-read; in-stream state dedup (dedup_state.lww_dedup_stream) can
be composed upstream to cut sink traffic when duplicates are frequent.

Skew (hot codec/sr_hz) is handled by salted repartition before the
decode UDF: partitioning on (codec, pmod(hash(clip_id), salt)) spreads
the 80%-pcm_s16le mass over `salt` tasks while keeping batches
codec-coherent for the Arrow kernels (SURVEY §2.10).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataflow_flex_templates_spark.functions.audio import (
    normalize_transcript,
    with_audio_features,
)
from dataflow_flex_templates_spark.streaming.sink import ExactlyOnceTable
from dataflow_flex_templates_spark.testing.clips import clips_spark_schema

SEQ_COL = "__seq__"


@dataclass
class ClipGraphJob:
    """Configuration for the streaming clip→graph job."""

    input_dir: str
    output_dir: str
    checkpoint_dir: str
    watermark: str = "60 seconds"
    max_files_per_trigger: int = 4
    salt_buckets: int = 32
    decode_audio: bool = True

    nodes_table: ExactlyOnceTable = dc_field(init=False)
    codec_nodes_table: ExactlyOnceTable = dc_field(init=False)
    edges_table: ExactlyOnceTable = dc_field(init=False)

    def __post_init__(self):
        self.nodes_table = ExactlyOnceTable(
            os.path.join(self.output_dir, "nodes_clip"),
            key_cols=["clip_id"], order_col=SEQ_COL)
        self.codec_nodes_table = ExactlyOnceTable(
            os.path.join(self.output_dir, "nodes_codec"),
            key_cols=["codec"], order_col=SEQ_COL)
        self.edges_table = ExactlyOnceTable(
            os.path.join(self.output_dir, "edges_encoded_as"),
            key_cols=["clip_id", "codec"], order_col=SEQ_COL)

    # -- per-micro-batch transform (pure DataFrame; unit-testable) --------

    def prepare_batch(self, batch_df: DataFrame) -> DataFrame:
        """Salt + decode + normalize — the expensive one-pass prefix
        shared by every target (the reference's shared-source reuse,
        GcpToNeo4j.java:197-202). Callers persist() the result before
        fanning out so the pandas-UDF decode runs exactly once."""
        df = batch_df
        if self.salt_buckets > 1:
            # Salted repartition: hot codec keys spread across buckets.
            df = df.repartition(
                self.salt_buckets,
                F.col("codec"),
                F.pmod(F.xxhash64("clip_id"), F.lit(self.salt_buckets)),
            )
        if self.decode_audio:
            df = with_audio_features(df)
        else:
            df = (df.withColumn("n_samples", F.lit(None).cast("long"))
                    .withColumn("rms", F.lit(None).cast("double"))
                    .withColumn("peak", F.lit(None).cast("double"))
                    .withColumn("zcr", F.lit(None).cast("double")))
        df = df.withColumn("transcript_norm",
                           normalize_transcript(F.col("transcript")))
        # The raw payload is consumed by the decode — nothing downstream
        # needs it. Dropping it here keeps the persisted frame (and any
        # shuffle of it) ~25x smaller: features are a few doubles vs
        # tens-of-KB PCM per row.
        df = df.drop("bytes")
        return df.withColumn(SEQ_COL, F.unix_micros(F.col("event_time")))

    def build_relations(self, df: DataFrame) -> dict[str, DataFrame]:
        """Prepared frame → the three graph relations (cheap plans)."""
        clip_nodes = df.select(
            "clip_id", "sr_hz", "dur_ms", "codec",
            "n_samples", "rms", "peak", "zcr",
            "transcript_norm", "event_time", SEQ_COL,
        )
        codec_nodes = (df.groupBy("codec")
                       .agg(F.max(SEQ_COL).alias(SEQ_COL),
                            F.count("*").alias("clips_in_batch")))
        edges = df.select(
            "clip_id", "codec",
            F.lit("ENCODED_AS").alias("rel_type"),
            "event_time", SEQ_COL,
        )
        return {"clip_nodes": clip_nodes, "codec_nodes": codec_nodes,
                "edges": edges}

    def transform_batch(self, batch_df: DataFrame) -> dict[str, DataFrame]:
        """Decode + normalize + build the three graph relations
        (un-persisted convenience for tests; the sink path persists)."""
        return self.build_relations(self.prepare_batch(batch_df))

    # -- sink --------------------------------------------------------------

    def _write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if (self.nodes_table.is_committed(batch_id)
                and self.codec_nodes_table.is_committed(batch_id)
                and self.edges_table.is_committed(batch_id)):
            return  # replay after restart — exactly-once skip
        # One decode pass feeds all three targets and their lineage
        # counts — persist the prepared frame so the pandas-UDF decode
        # runs exactly once per micro-batch.
        prepared = self.prepare_batch(batch_df).persist()
        try:
            rels = self.build_relations(prepared)
            # D2: nodes before edges, inside the same micro-batch.
            self.nodes_table.write_batch(rels["clip_nodes"], batch_id)
            self.codec_nodes_table.write_batch(rels["codec_nodes"], batch_id)
            self.edges_table.write_batch(rels["edges"], batch_id)
        finally:
            prepared.unpersist()

    # -- query lifecycle ----------------------------------------------------

    def read_stream(self, spark: SparkSession) -> DataFrame:
        return (spark.readStream
                .schema(clips_spark_schema())
                .option("maxFilesPerTrigger", self.max_files_per_trigger)
                .parquet(self.input_dir)
                .withWatermark("event_time", self.watermark))

    def start(self, spark: SparkSession, available_now: bool = True):
        stream = self.read_stream(spark)
        writer = (stream.writeStream
                  .foreachBatch(self._write_batch)
                  .option("checkpointLocation", self.checkpoint_dir)
                  .queryName("clip_graph"))
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_to_completion(self, spark: SparkSession, timeout_s: int = 600):
        q = self.start(spark, available_now=True)
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
        return q
