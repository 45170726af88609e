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

Skew (hot codec/sr_hz): per-row PCM decode needs no co-location, so the
default hot path does NOT shuffle the payload at all — input splits
decode in place and hot codec values are irrelevant to row-local work.
Keyed operations handle skew where keys actually exist: per-codec
rollups collapse map-side before any exchange, clip_id state hashes
uniformly, and `salt_buckets` remains available to spread a skewed
FILE layout (e.g. one giant file per hot codec) across tasks
(SURVEY §2.10).
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

#: Codecs whose per-byte decode cost is high enough that spreading a
#: starved scan pays for shuffling the payload. Measured break-even
#: (BASELINE.md "Skew", bench `salt_recovery_hotfile`): LUT codecs
#: (ulaw/alaw) and raw PCM are DRAM-bound — salting a cheap-codec
#: hotfile measured 0.675x (the payload shuffle costs MORE than the
#: starved decode it relieves). Only the sequential-prediction ADPCM
#: decode (~4 bits in → 16 bits out through a per-sample state machine)
#: is compute-bound enough to clear the break-even.
EXPENSIVE_CODECS = frozenset({"adpcm_ima"})


@dataclass
class ClipGraphJob:
    """Configuration for the streaming clip→graph job."""

    input_dir: str
    output_dir: str
    checkpoint_dir: str
    watermark: str = "60 seconds"
    max_files_per_trigger: int = 4
    #: Salted repartition bucket count for the pre-decode shuffle.
    #: DEFAULT 0 = no shuffle: per-row PCM decode is embarrassingly
    #: parallel (no co-location needed), and shuffling the raw payload
    #: costs 2x its size in memory/disk traffic — the dominant cost at
    #: scale. Keyed skew is handled where keys actually matter: the
    #: codec groupBy collapses map-side (partial agg → ≤|codecs| rows
    #: per task before the exchange), and clip_id state ops hash a
    #: uniform key. Set >1 only when upstream file layout itself is
    #: skewed (e.g. one giant file per hot codec) to spread the scan.
    #: ``"auto"`` measures instead of guessing: on the FIRST micro-batch
    #: it salts (to the core count) only when BOTH break-even conditions
    #: from the measured skew study hold — the scan is layout-starved
    #: (fewer input files than cores) AND the codec mix is
    #: expensive-per-byte (≥ ``auto_expensive_frac`` of rows in
    #: EXPENSIVE_CODECS). The decision is cached for the query's
    #: lifetime, so steady state pays zero extra jobs.
    salt_buckets: int | str = 0
    #: "auto" threshold: row fraction in EXPENSIVE_CODECS above which
    #: the batch counts as compute-bound. ADPCM decodes ~5-10x slower
    #: per byte than the LUT/PCM paths, so at >=25% of rows it already
    #: dominates wall-clock and a starved scan serializes it.
    auto_expensive_frac: float = 0.25
    decode_audio: bool = True

    nodes_table: ExactlyOnceTable = dc_field(init=False)
    edges_table: ExactlyOnceTable = dc_field(init=False)

    def __post_init__(self):
        if isinstance(self.salt_buckets, str) and self.salt_buckets != "auto":
            raise ValueError(
                f"salt_buckets must be an int or 'auto', "
                f"got {self.salt_buckets!r}")
        #: cached "auto" decision (bucket count; 0 = don't salt).
        #: None = not yet decided.
        self._auto_salt: int | None = None
        self.nodes_table = ExactlyOnceTable(
            os.path.join(self.output_dir, "nodes_clip"),
            key_cols=["clip_id"], order_col=SEQ_COL)
        self.edges_table = ExactlyOnceTable(
            os.path.join(self.output_dir, "edges_encoded_as"),
            key_cols=["clip_id", "codec"], order_col=SEQ_COL)

    def _decide_auto_salt(self, batch_df: DataFrame) -> int:
        """Measure the two break-even conditions ONCE (at the first
        trigger) against the input table and cache the verdict
        (BASELINE.md "Skew" derived this rule from bench data, not
        doctrine):

        1. *Scan starved*: fewer input files than cores. File count is
           the conservative split estimate — parquet only splits at
           row-group boundaries, so the pathological layouts this knob
           exists for (one writer file per hot partition value, giant
           row groups) show up as a tiny file count regardless of
           ``maxPartitionBytes``.
        2. *Expensive decode*: ≥ ``auto_expensive_frac`` of rows carry
           an EXPENSIVE_CODECS codec. Costs one columnar codec-only
           scan of the (few, by precondition 1) input files; nothing
           afterwards.

        Salting helps only when BOTH hold: a starved scan of a cheap
        codec is bounded by the scan itself (the shuffle just adds
        payload traffic — measured 0.675x), and an expensive mix over a
        healthy layout already decodes in place on every core.
        """
        spark = batch_df.sparkSession
        cores = spark.sparkContext.defaultParallelism
        # Layout starvation is a property of the INPUT TABLE, not of
        # one micro-batch — and micro-batch DataFrames report no
        # inputFiles() at all (measured: always []), so the decision
        # reads the table's file list via a batch-path metadata probe.
        try:
            files = spark.read.parquet(self.input_dir).inputFiles()
        except Exception:  # unreadable/non-parquet input: don't salt
            return 0
        if not files or len(files) >= cores:
            return 0
        # Codec distribution via a FRESH pruned batch read, NOT an
        # aggregate over the micro-batch plan: the streaming batch
        # relation does not column-prune, so grouping it re-reads the
        # full payload (measured ~2.4 s/GiB on the hotfile fixture) —
        # a codec-only parquet scan reads just that column's pages.
        # Bounded by the starvation precondition: we only get here
        # with fewer files than cores.
        counts = dict(spark.read.parquet(*files).select("codec")
                      .groupBy("codec").count().collect())
        total = sum(counts.values())
        if total == 0:
            return 0
        hot = sum(n for c, n in counts.items() if c in EXPENSIVE_CODECS)
        return cores if hot / total >= self.auto_expensive_frac else 0

    def _effective_salt_buckets(self, batch_df: DataFrame) -> int:
        if self.salt_buckets != "auto":
            return int(self.salt_buckets)
        if self._auto_salt is None:
            self._auto_salt = self._decide_auto_salt(batch_df)
        return self._auto_salt

    # -- per-micro-batch transform (pure DataFrame; unit-testable) --------

    def prepare_batch(self, batch_df: DataFrame) -> DataFrame:
        """(Optional salt +) decode + normalize — the expensive one-pass
        prefix shared by every target (the reference's shared-source
        reuse, GcpToNeo4j.java:197-202). The sink keeps the decode to a
        single plan branch; callers fanning out to several derived
        frames should persist() the result."""
        df = batch_df
        buckets = self._effective_salt_buckets(batch_df)
        if buckets > 1:
            # Salted repartition: hot codec keys spread across buckets.
            df = df.repartition(
                buckets,
                F.col("codec"),
                F.pmod(F.xxhash64("clip_id"), F.lit(buckets)),
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

    def read_codec_stats(self, spark: SparkSession) -> DataFrame:
        """Per-codec rollup derived from the committed edges at read
        time (count + latest seq per codec). Kept out of the per-batch
        hot path so every trigger stays a map-only job."""
        return (self.edges_table.read_appends(spark)
                .groupBy("codec")
                .agg(F.count("*").alias("n_clips"),
                     F.max(SEQ_COL).alias(SEQ_COL)))

    def build_relations(self, df: DataFrame) -> dict[str, DataFrame]:
        """Prepared frame → the graph relations (cheap plans)."""
        clip_nodes = df.select(
            "clip_id", "sr_hz", "dur_ms", "codec",
            "n_samples", "rms", "peak", "zcr",
            "transcript_norm", "event_time", SEQ_COL,
        )
        edges = df.select(
            "clip_id", "codec",
            F.lit("ENCODED_AS").alias("rel_type"),
            "event_time", SEQ_COL,
        )
        return {"clip_nodes": clip_nodes, "edges": edges}

    def transform_batch(self, batch_df: DataFrame) -> dict[str, DataFrame]:
        """Decode + normalize + build the graph relations."""
        return self.build_relations(self.prepare_batch(batch_df))

    # -- sink --------------------------------------------------------------

    def _write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from dataflow_flex_templates_spark.streaming.sink import (
            write_batch_multi,
        )

        # The per-batch write is ONE map-only Spark job: the nodes
        # branch carries the (single) pandas-UDF decode, the edges
        # branch projects raw columns, and the union is written with a
        # __table__ partition split. No shuffle, no persist, no extra
        # jobs — the per-batch floor is the write itself plus commit
        # bookkeeping. Per-codec rollups are NOT aggregated per batch
        # (that would add a shuffle barrier to every trigger); they are
        # derived at read time (read_codec_stats) or, windowed, by a
        # SpecStreamJob stateful-agg target. Commit order nodes →
        # edges preserves D2 visibility.
        raw = batch_df.withColumn(SEQ_COL,
                                  F.unix_micros(F.col("event_time")))
        clip_nodes = self.build_relations(
            self.prepare_batch(batch_df))["clip_nodes"]
        edges = raw.select("clip_id", "codec",
                           F.lit("ENCODED_AS").alias("rel_type"),
                           "event_time", SEQ_COL)
        write_batch_multi(
            {"clip_nodes": self.nodes_table, "edges": self.edges_table},
            {"clip_nodes": clip_nodes, "edges": edges},
            batch_id,
            commit_order=["clip_nodes", "edges"],
        )

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
        # awaitTermination returning False means the availableNow run is
        # still mid-flight: the sink tables are partial. Surfacing that
        # as a hard error beats letting a caller read short output and
        # fail an oracle hash downstream (same contract as the entry
        # module's _await_or_raise).
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise RuntimeError(
                f"clip_graph: availableNow query timed out ({timeout_s} s)"
                " — refusing to treat partial sink output as complete")
        return q
