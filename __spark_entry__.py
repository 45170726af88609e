"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship spec-driven graph job at sf0.001.
``queries()`` — one entry per implemented operator family
(SURVEY.md §2 + training-data pipeline ops), each a callable
(spark, sf_dir) → DataFrame.
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible
query (same column names/aliases both sides). Non-SQL-expressible ops
(streaming state, LSH approximations, audio decode) ship without an
oracle → rows-only check; their exact semantics are pytest-verified
against numpy/DuckDB oracles in tests/.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Flagship job spec: the reference's northwind 3-target shape re-expressed
# over the TPC-H-ish testdata (orders ⋈ lineitem ⋈ customer as the SQL
# source, S1) — Customer nodes (group dedup), Part nodes (aggregations),
# ORDERED edges (aggregations keyed on customer+part).
# --------------------------------------------------------------------------

FLAGSHIP_SPEC = {
    "config": {"node_write_batch_size": 5000, "edge_write_batch_size": 1000},
    "sources": [{
        "type": "bigquery",     # = SQL-text source, executed as spark.sql
        "name": "order_lines",
        "query": """
            SELECT c.c_custkey, c.c_name, c.c_mktsegment, c.c_acctbal,
                   l.l_partkey, l.l_quantity, l.l_extendedprice, l.l_discount,
                   o.o_orderkey, o.o_orderdate
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
        """,
    }],
    "targets": [
        {"node": {
            "source": "order_lines", "name": "Customer", "mode": "merge",
            "transform": {"group": True},
            "mappings": {
                "labels": ["\"Customer\""],
                "keys": [{"c_custkey": "custkey"}],
                "properties": {"strings": [{"c_name": "name"},
                                           {"c_mktsegment": "mktsegment"}]},
            },
        }},
        {"node": {
            "source": "order_lines", "name": "Part", "mode": "merge",
            "transform": {
                "group": True,
                "aggregations": [
                    {"expr": "SUM(l_extendedprice*(1-l_discount))",
                     "field": "revenue"},
                    {"expr": "SUM(l_quantity)", "field": "total_qty"},
                ],
            },
            "mappings": {
                "labels": ["\"Part\""],
                "keys": [{"l_partkey": "partkey"}],
                "properties": {"doubles": [{"revenue": "revenue"},
                                           {"total_qty": "total_qty"}]},
            },
        }},
        {"edge": {
            "source": "order_lines", "name": "ORDERED", "mode": "merge",
            "transform": {
                "group": True,
                "aggregations": [
                    {"expr": "SUM(l_quantity)", "field": "qty"},
                    {"expr": "COUNT(*)", "field": "n_lines"},
                ],
            },
            "mappings": {
                "type": "\"ORDERED\"",
                "source": {"label": "\"Customer\"", "key": {"c_custkey": "custkey"}},
                "target": {"label": "\"Part\"", "key": {"l_partkey": "partkey"}},
                "properties": {"doubles": [{"qty": "qty"}],
                               "longs": [{"n_lines": "n_lines"}]},
            },
        }},
    ],
}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _load(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def _run_flagship(spark: SparkSession, sf_dir: str):
    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    _load(spark, sf_dir)
    spec = parse_job_spec(json.dumps(FLAGSHIP_SPEC))
    return run_job(spark, spec)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _run_flagship(spark, "/root/testdata/sf0.001").nodes


# --------------------------------------------------------------------------
# queries() — driver-checkable operator inventory
# --------------------------------------------------------------------------

def _q_jobspec_customer_nodes(spark, sf_dir):
    res = _run_flagship(spark, sf_dir)
    return res.target_frames["Customer"].select(
        F.col("custkey"), F.col("name"), F.col("mktsegment"))


def _q_jobspec_part_nodes_agg(spark, sf_dir):
    res = _run_flagship(spark, sf_dir)
    return res.target_frames["Part"].select(
        "partkey", F.round("revenue", 4).alias("revenue"), "total_qty")


def _q_jobspec_ordered_edges(spark, sf_dir):
    res = _run_flagship(spark, sf_dir)
    return res.target_frames["ORDERED"].select(
        "custkey", "partkey", "qty", "n_lines")


def _q_where_order_limit(spark, sf_dir):
    """P4 WHERE + A1 group + O1 order + O3 limit through the generated
    SQL of a spec target."""
    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    _load(spark, sf_dir)
    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "bigquery", "name": "s",
                     "query": "SELECT o_custkey, o_totalprice, o_orderstatus FROM orders"}],
        "targets": [{"node": {
            "source": "s", "name": "Big", "mode": "append",
            "transform": {"group": True,
                          "aggregations": [
                              {"expr": "SUM(o_totalprice)", "field": "spend"},
                              {"expr": "COUNT(*)", "field": "n_orders"}],
                          "where": "o_orderstatus = 'F'",
                          "order_by": "spend DESC, o_custkey ASC",
                          "limit": 50},
            "mappings": {"labels": ["\"C\""], "keys": [{"o_custkey": "custkey"}],
                         "properties": {"doubles": [{"spend": "spend"}],
                                        "longs": [{"n_orders": "n_orders"}]}},
        }}],
    }))
    out = run_job(spark, spec).target_frames["Big"]
    return out.select("custkey", F.round("spend", 4).alias("spend"), "n_orders")


def _q_cast_expand(spark, sf_dir):
    """P5 typed casting: all-string source → typed target row with
    try_cast null-on-failure + P2 constant injection."""
    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    _load(spark, sf_dir)
    strings = spark.sql("""
        SELECT CAST(o_orderkey AS STRING) AS ok,
               CAST(o_totalprice AS STRING) AS price,
               CASE WHEN o_orderkey % 7 = 0 THEN 'oops'
                    ELSE CAST(o_orderdate AS STRING) END AS odate
        FROM orders""")
    strings.createOrReplaceTempView("orders_str")
    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "bigquery", "name": "s",
                     "query": "SELECT * FROM orders_str"}],
        "targets": [{
            "name": "O", "type": "node", "source": "s", "mode": "append",
            "mappings": [
                {"constant": "Order", "name": "Order", "role": "label"},
                {"field": "ok", "name": "orderkey", "role": "key", "type": "Long"},
                {"field": "price", "name": "price", "role": "property", "type": "Float"},
                {"field": "odate", "name": "odate", "role": "property", "type": "Date"},
                {"constant": "northwind", "name": "src_system",
                 "role": "property", "type": "String"},
            ],
        }],
    }))
    return run_job(spark, spec).target_frames["O"].select(
        "orderkey", F.round("price", 4).alias("price"),
        F.col("odate").cast("string").alias("odate"), "src_system")


def _q_merge_lww(spark, sf_dir):
    """A4/W2 MERGE last-writer-wins dedup on a natural key with the
    deterministic (ordinal) tie-break: latest event per user wins."""
    from dataflow_flex_templates_spark.plans.compiler import ORDINAL_COL
    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    _load(spark, sf_dir)
    ev = (spark.table("events")
          .withColumn(ORDINAL_COL,
                      F.col("event_id").cast("long")))  # arrival = event_id
    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "bigquery", "name": "s", "query": "SELECT 1"}],
        "targets": [{"node": {
            "source": "s", "name": "U", "mode": "merge",
            "mappings": {"labels": ["\"User\""], "keys": [{"user_id": "user_id"}],
                         "properties": {"strings": [{"event_type": "last_event_type"}],
                                        "doubles": [{"value": "last_value"}]}},
        }}],
    }))
    out = run_job(spark, spec, source_frames={"s": ev}).target_frames["U"]
    return out.select("user_id", "last_event_type",
                      F.round("last_value", 4).alias("last_value"))


def _q_tumbling_window(spark, sf_dir):
    from dataflow_flex_templates_spark.streaming.windows import tumbling_agg

    _load(spark, sf_dir)
    out = tumbling_agg(spark.table("events"), "ts", "1 hour", ["event_type"],
                       {"n": "count(*)", "total_value": "round(sum(value), 4)"})
    return out.select(F.unix_micros(F.col("window_start").cast("timestamp")).alias("window_start"),
                      "event_type", "n", "total_value")


def _q_sliding_window(spark, sf_dir):
    from dataflow_flex_templates_spark.streaming.windows import sliding_agg

    _load(spark, sf_dir)
    out = sliding_agg(spark.table("events"), "ts", "2 hours", "1 hour",
                      ["event_type"], {"n": "count(*)"})
    return out.select(F.unix_micros(F.col("window_start").cast("timestamp")).alias("window_start"),
                      "event_type", "n")


def _q_session_window(spark, sf_dir):
    from dataflow_flex_templates_spark.streaming.windows import session_agg

    _load(spark, sf_dir)
    out = session_agg(spark.table("events"), "ts", "5 minutes", ["user_id"],
                      {"n": "count(*)", "total_value": "round(sum(value), 4)"})
    return out.select(F.unix_micros(F.col("window_start").cast("timestamp")).alias("window_start"),
                      "user_id", "n", "total_value")


def _q_text_profile(spark, sf_dir):
    from dataflow_flex_templates_spark.operators.text import text_profile

    _load(spark, sf_dir)
    return text_profile(spark.table("documents")).select(
        "doc_id", "n_tokens", "fp", "punct_ratio", "stopword_ratio",
        "quality", "lang_pred")


def _q_gopher_quality(spark, sf_dir):
    """Gopher-rules-style quality flags + keep decision (one scan,
    all-JVM expressions)."""
    from dataflow_flex_templates_spark.operators.text import gopher_flags

    _load(spark, sf_dir)
    return gopher_flags(spark.table("documents")).select(
        "doc_id", "flag_too_few_tokens", "flag_mean_word_len",
        "flag_symbol_heavy", "flag_ellipsis_lines", "flag_no_stopwords",
        "keep")


def _q_token_counts(spark, sf_dir):
    """Token counting two ways: whitespace + BPE-ish GPT-2 pre-tokenizer
    regex (LLM token budgeting without a merges table)."""
    from dataflow_flex_templates_spark.operators.text import (
        bpe_token_count,
        token_count,
    )

    _load(spark, sf_dir)
    d = spark.table("documents")
    return d.select("doc_id",
                    token_count(F.col("text")).alias("ws_tokens"),
                    bpe_token_count(F.col("text")).alias("bpe_tokens"))


def _q_exact_dedup(spark, sf_dir):
    from dataflow_flex_templates_spark.operators.dedup import exact_dedup

    _load(spark, sf_dir)
    return exact_dedup(spark.table("documents"))


def _q_ngram_jaccard(spark, sf_dir):
    from dataflow_flex_templates_spark.operators.dedup import ngram_jaccard_pairs

    _load(spark, sf_dir)
    docs = spark.table("documents").filter("doc_id < 120")
    return ngram_jaccard_pairs(docs, threshold=0.18, n=3)


def _q_dedup_clusters(spark, sf_dir):
    """Connected-components dedup grouping over exact-jaccard pairs
    (iterative min-label propagation; DuckDB oracle = recursive CTE
    transitive closure)."""
    from dataflow_flex_templates_spark.operators.dedup import (
        cluster_duplicates,
        ngram_jaccard_pairs,
    )

    _load(spark, sf_dir)
    docs = spark.table("documents").filter("doc_id < 120")
    pairs = ngram_jaccard_pairs(docs, threshold=0.18, n=3)
    return cluster_duplicates(pairs).select("id", "cluster_rep")


def _q_dedup_keep(spark, sf_dir):
    """End-to-end dedup filter: drop every non-representative member of
    a near-dup component; keep representatives + unpaired docs."""
    from dataflow_flex_templates_spark.operators.dedup import (
        dedup_keep,
        ngram_jaccard_pairs,
    )

    _load(spark, sf_dir)
    docs = spark.table("documents").filter("doc_id < 120")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, n=3)
    return dedup_keep(pairs, docs).select("doc_id")


def _q_embedding_neardup(spark, sf_dir):
    from dataflow_flex_templates_spark.operators.dedup import embedding_neardup_pairs

    _load(spark, sf_dir)
    return embedding_neardup_pairs(
        spark.table("embeddings").filter("vec_id < 300"), threshold=0.3)


def _q_embedding_neardup_lsh(spark, sf_dir):
    """LSH-prefiltered embedding near-dup pairs (sub-quadratic, exact
    cosine verify → precision 1.0; recall pytest-verified). Rows-only."""
    from dataflow_flex_templates_spark.operators.dedup import (
        embedding_neardup_lsh,
    )

    _load(spark, sf_dir)
    return embedding_neardup_lsh(
        spark.table("embeddings").filter("vec_id < 300"),
        threshold=0.3, n_planes=4, n_tables=16)


def _q_cosine_topk(spark, sf_dir):
    from dataflow_flex_templates_spark.operators.similarity import cosine_topk

    _load(spark, sf_dir)
    vecs = spark.table("embeddings").filter("vec_id < 300")
    qs = spark.table("embeddings").filter("vec_id < 12")
    return cosine_topk(vecs, qs, k=5)


def _q_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup (approximation → rows-only driver check;
    recall/precision pytest-verified vs exact jaccard)."""
    from dataflow_flex_templates_spark.operators.dedup import minhash_lsh_pairs

    _load(spark, sf_dir)
    docs = spark.table("documents").filter("doc_id < 120")
    return minhash_lsh_pairs(docs, num_hashes=32, bands=16, threshold=0.18)


def _q_simhash(spark, sf_dir):
    """SimHash fingerprints (xxhash64-based → rows-only driver check)."""
    from dataflow_flex_templates_spark.operators.dedup import simhash

    _load(spark, sf_dir)
    return simhash(spark.table("documents").filter("doc_id < 200"))


def _q_lsh_ann_topk(spark, sf_dir):
    """LSH-bucketed ANN (approximation → rows-only driver check)."""
    from dataflow_flex_templates_spark.operators.similarity import lsh_ann_topk

    _load(spark, sf_dir)
    vecs = spark.table("embeddings").filter("vec_id < 300")
    qs = spark.table("embeddings").filter("vec_id < 12")
    return lsh_ann_topk(vecs, qs, k=5, dim=64, n_planes=3, n_tables=16)


def _q_winnow_fingerprints(spark, sf_dir):
    """Rolling-hash winnowing fingerprints (MOSS) per document —
    Arrow-batched numpy kernel; rows-only driver check (the hash
    algebra is pytest-verified against a pure-numpy oracle)."""
    from dataflow_flex_templates_spark.operators.text import (
        winnow_fingerprints,
    )

    _load(spark, sf_dir)
    return (winnow_fingerprints(spark.table("documents").filter("doc_id < 200"))
            .select("doc_id", F.size("fingerprints").alias("n_fp"),
                    F.col("fingerprints")))


def _q_ivf_ann_topk(spark, sf_dir):
    """IVF-FLAT ANN (hash-seeded centroids + Lloyd refinement, nprobe
    cell search → exact re-rank). Approximation → rows-only driver
    check; recall vs exact is pytest-verified."""
    from dataflow_flex_templates_spark.operators.similarity import ivf_topk

    _load(spark, sf_dir)
    vecs = spark.table("embeddings").filter("vec_id < 300")
    qs = spark.table("embeddings").filter("vec_id < 12")
    return ivf_topk(vecs, qs, k=5, n_centroids=12, nprobe=4)


def _q_audio_decode_stats(spark, sf_dir):
    """Vectorized PCM decode (pandas UDF) over the synthetic clip table
    — per-codec amplitude stats. No SQL oracle (binary decode);
    SNR≥30dB is pytest-verified per row."""
    from dataflow_flex_templates_spark.functions.audio import with_audio_features
    from dataflow_flex_templates_spark.testing.clips import make_clips_df

    clips = make_clips_df(spark, 300, seed=42)
    return (with_audio_features(clips)
            .groupBy("codec")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("rms"), 4).alias("avg_rms"),
                 F.round(F.avg("zcr"), 4).alias("avg_zcr"))
            .orderBy("codec"))


def _q_audio_resample_stats(spark, sf_dir):
    """Decode → linear-resample to 16 kHz → summarize, one Arrow pass
    per clip (the audio analogue of image resize). Rows-only; SNR of
    the resampling kernel is pytest-verified."""
    from dataflow_flex_templates_spark.functions.audio import resample_stats
    from dataflow_flex_templates_spark.testing.clips import make_clips_df

    clips = make_clips_df(spark, 300, seed=42)
    rs = resample_stats(16000)
    return (clips.withColumn("__rs__", rs(F.col("bytes"), F.col("codec"),
                                          F.col("sr_hz")))
            .groupBy("sr_hz")
            .agg(F.count("*").alias("n"),
                 F.sum("__rs__.n_samples_out").alias("total_out_samples"),
                 F.round(F.avg("__rs__.rms_out"), 4).alias("avg_rms"))
            .orderBy("sr_hz"))


def _q_streaming_clip_graph(spark, sf_dir):
    """End-to-end streaming job (exactly-once sink, LWW merge) run to
    completion on a synthetic clip stream; returns the merged node
    table. Rows-only driver check; full semantics pytest-verified."""
    import tempfile

    from dataflow_flex_templates_spark.streaming.job import ClipGraphJob
    from dataflow_flex_templates_spark.testing.clips import make_clips_df

    root = tempfile.mkdtemp(prefix="entry_stream_")
    make_clips_df(spark, 200, seed=42).repartition(4).write.mode(
        "overwrite").parquet(f"{root}/in")
    job = ClipGraphJob(input_dir=f"{root}/in", output_dir=f"{root}/out",
                       checkpoint_dir=f"{root}/ckpt",
                       max_files_per_trigger=2)
    job.run_to_completion(spark)
    return (job.nodes_table.read_merged(spark)
            .select("clip_id", "sr_hz", "dur_ms", "codec", "n_samples",
                    "transcript_norm"))


def _q_spec_stream_graph(spark, sf_dir):
    """North-star flagship: the SAME JSON job spec the batch engine
    runs, executed as a continuous Structured Streaming pipeline
    (SpecStreamJob) — vectorized decode, event-time-deterministic LWW
    MERGE, exactly-once commits. Rows-only driver check; batch/stream
    row-identity is pytest-verified (tests/test_spec_stream.py)."""
    import json as _json
    import tempfile

    from pyspark.sql import functions as _F

    from dataflow_flex_templates_spark.functions.audio import (
        normalize_transcript,
        with_audio_features,
    )
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec
    from dataflow_flex_templates_spark.streaming.spec_stream import SpecStreamJob
    from dataflow_flex_templates_spark.testing.clips import (
        clips_spark_schema,
        make_clips_df,
    )

    spec = parse_job_spec(_json.dumps({
        "sources": [{"type": "bigquery", "name": "clips",
                     "query": "SELECT 1"}],
        "targets": [{
            "name": "Clip", "type": "node", "source": "clips",
            "mode": "merge",
            "mappings": [
                {"constant": "Clip", "role": "label"},
                {"field": "clip_id", "name": "clip_id", "role": "key",
                 "type": "String"},
                {"field": "codec", "name": "codec", "role": "property",
                 "type": "String"},
                {"field": "n_samples", "name": "n_samples",
                 "role": "property", "type": "Long"},
                {"field": "transcript_norm", "name": "transcript_norm",
                 "role": "property", "type": "String"},
            ],
        }],
    }))

    def prepare(df):
        return (with_audio_features(df)
                .withColumn("transcript_norm",
                            normalize_transcript(_F.col("transcript")))
                .drop("bytes"))

    root = tempfile.mkdtemp(prefix="entry_spec_stream_")
    make_clips_df(spark, 200, seed=42).repartition(4).write.mode(
        "overwrite").parquet(f"{root}/in")
    job = SpecStreamJob(
        spec, input_dir=f"{root}/in", input_schema=clips_spark_schema(),
        output_dir=f"{root}/out", checkpoint_dir=f"{root}/ckpt",
        max_files_per_trigger=2, prepare_fn=prepare)
    job.run_to_completion(spark)
    return job.read_merged(spark, "Clip").select(
        "clip_id", "codec", "n_samples", "transcript_norm")


def _q_cep_sequence_detect(spark, sf_dir):
    """CEP sequence detection (view→cart→buy within 2 min per user)
    over an out-of-order event stream: watermark-gated buffered
    matching via applyInPandasWithState. Non-SQL-expressible stateful
    op → rows-only; equality with the sorted batch automaton oracle is
    pytest-verified (tests/test_cep.py)."""
    import os
    import random
    import tempfile
    from datetime import datetime, timedelta, timezone

    import pandas as pd
    from pyspark.sql import types as T

    from dataflow_flex_templates_spark.streaming.cep import detect_sequence

    rng = random.Random(13)
    t = datetime(2025, 1, 1, tzinfo=timezone.utc)
    rows = []
    for _ in range(600):
        t = t + timedelta(milliseconds=rng.randrange(200, 1500))
        rows.append((f"u{rng.randrange(8)}",
                     rng.choices(["view", "cart", "buy", "noise"],
                                 [0.4, 0.25, 0.15, 0.2])[0],
                     t - timedelta(seconds=rng.uniform(0, 5))))
    pdf = pd.DataFrame(rows, columns=["user", "event", "event_time"])
    schema = T.StructType([
        T.StructField("user", T.StringType()),
        T.StructField("event", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
    ])
    root = tempfile.mkdtemp(prefix="entry_cep_")
    inp = os.path.join(root, "in")
    chunk = len(pdf) // 8 + 1
    for i in range(0, len(pdf), chunk):
        spark.createDataFrame(pdf.iloc[i:i + chunk], schema=schema) \
            .coalesce(1).write.mode("append").parquet(inp)
    far = pdf["event_time"].max() + timedelta(hours=1)
    spark.createDataFrame(
        pd.DataFrame([(u, "noise", far) for u in sorted(pdf["user"].unique())],
                     columns=pdf.columns), schema=schema) \
        .coalesce(1).write.mode("append").parquet(inp)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 2).parquet(inp)
              .withWatermark("event_time", "30 seconds"))
    matches = detect_sequence(stream, "user", "event",
                              ["view", "cart", "buy"], within="2 minutes")
    out = os.path.join(root, "out")
    q = (matches.writeStream.outputMode("append")
         .foreachBatch(lambda df, bid: df.write.mode("append").parquet(out))
         .option("checkpointLocation", os.path.join(root, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    return (spark.read.parquet(out)
            .select("user",
                    F.unix_micros("match_start").alias("match_start"),
                    F.unix_micros("match_end").alias("match_end"),
                    "n_events"))


def _q_text_source_csv(spark, sf_dir):
    """S3 text scan + S6 dialect + all-string ingest
    (utils/BeamUtils.java:125-135) + per-target typed casting."""
    import os
    import tempfile

    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    _load(spark, sf_dir)
    path = os.path.join(tempfile.gettempdir(),
                        f"graft_csv_{abs(hash(sf_dir)) & 0xFFFFFF:x}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (spark.table("nation")
         .select("n_nationkey", "n_name", "n_regionkey")
         .coalesce(1).write.mode("overwrite").csv(path))
    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "text", "name": "s", "uri": path,
                     "format": "DEFAULT",
                     "ordered_field_names": "n_nationkey,n_name,n_regionkey"}],
        "targets": [{
            "name": "Nation", "type": "node", "source": "s", "mode": "merge",
            "mappings": [
                {"constant": "Nation", "role": "label"},
                {"field": "n_nationkey", "name": "nationkey", "role": "key",
                 "type": "Long"},
                {"field": "n_name", "name": "name", "role": "property",
                 "type": "String"},
                {"field": "n_regionkey", "name": "regionkey",
                 "role": "property", "type": "Long"},
            ],
        }],
    }))
    return run_job(spark, spec).target_frames["Nation"].select(
        "nationkey", "name", "regionkey")


MUSICIANS_ROWS = [["Brian", 12, "guitar", "red"],
                  ["Carol", 8, "drums", "blue"],
                  ["Dana", 15, "bass", "green"],
                  ["Evan", 3, "keys", "black"]]


def _q_inline_source(spark, sf_dir):
    """S4 inline data scan (ListOfStringToRowFn semantics): rows embedded
    in the spec JSON, all-string, typed per mappings."""
    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "text", "name": "s",
                     "ordered_field_names":
                         "name,experience,instrument,instrument_color",
                     "data": MUSICIANS_ROWS}],
        "targets": [{
            "name": "Musician", "type": "node", "source": "s",
            "mode": "merge",
            "mappings": [
                {"constant": "Musician", "role": "label"},
                {"field": "name", "name": "name", "role": "key",
                 "type": "String"},
                {"field": "experience", "name": "experience",
                 "role": "property", "type": "Long"},
                {"field": "instrument", "name": "instrument",
                 "role": "property", "type": "String"},
            ],
        }],
    }))
    return run_job(spark, spec).target_frames["Musician"].select(
        "name", "experience", "instrument")


def _q_token_substitution(spark, sf_dir):
    """P7 $var substitution into source SQL
    (ModelUtils.replaceVariableTokens:358-378)."""
    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    _load(spark, sf_dir)
    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "bigquery", "name": "s",
                     "query": "SELECT o_orderkey, o_totalprice FROM orders "
                              "WHERE o_orderstatus = '$status'"}],
        "targets": [{"node": {
            "source": "s", "name": "O", "mode": "append",
            "mappings": {"labels": ["\"O\""], "keys": [{"o_orderkey": "orderkey"}],
                         "properties": {"doubles": [{"o_totalprice": "price"}]}},
        }}],
    }))
    out = run_job(spark, spec, runtime_tokens={"status": "P"})
    return out.target_frames["O"].select(
        "orderkey", F.round("price", 4).alias("price"))


def _q_actions_pipeline(spark, sf_dir):
    """X1/X2 SQL actions with D1 ordering: a preload action creates the
    view the source reads; a post-load action audits it."""
    from dataflow_flex_templates_spark.graph.build import run_job
    from dataflow_flex_templates_spark.spec.parser import parse_job_spec

    _load(spark, sf_dir)
    spec = parse_job_spec(json.dumps({
        "sources": [{"type": "bigquery", "name": "s",
                     "query": "SELECT * FROM act_top_parts"}],
        "targets": [{"node": {
            "source": "s", "name": "TopPart", "mode": "merge",
            "mappings": {"labels": ["\"TopPart\""],
                         "keys": [{"l_partkey": "partkey"}],
                         "properties": {"doubles": [{"qty": "qty"}]}},
        }}],
        "actions": [
            {"name": "mkview", "type": "cypher", "execute_after": "start",
             "options": [{"cypher":
                          "CREATE OR REPLACE TEMP VIEW act_top_parts AS "
                          "SELECT l_partkey, SUM(l_quantity) AS qty "
                          "FROM lineitem GROUP BY l_partkey "
                          "HAVING SUM(l_quantity) > 150"}]},
            {"name": "audit", "type": "bigquery", "execute_after": "loads",
             "options": [{"sql": "SELECT count(*) FROM act_top_parts"}]},
        ],
    }))
    out = run_job(spark, spec)
    assert [r["name"] for r in out.action_results] == ["mkview", "audit"]
    return out.target_frames["TopPart"].select(
        "partkey", F.round("qty", 4).alias("qty"))


def _q_drop_empty_rows(spark, sf_dir):
    """P6 drop-all-null rows (transforms/DeleteEmptyRowsFn.java:12-29)."""
    from dataflow_flex_templates_spark.graph.build import drop_empty_rows

    _load(spark, sf_dir)
    sparse = spark.sql("""
        SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderkey END
                 AS orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END
                 AS status
        FROM orders""")
    return drop_empty_rows(sparse)


def _q_frame_sample_plan(spark, sf_dir):
    """Multimodal frame-sampling pre-pass: frame indices from metadata
    only (operators/multimodal.py) — bounds decode work before the
    expensive kernel."""
    from dataflow_flex_templates_spark.operators.multimodal import (
        frame_sample_plan,
    )

    _load(spark, sf_dir)
    media = spark.sql("""
        SELECT CAST(o_orderkey AS STRING) AS media_id,
               CAST(o_orderkey % 9000 + 500 AS INT) AS dur_ms
        FROM orders""")
    return frame_sample_plan(media, every_ms=1000).select(
        "media_id", "n_frames")


def _q_media_features(spark, sf_dir):
    """Multimodal binary decode plumbing (stub kernel, real Arrow
    batch shape) — rows-only driver check."""
    from dataflow_flex_templates_spark.operators.multimodal import (
        extract_media_features,
    )

    _load(spark, sf_dir)
    media = spark.sql("""
        SELECT CAST(doc_id AS STRING) AS media_id,
               encode(text, 'utf-8') AS bytes,
               'raw' AS format,
               CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height
        FROM documents WHERE doc_id < 100""")
    return extract_media_features(media).select(
        "media_id", "format", "n_bytes")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "jobspec_customer_nodes": _q_jobspec_customer_nodes,
        "jobspec_part_nodes_agg": _q_jobspec_part_nodes_agg,
        "jobspec_ordered_edges": _q_jobspec_ordered_edges,
        "where_order_limit": _q_where_order_limit,
        "cast_expand": _q_cast_expand,
        "merge_lww": _q_merge_lww,
        "tumbling_window": _q_tumbling_window,
        "sliding_window": _q_sliding_window,
        "session_window": _q_session_window,
        "text_profile": _q_text_profile,
        "exact_dedup": _q_exact_dedup,
        "token_counts": _q_token_counts,
        "gopher_quality": _q_gopher_quality,
        "ngram_jaccard": _q_ngram_jaccard,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_keep": _q_dedup_keep,
        "embedding_neardup": _q_embedding_neardup,
        "embedding_neardup_lsh": _q_embedding_neardup_lsh,
        "cosine_topk": _q_cosine_topk,
        "minhash_lsh": _q_minhash_lsh,
        "simhash": _q_simhash,
        "lsh_ann_topk": _q_lsh_ann_topk,
        "ivf_ann_topk": _q_ivf_ann_topk,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "audio_decode_stats": _q_audio_decode_stats,
        "audio_resample_stats": _q_audio_resample_stats,
        "streaming_clip_graph": _q_streaming_clip_graph,
        "spec_stream_graph": _q_spec_stream_graph,
        "cep_sequence_detect": _q_cep_sequence_detect,
        "text_source_csv": _q_text_source_csv,
        "inline_source": _q_inline_source,
        "token_substitution": _q_token_substitution,
        "actions_pipeline": _q_actions_pipeline,
        "drop_empty_rows": _q_drop_empty_rows,
        "frame_sample_plan": _q_frame_sample_plan,
        "media_features": _q_media_features,
    }


# --------------------------------------------------------------------------
# oracle_sql() — DuckDB equivalents (same aliases, same rounding)
# --------------------------------------------------------------------------

_STOPWORDS_SQL = ("['a','and','are','as','at','be','by','for','from','has',"
                  "'he','in','is','it','its','of','on','that','the','to',"
                  "'was','were','will','with']")


def oracle_sql() -> dict[str, str]:
    return {
        "jobspec_customer_nodes": """
            SELECT c_custkey AS custkey, c_name AS name,
                   c_mktsegment AS mktsegment
            FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders
                                WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem))
        """,
        "jobspec_part_nodes_agg": """
            SELECT l.l_partkey AS partkey,
                   round(SUM(l.l_extendedprice*(1-l.l_discount)), 4) AS revenue,
                   round(SUM(l.l_quantity), 4) AS total_qty
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "jobspec_ordered_edges": """
            SELECT c.c_custkey AS custkey, l.l_partkey AS partkey,
                   round(SUM(l.l_quantity), 4) AS qty,
                   COUNT(*) AS n_lines
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        """,
        "where_order_limit": """
            SELECT o_custkey AS custkey,
                   round(SUM(o_totalprice), 4) AS spend,
                   COUNT(*) AS n_orders
            FROM orders WHERE o_orderstatus = 'F'
            GROUP BY 1 ORDER BY SUM(o_totalprice) DESC, o_custkey ASC LIMIT 50
        """,
        "cast_expand": """
            SELECT o_orderkey AS orderkey,
                   round(o_totalprice, 4) AS price,
                   CASE WHEN o_orderkey % 7 = 0 THEN NULL
                        ELSE strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
                   END AS odate,
                   'northwind' AS src_system
            FROM orders
        """,
        "merge_lww": """
            SELECT user_id,
                   arg_max(event_type, event_id) AS last_event_type,
                   round(arg_max(value, event_id), 4) AS last_value
            FROM events GROUP BY 1
        """,
        "tumbling_window": """
            SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start,
                   event_type, COUNT(*) AS n,
                   round(SUM(value), 4) AS total_value
            FROM events GROUP BY time_bucket(INTERVAL 1 HOUR, ts), event_type
        """,
        "sliding_window": """
            WITH offs AS (SELECT 0 AS o UNION ALL SELECT 1),
            win AS (
              SELECT time_bucket(INTERVAL 1 HOUR, ts)
                     - TO_HOURS(o) AS ws, event_type
              FROM events, offs)
            SELECT epoch_us(ws) AS window_start,
                   event_type, COUNT(*) AS n
            FROM win GROUP BY ws, event_type
        """,
        "session_window": """
            WITH ordered AS (
              SELECT user_id, ts, value,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                               > INTERVAL 5 MINUTES OR
                               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                          THEN 1 ELSE 0 END AS new_sess
              FROM events),
            sess AS (
              SELECT user_id, ts, value,
                     SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS UNBOUNDED PRECEDING) AS sid
              FROM ordered)
            SELECT epoch_us(MIN(ts)) AS window_start,
                   user_id, COUNT(*) AS n, round(SUM(value), 4) AS total_value
            FROM sess GROUP BY user_id, sid
        """,
        "text_profile": f"""
            WITH t AS (
              SELECT *, trim(text) AS tt,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS nt
              FROM documents),
            tok AS (
              SELECT *,
                CASE WHEN length(tt)=0 THEN 0
                     ELSE len(regexp_split_to_array(tt, '\\s+')) END AS n_tokens,
                CASE WHEN length(nt)=0 THEN 0
                     ELSE len(list_filter(string_split(nt, ' '),
                              x -> list_contains({_STOPWORDS_SQL}, x))) END AS stop_hits,
                CASE WHEN length(nt)=0 THEN 1
                     ELSE len(string_split(nt, ' ')) END AS nt_tokens,
                (length(tt) - length(regexp_replace(tt, '[.!?,;:]', '', 'g')))
                  / greatest(length(tt), 1) AS praw
              FROM t)
            SELECT doc_id, n_tokens, md5(nt) AS fp,
                   round(praw, 6) AS punct_ratio,
                   round(stop_hits / greatest(nt_tokens, 1), 6) AS stopword_ratio,
                   round(0.5 * least(n_tokens / 100.0, 1.0)
                         + 0.5 * least(stop_hits / greatest(nt_tokens,1) * 4.0, 1.0)
                         - 0.25 * least(praw * 5.0, 1.0), 6) AS quality,
                   CASE WHEN stop_hits >= 2
                             AND stop_hits / greatest(nt_tokens,1) >= 0.15
                        THEN 'en' ELSE 'unk' END AS lang_pred
            FROM tok
        """,
        "gopher_quality": rf"""
            WITH t AS (
              SELECT doc_id, text,
                     lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS nt
              FROM documents),
            m AS (
              SELECT doc_id, text, nt,
                     string_split(nt, ' ') AS toks,
                     len(string_split(nt, ' ')) AS n_tok
              FROM t),
            f AS (
              SELECT doc_id,
                     n_tok < 5 AS flag_too_few_tokens,
                     (list_sum(list_transform(toks, x -> length(x)))
                      / greatest(n_tok, 1)) AS mean_len,
                     (length(text) - length(regexp_replace(
                        text, '[#@~^*+=|<>]', '', 'g')))
                       / greatest(length(text), 1)::DOUBLE AS sym_ratio,
                     ((length(text) - length(replace(text, '...', ''))) / 3)
                       * 10.0 AS ell10,
                     n_tok,
                     len(list_filter(toks,
                         x -> list_contains({_STOPWORDS_SQL}, x))) AS stops
              FROM m)
            SELECT doc_id, flag_too_few_tokens,
                   (mean_len < 2.0 OR mean_len > 12.0) AS flag_mean_word_len,
                   sym_ratio > 0.10 AS flag_symbol_heavy,
                   ell10 > n_tok AS flag_ellipsis_lines,
                   stops = 0 AS flag_no_stopwords,
                   NOT (flag_too_few_tokens
                        OR mean_len < 2.0 OR mean_len > 12.0
                        OR sym_ratio > 0.10 OR ell10 > n_tok
                        OR stops = 0) AS keep
            FROM f
        """,
        "token_counts": r"""
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\s+'))
                   END AS ws_tokens,
                   len(regexp_extract_all(text,
                       '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+'))
                     AS bpe_tokens
            FROM documents
        """,
        "exact_dedup": """
            SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
                   MIN(doc_id) AS keeper_id, COUNT(*) AS n_dupes
            FROM documents GROUP BY 1
        """,
        "ngram_jaccard": """
            WITH norm AS (
              SELECT doc_id AS id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS nt
              FROM documents WHERE doc_id < 120),
            sh AS (
              SELECT id, list_distinct(list_transform(
                       generate_series(1, greatest(length(nt)-2, 1)),
                       i -> substring(nt, i, 3))) AS s
              FROM norm),
            inv AS (SELECT id, len(s) AS sz, unnest(s) AS g FROM sh),
            pairs AS (
              SELECT a.id AS id_a, b.id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
                     COUNT(*) AS inter
              FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id
              GROUP BY 1,2,3,4)
            SELECT id_a, id_b,
                   round(inter / (sz_a + sz_b - inter), 6) AS jaccard
            FROM pairs WHERE inter / (sz_a + sz_b - inter) >= 0.18
        """,
        "dedup_clusters": """
            WITH RECURSIVE norm AS (
              SELECT doc_id AS id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS nt
              FROM documents WHERE doc_id < 120),
            sh AS (
              SELECT id, list_distinct(list_transform(
                       generate_series(1, greatest(length(nt)-2, 1)),
                       i -> substring(nt, i, 3))) AS s
              FROM norm),
            inv AS (SELECT id, len(s) AS sz, unnest(s) AS g FROM sh),
            cand AS (
              SELECT a.id AS id_a, b.id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
                     COUNT(*) AS inter
              FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id
              GROUP BY 1,2,3,4),
            pairs AS (
              SELECT id_a, id_b FROM cand
              WHERE inter / (sz_a + sz_b - inter) >= 0.18),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
            reach(id, r) AS (
              SELECT a, a FROM edges
              UNION
              SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id)
            SELECT id, MIN(r) AS cluster_rep FROM reach GROUP BY id
        """,
        "dedup_keep": """
            WITH RECURSIVE norm AS (
              SELECT doc_id AS id,
                     lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS nt
              FROM documents WHERE doc_id < 120),
            sh AS (
              SELECT id, list_distinct(list_transform(
                       generate_series(1, greatest(length(nt)-2, 1)),
                       i -> substring(nt, i, 3))) AS s
              FROM norm),
            inv AS (SELECT id, len(s) AS sz, unnest(s) AS g FROM sh),
            cand AS (
              SELECT a.id AS id_a, b.id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
                     COUNT(*) AS inter
              FROM inv a JOIN inv b ON a.g = b.g AND a.id < b.id
              GROUP BY 1,2,3,4),
            pairs AS (
              SELECT id_a, id_b FROM cand
              WHERE inter / (sz_a + sz_b - inter) >= 0.5),
            edges AS (
              SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
            reach(id, r) AS (
              SELECT a, a FROM edges
              UNION
              SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id),
            losers AS (
              SELECT id FROM reach GROUP BY id HAVING id != MIN(r))
            SELECT doc_id FROM documents
            WHERE doc_id < 120 AND doc_id NOT IN (SELECT id FROM losers)
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
                     AS cosine
            FROM embeddings a JOIN embeddings b
              ON a.vec_id < b.vec_id
            WHERE a.vec_id < 300 AND b.vec_id < 300
              AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
        """,
        "cosine_topk": """
            WITH v AS (SELECT * FROM embeddings WHERE vec_id < 300),
                 q AS (SELECT * FROM embeddings WHERE vec_id < 12),
            sc AS (
              SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
                     round(list_cosine_similarity(q.embedding::DOUBLE[], v.embedding::DOUBLE[]), 6)
                       AS cosine,
                     row_number() OVER (PARTITION BY q.vec_id ORDER BY
                       list_cosine_similarity(q.embedding::DOUBLE[], v.embedding::DOUBLE[]) DESC,
                       v.vec_id ASC) AS rank
              FROM q, v WHERE q.vec_id != v.vec_id)
            SELECT query_id, neighbor_id, cosine, rank FROM sc WHERE rank <= 5
        """,
        "text_source_csv": """
            SELECT n_nationkey AS nationkey, n_name AS name,
                   n_regionkey AS regionkey
            FROM nation
        """,
        "inline_source": """
            SELECT * FROM (VALUES
              ('Brian', CAST(12 AS BIGINT), 'guitar'),
              ('Carol', 8, 'drums'),
              ('Dana', 15, 'bass'),
              ('Evan', 3, 'keys')) AS t(name, experience, instrument)
        """,
        "token_substitution": """
            SELECT o_orderkey AS orderkey, round(o_totalprice, 4) AS price
            FROM orders WHERE o_orderstatus = 'P'
        """,
        "actions_pipeline": """
            SELECT l_partkey AS partkey, round(SUM(l_quantity), 4) AS qty
            FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 150
        """,
        "drop_empty_rows": """
            SELECT o_orderkey AS orderkey, o_orderstatus AS status
            FROM orders WHERE o_orderkey % 5 <> 0
        """,
        "frame_sample_plan": """
            SELECT CAST(o_orderkey AS VARCHAR) AS media_id,
                   CAST(greatest(floor((o_orderkey % 9000 + 500) / 1000.0), 1)
                        AS INT) AS n_frames
            FROM orders
        """,
        "media_features": """
            SELECT CAST(doc_id AS VARCHAR) AS media_id, 'raw' AS format,
                   octet_length(encode(text)) AS n_bytes
            FROM documents WHERE doc_id < 100
        """,
        # minhash_lsh / simhash / lsh_ann_topk / audio_decode_stats /
        # streaming_clip_graph: intentionally no SQL oracle (hash-based
        # approximations, binary decode, streaming state) — rows-only.
    }


if __name__ == "__main__":
    from dataflow_flex_templates_spark.session import get_spark

    s = get_spark("entry-smoke", cores=8)
    df = entry(s)
    print("entry rows:", df.count())
    df.show(5, truncate=False)
    s.stop()
