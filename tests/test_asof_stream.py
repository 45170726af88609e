"""Streaming as-of enrichment: kernel invariants + stream/batch parity.

The streaming operator must emit, over the same finalized prefix,
exactly what `operators/temporal.py asof_join` computes in batch on
the union of the two inputs — including build observations that
arrive in EARLIER micro-batches than the probes they serve (the O(1)
carried observation), out-of-order rows within the watermark, ties at
equal event time, and probes with no observation yet.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataflow_flex_templates_spark.streaming.asof_stream import (
    asof_enrich_stream,
    run_asof_enrich,
)

T0 = datetime(2025, 5, 1, tzinfo=timezone.utc)


def ts(s: float) -> datetime:
    return T0 + timedelta(seconds=s)


def test_run_asof_enrich_kernel():
    # (ts, side, ord, vals): build side=0, probe side=1
    items = sorted([
        (10, 0, 1, (1.0,)),
        (10, 0, 2, (2.0,)),    # same time, larger ord wins
        (10, 1, 3, ()),        # probe at equal time sees ord=2
        (5, 1, 0, ()),         # before any build: no match
        (20, 1, 4, ()),
    ], key=lambda r: r[:3])
    emitted, last = run_asof_enrich([(t, s, o, v if s == 0 else ())
                                     for t, s, o, v in items], None)
    got = {(t, o): m for t, o, m in emitted}
    assert got[(5, 0)] is None
    assert got[(10, 3)] == (10, 2, (2.0,))
    assert got[(20, 4)] == (10, 2, (2.0,))
    assert last == (10, 2, (2.0,))
    # chunked feeding with carried last == one-shot
    whole, wl = run_asof_enrich(items2 := sorted(
        [(i * 3, i % 2, i, (float(i),) if i % 2 == 0 else ())
         for i in range(50)], key=lambda r: r[:3]), None)
    last2, chunked = None, []
    for lo in range(0, len(items2), 7):
        em, last2 = run_asof_enrich(items2[lo:lo + 7], last2)
        chunked.extend(em)
    assert chunked == whole and last2 == wl


def test_asof_enrich_stream_equals_batch(spark, tmp_path):
    from dataflow_flex_templates_spark.operators.temporal import asof_join

    probe_schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("ord", T.LongType()),
    ])
    build_schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("ord", T.LongType()),
        T.StructField("gain", T.DoubleType()),
    ])

    # build rows (calibration revisions) and probe rows (clips);
    # key 1's revision arrives two micro-batches before its probes,
    # key 2 probes before any revision exists, key 3 has an
    # equal-time revision + a same-time ord tie, key 1 gets a
    # mid-stream revision bump that later probes must pick up
    build_chunks = [
        [(1, ts(0), 100, 0.5), (3, ts(30), 300, 2.0),
         (3, ts(30), 301, 2.5)],
        [],
        [(1, ts(40), 101, 0.8)],
        [(1, ts(1000), 999, 9.9)],          # flush the tail
    ]
    probe_chunks = [
        [(2, ts(5), 1)],
        [(1, ts(20), 2), (3, ts(30), 3), (1, ts(10), 4)],  # ooo in wm
        [(1, ts(50), 5), (2, ts(60), 6)],
        [(1, ts(1000), 7)],                 # flush the tail
    ]
    p_dir, b_dir = str(tmp_path / "p"), str(tmp_path / "b")
    for rows in probe_chunks:
        spark.createDataFrame(rows or [], probe_schema).coalesce(1) \
            .write.mode("append").parquet(p_dir)
    for rows in build_chunks:
        spark.createDataFrame(rows or [], build_schema).coalesce(1) \
            .write.mode("append").parquet(b_dir)

    probe = (spark.readStream.schema(probe_schema)
             .option("maxFilesPerTrigger", 1).parquet(p_dir)
             .withWatermark("event_time", "15 seconds"))
    build = (spark.readStream.schema(build_schema)
             .option("maxFilesPerTrigger", 1).parquet(b_dir)
             .withWatermark("event_time", "15 seconds"))

    out = str(tmp_path / "out")
    q = (asof_enrich_stream(probe, build, on="event_time", by="k",
                            values=["gain"], probe_ord_col="ord",
                            build_ord_col="ord")
         .writeStream.outputMode("append").format("parquet")
         .option("path", out)
         .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    got = sorted(
        (r["k"], r["event_time"].replace(tzinfo=timezone.utc), r["ord"],
         r["gain"],
         r["asof_ts"].replace(tzinfo=timezone.utc) if r["asof_ts"]
         else None,
         r["asof_ord"])
        for r in spark.read.parquet(out).collect())

    # batch reference over the same inputs; only probes the final
    # watermark (max event_time 1000s - 15s) finalized can have
    # streamed out
    p_df = spark.read.parquet(p_dir)
    # bord rides along as a value so we can compare the matched
    # ordinal too; right side must be unique per (k, t) for the batch
    # kernel — resolve the ts(30) tie by max ord first
    b_uniq = (spark.read.parquet(b_dir)
              .groupBy("k", "event_time")
              .agg(F.max_by("gain", "ord").alias("gain"),
                   F.max("ord").alias("bord")))
    want_all = asof_join(p_df, b_uniq, on="event_time", by=["k"],
                         values=["gain", "bord"],
                         match_time_col="asof_ts")
    cutoff = ts(985).replace(tzinfo=None)
    want = sorted(
        (r["k"], r["event_time"].replace(tzinfo=timezone.utc), r["ord"],
         r["gain"],
         r["asof_ts"].replace(tzinfo=timezone.utc) if r["asof_ts"]
         else None,
         r["bord"])
        for r in want_all.collect()
        if r["event_time"] < cutoff)
    assert got == want
    # spot-check semantics: key 2's first probe has no match, key 1's
    # ts(50) probe sees the ts(40) revision, key 3 matched ord 301
    by_key = {(k, o): (g, at, ao) for k, t, o, g, at, ao in got}
    assert by_key[(2, 1)] == (None, None, None)
    assert by_key[(1, 5)][0] == 0.8
    assert by_key[(3, 3)] == (2.5, ts(30), 301)
    assert by_key[(1, 4)][0] == 0.5 and by_key[(1, 2)][0] == 0.5


def test_asof_enrich_stream_kill_and_resume(spark, tmp_path):
    """Kill the enrichment stream mid-run and restart from the
    checkpoint: the carried observation and the undecided buffer must
    resume from the state store, and the final output must equal an
    uninterrupted run (== the batch reference)."""
    import time

    from pyspark.sql import functions as F

    from dataflow_flex_templates_spark.operators.temporal import asof_join

    probe_schema = "k long, event_time timestamp, ord long"
    build_schema = "k long, event_time timestamp, ord long, gain double"

    # revision in file 1, probes spread over files 2-5, flush tail
    build_rows = [[(1, ts(0), 100, 0.5), (2, ts(0), 200, 1.5)],
                  [], [], [], [(1, ts(2000), 999, 9.9)]]
    probe_rows = [[(1, ts(5), 1)], [(2, ts(20), 2)],
                  [(1, ts(40), 3)], [(2, ts(60), 4), (1, ts(80), 5)],
                  [(1, ts(2000), 6)]]
    p_dir, b_dir = str(tmp_path / "p"), str(tmp_path / "b")
    for rows in probe_rows:
        spark.createDataFrame(rows or [], probe_schema).coalesce(1) \
            .write.mode("append").parquet(p_dir)
    for rows in build_rows:
        spark.createDataFrame(rows or [], build_schema).coalesce(1) \
            .write.mode("append").parquet(b_dir)

    def mk_query(out, ck):
        probe = (spark.readStream.schema(probe_schema)
                 .option("maxFilesPerTrigger", 1).parquet(p_dir)
                 .withWatermark("event_time", "10 seconds"))
        build = (spark.readStream.schema(build_schema)
                 .option("maxFilesPerTrigger", 1).parquet(b_dir)
                 .withWatermark("event_time", "10 seconds"))
        from dataflow_flex_templates_spark.streaming.asof_stream import (
            asof_enrich_stream,
        )

        return (asof_enrich_stream(probe, build, on="event_time",
                                   by="k", values=["gain"],
                                   probe_ord_col="ord",
                                   build_ord_col="ord")
                .writeStream.outputMode("append").format("parquet")
                .option("path", out).option("checkpointLocation", ck)
                .trigger(availableNow=True))

    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    q = mk_query(out, ck).start()
    # kill after at least one committed micro-batch
    deadline = time.time() + 300
    while not q.recentProgress and time.time() < deadline:
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(60)

    q2 = mk_query(out, ck).start()
    q2.awaitTermination(600)

    got = sorted(
        (r["k"], r["event_time"], r["ord"], r["gain"], r["asof_ord"])
        for r in spark.read.parquet(out).collect())
    assert len(got) == len(set(got)), "duplicate emissions after resume"

    want_df = asof_join(
        spark.read.parquet(p_dir),
        spark.read.parquet(b_dir)
        .groupBy("k", "event_time")
        .agg(F.max_by("gain", "ord").alias("gain"),
             F.max("ord").alias("bord")),
        on="event_time", by=["k"], values=["gain", "bord"])
    cutoff = ts(1990).replace(tzinfo=None)
    want = sorted(
        (r["k"], r["event_time"], r["ord"], r["gain"], r["bord"])
        for r in want_df.collect() if r["event_time"] < cutoff)
    assert got == want and len(got) == 5
