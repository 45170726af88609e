"""CEP sequence detection (streaming/cep.py): out-of-order-safe
watermark-gated matching equals the sorted batch oracle; state stays
bounded via eviction."""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta, timezone

import pandas as pd
import pytest

PATTERN = ["view", "cart", "buy"]


def _events_pdf(n=600, seed=13):
    rng = random.Random(seed)
    t = datetime(2025, 1, 1, tzinfo=timezone.utc)
    rows = []
    for i in range(n):
        t = t + timedelta(milliseconds=rng.randrange(200, 1500))
        user = f"u{rng.randrange(8)}"
        ev = rng.choices(["view", "cart", "buy", "noise"],
                         [0.4, 0.25, 0.15, 0.2])[0]
        # bounded disorder well under the 30s watermark
        ts = t - timedelta(seconds=rng.uniform(0, 5))
        rows.append((user, ev, ts))
    return pd.DataFrame(rows, columns=["user", "event", "event_time"])


@pytest.fixture(scope="module")
def cep_run(spark, tmp_path_factory):
    from pyspark.sql import types as T

    from dataflow_flex_templates_spark.streaming.cep import detect_sequence

    root = str(tmp_path_factory.mktemp("cep"))
    pdf = _events_pdf()
    schema = T.StructType([
        T.StructField("user", T.StringType()),
        T.StructField("event", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
    ])
    inp = os.path.join(root, "in")
    chunk = len(pdf) // 8 + 1
    for i in range(0, len(pdf), chunk):
        spark.createDataFrame(pdf.iloc[i:i + chunk], schema=schema) \
            .coalesce(1).write.mode("append").parquet(inp)
    # final flush file: one far-future sentinel per user advances the
    # watermark through every group so all real events finalize
    far = pdf["event_time"].max() + timedelta(hours=1)
    sentinels = pd.DataFrame(
        [(u, "noise", far) for u in sorted(pdf["user"].unique())],
        columns=["user", "event", "event_time"])
    spark.createDataFrame(sentinels, schema=schema) \
        .coalesce(1).write.mode("append").parquet(inp)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 2).parquet(inp)
              .withWatermark("event_time", "30 seconds"))
    matches = detect_sequence(stream, "user", "event", PATTERN,
                              within="2 minutes")
    out = os.path.join(root, "out")

    def write(df, bid):
        df.write.mode("append").parquet(out)

    q = (matches.writeStream.outputMode("append").foreachBatch(write)
         .option("checkpointLocation", os.path.join(root, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    try:
        got = spark.read.parquet(out).toPandas()
    except Exception:
        got = pd.DataFrame(columns=["user", "match_start", "match_end",
                                    "n_events"])
    return pdf, got


def _oracle(pdf, cutoff_us):
    from dataflow_flex_templates_spark.streaming.cep import run_automaton

    out = []
    for user, grp in pdf.groupby("user"):
        ev = sorted(
            (int(ts.value // 1000), e)
            for e, ts in zip(grp["event"], grp["event_time"])
            if int(ts.value // 1000) <= cutoff_us)
        matches, _, _ = run_automaton(ev, PATTERN, 120_000_000)
        out.extend((user, s, e) for s, e in matches)
    return sorted(out)


def test_cep_matches_equal_sorted_oracle(cep_run):
    pdf, got = cep_run
    # the sentinel file advances the watermark past every real event,
    # and the timeout-flush drains remaining buffers — every real
    # event is finalized, so the oracle covers the full input
    max_us = int(pdf["event_time"].max().value // 1000)
    want = _oracle(pdf, max_us + 1)
    assert len(want) > 0, "test input produced no matches; adjust seed"
    got_t = sorted(
        (r["user"],
         int(pd.Timestamp(r["match_start"]).value // 1000),
         int(pd.Timestamp(r["match_end"]).value // 1000))
        for _, r in got.iterrows())
    assert got_t == want


def test_cep_match_spans_within_window(cep_run):
    _, got = cep_run
    for _, r in got.iterrows():
        span = (pd.Timestamp(r["match_end"])
                - pd.Timestamp(r["match_start"])).total_seconds()
        assert 0 <= span <= 120
        assert r["n_events"] == len(PATTERN)
