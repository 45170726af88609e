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


def test_run_absence_pure():
    """Decision rule of the absence automaton: only triggers whose
    deadline the watermark has cleared are decided; out-of-order
    witnesses inside the window suppress the alert; retained state is
    exactly the undecided tail."""
    from dataflow_flex_templates_spark.streaming.cep import run_absence

    W = 10  # within_us
    ev = [(0, "A"), (5, "B"),          # witnessed → no alert
          (20, "A"),                   # no B in (20, 30] → alert
          (40, "A"), (52, "B"),        # B too late (52 > 50) → alert
          (60, "A")]                   # undecided at wm=65
    alerts, rest = run_absence(ev, "A", "B", W, wm_us=65)
    assert alerts == [(20, 30), (40, 50)]
    assert rest == [(60, "A")]
    # advancing the watermark decides the tail
    alerts2, rest2 = run_absence(rest, "A", "B", W, wm_us=75)
    assert alerts2 == [(60, 70)] and rest2 == []
    # a witness exactly AT the deadline counts (<=)
    a3, _ = run_absence([(0, "A"), (10, "B")], "A", "B", W, wm_us=100)
    assert a3 == []


def test_detect_absence_streaming_equals_anti_join(spark, tmp_path):
    """Streaming absence detection == batch anti-join oracle over the
    same events, including an out-of-order witness that arrives in a
    later file than its trigger."""
    from pyspark.sql import types as T

    from dataflow_flex_templates_spark.streaming.cep import detect_absence

    schema = T.StructType([
        T.StructField("user", T.StringType()),
        T.StructField("event", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
    ])
    t0 = datetime(2025, 3, 1, tzinfo=timezone.utc)

    def ts(s):
        return t0 + timedelta(seconds=s)

    # u1: order at 0 shipped at 20 (within 60s) → no alert
    # u1: order at 100, never shipped → alert
    # u2: order at 10, shipped at 75 (too late) → alert
    # u3: order at 30, witness arrives OUT OF ORDER in a later file
    chunks = [
        [("u1", "order", ts(0)), ("u2", "order", ts(10))],
        [("u1", "ship", ts(20)), ("u3", "order", ts(30))],
        [("u2", "ship", ts(75)), ("u1", "order", ts(100))],
        [("u3", "ship", ts(55))],                 # late-arriving witness
        [("u1", "flush", ts(10_000)), ("u2", "flush", ts(10_000)),
         ("u3", "flush", ts(10_000))],
    ]
    inp = str(tmp_path / "in")
    for rows in chunks:
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["user", "event", "event_time"]),
            schema=schema).coalesce(1).write.mode("append").parquet(inp)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(inp)
              .withWatermark("event_time", "30 seconds"))
    alerts = detect_absence(stream, "user", "event",
                            trigger="order", expected="ship",
                            within="60 seconds")
    out = str(tmp_path / "out")
    q = (alerts.writeStream.outputMode("append")
         .foreachBatch(lambda df, bid:
                       df.write.mode("append").parquet(out))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    got = sorted((r["user"], r["trigger_time"].timestamp())
                 for r in spark.read.parquet(out).collect())
    want = sorted([("u1", ts(100).timestamp()),
                   ("u2", ts(10).timestamp())])
    assert got == want


def test_absence_alarm_fires_for_silent_key(spark, tmp_path):
    """A key that goes completely silent after its trigger must still
    alarm once OTHER keys' traffic advances the watermark past the
    deadline — the buffered-state timeout re-arms at watermark+1 so no
    per-key flush row is ever needed."""
    from pyspark.sql import types as T

    from dataflow_flex_templates_spark.streaming.cep import detect_absence

    schema = T.StructType([
        T.StructField("user", T.StringType()),
        T.StructField("event", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
    ])
    t0 = datetime(2025, 3, 1, tzinfo=timezone.utc)

    def ts(s):
        return t0 + timedelta(seconds=s)

    # u2 orders at t=10 then never appears again, in any file;
    # only u1's heartbeats advance the watermark.
    chunks = [
        [("u1", "hb", ts(0)), ("u2", "order", ts(10))],
        [("u1", "hb", ts(50))],
        [("u1", "hb", ts(200))],
        [("u1", "hb", ts(400))],
    ]
    inp = str(tmp_path / "in")
    for rows in chunks:
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["user", "event", "event_time"]),
            schema=schema).coalesce(1).write.mode("append").parquet(inp)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(inp)
              .withWatermark("event_time", "30 seconds"))
    alerts = detect_absence(stream, "user", "event",
                            trigger="order", expected="ship",
                            within="60 seconds")
    out = str(tmp_path / "out")
    q = (alerts.writeStream.outputMode("append")
         .foreachBatch(lambda df, bid:
                       df.write.mode("append").parquet(out))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    got = [(r["user"], r["trigger_time"].timestamp())
           for r in spark.read.parquet(out).collect()]
    assert got == [("u2", ts(10).timestamp())]
