"""CUSUM changepoint / drift alarms over keyed, event-time-ordered
integer series — the classic page-view-spike / error-burst detector a
monitoring pipeline runs on top of its windowed aggregates.

Semantics (one-sided upper CUSUM, all integer arithmetic so the SQL
oracle replays it exactly): per key, over observations x_t in time
order,

    S_0 = 0
    S_t = max(0, S_{t-1} + x_t - target - slack)
    alarm at t when S_t >= threshold, then S resets to 0
    (restart detection — each alarm is an independent excursion)

Like debounce/MERGE-LWW this is a sequential per-key recurrence no
windowed aggregate expresses; the batch path runs a pure-python
kernel per key group (Arrow), and the DuckDB oracle re-derives the
recurrence as a recursive CTE. In streaming, run it downstream of a
windowed aggregate inside ``foreachBatch`` over the cumulative
windowed table — the window rows are already watermark-finalized and
keyed, so the batch operator applies unchanged per micro-batch.

Scale: groups process in parallel across keys (the only parallelism a
sequential recurrence admits); per-key series are windowed aggregates,
i.e. horizon-bounded, not raw-event-sized.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def run_cusum(
    items: list[tuple[int, int]],
    target: int,
    slack: int,
    threshold: int,
    s: int = 0,
) -> tuple[list[tuple[int, int]], int]:
    """Feed time-ordered (ts_us, x) pairs through the CUSUM
    recurrence. Returns (alarms as (ts_us, S_at_alarm), final S).
    Pure python — shared by the batch path and the test oracle."""
    alarms: list[tuple[int, int]] = []
    for ts, x in items:
        s = max(0, s + x - target - slack)
        if s >= threshold:
            alarms.append((ts, s))
            s = 0
    return alarms, s


def cusum_alarms(
    df: DataFrame,
    key_col: str,
    value_col: str,
    target: int,
    slack: int = 0,
    threshold: int = 1,
    time_col: str = "ts",
) -> DataFrame:
    """Batch CUSUM over (key, time, value) rows: one Arrow pass per
    key group in (time) order. Emits (key, ts, s_q) per alarm."""
    key_field = df.schema[key_col]
    out_schema = T.StructType([
        key_field,
        T.StructField("ts", T.TimestampType()),
        T.StructField("s_q", T.LongType()),
    ])

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = pdf[time_col].astype("datetime64[us]").astype("int64")
        xs = pdf[value_col].astype("int64")
        items = sorted(zip((int(t) for t in ts), (int(x) for x in xs)))
        alarms, _ = run_cusum(items, target, slack, threshold)
        # explicit dtypes: a zero-alarm group would otherwise infer
        # float64 for the empty ts column, and Arrow refuses the
        # double→timestamp cast (first bites at sf0.001, where sparse
        # keys produce alarm-free groups)
        return pd.DataFrame({
            key_col: pd.Series([pdf[key_col].iloc[0]] * len(alarms)),
            "ts": pd.to_datetime([t for t, _ in alarms], unit="us"),
            "s_q": pd.Series([s for _, s in alarms], dtype="int64"),
        })

    return df.groupBy(F.col(key_col)).applyInPandas(fn, out_schema)
