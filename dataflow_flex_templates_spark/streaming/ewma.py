"""Streaming per-key integer EWMA as watermark-gated keyed state
(``applyInPandasWithState``) — the continuous twin of
``operators/temporal.ewma_smooth``.

Semantics: per key, rows ordered by (event_time, value) fold through
the truncating integer recurrence (see ``operators/temporal.run_ewma``
— the SAME kernel runs here, in the batch parity tests, and as the
driver's recursive-CTE oracle). Emission is watermark-gated exactly
like streaming/debounce.py: rows buffer in state until the watermark
passes their event time, then the finalized, event-time-sorted prefix
folds through the kernel, so the smoothed series is byte-equal to the
batch path on the same (non-late) input regardless of arrival order.

State per key is the un-finalized buffer (bounded by the watermark
delay) plus the carried smoothed value — O(1) once the buffer drains,
the same carried-observation shape as streaming/asof_stream.py. Idle
keys evict after ``idle_evict_ms``; a non-empty buffer re-arms its
timeout at the next watermark advance so quiet keys still flush
(the watermark-advance re-arm idiom from streaming/cep.py).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dataflow_flex_templates_spark.operators.temporal import run_ewma

_STATE_SCHEMA = T.StructType([
    T.StructField("buf_ts", T.ArrayType(T.LongType())),   # micros
    T.StructField("buf_v", T.ArrayType(T.LongType())),
    T.StructField("carry", T.LongType()),
    T.StructField("has_carry", T.LongType()),             # 0/1
])


def _out_schema(key_field: T.StructField) -> T.StructType:
    return T.StructType([
        key_field,
        T.StructField("event_time", T.TimestampType()),
        T.StructField("value", T.LongType()),
        T.StructField("ewma_q", T.LongType()),
    ])


def ewma_stream(
    df: DataFrame,
    key_col: str,
    value_col: str,
    alpha_num: int = 3,
    alpha_den: int = 10,
    event_time_col: str = "event_time",
    idle_evict_ms: int = 60_000,
) -> DataFrame:
    """Continuous EWMA over a watermarked stream. ``df`` must carry a
    watermark on ``event_time_col``; values must be non-negative
    int64 (the cross-engine division contract of run_ewma)."""
    key_field = df.schema[key_col]
    out_schema = _out_schema(key_field)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        buf_ts, buf_v, carry, has_carry = (
            state.get if state.exists else ([], [], 0, 0))
        pending = list(zip(buf_ts, buf_v))
        timed_out = state.hasTimedOut
        if not timed_out:
            for pdf in pdfs:
                if pdf.empty:
                    continue
                ts = (pdf[event_time_col].astype("datetime64[us]")
                      .astype("int64"))
                vs = pdf[value_col].astype("int64")
                pending.extend(zip((int(t) for t in ts),
                                   (int(v) for v in vs)))
            pending.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000
        cut = 0
        while cut < len(pending) and pending[cut][0] <= wm_us:
            cut += 1
        final, rest = pending[:cut], pending[cut:]
        emitted, new_carry = run_ewma(
            final, alpha_num, alpha_den,
            carry if has_carry else None)
        if timed_out and not rest:
            state.remove()
        else:
            state.update((
                [t for t, _ in rest], [v for _, v in rest],
                new_carry if new_carry is not None else 0,
                1 if new_carry is not None else 0))
            wm_ms = max(wm_us // 1000, 0)
            state.setTimeoutTimestamp(
                wm_ms + (1 if rest else idle_evict_ms))
        if emitted:
            yield pd.DataFrame({
                key_col: [key[0]] * len(emitted),
                "event_time": [pd.Timestamp(t, unit="us")
                               for t, _, _ in emitted],
                "value": [v for _, v, _ in emitted],
                "ewma_q": [s for _, _, s in emitted],
            })

    return df.groupBy(F.col(key_col)).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
