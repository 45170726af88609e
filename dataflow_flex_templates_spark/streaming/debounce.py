"""Per-key event debouncing / throttling as watermark-gated keyed
state (``applyInPandasWithState``).

Semantics: per key, events ordered by (event_time, ordinal); an event
EMITS iff its event_time is at least ``cooldown`` after the previously
emitted event's time (the first event always emits). This is the
rate-limiting primitive of alerting/notification pipelines — "at most
one alarm per key per cooldown" — and, like MERGE-LWW, a sequential
per-key recurrence that no windowed aggregate expresses (a tumbling
window re-opens on the grid; debounce re-opens relative to the LAST
EMISSION).

Determinism contract: emission depends only on event time and the
explicit ordinal tie-break, never on arrival order. The streaming path
achieves this the same way streaming/cep.py does — rows buffer in
state until the watermark passes their event time, then the finalized
prefix runs through the same pure-python kernel the batch path and the
test oracle use (the driver oracle re-derives the recurrence as a
recursive CTE in DuckDB). State per key is the un-finalized buffer
(bounded by the watermark delay) plus one int64.

Output is the emission record (key, event_time, ordinal) — narrow by
design; callers needing payloads join back on (key, event_time,
ordinal), which is exact because the triple is unique per emission.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def run_debounce(
    events: list[tuple[int, int]],
    cooldown_us: int,
    last_emit: int = -1,
) -> tuple[list[tuple[int, int]], int]:
    """Feed time-ordered (ts_us, ord) pairs through the debounce
    recurrence. Returns (emitted pairs, last_emit). Pure python —
    shared by the streaming state function, the batch path, and the
    test oracle."""
    emitted: list[tuple[int, int]] = []
    for ts, o in events:
        if last_emit < 0 or ts >= last_emit + cooldown_us:
            emitted.append((ts, o))
            last_emit = ts
    return emitted, last_emit


def _out_schema(key_field: T.StructField) -> T.StructType:
    return T.StructType([
        key_field,
        T.StructField("event_time", T.TimestampType()),
        T.StructField("ord", T.LongType()),
    ])


def debounce_batch(
    df: DataFrame,
    key_col: str,
    cooldown_us: int,
    event_time_col: str = "event_time",
    ordinal_col: str | None = None,
) -> DataFrame:
    """Batch debounce: one Arrow pass per key group (the recurrence is
    sequential per key — groups process in parallel across keys, which
    is the only parallelism the semantics admit; key count is the
    scale axis, exactly like any keyed state op)."""
    key_field = df.schema[key_col]
    out_schema = _out_schema(key_field)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        ts = (pdf[event_time_col].astype("datetime64[us]")
              .astype("int64"))
        ords = (pdf[ordinal_col].astype("int64") if ordinal_col
                else pd.Series([0] * len(pdf), index=pdf.index))
        pairs = sorted(zip((int(x) for x in ts),
                           (int(o) for o in ords)))
        emitted, _ = run_debounce(pairs, cooldown_us)
        return pd.DataFrame({
            key_col: [pdf[key_col].iloc[0]] * len(emitted),
            "event_time": [pd.Timestamp(t, unit="us")
                           for t, _ in emitted],
            "ord": [o for _, o in emitted],
        })

    return df.groupBy(F.col(key_col)).applyInPandas(fn, out_schema)


_STATE_SCHEMA = T.StructType([
    T.StructField("buf_ts", T.ArrayType(T.LongType())),   # micros
    T.StructField("buf_ord", T.ArrayType(T.LongType())),
    T.StructField("last_emit", T.LongType()),
])


def debounce_stream(
    df: DataFrame,
    key_col: str,
    cooldown_us: int,
    event_time_col: str = "event_time",
    ordinal_col: str | None = None,
    idle_evict_ms: int = 60_000,
) -> DataFrame:
    """Streaming debounce over a watermarked DataFrame: rows buffer in
    keyed state until the watermark finalizes them, then run through
    :func:`run_debounce` in event-time order — emissions are byte-equal
    to the batch path on the same (non-late) input. Idle keys evict
    once fully flushed (bounded state)."""
    key_field = df.schema[key_col]
    out_schema = _out_schema(key_field)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        buf_ts, buf_ord, last_emit = (
            state.get if state.exists else ([], [], -1))
        pending = list(zip(buf_ts, buf_ord))
        timed_out = state.hasTimedOut
        if not timed_out:
            for pdf in pdfs:
                if pdf.empty:
                    continue
                ts = (pdf[event_time_col].astype("datetime64[us]")
                      .astype("int64"))
                ords = (pdf[ordinal_col].astype("int64") if ordinal_col
                        else pd.Series([0] * len(pdf), index=pdf.index))
                pending.extend(zip((int(x) for x in ts),
                                   (int(o) for o in ords)))
            pending.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000
        cut = 0
        while cut < len(pending) and pending[cut][0] <= wm_us:
            cut += 1
        final, rest = pending[:cut], pending[cut:]
        emitted, last_emit = run_debounce(final, cooldown_us, last_emit)
        if timed_out and not rest:
            state.remove()
        else:
            state.update(([t for t, _ in rest], [o for _, o in rest],
                          last_emit))
            # non-empty buffer: re-fire on the next watermark advance
            # (no new traffic needed); empty: long idle-evict horizon
            wm_ms = max(wm_us // 1000, 0)
            state.setTimeoutTimestamp(wm_ms + (1 if rest else idle_evict_ms))
        if emitted:
            yield pd.DataFrame({
                key_col: [key[0]] * len(emitted),
                "event_time": [pd.Timestamp(t, unit="us")
                               for t, _ in emitted],
                "ord": [o for _, o in emitted],
            })

    return df.groupBy(F.col(key_col)).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
