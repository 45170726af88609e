"""Streaming MERGE last-writer-wins dedup as watermark-evicted keyed
state (``applyInPandasWithState``).

Semantics being preserved (SURVEY.md §2.3 A4 / §2.10): Cypher
``MERGE (n {key}) SET n += props`` applies writes in arrival order —
last writer wins per natural key. In the stream we make that
deterministic with the documented tie-break (event_time, arrival
ordinal): a row replaces the current winner iff its (event_time, ord)
is strictly greater.

State is bounded: ``GroupStateTimeout.EventTimeTimeout`` evicts a key
once the watermark passes its last event_time + the configured keep
interval — explicitly NOT an unbounded ``dropDuplicates`` (north_rule).
Rows arriving later than the watermark are dropped by the upstream
``withWatermark`` and counted by the metrics listener.

Output mode is *update-style*: each micro-batch emits only keys whose
winner changed; the exactly-once sink MERGEs them into the table.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _state_schema() -> T.StructType:
    # (winner event_time micros, winner ordinal) — tiny, bounded state.
    return T.StructType([
        T.StructField("ts_micros", T.LongType()),
        T.StructField("ord", T.LongType()),
    ])


def lww_dedup_stream(
    df: DataFrame,
    key_col: str,
    event_time_col: str = "event_time",
    ordinal_col: str | None = None,
    state_keep_ms: int = 0,
) -> DataFrame:
    """Keyed last-writer-wins over a (watermarked) streaming DataFrame.

    Emits, per micro-batch, the rows that became (or stayed-new) winners
    for their key. ``df`` must already have ``withWatermark`` applied on
    ``event_time_col``.
    """
    out_schema = df.schema
    cols = df.columns
    ts_idx = cols.index(event_time_col)
    ord_idx = cols.index(ordinal_col) if ordinal_col else None

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        best_ts, best_ord = state.get if state.exists else (-1, -1)
        winner = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            ts_micros = (pdf.iloc[:, ts_idx].astype("datetime64[us]")
                         .astype("int64"))
            ords = (pdf.iloc[:, ord_idx].astype("int64")
                    if ord_idx is not None else pd.Series([0] * len(pdf)))
            for i in range(len(pdf)):
                cand = (int(ts_micros.iloc[i]), int(ords.iloc[i]))
                if cand > (best_ts, best_ord):
                    best_ts, best_ord = cand
                    winner = pdf.iloc[[i]]
        if winner is not None:
            state.update((best_ts, best_ord))
            # Evict once the watermark passes the winner's event time
            # (+ keep interval) — bounded state at 10^12-key scale.
            state.setTimeoutTimestamp(best_ts // 1000 + state_keep_ms + 1)
            yield winner

    return df.groupBy(F.col(key_col)).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_state_schema(),
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
