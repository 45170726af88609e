"""Streaming as-of enrichment: each probe event picks up the latest
at-or-before build observation for its key — clip rows enriched with
the newest calibration/config revision in effect at their event time,
as a continuous operator.

Spark's native stream-stream join is windowed-equality only; the
as-of ("latest revision wins") shape needs ordered per-key state. The
operator unions the two tagged streams, groups by key, and buffers
rows in ``applyInPandasWithState`` until the watermark finalizes
them; the finalized prefix then runs in strict (event_time, side,
ordinal) order through a pure-python kernel shared with the batch
path (`operators/temporal.py asof_join` — parity pytest-proven) and
the test oracle. Build rows at the same timestamp as a probe row
match it (backward as-of, ties included), the largest ordinal winning
among equal-time build rows.

Persistent state per key is ONE observation (the latest build row) —
O(1) forever — plus the watermark-bounded undecided buffer. Keys
idle longer than ``idle_evict_ms`` with an empty buffer drop their
observation (bounded state at 10^12 keys; raise the horizon when
enrichment state must outlive quiet periods).

Both inputs must carry their own ``withWatermark`` before being
passed in (Spark takes the min across the union). Value columns are
DOUBLE (the feature-enrichment case); wider payloads join back on
the emitted (key, event_time, ord) triple, unique per probe row.

Reference parity: the reference engine (Dataflow flex templates,
row-to-graph ETL) has no temporal join; this extends SURVEY.md §2.10's
stateful-operator family alongside CEP/debounce/bloom-dedup.
"""

from __future__ import annotations

from typing import Any, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

Obs = tuple[int, int, tuple[float, ...]] | None


def run_asof_enrich(
    items: list[tuple[int, int, int, tuple[float, ...]]],
    last: Obs,
) -> tuple[list[tuple[int, int, Obs]], Obs]:
    """Feed (ts_us, side, ord, vals) rows — sorted; side 0=build,
    1=probe — through the as-of recurrence. Probe rows emit
    (ts, ord, matched observation). Pure python — shared by the
    streaming state function and the parity tests. ``last`` carries
    across chunks (the watermark feeds monotone prefixes)."""
    emitted: list[tuple[int, int, Obs]] = []
    for ts, side, o, vals in items:
        if side == 0:
            if last is None or (ts, o) >= (last[0], last[1]):
                last = (ts, o, vals)
        else:
            emitted.append((ts, o, last))
    return emitted, last


def _out_schema(key_field: T.StructField,
                values: Sequence[str]) -> T.StructType:
    return T.StructType(
        [key_field,
         T.StructField("event_time", T.TimestampType()),
         T.StructField("ord", T.LongType())]
        + [T.StructField(v, T.DoubleType()) for v in values]
        + [T.StructField("asof_ts", T.TimestampType()),
           T.StructField("asof_ord", T.LongType())])


def _state_schema(values: Sequence[str]) -> T.StructType:
    return T.StructType(
        [T.StructField("buf_ts", T.ArrayType(T.LongType())),
         T.StructField("buf_side", T.ArrayType(T.LongType())),
         T.StructField("buf_ord", T.ArrayType(T.LongType())),
         T.StructField("buf_vals", T.ArrayType(T.ArrayType(
             T.DoubleType()))),
         T.StructField("last_ts", T.LongType()),
         T.StructField("last_ord", T.LongType())]
        + [T.StructField(f"last_v{i}", T.DoubleType())
           for i in range(len(values))])


def asof_enrich_stream(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    by: str,
    values: Sequence[str],
    probe_ord_col: str | None = None,
    build_ord_col: str | None = None,
    idle_evict_ms: int = 3_600_000,
) -> DataFrame:
    """Continuous backward as-of join of two watermarked streams.
    Emits one row per probe event: (key, event_time, ord, *values,
    asof_ts, asof_ord), the value/asof columns null when no build
    observation at-or-before exists yet."""
    key_field = probe.schema[by]
    out_schema = _out_schema(key_field, values)
    n_vals = len(values)

    def tag(df: DataFrame, side: int, ord_col: str | None,
            with_vals: bool) -> DataFrame:
        cols = [F.col(by), F.col(on).alias("__t__"),
                F.lit(side).alias("__side__"),
                (F.col(ord_col).cast("long") if ord_col
                 else F.lit(0)).alias("__ord__")]
        for i, v in enumerate(values):
            src = F.col(v) if with_vals else F.lit(None)
            cols.append(src.cast("double").alias(f"__v{i}__"))
        return df.select(*cols)

    u = tag(probe, 1, probe_ord_col, False).unionByName(
        tag(build, 0, build_ord_col, True))

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            pending = [(t, s, o, tuple(v))
                       for t, s, o, v in zip(st[0], st[1], st[2], st[3])]
            last: Obs = (None if st[4] is None
                         else (st[4], st[5], tuple(st[6:6 + n_vals])))
        else:
            pending, last = [], None
        if not state.hasTimedOut:
            for pdf in pdfs:
                if pdf.empty:
                    continue
                ts = (pdf["__t__"].astype("datetime64[us]")
                      .astype("int64"))
                vals = [pdf[f"__v{i}__"].astype("float64")
                        for i in range(n_vals)]
                pending.extend(
                    (int(t), int(s), int(o),
                     tuple(float(col.iloc[i]) if pd.notna(col.iloc[i])
                           else None for col in vals))
                    for i, (t, s, o) in enumerate(
                        zip(ts, pdf["__side__"], pdf["__ord__"])))
            pending.sort(key=lambda r: r[:3])
        wm_us = state.getCurrentWatermarkMs() * 1000
        cut = 0
        while cut < len(pending) and pending[cut][0] <= wm_us:
            cut += 1
        final, rest = pending[:cut], pending[cut:]
        emitted, last = run_asof_enrich(final, last)
        if state.hasTimedOut and not rest:
            state.remove()  # idle horizon passed: drop the observation
        else:
            flat = ((last[0], last[1]) + last[2]) if last is not None \
                else (None, None) + (None,) * n_vals
            state.update((
                [t for t, _, _, _ in rest], [s for _, s, _, _ in rest],
                [o for _, _, o, _ in rest],
                [list(v) for _, _, _, v in rest]) + flat)
            wm_ms = max(wm_us // 1000, 0)
            state.setTimeoutTimestamp(
                wm_ms + (1 if rest else idle_evict_ms))
        if emitted:
            def vcol(i):
                # nullable dtype: a missing match must surface as SQL
                # NULL, not NaN (batch-parity), so no bare float list
                return pd.array([m[2][i] if m is not None else None
                                 for _, _, m in emitted], dtype="Float64")
            yield pd.DataFrame(
                {by: [key[0]] * len(emitted),
                 "event_time": [pd.Timestamp(t, unit="us")
                                for t, _, _ in emitted],
                 "ord": [o for _, o, _ in emitted]}
                | {v: vcol(i) for i, v in enumerate(values)}
                | {"asof_ts": [pd.Timestamp(m[0], unit="us")
                               if m is not None else pd.NaT
                               for _, _, m in emitted],
                   "asof_ord": pd.array(
                       [m[1] if m is not None else None
                        for _, _, m in emitted], dtype="Int64")})

    return u.groupBy(by).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_state_schema(values),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
