"""CEP sequence detection: keyed event-pattern matching with bounded
state (``applyInPandasWithState``).

The north_star frames this engine as a streaming CEP/ETL engine; the
ETL half is the spec-driven graph pipeline, THIS is the CEP half — the
canonical "A then B then C within T per key" pattern, built the only
way it can be correct on an out-of-order stream:

  1. new events are BUFFERED in keyed state (never matched eagerly);
  2. on every trigger, the prefix of buffered events whose event time
     is ≤ the current watermark is final (no earlier event can still
     arrive) — it is sorted and fed through the pattern automaton;
  3. completed matches emit (key, match_start, match_end);
  4. the unfinalized suffix stays buffered; an event-time timeout
     FLUSHES an idle key's finalized buffer (matching anything still
     pending) and evicts it once empty, so state is bounded by
     (watermark delay + idle horizon) per active key — never the
     stream history.

Matching semantics: non-overlapping, first-match-restart, total span
of a match ≤ ``within``. Deterministic: ties in event time break on
the event string, so replay/parallelism produce identical matches.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _out_schema(key_field: T.StructField) -> T.StructType:
    return T.StructType([
        key_field,
        T.StructField("match_start", T.TimestampType()),
        T.StructField("match_end", T.TimestampType()),
        T.StructField("n_events", T.IntegerType()),
    ])


_STATE_SCHEMA = T.StructType([
    T.StructField("buf_ts", T.ArrayType(T.LongType())),     # micros
    T.StructField("buf_ev", T.ArrayType(T.StringType())),
    T.StructField("stage", T.IntegerType()),
    T.StructField("match_start", T.LongType()),              # micros
])


def run_automaton(
    events: list[tuple[int, str]],
    pattern: list[str],
    within_us: int,
    stage: int = 0,
    match_start: int = -1,
) -> tuple[list[tuple[int, int]], int, int]:
    """Feed time-ordered (ts_us, event) pairs through the sequence
    automaton. Returns (matches, stage, match_start) where matches are
    (start_us, end_us) spans. Pure python — shared by the streaming
    state function and the batch/test oracle."""
    matches: list[tuple[int, int]] = []
    for ts, ev in events:
        if stage > 0 and match_start >= 0 and ts - match_start > within_us:
            stage, match_start = 0, -1          # window expired
        if ev == pattern[stage]:
            if stage == 0:
                match_start = ts
            stage += 1
            if stage == len(pattern):
                matches.append((match_start, ts))
                stage, match_start = 0, -1      # non-overlapping restart
        elif stage > 0 and ev == pattern[0]:
            # restart opportunity: a fresh A mid-sequence begins anew
            stage, match_start = 1, ts
    return matches, stage, match_start


def detect_sequence(
    df: DataFrame,
    key_col: str,
    event_col: str,
    pattern: list[str],
    within: str = "60 seconds",
    event_time_col: str = "event_time",
    idle_evict_ms: int = 60_000,
) -> DataFrame:
    """Detect ``pattern`` (ordered event names) per key within the
    ``within`` span, over a watermarked streaming DataFrame.

    Emits one row per completed match: (key, match_start, match_end,
    n_events). ``df`` must have ``withWatermark`` applied on
    ``event_time_col``.
    """
    import re

    m = re.match(r"(\d+)\s*(second|minute|hour)s?", within.strip())
    if not m:
        raise ValueError(f"unparseable within: {within!r}")
    mult = {"second": 1_000_000, "minute": 60_000_000,
            "hour": 3_600_000_000}[m.group(2)]
    within_us = int(m.group(1)) * mult
    n_events = len(pattern)

    key_field = df.schema[key_col]
    out_schema = _out_schema(key_field)

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        buf_ts, buf_ev, stage, mstart = (
            state.get if state.exists else ([], [], 0, -1))
        pending = list(zip(buf_ts, buf_ev))
        timed_out = state.hasTimedOut
        if not timed_out:
            for pdf in pdfs:
                if pdf.empty:
                    continue
                ts = (pdf[event_time_col].astype("datetime64[us]")
                      .astype("int64"))
                pending.extend(zip((int(x) for x in ts),
                                   (str(e) for e in pdf[event_col])))
            pending.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000
        cut = 0
        while cut < len(pending) and pending[cut][0] <= wm_us:
            cut += 1
        final, rest = pending[:cut], pending[cut:]
        matches, stage, mstart = run_automaton(
            final, pattern, within_us, stage, mstart)
        if timed_out and not rest:
            # idle key fully flushed — evict (bounded state)
            state.remove()
        else:
            state.update(([t for t, _ in rest], [e for _, e in rest],
                          stage, mstart))
            # non-empty buffer: re-fire on the next watermark advance
            # (no new traffic needed); empty: long idle-evict horizon
            wm_ms = max(wm_us // 1000, 0)
            state.setTimeoutTimestamp(wm_ms + (1 if rest else idle_evict_ms))
        if matches:
            yield pd.DataFrame({
                key_col: [key[0]] * len(matches),
                "match_start": [pd.Timestamp(s, unit="us")
                                for s, _ in matches],
                "match_end": [pd.Timestamp(e, unit="us")
                              for _, e in matches],
                "n_events": [n_events] * len(matches),
            })

    return df.groupBy(F.col(key_col)).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ------------------------------------------------------- negation/absence

_ABSENCE_STATE_SCHEMA = T.StructType([
    T.StructField("buf_ts", T.ArrayType(T.LongType())),     # micros
    T.StructField("buf_ev", T.ArrayType(T.StringType())),
])


def run_absence(
    events: list[tuple[int, str]],
    trigger: str,
    expected: str,
    within_us: int,
    wm_us: int,
) -> tuple[list[tuple[int, int]], list[tuple[int, str]]]:
    """Decide absence alerts over time-sorted (ts_us, event) pairs.

    A ``trigger`` at time t is DECIDABLE once the watermark passes
    t + within (no ``expected`` witness with ts ≤ t + within can still
    arrive). Decided triggers with no witness in (t, t + within] emit
    (t, t + within). Returns (alerts, remaining) where remaining keeps
    every event newer than the decision horizon — an expected event at
    or below the horizon cannot witness any still-undecided trigger
    (undecided t > horizon implies witness ts > t > horizon), so state
    stays bounded by the (within + watermark-delay) window per key.
    Pure python — shared by the streaming state fn and the test twin."""
    import bisect

    horizon = wm_us - within_us
    exp_ts = [ts for ts, ev in events if ev == expected]
    alerts: list[tuple[int, int]] = []
    for ts, ev in events:
        if ev == trigger and ts <= horizon:
            i = bisect.bisect_right(exp_ts, ts)
            witnessed = (i < len(exp_ts)
                         and exp_ts[i] <= ts + within_us)
            if not witnessed:
                alerts.append((ts, ts + within_us))
    remaining = [(ts, ev) for ts, ev in events if ts > horizon]
    return alerts, remaining


def detect_absence(
    df: DataFrame,
    key_col: str,
    event_col: str,
    trigger: str,
    expected: str,
    within: str = "60 seconds",
    event_time_col: str = "event_time",
    idle_evict_ms: int = 60_000,
) -> DataFrame:
    """CEP NEGATION pattern: emit (key, trigger_time, deadline) for
    every ``trigger`` event NOT followed by an ``expected`` event for
    the same key within the ``within`` span — the absence/timeout
    alert (order placed, never shipped). Same watermark-gated buffered
    design as :func:`detect_sequence`: a trigger is only decided once
    the watermark clears its deadline, so out-of-order witnesses are
    never missed; state per key is bounded by within + watermark delay.
    ``df`` must have ``withWatermark`` applied on ``event_time_col``.
    """
    import re

    m = re.match(r"(\d+)\s*(second|minute|hour)s?", within.strip())
    if not m:
        raise ValueError(f"unparseable within: {within!r}")
    mult = {"second": 1_000_000, "minute": 60_000_000,
            "hour": 3_600_000_000}[m.group(2)]
    within_us = int(m.group(1)) * mult

    key_field = df.schema[key_col]
    out_schema = T.StructType([
        key_field,
        T.StructField("trigger_time", T.TimestampType()),
        T.StructField("deadline", T.TimestampType()),
    ])

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        buf_ts, buf_ev = state.get if state.exists else ([], [])
        pending = list(zip(buf_ts, buf_ev))
        timed_out = state.hasTimedOut
        if not timed_out:
            for pdf in pdfs:
                if pdf.empty:
                    continue
                ts = (pdf[event_time_col].astype("datetime64[us]")
                      .astype("int64"))
                pending.extend(zip((int(x) for x in ts),
                                   (str(e) for e in pdf[event_col])))
            pending.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000
        alerts, rest = run_absence(pending, trigger, expected,
                                   within_us, wm_us)
        if timed_out and not rest:
            state.remove()
        else:
            state.update(([t for t, _ in rest], [e for _, e in rest]))
            # pending triggers must alarm when the watermark passes
            # their deadline even if the key goes quiet: re-fire on the
            # next watermark advance while anything is buffered
            wm_ms = max(wm_us // 1000, 0)
            state.setTimeoutTimestamp(wm_ms + (1 if rest else idle_evict_ms))
        if alerts:
            yield pd.DataFrame({
                key_col: [key[0]] * len(alerts),
                "trigger_time": [pd.Timestamp(s, unit="us")
                                 for s, _ in alerts],
                "deadline": [pd.Timestamp(d, unit="us")
                             for _, d in alerts],
            })

    return df.groupBy(F.col(key_col)).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_ABSENCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
