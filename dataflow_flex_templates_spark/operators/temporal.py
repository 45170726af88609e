"""Temporal join operators Spark lacks as built-ins: as-of join,
bucketed range join, and fixed-grid LOCF resampling.

All three are single-shuffle compositions of DataFrame primitives —
no Python in the hot path, no non-equi join ever reaches the planner
(a naive ``l.ts >= r.ts`` join plans as BroadcastNestedLoopJoin /
CartesianProduct, which is O(n·m) and unusable at 100 TB):

- ``asof_join``: the classic union-tag + last(ignorenulls) window
  kernel. Probe and build rows are unioned, sorted once per key by
  (time, side), and the running "last build row seen" is carried
  forward — one shuffle on the key, O(n log n) per partition, linear
  state. The same kernel runs backward (latest build <= probe) and
  forward (earliest build >= probe) as-of.
- ``range_join_buckets``: interval × point join via fixed-width
  bucket explosion. Each interval is replicated to the O(len/width)
  buckets it covers, points hash to exactly one bucket, and the join
  is a plain equi-join on bucket id (+ optional keys) with the exact
  predicate re-checked — candidate cost is bounded by bucket
  occupancy, never |intervals|×|points|. Pick ``bucket`` near the
  median interval length so replication stays O(1) per interval.
- ``resample_locf``: per-key fixed-step grid (epoch-aligned) filled
  by last-observation-carried-forward — grid generation is
  ``sequence``+``explode`` (JVM-side), the fill is ``asof_join``.

Reference parity note: the reference engine has no temporal joins —
these cover SURVEY.md's training-pipeline extension surface (aligning
clip streams to the latest config/calibration revision, windowed
incident attribution, gap-free feature grids).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SIDE = "__asof_side__"
_MATCH_T = "__asof_match_t__"


_TS_TYPES = (T.TimestampType, T.TimestampNTZType)


def _as_long(col, dtype) -> "F.Column":
    """Numeric image of a time column: microseconds for timestamps
    (incl. NTZ — a bare cast-to-long would truncate to seconds), the
    value itself for integral/float types."""
    if isinstance(dtype, _TS_TYPES):
        return F.unix_micros(col.cast("timestamp"))
    return col.cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    values: Sequence[str],
    direction: str = "backward",
    tolerance: int | None = None,
    right_ord_col: str | None = None,
    match_time_col: str | None = "asof_ts",
) -> DataFrame:
    """As-of join: for every left row, attach ``values`` from the
    single right row with the same ``by`` key and the latest
    ``on`` <= left's (backward) or earliest >= left's (forward),
    ties at equal time matching. Left outer: unmatched rows keep
    nulls.

    The ENTIRE matched right row is carried as one struct (SQL ASOF
    semantics): a right row whose ``values`` are all null still
    matches, and its nulls surface as nulls in the output — it is NOT
    skipped in favor of an older non-null row (per-column carry would
    stitch values from different rows; see
    test_asof_join_struct_carry_not_columnwise). For deterministic
    results right must be unique per (by, on) — or pass
    ``right_ord_col`` and the largest ordinal wins among equal
    timestamps.

    ``tolerance``: maximum |left.on - right.on| for a match, in
    microseconds for timestamp columns / raw units for numeric ones;
    matches farther away revert to null.

    Plan shape: unionByName (no shuffle) → one exchange on ``by`` →
    single window sort shared by every carried column. Nothing
    non-equi reaches the join planner.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    ord_cols = [right_ord_col] if right_ord_col else []
    clash = ((set(values) | set(ord_cols) | {_SIDE, _MATCH_T})
             & set(left.columns))
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")
    on_type = right.schema[on].dataType

    l_tag = left.withColumn(_SIDE, F.lit(1))
    r_tag = (right.select(*by, on, *values, *ord_cols)
             .withColumn(_SIDE, F.lit(0)))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # sort (time, side, ord): build rows precede the probe row at equal
    # time (equal-time matches allowed), ord ascending so the largest
    # ordinal is the innermost build row and wins last(); the probe
    # row's null ord must NOT participate in ordering before side does
    t = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    order = [t, F.col(_SIDE).asc()] + [F.col(c).asc() for c in ord_cols]
    w = (Window.partitionBy(*by).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))

    # carry the ENTIRE matched build row as one struct — per-column
    # carry would stitch values from different build rows, which is
    # not an as-of join (and diverges from SQL ASOF semantics)
    payload = F.when(F.col(_SIDE) == 0,
                     F.struct(F.col(on).alias(_MATCH_T),
                              *[F.col(v) for v in values]))
    filled = u.withColumn("__asof_m__",
                          F.last(payload, ignorenulls=True).over(w))

    out = filled.filter(F.col(_SIDE) == 1).drop(_SIDE, *ord_cols)
    for v in values:
        out = out.withColumn(v, F.col(f"__asof_m__.{v}"))
    out = (out.withColumn(_MATCH_T, F.col(f"__asof_m__.{_MATCH_T}"))
           .drop("__asof_m__"))
    if tolerance is not None:
        lt = _as_long(F.col(on), on_type)
        rt = _as_long(F.col(_MATCH_T), on_type)
        gap = (lt - rt) if direction == "backward" else (rt - lt)
        ok = F.col(_MATCH_T).isNotNull() & (gap <= F.lit(int(tolerance)))
        for v in values:
            out = out.withColumn(v, F.when(ok, F.col(v)))
        out = out.withColumn(_MATCH_T, F.when(ok, F.col(_MATCH_T)))
    if match_time_col:
        out = out.withColumnRenamed(_MATCH_T, match_time_col)
    else:
        out = out.drop(_MATCH_T)
    return out


def range_join_buckets(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    point_col: str,
    bucket: int,
    by: Sequence[str] = (),
) -> DataFrame:
    """Interval × point join on ``start <= point < end`` (half-open),
    optionally also equi-keyed on ``by``, WITHOUT a non-equi join:
    intervals explode to the fixed-width buckets they cover, points
    hash to exactly one bucket, the join is a bucket equi-join and the
    exact predicate is re-applied. Each qualifying pair surfaces
    exactly once (a point lives in one bucket).

    ``bucket`` is the width in microseconds (timestamp columns) or raw
    units (numeric). Cost: |intervals| × ceil(len/bucket) replicated
    rows; an interval spanning B buckets appears B times, so size the
    bucket near the median interval length.
    """
    if bucket <= 0:
        raise ValueError("bucket width must be positive")
    clash = set(intervals.columns) & set(points.columns) - set(by)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")
    s_type = intervals.schema[start_col].dataType
    p_type = points.schema[point_col].dataType

    s_l = _as_long(F.col(start_col), s_type)
    e_l = _as_long(F.col(end_col), s_type)
    iv = (intervals.filter(e_l > s_l)
          .withColumn("__bkt__", F.explode(F.sequence(
              F.floor(s_l / bucket), F.floor((e_l - 1) / bucket)))))
    pt = points.withColumn(
        "__bkt__", F.floor(_as_long(F.col(point_col), p_type) / bucket))

    cond = [iv["__bkt__"] == pt["__bkt__"]]
    cond += [iv[k] == pt[k] for k in by]
    joined = (iv.join(pt, cond, "inner")
              .filter((pt[point_col] >= iv[start_col])
                      & (pt[point_col] < iv[end_col])))
    keep = [iv[c] for c in intervals.columns] + \
           [pt[c] for c in points.columns if c not in by]
    return joined.select(*keep)


def resample_locf(
    df: DataFrame,
    on: str,
    by: Sequence[str],
    values: Sequence[str],
    step: int,
    right_ord_col: str | None = None,
    grid_col: str = "grid_ts",
) -> DataFrame:
    """Per-key fixed-step resampling with last-observation-carried-
    forward: emit one row per key per grid tick between the key's
    first observation (floored to the epoch-aligned ``step`` grid) and
    its last, each carrying the most recent at-or-before observation
    of every value column. Grid ticks before the first observation
    (only the floored tick can be) carry nulls.

    ``step`` in microseconds for timestamp ``on`` / raw units for
    numeric. Grid generation is sequence+explode per key — pure JVM —
    and the fill is :func:`asof_join`'s single-shuffle kernel.
    """
    if step <= 0:
        raise ValueError("step must be positive")
    on_type = df.schema[on].dataType
    is_ts = isinstance(on_type, _TS_TYPES)
    t_long = _as_long(F.col(on), on_type)

    bounds = df.groupBy(*by).agg(
        F.min(t_long).alias("__t0__"), F.max(t_long).alias("__t1__"))
    g0 = F.floor(F.col("__t0__") / step) * step
    ticks = F.sequence(g0, F.col("__t1__"), F.lit(int(step)))
    grid = bounds.select(*by, F.explode(ticks).alias("__g__"))
    # cast back to the source's exact timestamp flavor (TZ vs NTZ) so
    # the union inside asof_join type-checks
    gexpr = (F.timestamp_micros(F.col("__g__")).cast(on_type) if is_ts
             else F.col("__g__").cast(on_type))
    grid = grid.select(*by, gexpr.alias(on))

    out = asof_join(grid, df.select(*by, on, *values, *(
        [right_ord_col] if right_ord_col else [])),
        on=on, by=by, values=list(values),
        right_ord_col=right_ord_col, match_time_col="asof_ts")
    return out.withColumnRenamed(on, grid_col)


def ewma_smooth(df: DataFrame, key_col: str, order_col: str,
                value_col: str, alpha_num: int = 3,
                alpha_den: int = 10) -> DataFrame:
    """Per-key exponentially-weighted moving average over an
    event-time-ordered integer series — the standard smoother for
    noisy per-clip loudness / rate metrics before alerting on them.

    Integer recurrence (``alpha = alpha_num/alpha_den``), truncating
    at every step so the oracle replays it bit-for-bit::

        s_1 = v_1
        s_t = (alpha_num * v_t + (alpha_den - alpha_num) * s_{t-1})
              div alpha_den

    Values must be NON-NEGATIVE: on negatives the three engines'
    integer divisions disagree (Spark ``div`` truncates toward zero,
    python ``//`` and DuckDB ``//`` floor) and the recurrence
    amplifies the one-off.

    Like CUSUM/debounce, the recurrence runs as the shared python
    kernel (:func:`run_ewma` — the same function the streaming EWMA
    state handler replays) under one Arrow ``applyInPandas`` pass:
    sort the key's batch by (order, value) — the tie-break
    ``array_sort`` used to give — then one linear fold. A Catalyst
    ``aggregate``+``array_append`` fold was the previous formulation
    but copies the accumulator array each step (O(n²) in per-key
    series length); the Arrow kernel is O(n) with identical
    bit-for-bit output.

    Scale: one shuffle on the key; the fold is sequential per key (the
    only parallelism a recurrence admits — same argument as
    changepoint.py). Per-key series should be horizon-bounded
    (windowed aggregates, not raw events) — a key's series must fit
    one Arrow batch.
    """
    import pandas as pd

    an, ad = alpha_num, alpha_den
    key_type = df.schema[key_col].dataType.simpleString()
    out_schema = (f"{key_col} {key_type}, {order_col} bigint, "
                  f"{value_col} bigint, ewma_q bigint")

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(["__o__", "__v__"], kind="mergesort")
        rows, _ = run_ewma(
            list(zip(pdf["__o__"].tolist(), pdf["__v__"].tolist())),
            an, ad)
        return pd.DataFrame({
            key_col: pdf[key_col].to_numpy(),
            order_col: [r[0] for r in rows],
            value_col: [r[1] for r in rows],
            "ewma_q": [r[2] for r in rows],
        })

    return (df.select(F.col(key_col),
                      F.col(order_col).cast("long").alias("__o__"),
                      F.col(value_col).cast("long").alias("__v__"))
            .groupBy(F.col(key_col))
            .applyInPandas(fn, out_schema))


def run_ewma(pairs: list[tuple[int, int]], alpha_num: int,
             alpha_den: int, carry: int | None = None
             ) -> tuple[list[tuple[int, int, int]], int | None]:
    """Feed (order, value) pairs — ALREADY sorted by (order, value),
    the same tie-break array_sort gives the JVM fold — through the
    truncating EWMA recurrence, seeding from ``carry`` (the smoothed
    value carried across micro-batches; None = fresh key). Returns
    ([(order, value, smoothed)], new_carry). Pure python — shared by
    the streaming state function and the batch↔streaming parity
    tests; bit-equal to :func:`ewma_smooth`'s Catalyst fold."""
    out = []
    dn = alpha_den - alpha_num
    for o, v in pairs:
        carry = v if carry is None else (
            (alpha_num * v + dn * carry) // alpha_den)
        out.append((o, v, carry))
    return out, carry


def rolling_stats(df: DataFrame, key_col: str, ts_col: str,
                  val_col: str, window_us: int,
                  id_col: str = "event_id") -> DataFrame:
    """Per-key trailing time-window aggregate — the RANGE-frame window
    ("events and value sum in the last N minutes per user") that
    monitoring and feature pipelines compute per event row.

    The frame is a true RANGE frame on microsecond epoch
    (``unix_micros``), NOT a row frame: the window is defined by time
    bounds, so output is deterministic regardless of tie order among
    equal timestamps, and the same ``RANGE BETWEEN n PRECEDING``
    algebra runs verbatim in an ANSI-SQL oracle. ``val_col`` is summed
    in cents (``*100`` cast long) to keep the oracle hash-exact.

    Scale: one shuffle on the key; the frame is evaluated by a single
    per-partition sort with a sliding two-pointer pass (Spark's window
    RANGE implementation) — no self-join, no explode. At 100 TB the
    cost is the keyed sort, which bucketing by key removes.
    """
    # NTZ columns cast wall-clock-identically under the session's
    # pinned UTC timezone (session.py), matching naive epoch_us in SQL
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cents = F.floor(F.col(val_col) * 100)  # floor, not cast: identical
    # for negatives across engines (CAST rounds in DuckDB, truncates
    # in Spark; floor agrees everywhere)
    w = (Window.partitionBy(key_col).orderBy(F.col("t_us").asc())
         .rangeBetween(-window_us, 0))
    return (df.select(key_col, t_us.alias("t_us"),
                      cents.alias("val_cents"), F.col(id_col))
            .withColumn("n_window", F.count("*").over(w))
            .withColumn("sum_cents_window",
                        F.sum("val_cents").over(w)))


def retention_cohorts(df: DataFrame, key_col: str, ts_col: str,
                      period_us: int = 86_400_000_000) -> DataFrame:
    """Cohort retention triangle: users grouped by their first-active
    period (cohort), counted on every later period they return —
    the (cohort_day, day_offset, n_users) table behind every
    retention curve.

    Integer-exact throughout: period index = epoch-micros DIV
    period_us (integer division, never float — a float quotient can
    round k*period up/down across the boundary). The pipeline reduces
    rows to DISTINCT (key, period) pairs at the scan, so every
    shuffle afterwards carries two longs per active-user-day, never
    events; the final count is a plain COUNT(*) because (cohort,
    offset, key) is already unique by construction.
    """
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    days = (df.select(F.col(key_col),
                      (t_us - (t_us % period_us)).alias("t0"))
            .select(key_col, (F.col("t0") / period_us)
                    .cast("long").alias("day"))
            .distinct())
    cohort = days.groupBy(key_col).agg(F.min("day").alias("cohort_day"))
    joined = days.join(cohort, key_col)
    return (joined
            .groupBy("cohort_day",
                     (F.col("day") - F.col("cohort_day"))
                     .alias("day_offset"))
            .agg(F.count("*").alias("n_users")))


def merge_intervals(df: DataFrame, key_col: str, start_col: str,
                    end_col: str, gap: int = 0) -> DataFrame:
    """Merge overlapping / near-adjacent integer intervals per key
    into maximal islands — VAD speech segments into speech regions,
    utterance spans into takes, retention windows into coverage
    ranges: ``(key_col, island_idx, start, end, n_intervals)``.

    The classic gaps-and-islands recurrence, kept exactly integral so
    a SQL oracle matches bit-for-bit: an interval OPENS a new island
    iff its start exceeds the running max end of all earlier
    intervals (in (start, end) order) by more than ``gap``;
    ``island_idx`` is the 0-based running count of openers. Intervals
    touching the boundary (``start == prev_max_end + gap``) MERGE —
    with ``gap=0``, [0,5] and [5,9] are one island (half-open
    convention [start, end)).

    Scale: ONE Exchange on the key; both windows (prior-running-max,
    opener running count) and the final per-island aggregate share
    the same partitioning — Catalyst plans a single shuffle + sort
    (plan-asserted in tests). This is the batch twin of a gap-based
    session window: for the CONTINUOUS path, Spark's native
    ``session_window`` with the same gap is the streaming engine's
    own implementation of this recurrence (`streaming/windows.py
    session_agg` — state ∝ open sessions), so no bespoke fold is
    needed here.

    Rows with NULL start or end are dropped (an interval without
    bounds merges with nothing — documented, mirroring
    ``heavy_hitters``' NULL-key rule); ``end < start`` raises at plan
    build via a validating projection.
    """
    from dataflow_flex_templates_spark.operators.shard import (
        _check_clash,
    )

    _check_clash(df, "island_idx", "n_intervals",
                 "__prev_max_end", "__opens")
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    iv = (df.select(F.col(key_col), s.alias("__s"), e.alias("__e"))
          .where(s.isNotNull() & e.isNotNull())
          .withColumn("__e", F.when(
              F.col("__e") < F.col("__s"),
              F.raise_error(F.concat(
                  F.lit("merge_intervals: end < start for key="),
                  F.col(key_col).cast("string"))))
              .otherwise(F.col("__e"))))
    # prev-max and opener-count MUST share one sort spec — both frames
    # derive from the same window object so the ordering cannot drift
    w = Window.partitionBy(key_col).orderBy("__s", "__e")
    prior = w.rowsBetween(Window.unboundedPreceding, -1)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    iv = (iv.withColumn("__prev_max_end", F.max("__e").over(prior))
          .withColumn("__opens",
                      F.when(F.col("__prev_max_end").isNull()
                             | (F.col("__s")
                                > F.col("__prev_max_end")
                                + F.lit(int(gap))), 1).otherwise(0))
          .withColumn("island_idx",
                      (F.sum("__opens").over(run) - 1).cast("long")))
    return (iv.groupBy(key_col, "island_idx")
            .agg(F.min("__s").alias("start"),
                 F.max("__e").alias("end"),
                 F.count(F.lit(1)).cast("long").alias("n_intervals")))


def interval_gaps(df: DataFrame, key_col: str, start_col: str,
                  end_col: str, gap: int = 0) -> DataFrame:
    """The complement of :func:`merge_intervals`: the maximal EMPTY
    ranges between a key's islands — silence between speech regions,
    coverage holes between retention windows:
    ``(key_col, gap_idx, gap_start, gap_end, gap_len)``, where
    ``gap_idx`` counts holes in order and the hole spans
    ``[prev island end, next island start)`` (half-open, so
    ``gap_len = gap_start-to-end`` difference exactly; a key with one
    island emits nothing — holes are INTERIOR by definition, since
    exterior silence has no data-defined boundary).

    Derivation: merge first (one Exchange), then one ``lead`` window
    over the |islands|-sized result — same key partitioning, so
    Catalyst inserts no second shuffle (plan-asserted). Exact integer
    algebra end-to-end; ``gap`` has the same bridging meaning as in
    the merge (bridged holes ≤ gap simply don't exist)."""
    islands = merge_intervals(df, key_col, start_col, end_col, gap)
    w = Window.partitionBy(key_col).orderBy("island_idx")
    nxt = F.lead("start").over(w)
    return (islands
            .withColumn("__next_start", nxt)
            .where(F.col("__next_start").isNotNull())
            .select(F.col(key_col),
                    F.col("island_idx").alias("gap_idx"),
                    F.col("end").alias("gap_start"),
                    F.col("__next_start").alias("gap_end"),
                    (F.col("__next_start") - F.col("end"))
                    .cast("long").alias("gap_len")))
