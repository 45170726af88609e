"""Temporal operators: as-of join, bucketed range join, LOCF resample.

Each operator is checked against an independent reference: a
brute-force python computation for the as-of kernel and a naive
non-equi Spark join for the bucketed range join — the operators must
be exact rewrites of those semantics, only with scalable plans.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataflow_flex_templates_spark.operators.temporal import (
    asof_join,
    range_join_buckets,
    resample_locf,
)

T0 = datetime(2025, 6, 1, tzinfo=timezone.utc)


def ts(s: float) -> datetime:
    return T0 + timedelta(seconds=s)


def _brute_asof(left_rows, right_rows, direction="backward",
                tolerance=None):
    """(key, t) probes against (key, t, v, ord) builds, pure python."""
    out = []
    for k, lt in left_rows:
        cands = [r for r in right_rows if r[0] == k
                 and (r[1] <= lt if direction == "backward" else r[1] >= lt)]
        if cands:
            # nearest time; among ties the largest ord wins
            best_t = (max if direction == "backward" else min)(
                c[1] for c in cands)
            best = max((c for c in cands if c[1] == best_t),
                       key=lambda c: c[3])
            gap = abs(lt - best[1])
            if tolerance is not None and gap > tolerance:
                out.append((k, lt, None, None))
            else:
                out.append((k, lt, best[2], best[1]))
        else:
            out.append((k, lt, None, None))
    return sorted(out, key=lambda x: (x[0], x[1]))


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_bruteforce(spark, direction):
    rng = random.Random(42)
    left_rows = [(rng.randrange(6), rng.randrange(1000))
                 for _ in range(300)]
    right_rows = [(rng.randrange(6), rng.randrange(1000),
                   float(i), i) for i in range(200)]
    # inject exact time collisions (probe==build and build==build)
    right_rows += [(0, left_rows[0][1], 777.0, 9000),
                   (0, left_rows[0][1], 778.0, 9001)]

    l_df = spark.createDataFrame(left_rows, "k int, t long")
    r_df = spark.createDataFrame(right_rows, "k int, t long, v double, o long")

    got = sorted(
        (r["k"], r["t"], r["v"],
         r["asof_ts"]) for r in asof_join(
            l_df, r_df, on="t", by=["k"], values=["v"],
            direction=direction, right_ord_col="o").collect())
    want = _brute_asof(left_rows, right_rows, direction)
    assert got == [(k, t, v, mt) for k, t, v, mt in want]


def test_asof_join_tolerance_and_timestamps(spark):
    l_df = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "t": [ts(100), ts(500), ts(100)]}))
    r_df = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2],
                      "t": [ts(90), ts(100), ts(400)],
                      "v": [1.0, 2.0, 3.0]}))
    out = {(r["k"], r["t"].replace(tzinfo=timezone.utc)): (r["v"], r["asof_ts"])
           for r in asof_join(l_df, r_df, on="t", by=["k"], values=["v"],
                              tolerance=60 * 1_000_000).collect()}
    assert out[(1, ts(100))][0] == 2.0          # equal-time match
    assert out[(1, ts(500))] == (None, None)    # 400 s gap > 60 s tol
    assert out[(2, ts(100))] == (None, None)    # no build row before


def test_asof_join_struct_carry_not_columnwise(spark):
    """A build row with a null value column must surface that null —
    not a stitched older non-null from a different row (SQL ASOF
    semantics)."""
    l_df = spark.createDataFrame([(1, 10)], "k int, t long")
    r_df = spark.createDataFrame(
        [(1, 1, 5.0, 5.0), (1, 2, 7.0, None)],
        "k int, t long, a double, b double")
    row = asof_join(l_df, r_df, on="t", by=["k"],
                    values=["a", "b"]).collect()[0]
    assert (row["a"], row["b"], row["asof_ts"]) == (7.0, None, 2)


def test_asof_join_rejects_column_collision(spark):
    l_df = spark.createDataFrame([(1, 1, 2.0)], "k int, t long, v double")
    r_df = spark.createDataFrame([(1, 1, 3.0)], "k int, t long, v double")
    with pytest.raises(ValueError, match="collision"):
        asof_join(l_df, r_df, on="t", by=["k"], values=["v"])


def test_range_join_buckets_matches_naive(spark):
    rng = random.Random(7)
    ivs = [(i, rng.randrange(0, 5000),) for i in range(80)]
    ivs = [(i, s, s + rng.randrange(1, 400)) for i, s in ivs]
    pts = [(j, rng.randrange(0, 5500)) for j in range(600)]
    iv_df = spark.createDataFrame(ivs, "iv_id int, s long, e long")
    pt_df = spark.createDataFrame(pts, "pt_id int, p long")

    got = sorted((r["iv_id"], r["pt_id"]) for r in range_join_buckets(
        iv_df, pt_df, "s", "e", "p", bucket=128).collect())
    want = sorted((i, j) for i, s, e in ivs for j, p in pts
                  if s <= p < e)
    assert got == want
    # half-open: a point exactly at e is excluded, at s included
    assert all(s <= p < e for (i, j) in got
               for (i2, s, e) in ivs if i2 == i
               for (j2, p) in pts if j2 == j)


def test_range_join_buckets_keyed_and_timestamps(spark):
    iv_df = spark.createDataFrame(
        pd.DataFrame({"u": [1, 2], "s": [ts(0), ts(0)],
                      "e": [ts(100), ts(100)]}))
    pt_df = spark.createDataFrame(
        pd.DataFrame({"u": [1, 1, 2], "p": [ts(50), ts(150), ts(50)],
                      "pt_id": [10, 11, 12]}))
    got = sorted((r["u"], r["pt_id"]) for r in range_join_buckets(
        iv_df, pt_df, "s", "e", "p", bucket=30 * 1_000_000,
        by=["u"]).collect())
    assert got == [(1, 10), (2, 12)]  # key match required; 150s outside


def test_range_join_no_nested_loop_in_plan(spark):
    iv_df = spark.createDataFrame([(1, 0, 10)], "iv_id int, s long, e long")
    pt_df = spark.createDataFrame([(1, 5)], "pt_id int, p long")
    plan = range_join_buckets(iv_df, pt_df, "s", "e", "p",
                              bucket=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_resample_locf_daily_grid(spark):
    day = 86_400_000_000
    obs = pd.DataFrame({
        "k": [1, 1, 1, 2],
        "t": [ts(3600), ts(2 * 86400 + 60), ts(4 * 86400), ts(0)],
        "v": [10.0, 20.0, 30.0, 5.0],
    })
    out = resample_locf(spark.createDataFrame(obs), on="t", by=["k"],
                        values=["v"], step=day)
    got = sorted((r["k"], r["grid_ts"].replace(tzinfo=timezone.utc),
                  r["v"]) for r in out.collect())
    assert got == [
        (1, ts(0), None),            # grid floor precedes first obs
        (1, ts(86400), 10.0),
        (1, ts(2 * 86400), 10.0),    # tick at 2d is before obs at 2d+60s
        (1, ts(3 * 86400), 20.0),
        (1, ts(4 * 86400), 30.0),    # tick == obs time: equal-time match
        (2, ts(0), 5.0),
    ]


def test_ewma_smooth_integer_recurrence(spark):
    """Hand-checked truncating EWMA (alpha=3/10): s1=v1, then
    s_t = (3 v_t + 7 s_{t-1}) div 10; keys fold independently."""
    from dataflow_flex_templates_spark.operators.temporal import (
        ewma_smooth,
    )

    rows = [("a", 1, 10), ("a", 2, 20), ("a", 3, 0), ("b", 1, 100)]
    df = spark.createDataFrame(rows, "k string, t long, v long")
    out = [tuple(r) for r in
           ewma_smooth(df, "k", "t", "v").orderBy("k", "t").collect()]
    assert out == [("a", 1, 10, 10),   # seed
                   ("a", 2, 20, 13),   # (60 + 70) div 10
                   ("a", 3, 0, 9),     # (0 + 91) div 10
                   ("b", 1, 100, 100)]


def test_ewma_smooth_long_single_key_linear(spark):
    """A 10k-event single-key series completes in seconds (the old
    Catalyst array_append fold was O(n²) per key) and stays bit-equal
    to the shared python kernel run_ewma."""
    import time

    from dataflow_flex_templates_spark.operators.temporal import (
        ewma_smooth,
        run_ewma,
    )

    n = 10_000
    vals = [(i * 1103515245 + 12345) % 10_000 for i in range(n)]
    df = spark.createDataFrame([("k", i, v) for i, v in enumerate(vals)],
                               "k string, t long, v long").coalesce(4)
    t0 = time.monotonic()
    got = [(r.t, r.v, r.ewma_q) for r in
           ewma_smooth(df, "k", "t", "v").orderBy("t").collect()]
    elapsed = time.monotonic() - t0
    want, _ = run_ewma(list(enumerate(vals)), 3, 10)
    assert got == want
    assert elapsed < 60, f"ewma_smooth 10k-row key took {elapsed:.1f}s"


def test_rolling_stats_range_frame(spark):
    """RANGE frame semantics: the trailing window is time-bounded
    (inclusive), equal timestamps all see each other regardless of
    row order, and keys never mix."""
    import datetime as dt

    from dataflow_flex_templates_spark.operators.temporal import (
        rolling_stats,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, 1.0),
        (2, 1, t0 + dt.timedelta(seconds=300), 2.0),
        (3, 1, t0 + dt.timedelta(seconds=600), 4.0),   # 0s still in
        (4, 1, t0 + dt.timedelta(seconds=601), 8.0),   # 0s now out
        (5, 1, t0 + dt.timedelta(seconds=601), 16.0),  # tie with 4
        (6, 2, t0 + dt.timedelta(seconds=300), 32.0),  # other key
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    out = {r["event_id"]: r
           for r in rolling_stats(df, "user_id", "ts", "value",
                                  window_us=600_000_000).collect()}
    assert (out[1]["n_window"], out[1]["sum_cents_window"]) == (1, 100)
    assert (out[3]["n_window"], out[3]["sum_cents_window"]) == (3, 700)
    # boundary: t0 is 601s before events 4/5 -> excluded; ties included
    assert (out[4]["n_window"], out[4]["sum_cents_window"]) == (4, 3000)
    assert out[5]["n_window"] == 4 and out[5]["sum_cents_window"] == 3000
    assert (out[6]["n_window"], out[6]["sum_cents_window"]) == (1, 3200)


def test_retention_cohorts_triangle(spark):
    """Cohort = first-active day; offsets count distinct returning
    users; multiple events on one day collapse; day boundaries are
    integer-exact (23:59:59.999999 vs 00:00:00.000000)."""
    import datetime as dt

    from dataflow_flex_templates_spark.operators.temporal import (
        retention_cohorts,
    )

    d0 = dt.datetime(2024, 1, 1)

    def at(day, h=12):
        return d0 + dt.timedelta(days=day, hours=h)

    rows = [
        (1, at(0)), (1, at(0, 13)), (1, at(2)),      # cohort 0: d0, d2
        (2, at(0)), (2, at(1)),                      # cohort 0: d0, d1
        (3, at(1)),                                  # cohort 1: d1 only
        # boundary: last microsecond of day 0 vs first of day 1
        (4, d0 + dt.timedelta(days=1) - dt.timedelta(microseconds=1)),
        (4, d0 + dt.timedelta(days=1)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for r in retention_cohorts(df, "user_id", "ts").collect()}
    base = 19723  # days from epoch to 2024-01-01
    assert out[(base, 0)] == 3        # users 1, 2, 4 first active d0
    assert out[(base, 1)] == 2        # user 2 and user 4 (boundary!)
    assert out[(base, 2)] == 1        # user 1
    assert out[(base + 1, 0)] == 1    # user 3's own cohort
    assert (base + 1, 1) not in out


# ---- interval merging (gaps-and-islands) ---------------------------


def test_merge_intervals_closed_form(spark):
    """Hand-checked islands: overlap, containment, boundary-touch
    merge (half-open), gap split, per-key independence."""
    from dataflow_flex_templates_spark.operators.temporal import (
        merge_intervals,
    )

    rows = [("a", 0, 5), ("a", 3, 4), ("a", 5, 9),   # one island 0-9
            ("a", 12, 15),                           # gap of 3 > 0
            ("b", 0, 100), ("b", 10, 20),            # containment
            ("b", 150, 160)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {(r["k"], r["island_idx"]): (r["start"], r["end"],
                                       r["n_intervals"])
           for r in merge_intervals(df, "k", "s", "e").collect()}
    assert got == {("a", 0): (0, 9, 3), ("a", 1): (12, 15, 1),
                   ("b", 0): (0, 100, 2), ("b", 1): (150, 160, 1)}
    # gap tolerance bridges the 3-unit hole
    got2 = {(r["k"], r["island_idx"])
            for r in merge_intervals(df, "k", "s", "e", gap=3)
            .collect()}
    assert got2 == {("a", 0), ("b", 0), ("b", 1)}


def test_merge_intervals_reference(spark):
    """Random fuzz vs an independent interval-union reference."""
    import random

    from dataflow_flex_templates_spark.operators.temporal import (
        merge_intervals,
    )

    rng = random.Random(77)
    rows = []
    for i in range(600):
        s = rng.randrange(0, 5000)
        rows.append((f"k{i % 5}", s, s + rng.randrange(0, 80)))
    df = spark.createDataFrame(rows, "k string, s long, e long") \
        .repartition(8)
    gap = 7
    got = sorted((r["k"], r["start"], r["end"], r["n_intervals"])
                 for r in merge_intervals(df, "k", "s", "e", gap=gap)
                 .collect())
    ref = []
    by_key = {}
    for k, s, e in rows:
        by_key.setdefault(k, []).append((s, e))
    for k, ivs in by_key.items():
        cur = None
        for s, e in sorted(ivs):
            if cur and s <= cur[1] + gap:
                cur = (cur[0], max(cur[1], e), cur[2] + 1)
            else:
                if cur:
                    ref.append((k, *cur))
                cur = (s, e, 1)
        ref.append((k, *cur))
    assert got == sorted(ref)


def test_merge_intervals_single_exchange(spark):
    from dataflow_flex_templates_spark.operators.temporal import (
        merge_intervals,
    )

    df = spark.createDataFrame([("a", 1, 2)], "k string, s long, e long")
    out = merge_intervals(df, "k", "s", "e")
    out.collect()
    plan = (out._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert plan.count("Exchange hashpartitioning") == 1


def test_merge_intervals_guards(spark):
    import pytest as _pytest

    from dataflow_flex_templates_spark.operators.temporal import (
        merge_intervals,
    )

    bad = spark.createDataFrame([("a", 9, 3)], "k string, s long, e long")
    with _pytest.raises(Exception, match="end < start"):
        merge_intervals(bad, "k", "s", "e").collect()
    clash = spark.createDataFrame([("a", 1, 2, 0)],
                                  "k string, s long, e long, island_idx long")
    with _pytest.raises(ValueError, match="clash"):
        merge_intervals(clash, "k", "s", "e")
    # NULL-bounded intervals drop
    nulls = spark.createDataFrame(
        [("a", None, 5), ("a", 1, 4)], "k string, s long, e long")
    rows = merge_intervals(nulls, "k", "s", "e").collect()
    assert [(r["start"], r["end"]) for r in rows] == [(1, 4)]


def test_interval_gaps(spark):
    """Gaps are the exact complement of the islands: hand-checked
    holes, single-island keys emit nothing, derivation adds no second
    Exchange, and islands ∪ gaps tile each key's span."""
    from dataflow_flex_templates_spark.operators.temporal import (
        interval_gaps,
        merge_intervals,
    )

    rows = [("a", 0, 5), ("a", 8, 12), ("a", 20, 21),
            ("b", 0, 9), ("b", 3, 7)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {(r["k"], r["gap_idx"]): (r["gap_start"], r["gap_end"],
                                    r["gap_len"])
           for r in interval_gaps(df, "k", "s", "e").collect()}
    assert got == {("a", 0): (5, 8, 3), ("a", 1): (12, 20, 8)}

    out = interval_gaps(df, "k", "s", "e")
    out.collect()
    plan = (out._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert plan.count("Exchange hashpartitioning") == 1

    # tiling: islands + gaps reconstruct the contiguous span per key
    isl = merge_intervals(df, "k", "s", "e").collect()
    for k in ("a",):
        spans = sorted([(r["start"], r["end"]) for r in isl
                        if r["k"] == k]
                       + [(g[0], g[1]) for (kk, _), g in got.items()
                          if kk == k])
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 == s2
