"""Event-time windowed aggregations: tumbling / sliding / session.

The reference's only aggregation form is GROUP BY all-mapped-fields +
agg list (SURVEY.md §2.3); the north_rule extends it with event-time
windows and watermarks. These helpers wrap the built-in window
functions so spec-driven jobs can declare a window on any grouped
target; everything stays inside Catalyst (streaming hash aggregation
with watermark-based state eviction — no custom state code needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _agg_exprs(aggs: dict[str, str]) -> list:
    return [F.expr(e).alias(name) for name, e in aggs.items()]


def tumbling_agg(
    df: DataFrame,
    time_col: str,
    window_duration: str,
    group_cols: list[str],
    aggs: dict[str, str],
    watermark: str | None = None,
) -> DataFrame:
    """groupBy(window(ts, d), *keys).agg(...) — SURVEY §2.10."""
    if watermark:
        df = df.withWatermark(time_col, watermark)
    g = df.groupBy(F.window(F.col(time_col), window_duration), *group_cols)
    out = g.agg(*_agg_exprs(aggs))
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *group_cols, *aggs.keys(),
    )


def sliding_agg(
    df: DataFrame,
    time_col: str,
    window_duration: str,
    slide_duration: str,
    group_cols: list[str],
    aggs: dict[str, str],
    watermark: str | None = None,
) -> DataFrame:
    if watermark:
        df = df.withWatermark(time_col, watermark)
    g = df.groupBy(
        F.window(F.col(time_col), window_duration, slide_duration), *group_cols
    )
    out = g.agg(*_agg_exprs(aggs))
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *group_cols, *aggs.keys(),
    )


def session_agg(
    df: DataFrame,
    time_col: str,
    gap: str,
    group_cols: list[str],
    aggs: dict[str, str],
    watermark: str | None = None,
) -> DataFrame:
    """Session windows (F.session_window) — new capability vs the
    reference (SURVEY §2.10); gap-based session close."""
    if watermark:
        df = df.withWatermark(time_col, watermark)
    g = df.groupBy(F.session_window(F.col(time_col), gap), *group_cols)
    out = g.agg(*_agg_exprs(aggs))
    return out.select(
        F.col("session_window.start").alias("window_start"),
        F.col("session_window.end").alias("window_end"),
        *group_cols, *aggs.keys(),
    )


def rank_topk(counts: DataFrame, key_col: str, k: int) -> DataFrame:
    """Rank windowed counts → top-k keys per window, deterministic
    tie-break (count DESC, key ASC). Batch-side half of windowed
    heavy hitters; see :func:`topk_per_window` for why applying this
    inside foreachBatch over an append-mode windowed-count stream is
    exact."""
    from pyspark.sql.window import Window

    w = (Window.partitionBy("window_start")
         .orderBy(F.desc("n"), F.asc(key_col)))
    return (counts.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def topk_per_window(
    df: DataFrame,
    time_col: str,
    window_duration: str,
    key_col: str,
    k: int,
    watermark: str | None = None,
) -> DataFrame:
    """Windowed heavy hitters: the k most frequent ``key_col`` values
    per tumbling window, ties broken by key.

    Batch: one call, ranking inline. Streaming: rank-over-window is
    not allowed on an unfinished streaming aggregate, so pass the
    returned COUNTS through foreachBatch and apply :func:`rank_topk`
    there — exact because in append mode a (window, key) count row is
    emitted exactly once, when the watermark passes the window end,
    and that same watermark advance releases EVERY key of that window
    into the SAME micro-batch (per-window completeness; asserted in
    tests/test_streaming.py). At scale the count aggregation is the
    only shuffle; the rank partitions by window_start — thousands of
    concurrent windows spread it, and k caps the output.
    """
    counts = tumbling_agg(df, time_col, window_duration, [key_col],
                          {"n": "count(*)"}, watermark)
    if df.isStreaming:
        return counts
    return rank_topk(counts, key_col, k)


def clip_transcript_join(
    clips: DataFrame,
    transcripts: DataFrame,
    watermark: str = "1 minute",
    join_window: str = "5 minutes",
    time_col: str = "event_time",
) -> DataFrame:
    """Stateful stream-stream equi-join on clip_id (SURVEY §2.5 J2 —
    the explicit analogue of Cypher's MATCH src/MATCH tgt key
    resolution): audio rows join transcript rows that arrive within
    ``join_window`` of each other; watermarks bound the join state."""
    c = clips.withWatermark(time_col, watermark).alias("c")
    t = transcripts.withWatermark(time_col, watermark).alias("t")
    cond = (
        (F.col("c.clip_id") == F.col("t.clip_id"))
        & (F.col("t." + time_col)
           >= F.col("c." + time_col) - F.expr(f"INTERVAL {join_window}"))
        & (F.col("t." + time_col)
           <= F.col("c." + time_col) + F.expr(f"INTERVAL {join_window}"))
    )
    return c.join(t, cond, "inner").select(
        F.col("c.clip_id").alias("clip_id"),
        F.col("c.bytes").alias("bytes"),
        F.col("c.sr_hz").alias("sr_hz"),
        F.col("c.dur_ms").alias("dur_ms"),
        F.col("c.codec").alias("codec"),
        F.col("t.transcript").alias("transcript"),
        F.col("c." + time_col).alias(time_col),
    )
