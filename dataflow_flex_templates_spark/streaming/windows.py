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
