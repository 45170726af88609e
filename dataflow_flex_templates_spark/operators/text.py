"""Text-analysis operators for training-data pipelines (documents table).

All hot-path logic is JVM-side Catalyst expressions (whole-stage
codegen) — no Python in the loop. Each operator is written so the SAME
semantics are expressible in DuckDB ANSI SQL for the driver's oracle
comparison (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny English stopword list used by the language-ID heuristic and the
# quality score. Keep SORTED and in sync with the oracle SQL.
STOPWORDS = ["a", "and", "are", "as", "at", "be", "by", "for", "from",
             "has", "he", "in", "is", "it", "its", "of", "on", "that",
             "the", "to", "was", "were", "will", "with"]


def norm_text(col: Column) -> Column:
    """Whitespace-collapsed, lowercased text (shared normalization)."""
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def token_count(col: Column) -> Column:
    """Whitespace token count (empty string → 0)."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the normalized text. Stable across
    engines (md5 is md5) — the exact-dedup key."""
    return F.md5(norm_text(col))


def punct_ratio(col: Column) -> Column:
    t = F.trim(col)
    stripped = F.regexp_replace(t, r"[.!?,;:]", "")
    return (F.length(t) - F.length(stripped)) / F.greatest(F.length(t), F.lit(1))


def stopword_ratio(col: Column) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    toks = F.split(norm_text(col), " ")
    hits = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length factor + stopword
    presence − punctuation excess. (Gopher-rules-style scoring distilled
    to three cross-engine-expressible terms.)"""
    length_f = F.least(token_count(col) / F.lit(100.0), F.lit(1.0))
    stop_f = F.least(stopword_ratio(col) * F.lit(4.0), F.lit(1.0))
    punct_pen = F.least(punct_ratio(col) * F.lit(5.0), F.lit(1.0))
    return F.round(
        F.lit(0.5) * length_f + F.lit(0.5) * stop_f - F.lit(0.25) * punct_pen, 6
    )


def lang_id(col: Column) -> Column:
    """n-gram-free language-ID heuristic: ≥2 stopword hits and ≥15%
    stopword ratio → 'en', else 'unk'. (A real fasttext model would be
    an external dep; the Spark-side plumbing — vectorized expression on
    a text column — is identical.)"""
    toks = F.split(norm_text(col), " ")
    hits = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    ratio = hits / F.greatest(F.size(toks), F.lit(1))
    return F.when((hits >= 2) & (ratio >= 0.15), F.lit("en")).otherwise(F.lit("unk"))


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All text-analysis columns in one projection (one scan, no shuffle)."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        fingerprint(c).alias("fp"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
    )
