"""Migration conformance gate: row-for-row comparison of two clip
tables (decoded-PCM SNR floor + transcript equality).

This reifies the engine's own acceptance criterion — "matches the
reference's output row-for-row, with per-row decoded-PCM allclose
(SNR ≥ 30 dB) and transcript equality" — as a first-class operator a
user runs when migrating a pipeline: point it at the old system's
clip table and the new system's, get one verdict row per clip_id.

Semantics (one output row per clip_id present in either table):

  status              precedence (first match wins)
  ---------------     ------------------------------------------
  missing_left        id only in ``right``
  missing_right       id only in ``left``
  poison              either side's payload fails to decode
  length_mismatch     decoded sample counts differ
  snr_below_floor     snr(left as reference, right) < floor
  transcript_diff     transcripts differ (null-safe equality)
  pass                everything above holds

plus the raw evidence columns (``n_left``, ``n_right``, ``snr_mdb``,
``transcript_equal``) so no failure mode hides behind the status
label. ``snr_mdb`` is integer milli-dB (round(snr·1000)) computed by
the same :func:`~dataflow_flex_templates_spark.functions.audio.snr_db`
kernel the codec round-trip tests pin — over the overlapping sample
prefix, so a length_mismatch row still reports how close the overlap
got. Transcript equality is evaluated JVM-side with ``<=>`` (null-safe
equal) — no Python touches the text path.

Inputs must be KEYED (one row per ``id_col``): run MERGE-LWW dedup
first if the table carries revisions — a duplicated id would fan out
through the join. The operator does not silently dedupe.

Scale shape: ONE keyed shuffle (the full-outer join on clip_id; with
both tables written bucketed on clip_id — ``sources/bucketed.py`` —
even that Exchange disappears), then a pure Arrow map decoding both
payloads of matched rows in one pass (absent/poison sides short-circuit
inside the batch loop). Nothing aggregates, so the operator streams at
scan speed; the verdict table is as partitionable as its inputs.

Reference parity: the reference's node/edge-count and
mapping-conformance tests (docs/README.md "Testing" roadmap;
CypherGenerator MERGE-on-keys semantics) check the same contract
batch-side; BASELINE.json's north_star names the SNR≥30dB/transcript
variant for the audio stream — this operator is that check as a
reusable plan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_PAIR_SCHEMA = T.StructType([
    T.StructField("n_left", T.LongType()),
    T.StructField("n_right", T.LongType()),
    T.StructField("snr_mdb", T.LongType()),
])

REQUIRED_COLS = ("bytes", "codec", "transcript")


def _pair_decode_udf():
    """Factory: one Arrow pass decoding BOTH payloads of each matched
    row and scoring right against left (left = reference). Absent or
    undecodable sides yield NULL counts; SNR only when both decode."""

    @pandas_udf(_PAIR_SCHEMA)
    def _pair(lb: pd.Series, lc: pd.Series,
              rb: pd.Series, rc: pd.Series) -> pd.DataFrame:
        from dataflow_flex_templates_spark.functions.audio import (
            decode_pcm_np,
            snr_db,
        )
        rows = []
        for b1, c1, b2, c2 in zip(lb, lc, rb, rc):
            w1 = w2 = None
            if b1 is not None and c1 is not None:
                try:
                    w1 = decode_pcm_np(b1, c1)
                except Exception:
                    w1 = None
            if b2 is not None and c2 is not None:
                try:
                    w2 = decode_pcm_np(b2, c2)
                except Exception:
                    w2 = None
            snr = (int(round(snr_db(w1, w2) * 1000.0))
                   if w1 is not None and w2 is not None else None)
            rows.append((len(w1) if w1 is not None else None,
                         len(w2) if w2 is not None else None, snr))
        return pd.DataFrame(rows, columns=["n_left", "n_right",
                                           "snr_mdb"])

    return _pair


def clip_conformance(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "clip_id",
    snr_floor_mdb: int = 30_000,
) -> DataFrame:
    """Per-clip conformance verdicts between two keyed clip tables.

    Returns (id_col, status, n_left, n_right, snr_mdb,
    transcript_equal) — see the module docstring for the status
    algebra. ``left`` is the reference side of the SNR.
    """
    for side, df in (("left", left), ("right", right)):
        missing = [c for c in (id_col, *REQUIRED_COLS)
                   if c not in df.columns]
        if missing:
            raise ValueError(f"{side} table lacks columns: {missing}")

    l = left.select(
        F.col(id_col),
        F.col("bytes").alias("_l_bytes"),
        F.col("codec").alias("_l_codec"),
        F.col("transcript").alias("_l_tx"),
        F.lit(True).alias("_l_present"))
    r = right.select(
        F.col(id_col),
        F.col("bytes").alias("_r_bytes"),
        F.col("codec").alias("_r_codec"),
        F.col("transcript").alias("_r_tx"),
        F.lit(True).alias("_r_present"))

    j = l.join(r, on=id_col, how="full_outer")
    pair = _pair_decode_udf()
    scored = j.withColumn(
        "_p", pair("_l_bytes", "_l_codec", "_r_bytes", "_r_codec"))

    tx_eq = F.col("_l_tx").eqNullSafe(F.col("_r_tx"))
    n_l, n_r = F.col("_p.n_left"), F.col("_p.n_right")
    snr = F.col("_p.snr_mdb")
    status = (
        F.when(F.col("_l_present").isNull(), F.lit("missing_left"))
        .when(F.col("_r_present").isNull(), F.lit("missing_right"))
        .when(n_l.isNull() | n_r.isNull(), F.lit("poison"))
        .when(n_l != n_r, F.lit("length_mismatch"))
        .when(snr < F.lit(int(snr_floor_mdb)), F.lit("snr_below_floor"))
        .when(~tx_eq, F.lit("transcript_diff"))
        .otherwise(F.lit("pass")))

    return scored.select(
        F.col(id_col),
        status.alias("status"),
        n_l.alias("n_left"),
        n_r.alias("n_right"),
        snr.alias("snr_mdb"),
        tx_eq.alias("transcript_equal"))
