"""Audio payload path: codec round-trips (SNR ≥ 30 dB per-row
invariant), vectorized decode UDFs, transcript normalization,
dur_ms↔sample-count invariant. BASELINE.json input_hint contract."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dataflow_flex_templates_spark.functions.audio import (
    decode_pcm_np,
    encode_pcm_np,
    snr_db,
)
from dataflow_flex_templates_spark.testing.clips import (
    make_clips_pdf,
    reference_waveform,
)


@pytest.mark.parametrize("codec,min_snr", [
    ("pcm_s16le", 80.0), ("pcm_f32le", 150.0), ("ulaw", 30.0),
])
def test_codec_roundtrip_snr(codec, min_snr):
    w = reference_waveform("clip_000000000001", 16000, 500)
    dec = decode_pcm_np(encode_pcm_np(w, codec), codec)
    assert len(dec) == len(w)
    assert snr_db(w, dec) >= min_snr


def test_generated_clips_meet_snr_invariant():
    pdf = make_clips_pdf(50, seed=7)
    for _, r in pdf.iterrows():
        ref = reference_waveform(r["clip_id"], r["sr_hz"], r["dur_ms"])
        dec = decode_pcm_np(r["bytes"], r["codec"])
        # dur_ms invariant: len(decoded)/sr*1000 == dur_ms
        assert len(dec) == int(round(r["sr_hz"] * r["dur_ms"] / 1000.0))
        assert snr_db(ref, dec) >= 30.0


def test_decode_udf_and_features(spark):
    from dataflow_flex_templates_spark.functions.audio import (
        decode_pcm,
        with_audio_features,
    )
    from dataflow_flex_templates_spark.testing.clips import make_clips_df
    import pyspark.sql.functions as F

    df = make_clips_df(spark, 40, seed=3)
    out = with_audio_features(df).withColumn(
        "head", F.slice(decode_pcm(F.col("bytes"), F.col("codec")), 1, 4)
    )
    pdf = out.select("clip_id", "sr_hz", "dur_ms", "codec",
                     "n_samples", "rms", "peak", "zcr", "head").toPandas()
    assert (pdf["n_samples"] == (pdf["sr_hz"] * pdf["dur_ms"] / 1000.0)
            .round().astype(int)).all()
    assert (pdf["peak"] <= 1.0).all() and (pdf["rms"] > 0).all()
    # spot-check decoded samples against the numpy reference
    r = pdf.iloc[0]
    ref = reference_waveform(r["clip_id"], r["sr_hz"], r["dur_ms"])
    dec = decode_pcm_np(
        make_clips_pdf(1, seed=3).iloc[0]["bytes"], r["codec"])
    np.testing.assert_allclose(r["head"], ref[:4], atol=0.02)
    del dec


def test_empty_and_null_payloads():
    assert len(decode_pcm_np(b"", "pcm_s16le")) == 0
    assert len(decode_pcm_np(None, "ulaw")) == 0
    with pytest.raises(ValueError):
        decode_pcm_np(b"\x00\x00", "mp3")   # unsupported codec is explicit


def test_transcript_normalization(spark):
    from dataflow_flex_templates_spark.functions.audio import normalize_transcript
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("  Hello,   WORLD! it's  me. ",), ("", ), ("Tabs\tand\nnewlines",)],
        ["t"],
    ).select(normalize_transcript(F.col("t")).alias("n"))
    got = [r["n"] for r in df.collect()]
    assert got == ["hello world it's me", "", "tabs and newlines"]


def test_duplicate_clips_marked_for_lww():
    pdf = make_clips_pdf(600, seed=42, dup_rate=0.05)
    dups = pdf[pdf.duplicated("clip_id", keep=False)]
    assert len(dups) > 0
    # for each dup pair the later event_time carries the rev2 transcript
    for cid, grp in dups.groupby("clip_id"):
        grp = grp.sort_values("event_time")
        assert grp.iloc[-1]["transcript"].endswith("rev2")
