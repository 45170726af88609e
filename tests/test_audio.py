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


def test_resample_linear_snr():
    """Linear resampling preserves a low-frequency sine to SNR >= 25 dB
    both down (44.1k->16k) and up (8k->16k); output length scales by
    the rate ratio."""
    from dataflow_flex_templates_spark.functions.audio import (
        resample_linear_np,
        snr_db,
    )

    for sr_in, sr_out in [(44100, 16000), (8000, 16000), (22050, 22050)]:
        t = np.arange(int(sr_in * 0.5)) / sr_in
        wave = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
        out = resample_linear_np(wave, sr_in, sr_out)
        expect_n = int(round(len(wave) * sr_out / sr_in))
        assert abs(len(out) - expect_n) <= 1
        t_out = np.arange(len(out)) / sr_out
        ref = (0.5 * np.sin(2 * np.pi * 220.0 * t_out)).astype(np.float32)
        assert snr_db(ref, out) >= 25.0, (sr_in, sr_out)


def test_resample_stats_udf(spark):
    """Arrow-batched decode→resample→summarize: every clip lands at the
    target rate with the dur_ms-implied sample count."""
    from pyspark.sql import functions as F

    from dataflow_flex_templates_spark.functions.audio import resample_stats
    from dataflow_flex_templates_spark.testing.clips import make_clips_df

    clips = make_clips_df(spark, 60, seed=4)
    rs = resample_stats(16000)
    out = (clips.withColumn("__rs__", rs(F.col("bytes"), F.col("codec"),
                                         F.col("sr_hz")))
           .select("clip_id", "dur_ms", "sr_hz",
                   F.col("__rs__.n_samples_out").alias("n_out"),
                   F.col("__rs__.rms_out").alias("rms_out"))
           .toPandas())
    expect = (out["dur_ms"] / 1000.0 * 16000).round()
    assert (abs(out["n_out"] - expect) <= out["sr_hz"].map(lambda s: 16000 // s + 2)).all()
    assert (out["rms_out"] > 0).all()
