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


def test_speed_perturb_duration_economics(spark):
    """Kaldi-style sp augmentation: f=1.0 is the identity (exact
    original length + rms), other factors scale length by exactly
    round(n * sr / round(sr*f)), and rms stays in the same ballpark
    (resampling preserves energy density)."""
    from pyspark.sql import functions as F

    from dataflow_flex_templates_spark.functions.audio import (
        decode_pcm_np,
        speed_perturb_stats,
    )
    from dataflow_flex_templates_spark.testing.clips import (
        make_clips_df,
        make_clips_pdf,
    )

    clips = make_clips_df(spark, 40, seed=11)
    sp = speed_perturb_stats()
    out = (clips.withColumn("__sp__", sp(F.col("bytes"), F.col("codec"),
                                         F.col("sr_hz")))
           .select("clip_id", "sr_hz", F.explode("__sp__").alias("p"))
           .select("clip_id", "sr_hz", "p.factor_x100",
                   "p.n_samples_out", "p.rms_out")
           .toPandas())
    pdf = make_clips_pdf(40, seed=11)
    n_in = {r["clip_id"]: len(decode_pcm_np(r["bytes"], r["codec"]))
            for _, r in pdf.iterrows()}
    rms_in = {}
    for _, r in pdf.iterrows():
        w = decode_pcm_np(r["bytes"], r["codec"])
        rms_in[r["clip_id"]] = float((w.astype("float64") ** 2).mean()
                                     ** 0.5)
    assert len(out) == 3 * 40
    for _, r in out.iterrows():
        n, sr, f = n_in[r["clip_id"]], int(r["sr_hz"]), r["factor_x100"]
        if f == 100:
            assert r["n_samples_out"] == n
            # float32 dot vs float64 mean accumulation: ~1e-7 noise
            assert abs(r["rms_out"] - rms_in[r["clip_id"]]) < 1e-5
        else:
            sr_in = int(round(sr * f / 100))
            assert r["n_samples_out"] == max(int(round(n * sr / sr_in)),
                                             1)
        # energy density preserved within 25% (linear kernel smoothing)
        assert r["rms_out"] > 0.75 * rms_in[r["clip_id"]]


def test_sinc_resampler_beats_linear():
    """Kaiser-windowed-sinc resampling reconstructs in-band tones
    >40 dB better than linear interpolation in up-, down-, and
    fractional-rate conversion."""
    import numpy as np

    from dataflow_flex_templates_spark.functions.audio import (
        resample_linear_np,
        resample_sinc_np,
        snr_db,
    )

    for sr_in, sr_out, f in [(44100, 8000, 3000.0), (8000, 16000, 3000.0),
                             (22050, 16000, 5000.0)]:
        t_in = np.arange(int(sr_in * 0.5)) / sr_in
        w = (0.8 * np.sin(2 * np.pi * f * t_in)).astype(np.float32)
        lin = resample_linear_np(w, sr_in, sr_out)
        snc = resample_sinc_np(w, sr_in, sr_out)
        n = min(len(lin), len(snc))
        ideal = (0.8 * np.sin(2 * np.pi * f * np.arange(n) / sr_out)
                 ).astype(np.float32)
        sl = slice(200, n - 200)
        s_lin = snr_db(ideal[sl], lin[sl])
        s_snc = snr_db(ideal[sl], snc[sl])
        assert s_snc > 80, (sr_in, sr_out, s_snc)
        assert s_snc > s_lin + 40, (sr_in, sr_out, s_lin, s_snc)
    # identity passthrough
    w = np.ones(100, np.float32)
    assert (resample_sinc_np(w, 8000, 8000) == w).all()
    assert len(resample_sinc_np(np.zeros(0, np.float32), 8000, 16000)) == 0


def test_spectral_features_tone_and_udf(spark):
    """A pure tone's spectral centroid/rolloff land on the tone
    frequency with near-zero bandwidth and flatness; the Arrow UDF
    returns the same values as the numpy kernel."""
    import numpy as np
    from pyspark.sql import functions as F

    from dataflow_flex_templates_spark.functions.audio import (
        encode_pcm_np,
        decode_pcm_np,
        spectral_features,
        spectral_features_np,
    )

    sr = 16000
    t = np.arange(sr) / sr
    tone = (0.7 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    noise = np.random.default_rng(3).uniform(-0.5, 0.5, sr).astype(np.float32)
    c_t, b_t, r_t, f_t = spectral_features_np(tone, sr)
    assert abs(c_t - 440.0) < 2.0 and b_t < 10.0 and abs(r_t - 440.0) < 5.0
    c_n, b_n, r_n, f_n = spectral_features_np(noise, sr)
    assert f_n > 10 * f_t          # white noise is spectrally flat
    assert b_n > 1000.0            # and broad

    rows = [("tone", encode_pcm_np(tone, "pcm_s16le"), "pcm_s16le", sr),
            ("noise", encode_pcm_np(noise, "pcm_f32le"), "pcm_f32le", sr)]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, codec string, sr_hz int")
    sf = spectral_features(F.col("bytes"), F.col("codec"), F.col("sr_hz"))
    got = {r["clip_id"]: r for r in
           df.withColumn("f", sf).select("clip_id", "f.*").collect()}
    # UDF == numpy kernel on the DECODED (quantized) waveform
    want_t = spectral_features_np(
        decode_pcm_np(rows[0][1], "pcm_s16le"), sr)
    assert abs(got["tone"]["centroid_hz"] - want_t[0]) < 1e-9
    assert abs(got["noise"]["flatness"] - f_n) < 1e-9


def test_resample_stats_sinc_kernel(spark):
    """resample_stats(kernel='sinc') runs the quality path through the
    same Arrow plumbing."""
    from pyspark.sql import functions as F

    from dataflow_flex_templates_spark.functions.audio import resample_stats
    from dataflow_flex_templates_spark.testing.clips import make_clips_df

    clips = make_clips_df(spark, 20, seed=5, dup_rate=0.0, late_rate=0.0,
                          max_dur_ms=300)
    rs = resample_stats(16000, kernel="sinc")
    out = (clips.withColumn("r", rs(F.col("bytes"), F.col("codec"),
                                    F.col("sr_hz")))
           .select("clip_id", "sr_hz", "dur_ms", "r.*").collect())
    for r in out:
        want = int(round(r["sr_hz"] * r["dur_ms"] / 1000.0) * 16000 / r["sr_hz"])
        assert abs(r["n_samples_out"] - want) <= 1
        assert 0.0 < r["rms_out"] < 1.0


def test_vad_segments_np_closed_form():
    """Energy-gate VAD on constructed waveforms with known voiced
    runs: segment/frame counts are exact."""
    import numpy as np

    from dataflow_flex_templates_spark.functions.audio import (
        vad_segments_np,
    )

    sr, frame_ms = 1000, 20          # frame = 20 samples
    fl = 20

    def frames(pattern):
        # pattern: 1 = loud frame (rms 0.5), 0 = silent frame (rms 0)
        return np.concatenate([
            np.full(fl, 0.5 if p else 0.0, dtype=np.float32)
            for p in pattern])

    # three voiced runs: 1,1 | 1 | 1  → segments 3
    w = frames([1, 1, 0, 1, 0, 0, 1])
    assert vad_segments_np(w, sr, frame_ms) == (7, 4, 3)
    # leading + trailing voiced, all voiced, all silent, empty
    assert vad_segments_np(frames([1, 0, 1]), sr, frame_ms) == (3, 2, 2)
    assert vad_segments_np(frames([1, 1, 1]), sr, frame_ms) == (3, 3, 1)
    assert vad_segments_np(frames([0, 0]), sr, frame_ms) == (2, 0, 0)
    assert vad_segments_np(np.zeros(0, np.float32), sr, frame_ms) == (0, 0, 0)
    # tail shorter than a frame is ignored
    assert vad_segments_np(frames([1])[:30], sr, frame_ms) == (1, 1, 1)
    # threshold boundary: frame rms exactly at threshold is NOT voiced
    w = np.full(fl, 0.02, dtype=np.float32)
    assert vad_segments_np(w, sr, frame_ms, threshold=0.02)[1] == 0


def test_vad_stats_udf_matches_numpy_twin(spark):
    """The Arrow-batched vad_stats UDF equals the single-process twin
    per clip over the synthetic table."""
    from dataflow_flex_templates_spark.functions.audio import (
        decode_pcm_np,
        vad_segments_np,
        vad_stats,
    )
    from dataflow_flex_templates_spark.testing.clips import (
        clips_spark_schema,
        make_clips_pdf,
    )
    from pyspark.sql import functions as F

    pdf = make_clips_pdf(60, seed=5, max_dur_ms=400)
    df = spark.createDataFrame(pdf, schema=clips_spark_schema())
    v = vad_stats()
    got = {r["clip_id"]: r for r in
           df.withColumn("__v__", v(F.col("bytes"), F.col("codec"),
                                    F.col("sr_hz")))
             .select("clip_id", "__v__.*").collect()}
    for _, r in pdf.iterrows():
        w = decode_pcm_np(r["bytes"], r["codec"])
        want = vad_segments_np(w, int(r["sr_hz"]))
        g = got[r["clip_id"]]
        assert (g["n_frames"], g["voiced_frames"], g["n_segments"]) == want


def test_poison_rows_yield_nulls_not_task_failures(spark):
    """A truncated payload or unknown codec must degrade to null
    features, never kill the task — at 10^12 rows one corrupt clip
    must not take down the stream. Empty payloads stay distinguishable
    (n_samples=0, rms=0.0, not null)."""
    from pyspark.sql import functions as F

    from dataflow_flex_templates_spark.functions.audio import (
        decode_pcm,
        resample_stats,
        spectral_features,
        vad_stats,
        with_audio_features,
    )

    rows = [
        ("ok", b"\x00\x01" * 200, 8000, "pcm_s16le"),
        ("trunc_s16", b"\x00\x01\x02", 8000, "pcm_s16le"),
        ("trunc_f32", b"\x00\x01\x02", 8000, "pcm_f32le"),
        ("bad_codec", b"\x00\x01\x02\x03", 8000, "opus"),
        ("empty", b"", 8000, "pcm_s16le"),
    ]
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, codec string")

    feat = {r["clip_id"]: r for r in with_audio_features(df).collect()}
    assert feat["ok"]["n_samples"] == 200 and feat["ok"]["rms"] is not None
    for k in ("trunc_s16", "trunc_f32", "bad_codec"):
        assert feat[k]["n_samples"] is None and feat[k]["rms"] is None, k
    assert feat["empty"]["n_samples"] == 0 and feat["empty"]["rms"] == 0.0

    v = vad_stats()(F.col("bytes"), F.col("codec"), F.col("sr_hz"))
    vad = {r["clip_id"]: r for r in
           df.withColumn("__v__", v).select("clip_id", "__v__.*").collect()}
    assert vad["ok"]["n_frames"] is not None
    assert vad["bad_codec"]["n_frames"] is None

    rs = resample_stats(16000)(F.col("bytes"), F.col("codec"),
                               F.col("sr_hz"))
    rsd = {r["clip_id"]: r for r in
           df.withColumn("__r__", rs).select("clip_id", "__r__.*").collect()}
    assert rsd["ok"]["n_samples_out"] == 400
    assert rsd["trunc_s16"]["n_samples_out"] is None

    sp = spectral_features(F.col("bytes"), F.col("codec"), F.col("sr_hz"))
    spd = {r["clip_id"]: r for r in
           df.withColumn("__s__", sp).select("clip_id", "__s__.*").collect()}
    assert spd["ok"]["centroid_hz"] is not None
    assert spd["trunc_f32"]["centroid_hz"] is None

    dec = {r["clip_id"]: r["w"] for r in
           df.withColumn("w", decode_pcm(F.col("bytes"),
                                         F.col("codec")))
             .select("clip_id", "w").collect()}
    assert len(dec["ok"]) == 200 and dec["bad_codec"] is None
    assert dec["empty"] == []


# ------------------------------------------------------ audio fingerprinting

def test_fingerprint_kernel_robustness():
    """Peak-landmark fingerprints: gain scaling is EXACTLY invariant
    (argmax is scale-free), −40 dB noise + re-quantization flips few
    frames, unrelated clips share essentially none."""
    from dataflow_flex_templates_spark.functions.audio import fingerprint_np

    sr, dur = 16000, 800
    w = reference_waveform("fp_base", sr, dur)
    base = decode_pcm_np(encode_pcm_np(w, "pcm_s16le"), "pcm_s16le")
    fb = fingerprint_np(base, sr)
    assert len(fb) > 10

    gain = decode_pcm_np(encode_pcm_np(base * np.float32(0.9),
                                       "pcm_f32le"), "pcm_f32le")
    assert np.array_equal(fingerprint_np(gain, sr), fb)

    nz = np.random.default_rng(5).standard_normal(len(base)).astype(np.float32)
    noisy = decode_pcm_np(encode_pcm_np(base + nz * np.float32(0.01),
                                        "pcm_s16le"), "pcm_s16le")
    fn = fingerprint_np(noisy, sr)
    assert (fb == fn).mean() >= 0.9

    other = decode_pcm_np(encode_pcm_np(
        reference_waveform("fp_other", sr, dur), "pcm_s16le"), "pcm_s16le")
    fo = fingerprint_np(other, sr)
    assert (fb == fo).mean() <= 0.2

    # too-short clip → empty fingerprint, no crash
    assert len(fingerprint_np(base[:10], sr)) == 0


def test_clip_fingerprints_spark_equals_twin(spark):
    """The mapInPandas fingerprint operator is bit-identical to the
    single-process numpy twin over the near-dup fixture."""
    from dataflow_flex_templates_spark.functions.audio import fingerprint_np
    from dataflow_flex_templates_spark.operators.audio_dedup import (
        clip_fingerprints,
    )
    from dataflow_flex_templates_spark.testing.clips import (
        clips_spark_schema,
        make_neardup_clips_pdf,
    )

    pdf = make_neardup_clips_pdf(12, seed=3)
    df = spark.createDataFrame(pdf, schema=clips_spark_schema())
    got = sorted(
        (r["id"], r["frame_idx"], r["subfp"])
        for r in clip_fingerprints(df).collect())
    want = sorted(
        (r["clip_id"], j, int(v))
        for _, r in pdf.iterrows()
        for j, v in enumerate(
            fingerprint_np(decode_pcm_np(r["bytes"], r["codec"]),
                           int(r["sr_hz"]))))
    assert got == want


def test_audio_neardup_pairs_recall_and_bound_identity(spark):
    """Every (base, variant) ground-truth pair is found (recall 1.0);
    every reported pair clears the integer thresholds; and the
    max_df-bounded run returns EXACTLY the unbounded run's output
    (the bound prunes candidate generation only — verification is
    exact — mirroring the ngram_jaccard proof)."""
    from dataflow_flex_templates_spark.operators.audio_dedup import (
        audio_neardup_pairs,
    )
    from dataflow_flex_templates_spark.testing.clips import (
        make_neardup_clips_df,
    )

    df = make_neardup_clips_df(spark, 18, seed=3)
    kw = dict(min_match_frames=2, min_match_pct=60)
    rows = audio_neardup_pairs(df, max_df=8, **kw).collect()
    pairs = {(r["clip_a"], r["clip_b"]) for r in rows}
    for i in range(18):
        cid = f"afp_3_{i:04d}"
        if i % 3 == 0:
            assert (cid, cid + "_g") in pairs
        elif i % 3 == 1:
            assert (cid, cid + "_n") in pairs
    for r in rows:
        assert r["match_frames"] >= 2
        assert r["match_frames"] * 100 >= 60 * min(r["frames_a"],
                                                   r["frames_b"])
    unbounded = {(r["clip_a"], r["clip_b"], r["match_frames"])
                 for r in audio_neardup_pairs(df, max_df=None,
                                              **kw).collect()}
    assert {(r["clip_a"], r["clip_b"], r["match_frames"])
            for r in rows} == unbounded


def test_clip_text_quality_flags(spark):
    """Every flag fires on a crafted clip: too-short, empty transcript,
    low/high token density, silence-heavy, and one clean keeper."""
    from datetime import datetime, timezone

    from dataflow_flex_templates_spark.functions.audio import (
        clip_text_quality,
    )
    from dataflow_flex_templates_spark.testing.clips import (
        clips_spark_schema,
    )

    sr = 16000
    loud = reference_waveform("q_loud", sr, 1000)          # 1 s voiced
    quiet = (loud * np.float32(0.001)).astype(np.float32)  # under gate
    ts = datetime(2025, 1, 1, tzinfo=timezone.utc)

    def clip(cid, wave, dur, tx):
        return (cid, encode_pcm_np(wave, "pcm_s16le"), sr, dur,
                "pcm_s16le", tx, ts)

    rows = [
        clip("keeper", loud, 1000, " ".join(["ok"] * 150)),   # 150 t/s
        clip("short", loud[:sr // 10], 100, "hi there you"),
        clip("empty", loud, 1000, "  ,.!  "),                 # normalizes to ''
        clip("sparse", loud, 1000, " ".join(["a"] * 50)),     # 50 t/s
        clip("dense", loud, 1000, " ".join(["b"] * 400)),     # 400 t/s
        clip("silent", quiet, 1000, " ".join(["c"] * 150)),
    ]
    pdf = pd.DataFrame(rows, columns=["clip_id", "bytes", "sr_hz",
                                      "dur_ms", "codec", "transcript",
                                      "event_time"])
    out = {r["clip_id"]: r for r in clip_text_quality(
        spark.createDataFrame(pdf, schema=clips_spark_schema())).collect()}

    assert out["keeper"]["keep"]
    for cid, flag in [("short", "too_short"),
                      ("empty", "empty_transcript"),
                      ("sparse", "low_density"),
                      ("dense", "high_density"),
                      ("silent", "silence_heavy")]:
        assert out[cid][flag], (cid, flag)
        assert not out[cid]["keep"], cid
    # empty transcript also reads as low-density, never high
    assert out["empty"]["low_density"] and not out["empty"]["high_density"]


def test_audio_health_kernel_units():
    """audio_health_np counts defects exactly on crafted waveforms."""
    from dataflow_flex_templates_spark.functions.audio import (
        audio_health_np,
    )

    assert audio_health_np(np.zeros(0, np.float32)) == (0, 0, 0, 0, 0)
    # all-quiet clip: one run spanning everything
    n, c, q, run, dc = audio_health_np(np.zeros(100, np.float32))
    assert (n, c, q, run, dc) == (100, 0, 100, 100, 0)
    # crafted: 3 clipped samples, an 8-sample interior quiet run, DC 0.5
    w = np.full(50, 0.5, np.float32)
    w[5:8] = 1.0
    w[20:28] = 0.0
    n, c, q, run, dc = audio_health_np(w)
    assert (n, c, q, run) == (50, 3, 8, 8)
    exp = (0.5 * (50 - 3 - 8) + 3 * 1.0) / 50
    assert dc == round(exp * 1e9)
    # quiet run at the head AND tail (boundary handling)
    w2 = np.full(30, 0.3, np.float32)
    w2[:4] = 0.0
    w2[-6:] = 0.0
    assert audio_health_np(w2)[3] == 6


def test_audio_health_fixture_classification(spark):
    """The defect-injected fixture classifies exactly by construction:
    i%4 → {0: healthy, 1: clipping, 2: dropout, 3: dc_bias}, across
    all three codec round-trips (Spark path end-to-end)."""
    from dataflow_flex_templates_spark.functions.audio import (
        with_audio_health,
    )
    from dataflow_flex_templates_spark.testing.clips import (
        make_health_clips_df,
    )

    out = {r["clip_id"]: r
           for r in with_audio_health(make_health_clips_df(spark)).collect()}
    assert len(out) == 60
    for cid, r in out.items():
        kind = int(cid.rsplit("_", 1)[1]) % 4
        expect = {0: "healthy", 1: "clipping",
                  2: "dropout", 3: "dc_bias"}[kind]
        for flag in ("healthy", "clipping", "dropout", "dc_bias"):
            assert r[flag] == (flag == expect), (cid, flag, dict(r.asDict()))


def test_audio_health_poison_rows_null(spark):
    """Truncated payloads / unknown codecs yield null counters, not
    task failures."""
    from datetime import datetime, timezone

    from dataflow_flex_templates_spark.functions.audio import (
        with_audio_health,
    )
    from dataflow_flex_templates_spark.testing.clips import (
        clips_spark_schema,
    )

    ts = datetime(2025, 1, 1, tzinfo=timezone.utc)
    pdf = pd.DataFrame(
        [("ok", encode_pcm_np(np.zeros(64, np.float32), "pcm_s16le"),
          16000, 4, "pcm_s16le", "x", ts),
         ("bad_codec", b"\x00" * 16, 16000, 4, "opus", "x", ts),
         ("truncated", b"\x00", 16000, 4, "pcm_f32le", "x", ts)],
        columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                 "transcript", "event_time"])
    rows = {r["clip_id"]: r for r in with_audio_health(
        spark.createDataFrame(pdf, schema=clips_spark_schema())).collect()}
    assert rows["ok"]["n_samples"] == 64
    assert rows["bad_codec"]["n_samples"] is None
    assert rows["truncated"]["n_samples"] is None


def test_trim_silence_kernel_and_fixture(spark):
    """Closed-form kernel cases + exact recovery of the injected
    head/tail padding on the fixture, through all codec round-trips
    (Spark path end-to-end)."""
    from pyspark.sql import functions as F

    from dataflow_flex_templates_spark.functions.audio import (
        trim_silence_np,
        trim_silence_stats,
    )
    from dataflow_flex_templates_spark.testing.clips import (
        make_trim_clips_df,
    )

    assert trim_silence_np(np.zeros(0, np.float32)) == (0, 0, 0, 0)
    assert trim_silence_np(np.zeros(50, np.float32)) == (50, 50, 0, 0)
    w = np.zeros(40, np.float32)
    w[10] = 0.5
    w[29] = -0.5
    assert trim_silence_np(w) == (40, 10, 10, 20)

    clips = make_trim_clips_df(spark)
    t = trim_silence_stats()(F.col("bytes"), F.col("codec"))
    rows = {r["clip_id"]: r for r in
            clips.withColumn("__t__", t)
                 .select("clip_id", "sr_hz", "__t__.*").collect()}
    assert len(rows) == 45
    for cid, r in rows.items():
        i = int(cid.rsplit("_", 1)[1])
        sr = r["sr_hz"]
        head = (i % 3) * int(sr * 0.04)
        tail = (i % 4) * int(sr * 0.03)
        # padding is recovered up to the waveform's own quiet edges
        assert r["lead_quiet"] >= head, cid
        assert r["trail_quiet"] >= tail, cid
        assert r["n_samples"] == r["lead_quiet"] + r["trail_quiet"] \
            + r["n_kept"]


def test_utterance_segments_consistency(spark):
    """Segment rows agree with the scalar VAD counters (same frames /
    voiced totals / run count) and with a crafted quiet-gap clip."""
    from pyspark.sql import functions as F

    from dataflow_flex_templates_spark.functions.audio import (
        utterance_segments,
        vad_segment_rows_np,
        vad_segments_np,
    )
    from dataflow_flex_templates_spark.testing.clips import (
        clips_spark_schema,
        make_clips_pdf,
    )

    # kernel: loud-quiet-loud → exactly two runs at the right frames
    sr = 16000
    flen = sr * 20 // 1000
    w = np.concatenate([
        np.full(5 * flen, 0.5, np.float32),
        np.zeros(3 * flen, np.float32),
        np.full(4 * flen, 0.5, np.float32)])
    assert vad_segment_rows_np(w, sr) == [(0, 5), (8, 4)]
    nf, nv, nseg = vad_segments_np(w, sr)
    assert (nf, nv, nseg) == (12, 9, 2)

    pdf = make_clips_pdf(80, seed=7)
    df = spark.createDataFrame(pdf, schema=clips_spark_schema())
    segs = utterance_segments(df).collect()
    # python twin over the same rows (duplicates included)
    from dataflow_flex_templates_spark.functions.audio import (
        decode_pcm_np,
    )

    want = []
    for _, r in pdf.iterrows():
        for j, (s0, nfr) in enumerate(vad_segment_rows_np(
                decode_pcm_np(r["bytes"], r["codec"]), int(r["sr_hz"]))):
            want.append((r["clip_id"], j, s0, nfr))
    got = sorted((r["clip_id"], r["seg_idx"], r["start_frame"],
                  r["n_frames"]) for r in segs)
    assert got == sorted(want)
    # totals line up with the scalar counter UDF per clip
    from dataflow_flex_templates_spark.functions.audio import vad_stats

    v = vad_stats()(F.col("bytes"), F.col("codec"), F.col("sr_hz"))
    totals = {r["clip_id"]: (r["v"]["voiced_frames"], r["v"]["n_segments"])
              for r in df.withColumn("v", v)
              .select("clip_id", "v").dropDuplicates(["clip_id"]).collect()}
    by_clip: dict = {}
    for cid, _, _, nfr in got:
        a, b = by_clip.get(cid, (0, 0))
        by_clip[cid] = (a + nfr, b + 1)
    for cid, (nv_, ns_) in by_clip.items():
        assert totals[cid] == (nv_, ns_), cid


def test_loudness_kernel_units():
    """Known waveforms → closed-form gain staging: a full-scale square
    wave at 0 dBFS RMS needs exactly target_db of gain; silence floors
    at -180 dBFS; post-gain clipping counts samples above the limit
    under the QUANTIZED gain."""
    import numpy as np

    from dataflow_flex_templates_spark.functions.audio import (
        loudness_norm_np,
    )

    sq = np.ones(1000, np.float32)              # RMS = 1.0 = 0 dBFS
    rms_q, gain_mdb, clipped, peak_q = loudness_norm_np(sq, -3.0)
    assert rms_q == 1_000_000_000
    assert gain_mdb == -3000                    # exactly -3 dB
    g = 10.0 ** (-3000 / 20000.0)
    assert clipped == (1000 if g > 0.99 else 0) == 0
    assert peak_q == round(g * 1e9)

    # half-scale square → RMS -6.0206 dBFS; +3.0206 dB of gain to hit
    # -3, post peak ≈ 0.708 < 0.99 → no clipping
    hq = np.full(1000, 0.5, np.float32)
    rms_q, gain_mdb, clipped, peak_q = loudness_norm_np(hq, -3.0)
    assert rms_q == 500_000_000 and clipped == 0
    assert gain_mdb == round((-3.0 + 20 * np.log10(2.0)) * 1000)

    # gain pushes the peak over the limit → every sample counts
    loud = np.full(100, 0.125, np.float32)      # needs ~+15 dB
    _, gain_mdb, clipped, peak_q = loudness_norm_np(loud, 0.0)
    assert clipped == 100 and peak_q > 990_000_000

    # silence: floored RMS, huge positive gain, zero stays zero
    z = np.zeros(50, np.float32)
    rms_q, gain_mdb, clipped, peak_q = loudness_norm_np(z, -20.0)
    assert (rms_q, clipped, peak_q) == (0, 0, 0)
    assert gain_mdb == 160_000                  # -20 - (-180) dB

    assert loudness_norm_np(np.zeros(0, np.float32)) == (0, 0, 0, 0)


def test_loudness_udf_matches_twin(spark):
    """The Arrow UDF over the 300-clip fixture reproduces the pinned
    per-clip twin counters bit-for-bit (same kernel, two engines)."""
    import json
    import os

    from pyspark.sql import functions as F

    from dataflow_flex_templates_spark.functions.audio import (
        loudness_stats,
    )
    from dataflow_flex_templates_spark.testing.clips import make_clips_df

    const_path = os.path.join(
        os.path.dirname(__file__), "..", "dataflow_flex_templates_spark",
        "testing", "oracle_constants.json")
    pins = {r[0]: tuple(r[2:]) for r in
            json.load(open(const_path))["audio_loudness"]}

    clips = make_clips_df(spark, 300, seed=42)
    got = {r["clip_id"]: (r["__ld__"]["rms_q"], r["__ld__"]["gain_mdb"],
                          r["__ld__"]["post_clipped"],
                          r["__ld__"]["post_peak_q"])
           for r in clips.withColumn(
               "__ld__", loudness_stats(target_db=-3.0)(
                   F.col("bytes"), F.col("codec"))).collect()}
    assert got == pins


def test_mel_kernel_band_selectivity():
    """Pure tones land their energy in the mel band containing the
    tone frequency; silence returns the -10000 milli floor in every
    band; empty clips pad to one frame of silence."""
    import numpy as np

    from dataflow_flex_templates_spark.functions.audio import (
        _mel_filterbank,
        mel_energies_np,
    )

    t = np.arange(16000) / 16000.0
    for f_hz in (300.0, 1000.0, 3000.0):
        w = np.sin(2 * np.pi * f_hz * t).astype(np.float32)
        m = mel_energies_np(w, 16000)
        fb = _mel_filterbank(16000, 256, 8)
        bins = np.fft.rfftfreq(256, d=1.0 / 16000)
        expect_band = int(np.argmax(fb[:, np.argmin(np.abs(bins - f_hz))]))
        assert int(np.argmax(m)) == expect_band, (f_hz, m)
    assert mel_energies_np(np.zeros(0, np.float32), 16000) == [-10000] * 8
    assert mel_energies_np(np.zeros(100, np.float32), 16000) == [-10000] * 8


def test_mel_udf_matches_twin(spark):
    """The Arrow UDF over the 300-clip fixture reproduces the pinned
    per-clip twin band vectors bit-for-bit."""
    import json
    import os

    from pyspark.sql import functions as F

    from dataflow_flex_templates_spark.functions.audio import mel_stats
    from dataflow_flex_templates_spark.testing.clips import make_clips_df

    const_path = os.path.join(
        os.path.dirname(__file__), "..", "dataflow_flex_templates_spark",
        "testing", "oracle_constants.json")
    pins = {r[0]: list(r[2:]) for r in
            json.load(open(const_path))["audio_mel"]}

    clips = make_clips_df(spark, 300, seed=42)
    got = {r["clip_id"]: list(r["__mel__"]) for r in clips.withColumn(
        "__mel__", mel_stats()(F.col("bytes"), F.col("codec"),
                               F.col("sr_hz"))).collect()}
    assert got == pins


def test_mfcc_kernel_properties():
    """DCT-II sanity: a flat mel vector projects entirely onto c0
    (all higher coefficients zero), and c0 equals sqrt(M)·mean·1000
    under the orthonormal scaling; UDF-vs-twin parity rides the
    pinned constants like mel."""
    import json
    import math
    import os

    import numpy as np

    from dataflow_flex_templates_spark.functions.audio import mfcc_np

    # silence → every mel band at the -10 log floor → flat vector
    z = mfcc_np(np.zeros(1000, np.float32), 16000)
    assert z[0] == round(math.sqrt(8) * -10.0 * 1000)
    assert z[1:] == [0, 0, 0, 0]

    const_path = os.path.join(
        os.path.dirname(__file__), "..", "dataflow_flex_templates_spark",
        "testing", "oracle_constants.json")
    pins = json.load(open(const_path))["audio_mfcc"]
    assert len(pins) == 302 and all(len(r) == 7 for r in pins)


def test_mfcc_udf_matches_twin(spark):
    import json
    import os

    from pyspark.sql import functions as F

    from dataflow_flex_templates_spark.functions.audio import mfcc_stats
    from dataflow_flex_templates_spark.testing.clips import make_clips_df

    const_path = os.path.join(
        os.path.dirname(__file__), "..", "dataflow_flex_templates_spark",
        "testing", "oracle_constants.json")
    pins = {r[0]: list(r[2:]) for r in
            json.load(open(const_path))["audio_mfcc"]}
    clips = make_clips_df(spark, 300, seed=42)
    got = {r["clip_id"]: list(r["__mf__"]) for r in clips.withColumn(
        "__mf__", mfcc_stats()(F.col("bytes"), F.col("codec"),
                               F.col("sr_hz"))).collect()}
    assert got == pins


def test_segment_plan_drives_byte_exact_pcm_slicing():
    """The segment_clips contract ("the decode stage later slices the
    payload per planned segment"): for pcm_s16le, byte-slicing the
    payload at the planned ms boundaries and decoding each slice
    reproduces exactly the corresponding samples of the full decode —
    gapless, overlap included, no resampling drift. Pure-kernel test
    (the Spark plan side is oracle-checked by the driver row)."""
    import numpy as np

    from dataflow_flex_templates_spark.functions.audio import (
        decode_pcm_np,
        encode_pcm_np,
    )
    from dataflow_flex_templates_spark.testing.clips import (
        reference_waveform,
    )

    sr, dur_ms = 16000, 8000
    wave = reference_waveform("seg_test", sr, dur_ms)
    buf = encode_pcm_np(wave, "pcm_s16le")
    full = decode_pcm_np(buf, "pcm_s16le")

    max_ms, overlap_ms = 3000, 500
    stride = max_ms - overlap_ms
    n_segs = 1 + -(-(dur_ms - max_ms) // stride)  # ceil
    covered = np.zeros(len(full), dtype=bool)
    for k in range(n_segs):
        start_ms = k * stride
        end_ms = min(start_ms + max_ms, dur_ms)
        s = start_ms * sr // 1000 * 2      # 2 bytes/sample
        e = end_ms * sr // 1000 * 2
        seg = decode_pcm_np(buf[s:e], "pcm_s16le")
        np.testing.assert_array_equal(seg, full[s // 2:e // 2])
        covered[s // 2:e // 2] = True
    assert covered.all()
    assert end_ms == dur_ms


def test_noise_mix_kernel_snr_exact_and_determinism():
    """The shared kernel hits the target SNR exactly: with gain g =
    rms(w)/(rms(v)*10^(snr/20)), SNR(w, g·v) == snr by construction.
    Noise is a pure function of (len, sr) — identical across calls."""
    import math

    import numpy as np

    from dataflow_flex_templates_spark.functions.audio import (
        noise_mix_rows_np,
        white_noise_np,
    )

    rng = np.random.default_rng(7)
    w = rng.standard_normal(16000).astype(np.float32) * 0.2
    rows = noise_mix_rows_np(w, 16000)
    assert [r[0] for r in rows] == [20, 10, 5]
    assert all(r[1] == 16000 for r in rows)
    w64 = w.astype(np.float64)
    rms_w = math.sqrt(float(np.dot(w64, w64)) / len(w64))
    v = white_noise_np(len(w), len(w) * 1000003 + 16000)
    rms_v = math.sqrt(float(np.dot(v, v)) / len(v))
    for snr, n, rms_m in rows:
        g = rms_w / (rms_v * 10.0 ** (snr / 20.0))
        m = w64 + g * v
        want = math.sqrt(float(np.dot(m, m)) / n)
        assert rms_m == want, snr              # same kernel, bit-equal
        # achieved SNR == target (rms of signal vs rms of added noise)
        got_snr = 20.0 * math.log10(rms_w / (g * rms_v))
        assert abs(got_snr - snr) < 1e-9
    # determinism + mixed clip is louder than the clean one
    assert noise_mix_rows_np(w, 16000) == rows
    assert all(r[2] > rms_w for r in rows)
    # silent + empty clips: gain 0, no NaNs
    assert noise_mix_rows_np(np.zeros(100, np.float32), 8000) == [
        (20, 100, 0.0), (10, 100, 0.0), (5, 100, 0.0)]
    assert noise_mix_rows_np(np.zeros(0, np.float32), 8000) == [
        (20, 0, 0.0), (10, 0, 0.0), (5, 0, 0.0)]


def test_noise_mix_stats_dataframe_poison_and_counts(spark):
    """UDF end-to-end: 3 rows per decodable clip, NULL array for
    undecodable bytes (poison-row convention), values match the shared
    kernel applied to the same decoded waveforms."""
    from pyspark.sql import functions as F

    from dataflow_flex_templates_spark.functions.audio import (
        decode_pcm_np,
        noise_mix_rows_np,
        noise_mix_stats,
    )
    from dataflow_flex_templates_spark.testing.clips import (
        make_clips_df,
        make_clips_pdf,
    )

    clips = make_clips_df(spark, 30, seed=11)
    bad = spark.createDataFrame(
        [("poison", bytearray(b"xx"), "no_such_codec", 8000)],
        "clip_id string, bytes binary, codec string, sr_hz int")
    nm = noise_mix_stats()
    out = (clips.select("clip_id", "bytes", "codec", "sr_hz")
           .unionByName(bad)
           .withColumn("__nm__", nm(F.col("bytes"), F.col("codec"),
                                    F.col("sr_hz"))))
    rows = {r["clip_id"]: r["__nm__"] for r in
            out.select("clip_id", "__nm__").collect()}
    assert rows["poison"] is None
    pdf = make_clips_pdf(30, seed=11)
    for _, r in pdf.iterrows():
        w = decode_pcm_np(r["bytes"], r["codec"])
        want = noise_mix_rows_np(w, int(r["sr_hz"]))
        got = [(p["snr_db"], p["n_samples"], p["rms_mixed"])
               for p in rows[r["clip_id"]]]
        assert got == want, r["clip_id"]


def test_speaking_rate_gate_edges_and_flags(spark):
    """Empty transcript → 0 words (split-of-empty trap), zero duration
    → NULL rates, flag boundaries are inclusive on 'ok'."""
    from dataflow_flex_templates_spark.operators.asr import (
        speaking_rate_gate,
    )

    rows = [
        ("empty", 60000, "   "),              # 0 words, slow
        ("slowb", 60000, " ".join(["w"] * 149)),   # 149 wpm → slow
        ("okmin", 60000, " ".join(["w"] * 150)),   # 150 wpm → ok
        ("okmax", 60000, " ".join(["w"] * 900)),   # 900 wpm → ok
        ("fastb", 60000, " ".join(["w"] * 901)),   # 901 wpm → fast
        ("zdur", 0, "some words here"),       # NULL rates → ok branch?
    ]
    df = spark.createDataFrame(rows,
                               "clip_id string, dur_ms int, "
                               "transcript string")
    out = {r["clip_id"]: r for r in speaking_rate_gate(df).collect()}
    assert out["empty"]["n_words"] == 0
    assert out["empty"]["rate_flag"] == "slow"
    assert out["slowb"]["rate_flag"] == "slow"
    assert out["okmin"]["rate_flag"] == "ok"
    assert out["okmax"]["rate_flag"] == "ok"
    assert out["fastb"]["rate_flag"] == "fast"
    assert out["okmin"]["wpm_x10"] == 1500
    assert out["fastb"]["wpm_x10"] == 9010
    # zero duration: rates NULL and the row must NOT silently pass
    # the gate (the NULL-falls-through-when()-to-otherwise trap)
    assert out["zdur"]["wpm_x10"] is None
    assert out["zdur"]["rate_flag"] == "undetermined"


def test_reverb_kernel_rir_properties_and_length():
    """RIR: unit direct path, tail energy drr_db below it, −60 dB
    decay envelope at rt60; convolution output length n+m−1; silent
    input stays silent; kernel is deterministic."""
    import math

    import numpy as np

    from dataflow_flex_templates_spark.functions.audio import (
        reverb_rows_np,
        rir_np,
    )

    h = rir_np(16000, 120, drr_db=6.0, seed=16000 * 1000003 + 120)
    assert h[0] == 1.0 and len(h) == int(16000 * 0.120)
    tail_e = float(np.dot(h[1:], h[1:]))
    assert abs(10 * math.log10(1.0 / tail_e) - 6.0) < 1e-9
    rng = np.random.default_rng(3)
    w = rng.standard_normal(8000).astype(np.float32) * 0.1
    rows = reverb_rows_np(w, 16000)
    assert [(r[0], r[1]) for r in rows] == [
        (120, 8000 + len(h) - 1),
        (300, 8000 + int(16000 * 0.300) - 1)]
    assert rows == reverb_rows_np(w, 16000)       # deterministic
    assert all(r[2] > 0 for r in rows)
    assert reverb_rows_np(np.zeros(0, np.float32), 16000) == [
        (120, 0, 0.0), (300, 0, 0.0)]
    # energy sanity: reverb adds the tail's energy; rms within 2x dry
    w64 = w.astype(np.float64)
    dry = math.sqrt(float(np.dot(w64, w64)) / len(w64))
    assert all(0.3 * dry < r[2] < 2.0 * dry for r in rows)
