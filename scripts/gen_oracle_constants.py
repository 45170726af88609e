#!/usr/bin/env python
"""Generate the driver-oracle constant tables — WITHOUT Spark.

Hash-derived operators (simhash, minhash-LSH, hyperplane-LSH) and the
binary audio path cannot be expressed in DuckDB ANSI SQL directly, so
their oracles are split: the hash/candidate half is computed here by
the single-process twins (testing/twins.py — pure-Python XXH64 +
sequential-fold LSH, bit-exact with Catalyst by construction, verified
in tests/test_twins.py), pinned into oracle_constants.json, and the
similarity/aggregation half runs in DuckDB SQL over the same parquet
tables. Nothing in this script imports pyspark.

Inputs: /root/testdata/sf0.01 (the driver's correctness SF).
Output: dataflow_flex_templates_spark/testing/oracle_constants.json

Re-run whenever the testdata or the operator parameters in
__spark_entry__.py change:  python scripts/gen_oracle_constants.py
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
OUT = os.environ.get(
    "SPARK_GRAFT_ORACLE_CONST_OUT",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "dataflow_flex_templates_spark", "testing",
                 "oracle_constants.json"))


def _assert_not_knife_edge(x: float, digits: int = 4) -> float:
    """Rounded aggregates must sit safely away from a rounding boundary
    so engine-side float-sum reassociation cannot flip the digit."""
    scaled = x * 10 ** digits
    frac = abs(scaled - math.floor(scaled) - 0.5)
    assert frac > 1e-6, f"knife-edge rounding for {x!r}"
    return round(x, digits)


def main() -> None:
    from dataflow_flex_templates_spark.testing.twins import (
        lsh_pair_candidates,
        lsh_query_candidates,
        minhash_band_candidates,
        simhash_twin,
    )

    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    docs = docs.sort_values("doc_id")
    out: dict = {"sf_dir": SF_DIR}

    # simhash signatures for every doc (queries slice by doc_id in SQL)
    out["simhash"] = [
        [int(i), simhash_twin(t)]
        for i, t in zip(docs["doc_id"], docs["text"])
    ]

    # minhash banded-LSH candidate pairs (driver params: doc_id < 120,
    # num_hashes=32, bands=16)
    sub = [(int(i), t) for i, t in zip(docs["doc_id"], docs["text"])
           if i < 120]
    out["minhash_candidates"] = [
        list(p) for p in minhash_band_candidates(sub, num_hashes=32,
                                                 bands=16, n=3)
    ]

    emb = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet")).to_pandas()
    emb = emb[emb["vec_id"] < 300].sort_values("vec_id")
    vecs = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for _, r in emb.iterrows()]
    dim = len(vecs[0][1])
    out["embedding_dim"] = dim

    # embedding_neardup_lsh candidates (vec_id < 300, planes=4, tables=16)
    out["neardup_lsh_candidates"] = [
        list(p) for p in lsh_pair_candidates(vecs, dim, n_planes=4,
                                             n_tables=16)
    ]
    # lsh_ann_topk candidates (queries vec_id < 12, planes=3, tables=16)
    qvecs = [(i, v) for i, v in vecs if i < 12]
    out["lsh_ann_candidates"] = [
        list(p) for p in lsh_query_candidates(vecs, qvecs, dim, n_planes=3,
                                              n_tables=16)
    ]
    # ivf_ann_topk candidates (lloyd_iters=0 deterministic index;
    # n_centroids=12, nprobe=4)
    from dataflow_flex_templates_spark.testing.twins import ivf_candidates

    out["ivf_candidates"] = [
        list(p) for p in ivf_candidates(vecs, qvecs, n_centroids=12,
                                        nprobe=4)
    ]

    # ---- audio stats twins (no Spark, no DataFrames) -------------------
    from dataflow_flex_templates_spark.functions.audio import (
        decode_pcm_np,
        resample_linear_np,
        spectral_features_np,
        vad_segments_np,
    )
    from dataflow_flex_templates_spark.testing.clips import make_clips_pdf

    clips = make_clips_pdf(300, seed=42)
    by_codec: dict[str, list[tuple[float, float]]] = {}
    by_sr: dict[int, list[tuple[int, float]]] = {}
    spec_by_codec: dict[str, list[tuple]] = {}
    vad_by_codec: dict[str, list[tuple[int, int, int]]] = {}
    for _, r in clips.iterrows():
        w = decode_pcm_np(r["bytes"], r["codec"])
        spec_by_codec.setdefault(r["codec"], []).append(
            spectral_features_np(w, int(r["sr_hz"])))
        vad_by_codec.setdefault(r["codec"], []).append(
            vad_segments_np(w, int(r["sr_hz"])))
        n = len(w)
        rms = math.sqrt(float(np.dot(w, w)) / n) if n else 0.0
        sb = np.signbit(w)
        zcr = (float(np.count_nonzero(sb[1:] != sb[:-1])) / max(n - 1, 1)
               if n else 0.0)
        by_codec.setdefault(r["codec"], []).append((rms, zcr))
        rs = resample_linear_np(w, int(r["sr_hz"]), 16000)
        rms_o = (math.sqrt(float(np.dot(rs, rs)) / len(rs))
                 if len(rs) else 0.0)
        by_sr.setdefault(int(r["sr_hz"]), []).append((len(rs), rms_o))

    out["audio_decode_stats"] = [
        [codec, len(v),
         _assert_not_knife_edge(sum(x for x, _ in v) / len(v)),
         _assert_not_knife_edge(sum(z for _, z in v) / len(v))]
        for codec, v in sorted(by_codec.items())
    ]

    # Speed perturbation twin: same decode + linear-resample kernels,
    # factor f = resample from round(sr*f) back to sr (duration ~1/f).
    # Must mirror functions/audio.speed_perturb_stats defaults exactly.
    sp_by: dict[tuple[int, str], list[tuple[int, float]]] = {}
    for _, r in clips.iterrows():
        w = decode_pcm_np(r["bytes"], r["codec"])
        for fq, f in ((90, 0.9), (100, 1.0), (110, 1.1)):
            rs = resample_linear_np(
                w, int(round(int(r["sr_hz"]) * f)), int(r["sr_hz"]))
            rms = (math.sqrt(float(np.dot(rs, rs)) / len(rs))
                   if len(rs) else 0.0)
            sp_by.setdefault((fq, r["codec"]), []).append((len(rs), rms))
    out["speed_perturb"] = [
        [fq, codec, len(v), int(sum(n for n, _ in v)),
         _assert_not_knife_edge(sum(x for _, x in v) / len(v))]
        for (fq, codec), v in sorted(sp_by.items())
    ]

    # Noise-mix twin: calls the SAME shared kernel the Spark UDF calls
    # (functions/audio.noise_mix_rows_np) — zero drift by construction;
    # only the per-(snr, codec) aggregation is re-done here/in DuckDB.
    from dataflow_flex_templates_spark.functions.audio import (
        noise_mix_rows_np,
    )

    nm_by: dict[tuple[int, str], list[tuple[int, float]]] = {}
    for _, r in clips.iterrows():
        w = decode_pcm_np(r["bytes"], r["codec"])
        for snr, nn, rms in noise_mix_rows_np(w, int(r["sr_hz"])):
            nm_by.setdefault((snr, r["codec"]), []).append((nn, rms))
    out["noise_mix"] = [
        [snr, codec, len(v), int(sum(n for n, _ in v)),
         _assert_not_knife_edge(sum(x for _, x in v) / len(v))]
        for (snr, codec), v in sorted(nm_by.items())
    ]

    # Reverb twin: SAME shared kernel (reverb_rows_np) — zero drift.
    from dataflow_flex_templates_spark.functions.audio import (
        reverb_rows_np,
    )

    rv_by: dict[tuple[int, str], list[tuple[int, float]]] = {}
    for _, r in clips.iterrows():
        w = decode_pcm_np(r["bytes"], r["codec"])
        for rt, nn, rms in reverb_rows_np(w, int(r["sr_hz"])):
            rv_by.setdefault((rt, r["codec"]), []).append((nn, rms))
    out["reverb_aug"] = [
        [rt, codec, len(v), int(sum(n for n, _ in v)),
         _assert_not_knife_edge(sum(x for _, x in v) / len(v))]
        for (rt, codec), v in sorted(rv_by.items())
    ]

    # Speaking-rate twin: per-clip word/char counts from the same
    # fixture transcripts (python str.split == the operator's
    # trap-guarded whitespace split); rates + flags + rollup stay
    # genuine SQL in the oracle.
    out["speaking_rate"] = [
        [r["clip_id"], r["codec"], int(r["dur_ms"]),
         len(r["transcript"].split()), len(r["transcript"].strip())]
        for _, r in clips.iterrows()
    ]
    out["audio_resample_stats"] = [
        [sr, len(v), int(sum(n for n, _ in v)),
         _assert_not_knife_edge(sum(r for _, r in v) / len(v))]
        for sr, v in sorted(by_sr.items())
    ]
    out["audio_spectral_stats"] = [
        [codec, len(v),
         _assert_not_knife_edge(sum(x[0] for x in v) / len(v), 3),
         _assert_not_knife_edge(sum(x[1] for x in v) / len(v), 3),
         _assert_not_knife_edge(sum(x[2] for x in v) / len(v), 3),
         _assert_not_knife_edge(sum(x[3] for x in v) / len(v), 4)]
        for codec, v in sorted(spec_by_codec.items())
    ]

    out["audio_vad_stats"] = [
        [codec, len(v),
         int(sum(x[0] for x in v)),   # frames
         int(sum(x[1] for x in v)),   # voiced frames
         int(sum(x[2] for x in v))]   # segments — all exact integers
        for codec, v in sorted(vad_by_codec.items())
    ]

    # ---- per-user xxhash64 pins (hll_user_registers driver query) ----
    # Spark's xxhash64(LongType) via the byte-exact twin; register/rho
    # algebra is genuine SQL in the oracle.
    from dataflow_flex_templates_spark.testing.xxh import xxh64_long

    ev_users = pq.read_table(os.path.join(SF_DIR, "events.parquet"),
                             columns=["user_id"]).to_pandas()
    out["user_hash"] = [[int(u), xxh64_long(int(u))]
                        for u in sorted(ev_users["user_id"].unique())]

    # ---- per-clip VAD pins (audio_text_quality driver query) ---------
    # Waveform-derived halves only; transcripts and every quality flag
    # are genuine SQL over `documents` in the oracle.
    from dataflow_flex_templates_spark.testing.clips import (
        make_doc_clips_pdf,
    )

    doc300 = docs[docs["doc_id"] < 300]
    dc = make_doc_clips_pdf(doc300).drop_duplicates("clip_id")
    out["clip_vad_doc300"] = [
        [r["clip_id"],
         *map(int, vad_segments_np(decode_pcm_np(r["bytes"], r["codec"]),
                                   int(r["sr_hz"]))[:2])]
        for _, r in dc.iterrows()
    ]

    # ---- audio fingerprint pins (audio_fp_neardup driver query) ------
    # Only the DSP half (decode → FFT → landmark subfp per frame) is
    # pinned; candidate generation + verification run as genuine SQL
    # over these rows in the oracle.
    from dataflow_flex_templates_spark.functions.audio import fingerprint_np
    from dataflow_flex_templates_spark.testing.clips import (
        make_neardup_clips_pdf,
    )

    nd = make_neardup_clips_pdf()
    fp_rows = []
    for _, r in nd.iterrows():
        fp = fingerprint_np(decode_pcm_np(r["bytes"], r["codec"]),
                            int(r["sr_hz"]))
        fp_rows.extend([r["clip_id"], int(j), int(v)]
                       for j, v in enumerate(fp))
    out["audio_fp"] = fp_rows

    # ---- per-clip health pins (audio_health driver query) ------------
    # Only the waveform-derived integer counters are pinned; the defect
    # flags and per-codec aggregation are genuine SQL in the oracle.
    from dataflow_flex_templates_spark.functions.audio import (
        audio_health_np,
    )
    from dataflow_flex_templates_spark.testing.clips import (
        make_health_clips_pdf,
    )

    hc = make_health_clips_pdf()
    out["audio_health"] = [
        [r["clip_id"], r["codec"], int(r["sr_hz"]),
         *map(int, audio_health_np(decode_pcm_np(r["bytes"], r["codec"])))]
        for _, r in hc.iterrows()
    ]

    # ---- per-clip loudness pins (audio_loudness driver query) --------
    # Per-clip int64 gain-staging counters from the numpy twin; the
    # per-codec rollup is genuine SQL in the oracle. Params must mirror
    # _q_audio_loudness: target_db=-3 (hot target so the post-gain
    # clip counter actually exercises nonzero), peak_limit=0.99.
    from dataflow_flex_templates_spark.functions.audio import (
        loudness_norm_np,
    )

    out["audio_loudness"] = [
        [r["clip_id"], r["codec"],
         *map(int, loudness_norm_np(
             decode_pcm_np(r["bytes"], r["codec"]), target_db=-3.0))]
        for _, r in clips.iterrows()
    ]

    # ---- per-clip log-mel pins (audio_mel_stats driver query) --------
    # Per-clip milli-log-unit band energies (int64) from the numpy
    # twin; per-codec band rollup is genuine SQL. Params must mirror
    # _q_audio_mel_stats: n_mels=8, n_fft=256, hop=128.
    from dataflow_flex_templates_spark.functions.audio import (
        mel_energies_np,
    )

    out["audio_mel"] = [
        [r["clip_id"], r["codec"],
         *mel_energies_np(decode_pcm_np(r["bytes"], r["codec"]),
                          int(r["sr_hz"]))]
        for _, r in clips.iterrows()
    ]

    # ---- per-clip MFCC pins (audio_mfcc_stats driver query) ----------
    # Quantized DCT-II of the (already-int) log-mel vector; per-codec
    # rollup genuine SQL. Params mirror _q_audio_mfcc_stats: n_mfcc=5.
    from dataflow_flex_templates_spark.functions.audio import mfcc_np

    out["audio_mfcc"] = [
        [r["clip_id"], r["codec"],
         *mfcc_np(decode_pcm_np(r["bytes"], r["codec"]),
                  int(r["sr_hz"]))]
        for _, r in clips.iterrows()
    ]

    # ---- per-segment VAD-run pins (utterance_segments driver query) --
    # Same 300-clip fixture and VAD params as audio_vad_stats; only the
    # waveform-derived runs are pinned, ordering/rollup genuine SQL.
    from dataflow_flex_templates_spark.functions.audio import (
        vad_segment_rows_np,
    )

    seg_rows = []
    for _, r in clips.iterrows():
        w = decode_pcm_np(r["bytes"], r["codec"])
        for j, (s0, nf) in enumerate(
                vad_segment_rows_np(w, int(r["sr_hz"]))):
            seg_rows.append([r["clip_id"], j, s0, nf])
    out["utterance_segments"] = seg_rows

    # ---- per-clip edge-silence pins (trim_silence driver query) ------
    from dataflow_flex_templates_spark.functions.audio import (
        trim_silence_np,
    )
    from dataflow_flex_templates_spark.testing.clips import (
        make_trim_clips_pdf,
    )

    tc = make_trim_clips_pdf()
    out["trim_silence"] = [
        [r["clip_id"], r["codec"],
         *map(int, trim_silence_np(decode_pcm_np(r["bytes"],
                                                 r["codec"])))]
        for _, r in tc.iterrows()
    ]

    # ---- per-doc zlib pins (compression_ratio driver query) ----------
    # zlib output is deterministic at a fixed level for a given zlib
    # build; the ratio/flag arithmetic is genuine SQL in the oracle.
    from dataflow_flex_templates_spark.operators.text import (
        compression_profile_np,
    )

    full_docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                              columns=["doc_id", "text"]).to_pandas()
    out["compression"] = [
        [int(r["doc_id"]), *compression_profile_np(r["text"])]
        for _, r in full_docs.sort_values("doc_id").iterrows()
    ]

    # ---- bloom-dedup FP victims (bloom_dedup driver query) -----------
    # The hash half: first occurrences wrongly suppressed by bloom
    # false positives, computed by the pure-python kernel over the
    # event-time-ordered stream. Everything else (first-occurrence
    # selection) is genuine SQL in the oracle. Params must mirror
    # _q_bloom_dedup: m_bits=4096, n_shards=8, k=4.
    from dataflow_flex_templates_spark.streaming.bloom_dedup import (
        run_bloom_dedup,
    )
    from dataflow_flex_templates_spark.testing.xxh import xxh64_long

    ev = pq.read_table(os.path.join(SF_DIR, "events.parquet"),
                       columns=["user_id", "ts", "event_id"]).to_pandas()
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    by_shard: dict[int, list] = {}
    for r in ev.itertuples():
        shard = xxh64_long(int(r.user_id)) % 8
        by_shard.setdefault(shard, []).append(
            (int(r.ts_us), int(r.event_id), int(r.user_id)))
    firsts = {}
    for r in sorted(ev.itertuples(),
                    key=lambda x: (x.ts_us, x.event_id)):
        firsts.setdefault(int(r.user_id), (int(r.ts_us), int(r.event_id)))
    emitted_keys = set()
    for shard, items in by_shard.items():
        em, _ = run_bloom_dedup(sorted(items), [0] * (4096 // 64),
                                4096, 4)
        emitted_keys.update(v for _, _, v in em)
    out["bloom_dedup_fp_victims"] = sorted(
        int(u) for u in firsts if u not in emitted_keys)

    # ---- per-clip pitch/ZCR pins (audio_pitch_stats driver query) ----
    # Same 300-clip fixture as loudness/mel; per-clip integer pitch
    # features from the numpy twin, per-codec rollup genuine SQL.
    from dataflow_flex_templates_spark.functions.audio import pitch_zcr_np

    out["audio_pitch"] = [
        [r["clip_id"], r["codec"],
         *map(int, pitch_zcr_np(decode_pcm_np(r["bytes"], r["codec"]),
                                int(r["sr_hz"])))]
        for _, r in clips.iterrows()
    ]

    # ---- per-clip transcode-fidelity pins (audio_transcode query) ----
    # Lossy-extension-codec fixture (alaw + adpcm_ima, seed 77); the
    # pins replicate transcode_fidelity_stats' per-clip math exactly:
    # decoded length, int64 |x| energy proxy, SNR vs the re-derived
    # reference waveform in milli-dB. Rollup genuine SQL.
    from dataflow_flex_templates_spark.functions.audio import snr_db
    from dataflow_flex_templates_spark.testing.clips import (
        reference_waveform,
    )

    tc_clips = make_clips_pdf(200, seed=77, max_dur_ms=800,
                              codec_choices=["alaw", "adpcm_ima"])
    tc_rows = []
    for _, r in tc_clips.iterrows():
        w = decode_pcm_np(r["bytes"], r["codec"])
        ref = reference_waveform(r["clip_id"], int(r["sr_hz"]),
                                 int(r["dur_ms"]))
        sum_abs_q = int(np.abs(np.round(
            w.astype(np.float64) * 1e6)).astype(np.int64).sum())
        tc_rows.append([r["clip_id"], r["codec"], len(w), sum_abs_q,
                        int(round(snr_db(ref, w) * 1000.0))])
    out["audio_transcode"] = tc_rows

    # ---- Clip-conformance verdicts (clip_conformance driver query) ---
    # The (left, right) pair comes from the ONE shared fixture builder
    # (testing/clips.py conformance_fixture_pdfs); the status algebra
    # below is an independent re-derivation of
    # operators/conformance.clip_conformance — only the decode/snr
    # kernels are shared (the accepted shared-kernel twin pattern).
    from dataflow_flex_templates_spark.testing.clips import (
        conformance_fixture_pdfs,
    )

    cf_left, cf_right = conformance_fixture_pdfs()
    lmap = {r["clip_id"]: r for _, r in cf_left.iterrows()}
    rmap = {r["clip_id"]: r for _, r in cf_right.iterrows()}
    cf_rows = []
    for cid in sorted(set(lmap) | set(rmap)):
        lrow, rrow = lmap.get(cid), rmap.get(cid)

        def _dec(row):
            if row is None:
                return None
            try:
                return decode_pcm_np(row["bytes"], row["codec"])
            except Exception:
                return None

        w1, w2 = _dec(lrow), _dec(rrow)
        n1 = len(w1) if w1 is not None else None
        n2 = len(w2) if w2 is not None else None
        snr = (int(round(snr_db(w1, w2) * 1000.0))
               if w1 is not None and w2 is not None else None)
        t1 = lrow["transcript"] if lrow is not None else None
        t2 = rrow["transcript"] if rrow is not None else None
        tx_eq = t1 == t2 if (t1 is not None or t2 is not None) else True
        if lrow is None:
            status = "missing_left"
        elif rrow is None:
            status = "missing_right"
        elif n1 is None or n2 is None:
            status = "poison"
        elif n1 != n2:
            status = "length_mismatch"
        elif snr < 30000:
            status = "snr_below_floor"
        elif not tx_eq:
            status = "transcript_diff"
        else:
            status = "pass"
        cf_rows.append([cid, status, n1, n2, snr, bool(tx_eq)])
    assert len({r[1] for r in cf_rows}) == 7, \
        "conformance fixture must exercise all seven statuses"
    out["clip_conformance"] = cf_rows

    # ---- WAV-ingest fixture facts (wav_ingest driver query) ----------
    # Fully derivable without Spark: the wavio writer/parser twin IS
    # the oracle; the poison file (i=13) pins NULL fields.
    from dataflow_flex_templates_spark.testing.wavio import (
        make_wav_fixture,
    )

    wav_rows = []
    for i in range(40):
        _, _, facts = make_wav_fixture(i)
        wav_rows.append([
            facts["name"], facts["ok"], facts.get("sr_hz", -1),
            facts.get("n_channels", -1), facts.get("n_frames", -1),
            facts.get("dur_ms", -1), facts.get("sum_abs", -1)])
    out["wav_ingest"] = wav_rows

    with open(OUT, "w") as f:
        json.dump(out, f)
    sizes = {k: (len(v) if isinstance(v, list) else v)
             for k, v in out.items()}
    print(f"wrote {OUT}: {sizes}")


if __name__ == "__main__":
    main()
