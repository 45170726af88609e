"""Extension codecs (functions/codecs.py): G.711 A-law + IMA ADPCM.

Known-vector checks come straight from the public specs (A-law silence
is 0xD5, positive full-scale is 0xAA after the 0x55 even-bit toggle);
roundtrip SNR floors are measured on the clip fixture's own waveform
family and asserted with margin.
"""

from __future__ import annotations

import numpy as np
import pytest

from dataflow_flex_templates_spark.functions.audio import (
    decode_pcm_np,
    encode_pcm_np,
    snr_db,
)
from dataflow_flex_templates_spark.functions.codecs import (
    adpcm_ima_decode_np,
    adpcm_ima_encode_np,
    alaw_decode_np,
    alaw_encode_np,
)
from dataflow_flex_templates_spark.testing.clips import reference_waveform


def test_alaw_known_vectors():
    # G.711: zero encodes to 0xD5 (mask toggle of 0x80|0x00);
    # positive full-scale to 0xAA; negative full-scale to 0x2A.
    assert alaw_encode_np(np.array([0.0], np.float32)) == b"\xd5"
    assert alaw_encode_np(np.array([1.0], np.float32)) == b"\xaa"
    assert alaw_encode_np(np.array([-1.0], np.float32)) == b"\x2a"
    # decode of the quietest positive code is the half-step 8/32768
    assert alaw_decode_np(b"\xd5")[0] == pytest.approx(8.0 / 32768.0)
    # full-scale code decodes to the segment-7 max reconstruction
    assert alaw_decode_np(b"\xaa")[0] == pytest.approx(32256.0 / 32768.0)


def test_alaw_roundtrip_snr_fixture_family():
    snrs = []
    for i in range(20):
        w = reference_waveform(f"clip_{i:012d}", 16000, 500)
        dec = alaw_decode_np(alaw_encode_np(w))
        assert len(dec) == len(w)
        snrs.append(snr_db(w, dec))
    # measured floor 37.8 dB on this family; assert the north-rule 30
    assert min(snrs) >= 30.0


def test_adpcm_roundtrip_length_and_snr():
    # 4-bit ADPCM fidelity scales with the oversampling ratio: the
    # fixture's chirps sweep to ~2.5 kHz, so per-sample slopes at
    # sr=8000 are near the step-adaptation limit. Minima measured on
    # exactly these 8 clips per rate: 20.1 dB @8k, 25.9 @16k,
    # 26.7 @22k, 34.6 @44.1k — assert ~1.5 dB under each (codec
    # physics, not a regression gate on the 30 dB reference-parity
    # invariant, which lossless/companded codecs carry; the driver
    # query reports clips_snr30_ok honestly).
    floors = {8000: 18.5, 16000: 24.0, 22050: 25.0, 44100: 33.0}
    for sr, dur in ((16000, 500), (8000, 333), (22050, 250),
                    (44100, 200)):
        for i in range(8):
            w = reference_waveform(f"clip_{i:012d}", sr, dur)
            payload = adpcm_ima_encode_np(w)
            dec = adpcm_ima_decode_np(payload)
            # exact sample count, odd lengths included (header flag)
            assert len(dec) == len(w)
            assert snr_db(w, dec) >= floors[sr]


def test_adpcm_payload_is_quarter_size():
    w = reference_waveform("clip_000000000000", 16000, 1000)
    raw = encode_pcm_np(w, "pcm_s16le")
    adp = adpcm_ima_encode_np(w)
    assert len(adp) <= len(raw) / 4 + 8  # 4:1 plus the 4-byte header


def test_codec_dispatch_through_audio_module():
    """decode_pcm_np/encode_pcm_np accept the new codec names."""
    w = reference_waveform("clip_000000000001", 16000, 300)
    for codec, floor in (("alaw", 30.0), ("adpcm_ima", 24.0)):
        payload = encode_pcm_np(w, codec)
        dec = decode_pcm_np(payload, codec)
        assert len(dec) == len(w)
        assert snr_db(w, dec) >= floor


def test_adpcm_truncated_payload_raises():
    with pytest.raises(ValueError):
        adpcm_ima_decode_np(b"\x00\x00")


def test_pitch_zcr_pure_tone():
    from dataflow_flex_templates_spark.functions.audio import pitch_zcr_np

    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr
    tone = np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
    zcr, lag, mhz, conf = pitch_zcr_np(tone, sr)
    assert lag == round(sr / 220.0)  # 73
    assert abs(mhz - 220_000) < 4000  # within the lag-grid resolution
    assert conf > 900_000  # near-periodic: r[lag]/r[0] > 0.9
    assert abs(zcr - 2 * 220) <= 3  # two sign flips per cycle


def test_pitch_zcr_degenerate_inputs():
    from dataflow_flex_templates_spark.functions.audio import pitch_zcr_np

    assert pitch_zcr_np(np.zeros(0, np.float32), 16000) == (0, 0, 0, 0)
    # constant signal: zero crossings none, r[0]>0 path still defined
    zcr, lag, mhz, conf = pitch_zcr_np(np.full(512, 0.5, np.float32), 16000)
    assert zcr == 0 and lag >= 2
