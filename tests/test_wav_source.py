"""WAV/RIFF ingest source (sources/wav.py + testing/wavio.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dataflow_flex_templates_spark.testing.wavio import (
    make_wav_fixture,
    parse_wav_bytes,
    write_wav_bytes,
    write_wav_fixture_dir,
)


def test_wav_roundtrip_mono():
    pcm = (np.sin(np.arange(1001) / 7.0) * 20000).astype(np.int16)
    buf = write_wav_bytes(pcm, 16000)
    p = parse_wav_bytes(buf)
    assert p["sr_hz"] == 16000 and p["n_channels"] == 1
    assert p["n_frames"] == 1001
    assert np.array_equal(p["pcm"], pcm)


def test_wav_stereo_downmix_exact_integer_mean():
    left = np.array([100, -100, 32767, -32768], np.int16)
    right = np.array([200, -300, 32767, -32768], np.int16)
    inter = np.empty(8, np.int16)
    inter[0::2] = left
    inter[1::2] = right
    p = parse_wav_bytes(write_wav_bytes(inter, 8000, n_channels=2))
    assert p["n_frames"] == 4
    expected = ((left.astype(np.int32) + right.astype(np.int32)) >> 1)
    assert np.array_equal(p["pcm"], expected.astype(np.int16))


def test_wav_odd_chunk_pad_byte_walk():
    """A LIST chunk with an odd payload must not desync the walk."""
    pcm = np.arange(10, dtype=np.int16)
    buf = write_wav_bytes(pcm, 8000,
                          extra_chunks=[(b"LIST", b"INFOabc")])
    p = parse_wav_bytes(buf)
    assert np.array_equal(p["pcm"], pcm)


def test_wav_malformed_raises():
    with pytest.raises(ValueError):
        parse_wav_bytes(b"RIFX1234WAVE")
    # truncated data chunk
    pcm = np.arange(100, dtype=np.int16)
    buf = write_wav_bytes(pcm, 8000)
    with pytest.raises(ValueError):
        parse_wav_bytes(buf[:-7])
    # declared size beyond buffer
    bad = (b"RIFF" + struct.pack("<I", 100) + b"WAVE"
           + b"fmt " + struct.pack("<I", 1000))
    with pytest.raises(ValueError):
        parse_wav_bytes(bad)


def test_wav_fixture_deterministic():
    a = make_wav_fixture(3)
    b = make_wav_fixture(3)
    assert a[1] == b[1] and a[2] == b[2]
    # the poison file is flagged
    assert make_wav_fixture(13)[2]["ok"] is False


def test_read_wav_dir_spark(spark, tmp_path):
    facts = write_wav_fixture_dir(str(tmp_path), n_files=20)
    from dataflow_flex_templates_spark.sources.wav import read_wav_dir

    rows = {r["clip_id"]: r.asDict()
            for r in read_wav_dir(spark, str(tmp_path)).collect()}
    assert len(rows) == 20
    for f in facts:
        r = rows[f["name"]]
        assert r["ok"] == f["ok"]
        if f["ok"]:
            assert r["sr_hz"] == f["sr_hz"]
            assert r["n_frames"] == f["n_frames"]
            assert r["n_channels"] == f["n_channels"]
            assert r["sum_abs"] == f["sum_abs"]
            assert r["codec"] == "pcm_s16le"
            # payload decodes through the engine's standard path
            from dataflow_flex_templates_spark.functions.audio import (
                decode_pcm_np,
            )
            assert len(decode_pcm_np(r["bytes"], "pcm_s16le")) \
                == f["n_frames"]
        else:
            assert r["bytes"] is None
