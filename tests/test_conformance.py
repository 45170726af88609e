"""operators/conformance.py — the migration acceptance gate.

Hand-built six-row fixture (NOT the pinned driver fixture): every
status asserted against independently-reasoned expectations.
"""

from __future__ import annotations

import numpy as np
import pytest

from dataflow_flex_templates_spark.functions.audio import encode_pcm_np
from dataflow_flex_templates_spark.operators.conformance import (
    clip_conformance,
)

SCHEMA = ("clip_id string, bytes binary, codec string, "
          "transcript string")


def _tone(seed: int, n: int = 800) -> np.ndarray:
    t = np.arange(n, dtype=np.float64)
    return (0.8 * np.sin(2 * np.pi * (100 + seed * 37) * t / 8000.0)
            ).astype(np.float32)


def test_clip_conformance_statuses(spark):
    w = {k: _tone(k) for k in range(6)}
    enc = {k: encode_pcm_np(v, "pcm_s16le") for k, v in w.items()}
    left = spark.createDataFrame([
        ("a", enc[0], "pcm_s16le", "hello world"),   # identical -> pass
        ("b", enc[1], "pcm_s16le", "same audio"),    # transcript_diff
        ("c", enc[2], "pcm_s16le", "txt"),           # right truncated
        ("d", enc[3], "pcm_s16le", "txt"),           # right bad codec
        ("e", enc[4], "pcm_s16le", "txt"),           # right noisy < 30 dB
        ("f", enc[5], "pcm_s16le", "txt"),           # right missing
    ], SCHEMA)
    noisy = encode_pcm_np(
        (w[4] + 0.5 * _tone(9)).clip(-1, 1), "pcm_s16le")
    right = spark.createDataFrame([
        ("a", enc[0], "pcm_s16le", "hello world"),
        ("b", enc[1], "pcm_s16le", "same audio EDITED"),
        ("c", enc[2][: len(enc[2]) // 2], "pcm_s16le", "txt"),
        ("d", enc[3], "mp3", "txt"),
        ("e", noisy, "pcm_s16le", "txt"),
        ("g", enc[0], "pcm_s16le", "right only"),    # -> missing_left
    ], SCHEMA)

    got = {r["clip_id"]: r for r in
           clip_conformance(left, right).collect()}
    assert {k: v["status"] for k, v in got.items()} == {
        "a": "pass", "b": "transcript_diff", "c": "length_mismatch",
        "d": "poison", "e": "snr_below_floor", "f": "missing_right",
        "g": "missing_left"}
    # identical payloads: SNR capped at exactly 200 dB
    assert got["a"]["snr_mdb"] == 200_000
    assert got["a"]["transcript_equal"] is True
    # transcript_diff: audio evidence still reported and healthy
    assert got["b"]["snr_mdb"] == 200_000
    assert got["b"]["transcript_equal"] is False
    # truncation: evidence shows the count split; SNR of the
    # overlapping prefix is still perfect
    assert got["c"]["n_right"] * 2 == got["c"]["n_left"]
    assert got["c"]["snr_mdb"] == 200_000
    # poison: right side undecodable, left evidence intact
    assert got["d"]["n_right"] is None and got["d"]["n_left"] == 800
    # below floor but decodable: SNR present, in (0, 30 dB)
    assert 0 < got["e"]["snr_mdb"] < 30_000
    # missing sides: transcript equality is a real comparison vs NULL
    assert got["f"]["transcript_equal"] is False
    assert got["g"]["n_left"] is None


def test_clip_conformance_missing_column_raises(spark):
    df = spark.createDataFrame([("a", b"", "pcm_s16le")],
                               "clip_id string, bytes binary, "
                               "codec string")
    with pytest.raises(ValueError, match="transcript"):
        clip_conformance(df, df)


def test_clip_conformance_floor_is_parametric(spark):
    """The same pair flips pass <-> snr_below_floor with the floor —
    the gate is the parameter, not a hard-coded 30 dB."""
    w0 = _tone(0)
    a = encode_pcm_np(w0, "pcm_s16le")
    b = encode_pcm_np((w0 + 0.01 * _tone(3)).clip(-1, 1), "pcm_s16le")
    left = spark.createDataFrame([("x", a, "pcm_s16le", "t")], SCHEMA)
    right = spark.createDataFrame([("x", b, "pcm_s16le", "t")], SCHEMA)
    lo = clip_conformance(left, right, snr_floor_mdb=10_000).collect()[0]
    hi = clip_conformance(left, right,
                          snr_floor_mdb=150_000).collect()[0]
    assert lo["status"] == "pass"
    assert hi["status"] == "snr_below_floor"
    assert lo["snr_mdb"] == hi["snr_mdb"]


def _conf_rows(df):
    return sorted(
        (tuple(r) for r in df.collect()), key=lambda t: t[0])


@pytest.mark.parametrize("chunk", [1, 4, 0])
def test_stream_conformance_fold_equals_batch(spark, chunk):
    """streaming/conformance_stream.py: union(per-batch verdicts) ∪
    close-reconciliation == the batch full-outer gate, byte-for-byte,
    at ANY batch split (chunk = rows per micro-batch; 0 = one batch).
    Uses the driver fixture so every one of the seven statuses crosses
    a batch boundary at chunk=1."""
    from dataflow_flex_templates_spark.streaming.conformance_stream import (
        conformance_apply_batch,
        finalize_missing_right,
    )
    from dataflow_flex_templates_spark.testing.clips import (
        clips_spark_schema,
        conformance_fixture_pdfs,
    )

    left_pdf, right_pdf = conformance_fixture_pdfs(n=48, seed=77)
    schema = clips_spark_schema()
    left = spark.createDataFrame(left_pdf, schema=schema)
    right = spark.createDataFrame(right_pdf, schema=schema)

    want = _conf_rows(clip_conformance(left, right))

    n = len(right_pdf)
    step = n if chunk == 0 else chunk
    folds = []
    for i in range(0, n, step):
        batch = spark.createDataFrame(
            right_pdf.iloc[i:i + step], schema=schema)
        folds.append(conformance_apply_batch(left, batch))
    union = folds[0]
    for f in folds[1:]:
        union = union.unionByName(f)
    closed = union.unionByName(finalize_missing_right(left, union))

    assert _conf_rows(closed) == want
    # per-batch emissions never claim missing_right (end-of-stream
    # knowledge); the reconciliation emits exactly those
    assert all(r[1] != "missing_right" for r in _conf_rows(union))
    n_missing = sum(1 for r in want if r[1] == "missing_right")
    assert (len(_conf_rows(closed)) - len(_conf_rows(union))
            == n_missing)


def test_stream_conformance_redelivery_idempotent(spark):
    """A redelivered micro-batch re-emits IDENTICAL rows (verdicts are
    a deterministic pure function of (reference row, streamed row)),
    so keyed dedup on clip_id — what the exactly-once sink's MERGE
    does — restores the batch gate exactly. This is the redelivery
    contract the module docstring defers to the sink, pinned."""
    from dataflow_flex_templates_spark.streaming.conformance_stream import (
        conformance_apply_batch,
        finalize_missing_right,
    )
    from dataflow_flex_templates_spark.testing.clips import (
        clips_spark_schema,
        conformance_fixture_pdfs,
    )

    left_pdf, right_pdf = conformance_fixture_pdfs(n=24, seed=77)
    schema = clips_spark_schema()
    left = spark.createDataFrame(left_pdf, schema=schema)
    right = spark.createDataFrame(right_pdf, schema=schema)
    want = _conf_rows(clip_conformance(left, right))

    half = len(right_pdf) // 2
    b1 = spark.createDataFrame(right_pdf.iloc[:half], schema=schema)
    b2 = spark.createDataFrame(right_pdf.iloc[half:], schema=schema)
    # batch 1 delivered twice (the crash-between-data-and-commit case)
    union = (conformance_apply_batch(left, b1)
             .unionByName(conformance_apply_batch(left, b1))
             .unionByName(conformance_apply_batch(left, b2)))
    deduped = union.dropDuplicates(["clip_id"])
    closed = deduped.unionByName(finalize_missing_right(left, deduped))
    assert _conf_rows(closed) == want
    # and the duplicate really was byte-identical: dedup removed
    # exactly the redelivered batch's row count
    assert union.count() - deduped.count() == b1.count()
