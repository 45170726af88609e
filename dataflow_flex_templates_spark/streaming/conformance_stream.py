"""Incremental (streaming) migration-conformance gate.

The batch operator (`operators/conformance.py clip_conformance`)
full-outer joins two keyed clip tables and emits one verdict row per
clip_id — the engine's own acceptance criterion (decoded-PCM SNR ≥
30 dB + transcript equality) as a plan. The migration it gates is,
per the north rule, a CONTINUOUS pipeline: the new system's output
arrives as a stream while the old system's table sits still. This
module runs the gate that way — verdicts per micro-batch, nothing
ever re-reads accumulated output — by exploiting that every verdict
except ``missing_right`` is a pure function of ONE (left row, right
row) pair:

- per batch, restrict the static reference to the batch's ids (one
  left-semi join) and run the batch operator VERBATIM on the
  restricted pair — same UDF, same status algebra, boundaries cannot
  drift between the twins. ``missing_right`` cannot fire here by
  construction (the restricted left has no ids the batch lacks), and
  a streamed row with no reference lands ``missing_left`` exactly as
  in batch;
- at stream close, ONE reconciliation: reference rows whose id never
  streamed (left anti-join against the verdict table's ids) go
  through the SAME operator against an empty right side, which
  reproduces the batch ``missing_right`` rows byte-for-byte —
  including the evidence columns (``n_left`` from a real decode of
  the reference payload, the rest NULL).

Law: union(per-batch verdicts) ∪ reconciliation ==
clip_conformance(left, union of batches) EXACTLY, at ANY batch
split — pinned by tests/test_conformance.py::
test_stream_conformance_fold_equals_batch at chunk sizes 1/4/all.
Precondition: each clip_id streams in exactly one batch (keyed
input under the sink's exactly-once contract; a redelivered batch
re-emits identical rows for the idempotent sink to drop). No
ordering precondition — verdicts are row-local.

Scale shape per micro-batch: one keyed semi-join + the batch
operator's one keyed join (both collapse to zero Exchange when
reference and stream output are bucketed on clip_id —
`sources/bucketed.py`), then the one-pass Arrow pair decode. State:
NONE beyond the verdict sink itself — the only fold "store" is the
id set already written, consulted once at close by the
reconciliation anti-join. The close is a single batch job over
(reference ∖ verdicts), i.e. exactly the rows the stream never
covered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dataflow_flex_templates_spark.operators.conformance import (
    clip_conformance,
)


def conformance_apply_batch(
    left: DataFrame,
    batch_right: DataFrame,
    id_col: str = "clip_id",
    snr_floor_mdb: int = 30_000,
) -> DataFrame:
    """Verdicts for one micro-batch of the migrating (right) stream.

    ``left`` is the static reference table; ``batch_right`` one
    micro-batch of the new system's keyed output. Returns the batch
    operator's verdict rows for exactly the batch's clip_ids —
    ``missing_left`` / ``poison`` / ``length_mismatch`` /
    ``snr_below_floor`` / ``transcript_diff`` / ``pass``; never
    ``missing_right`` (that verdict needs end-of-stream knowledge —
    see :func:`finalize_missing_right`).
    """
    l_batch = left.join(
        batch_right.select(id_col).distinct(),
        on=id_col, how="left_semi")
    return clip_conformance(l_batch, batch_right, id_col=id_col,
                            snr_floor_mdb=snr_floor_mdb)


def finalize_missing_right(
    left: DataFrame,
    verdicts: DataFrame,
    id_col: str = "clip_id",
    snr_floor_mdb: int = 30_000,
) -> DataFrame:
    """Close the gate: ``missing_right`` rows for reference clips the
    stream never delivered.

    ``verdicts`` is the union of every per-batch emission. The
    uncovered reference rows run through the SAME batch operator
    against an empty right side (``left.limit(0)`` — schema-correct
    by construction), so the emitted rows are byte-identical to the
    batch full-outer's missing_right rows: status from the same
    algebra, ``n_left`` from a real decode of the reference payload,
    ``n_right``/``snr_mdb`` NULL, ``transcript_equal`` the same
    null-safe comparison against NULL.
    """
    uncovered = left.join(verdicts.select(id_col),
                          on=id_col, how="left_anti")
    return clip_conformance(uncovered, left.limit(0), id_col=id_col,
                            snr_floor_mdb=snr_floor_mdb)
