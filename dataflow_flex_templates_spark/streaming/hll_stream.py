"""Incremental (streaming) HyperLogLog register maintenance.

The batch operator (`operators/sketch.py hll_registers`) rebuilds the
register table from the full input — a continuous pipeline tracking
distinct users/clips per group over a 10^12-row stream cannot rescan
history per micro-batch. The fold implemented here maintains the
registers as a keyed store written through a STRICT-INCREASE upsert
changelog:

- store (``*group_cols``, reg_idx, max_rho): the current register
  table, keyed by (group, reg_idx). Per batch it is read only by a
  keyed lookup of the BATCH's register rows — a state-store
  point-lookup shape, never a scan.
- per micro-batch fold (:func:`hll_apply_batch`):

  1. sketch the batch alone with the SAME ``hll_registers`` the batch
     operator uses (one hash + groupBy-MAX over the batch, whole-stage
     codegen);
  2. left-join the batch's register rows against the store on
     (group, reg_idx);
  3. emit exactly the rows whose ``max_rho`` STRICTLY exceeds the
     stored value (or whose register is new) — the precise keyed-MERGE
     write set. An identically re-delivered batch emits NOTHING:
     redelivery contracts away at the comparison.

Exactness: MAX is associative and commutative and the per-row
(reg_idx, rho) derivation is deterministic, so folding the upsert log
(final value per key = last, equivalently MAX, of its emissions) over
ANY batch split equals ``hll_registers`` over the union of the
batches — the law pinned by
tests/test_streaming.py::test_hll_incremental_equals_batch and held
to the batch row's register-algebra DuckDB oracle by the driver row
``stream_hll`` (which shares ``hll_user_registers``'s oracle).

Changelog boundedness — the reason this shape survives 10^12 rows:
``max_rho`` for one register takes values in [1, 64-p+1] and every
emission is a strict increase, so one register emits at most 65-p
times EVER (59 at p=6), independent of how many rows the stream
carries. Total changelog rows ≤ groups × 2^p × (65-p); state is the
register table itself, ≤ groups × 2^p longs. Compaction is a plain
groupBy-MAX (``operators/sketch.py hll_merge``), the same mergeable
read the sketch exists for.

Reference parity: this is the streaming continuation of the MERGE
last-writer-wins upsert construction (CypherGenerator.java
MERGE-on-keys; docs/README.md node-merge semantics) applied to a
monotone metric — the write set of an Iceberg ``MERGE WHEN MATCHED
AND s.max_rho > t.max_rho``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataflow_flex_templates_spark.operators.sketch import (
    hll_merge,
    hll_registers,
)


def hll_apply_batch(
    batch_df: DataFrame,
    store: DataFrame,
    value_col: str,
    group_cols: list[str] | tuple[str, ...] = (),
    p: int = 6,
) -> DataFrame:
    """Fold one micro-batch into the incremental HLL store.

    ``store``: (*group_cols, reg_idx long, max_rho long) — the current
    register table (e.g. the compacted upsert log).

    Returns the upsert rows (same schema): registers the batch raised
    (strictly) or created. Callers APPEND them to the changelog (or
    MERGE them into a keyed table); the next batch's ``store`` is the
    compacted log (:func:`compact_log`).
    """
    for c in ("reg_idx", "max_rho"):
        if c in batch_df.columns:
            raise ValueError(
                f"batch column {c!r} clashes with the register schema")
    keys = [*group_cols, "reg_idx"]
    batch_regs = hll_registers(batch_df, value_col, group_cols, p=p)
    stored = store.withColumnRenamed("max_rho", "_stored_rho")
    return (batch_regs.join(stored, on=keys, how="left")
            .where(F.col("_stored_rho").isNull()
                   | (F.col("max_rho") > F.col("_stored_rho")))
            .select(*keys, "max_rho"))


def compact_log(
    log: DataFrame,
    group_cols: list[str] | tuple[str, ...] = (),
) -> DataFrame:
    """Current register table from the upsert changelog: element-wise
    MAX per key — emissions are strict increases, so MAX == latest.
    This is exactly the batch sketch's merge (`hll_merge`)."""
    return hll_merge(log, group_cols=group_cols)
