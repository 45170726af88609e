"""Incremental (streaming) SCD2 maintenance.

The batch operator (`operators/relational.py scd2_history`) rebuilds a
type-2 dimension from the full change history. A continuous pipeline
cannot re-sort 10^12 accumulated rows per micro-batch; the production
pattern is the one implemented here: keep a **tails** table holding
each key's OPEN version (one row per key — the dimension's
is_current=1 slice) and an append-only **closed** log, and fold each
micro-batch into them with pure DataFrame algebra:

- compute the batch-local SCD2 with the same `scd2_history`
  (one exchange over the BATCH, never over history);
- left-join the batch's per-key FIRST version with tails: if its
  state equals the tail's (null-safe), the opener collapses into the
  open version (no new version; the tail's valid_from/version are
  inherited); otherwise the tail closes at the opener's valid_from
  and is emitted to the log;
- shift the batch's version ordinals by the tail's, append every
  now-closed batch version to the log, and replace the key's tail
  with the batch's last version.

Correctness precondition: **ordered ingestion** — every row of batch
N+1 is >= every prior row of its key under the (ts, tiebreak) order
(a change-data-capture log replayed in commit order satisfies this;
an out-of-order source must be watermark-buffered upstream first).
Under that precondition, fold(batches) == scd2_history(union of
batches) exactly — the associativity law pinned by
tests/test_streaming.py::test_scd2_incremental_equals_batch and held
byte-identical to the batch DuckDB oracle by the driver row
`stream_scd2`.

Scale shape per micro-batch: one exchange+sort over the batch (the
batch-local history), one join against tails — at 10^12 rows tails is
|keys|-sized and lives in a keyed store (Iceberg MERGE / state
store); the closed log is append-only and never read on the hot
path. No operation ever touches the accumulated history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataflow_flex_templates_spark.operators.relational import (
    scd2_history,
)


def scd2_apply_batch(batch_df: DataFrame, tails: DataFrame,
                     key_cols: list[str], ts_col: str,
                     state_cols: list[str],
                     tiebreak_cols: list[str] | None = None,
                     ) -> tuple[DataFrame, DataFrame]:
    """Fold one ordered micro-batch into the SCD2 store.

    ``tails`` columns: key_cols + version + state_cols + valid_from
    (the open version per key; empty on the first batch). Returns
    ``(closed, new_tails)`` — ``closed`` rows (key_cols, version,
    state_cols, valid_from, valid_to) are final and append-only;
    ``new_tails`` replaces ``tails`` wholesale (keys untouched by the
    batch are carried through).
    """
    hist = scd2_history(batch_df, key_cols, ts_col, state_cols,
                        tiebreak_cols)

    t = tails.select(
        *key_cols,
        F.col("version").alias("__t_ver__"),
        *[F.col(c).alias(f"__t_{c}__") for c in state_cols],
        F.col("valid_from").alias("__t_from__"))
    j = hist.join(t, on=key_cols, how="left")

    state_eq = F.lit(True)
    for c in state_cols:
        state_eq = state_eq & F.col(c).eqNullSafe(F.col(f"__t_{c}__"))
    has_tail = F.col("__t_ver__").isNotNull()
    merged = has_tail & state_eq  # batch opener continues the tail
    # per-key constants, broadcast to every batch version via the
    # v1 row they were computed against (merged/shift only depend on
    # the tail + the batch's FIRST state, which v1 carries)
    first = j.where(F.col("version") == 1).select(
        *key_cols,
        F.when(merged, F.col("__t_ver__") - 1)
        .when(has_tail, F.col("__t_ver__"))
        .otherwise(F.lit(0)).alias("__shift__"),
        merged.alias("__merged__"),
        F.col("valid_from").alias("__v1_from__"))
    adj = (j.join(first, on=key_cols, how="inner")
           .select(
               *key_cols,
               (F.col("version") + F.col("__shift__")).alias("version"),
               *state_cols,
               # a merged opener inherits the tail's valid_from
               F.when((F.col("version") == 1) & F.col("__merged__"),
                      F.col("__t_from__"))
               .otherwise(F.col("valid_from")).alias("valid_from"),
               F.col("valid_to"),
               F.col("is_current")))

    # tails that close this batch: key has batch rows, opener differs
    closed_tails = (t.join(first, on=key_cols, how="inner")
                    .where(~F.col("__merged__"))
                    .select(*key_cols,
                            F.col("__t_ver__").alias("version"),
                            *[F.col(f"__t_{c}__").alias(c)
                              for c in state_cols],
                            F.col("__t_from__").alias("valid_from"),
                            F.col("__v1_from__").alias("valid_to")))
    closed = (adj.where(F.col("valid_to").isNotNull())
              .drop("is_current")
              .unionByName(closed_tails))

    tail_cols = [*key_cols, "version", *state_cols, "valid_from"]
    new_tails = (adj.where(F.col("valid_to").isNull())
                 .select(*tail_cols)
                 .unionByName(
                     t.join(hist.select(*key_cols).distinct(),
                            on=key_cols, how="left_anti")
                     .select(*key_cols,
                             F.col("__t_ver__").alias("version"),
                             *[F.col(f"__t_{c}__").alias(c)
                               for c in state_cols],
                             F.col("__t_from__").alias("valid_from"))))
    return closed, new_tails
