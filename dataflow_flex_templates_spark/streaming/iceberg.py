"""Iceberg MERGE-INTO sink — the cluster-scale twin of
``sink.ExactlyOnceTable``.

The sandbox has no Iceberg runtime jar, so local tests run the
filesystem merge-on-read sink; THIS module is the path a real cluster
uses (north_rule: "exactly-once idempotent Iceberg sink"), and its SQL
generation + commit protocol are unit-tested without the jar:

  foreachBatch(batch_id, df):
    1. committed batch_ids live in a side log table — skip if seen
    2. stage the micro-batch as a temp view
    3. one atomic ``MERGE INTO`` keyed on the natural key with the
       deterministic LWW guard (update only when source order is newer)
    4. the batch_id is recorded by a separate INSERT into the log table

This is a TWO-commit protocol (MERGE commit, then log commit). A crash
between the two replays the MERGE on restart; the replay is a no-op
because the ``order_col >= `` guard makes the MERGE idempotent — the
replayed rows carry the same deterministic event-time ordinals, so
every matched row re-writes its own values. That argument REQUIRES
``order_col``: without it a replay still re-applies the same values
(benign when the batch content is deterministic) but carries no
ordering defense against recomputation drift, so production use should
always pass the deterministic ordinal.

``protocol="wap"`` selects the SINGLE-commit variant and removes the
window entirely: the batch id is stamped into the snapshot summary of
the MERGE commit itself via Iceberg's write-audit-publish hook
(``spark.wap.id`` — any commit made while the conf is set carries
``wap.id`` in its summary), and replay detection reads the
``<table>.snapshots`` metadata table instead of a side log. Data and
commit marker are then one atomic Iceberg snapshot; there is no state
in which data is visible but the batch unrecorded. The log-table form
remains the default because the WAP path needs a real Iceberg catalog
to observe snapshots, while the two-commit replay semantics are
independently provable under the guard.

Mapping to the reference: W2 node merge (CypherGenerator.java:63-71
``MERGE (n {keys}) SET n += props``) and W3 edge merge (:38-48) both
become this statement; W1/append targets use a plain INSERT INTO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def quote_ident(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def merge_into_sql(
    table: str,
    source_view: str,
    key_cols: list[str],
    value_cols: list[str],
    order_col: str | None = None,
) -> str:
    """Build the keyed LWW ``MERGE INTO``.

    ``order_col`` (the deterministic event-time ordinal) guards the
    UPDATE so replays and out-of-order micro-batches keep last-writer-
    wins semantics identical to the filesystem sink's merge-on-read.
    """
    on = " AND ".join(
        f"t.{quote_ident(k)} = s.{quote_ident(k)}" for k in key_cols)
    set_cols = ", ".join(
        f"t.{quote_ident(c)} = s.{quote_ident(c)}" for c in value_cols)
    guard = (f" AND s.{quote_ident(order_col)} >= t.{quote_ident(order_col)}"
             if order_col else "")
    insert_cols = ", ".join(quote_ident(c) for c in key_cols + value_cols)
    insert_vals = ", ".join(
        f"s.{quote_ident(c)}" for c in key_cols + value_cols)
    return (
        f"MERGE INTO {table} t USING {source_view} s ON {on} "
        f"WHEN MATCHED{guard} THEN UPDATE SET {set_cols} "
        f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) "
        f"VALUES ({insert_vals})"
    )


class IcebergMergeSink:
    """foreachBatch writer committing one Iceberg MERGE per micro-batch.

    Usage on a cluster with the Iceberg runtime + catalog configured:

        sink = IcebergMergeSink("catalog.db.nodes", ["clip_id"],
                                order_col="__seq__")
        stream.writeStream.foreachBatch(sink).start()
    """

    def __init__(self, table: str, key_cols: list[str],
                 order_col: str | None = None,
                 log_table: str | None = None,
                 protocol: str = "log_table"):
        if protocol not in ("log_table", "wap"):
            raise ValueError(
                f"protocol must be 'log_table' or 'wap', got {protocol!r}")
        self.table = table
        self.key_cols = key_cols
        self.order_col = order_col
        self.protocol = protocol
        #: batch-id commit log table (created on first use):
        #: (batch_id BIGINT) — queried to skip replays (log_table
        #: protocol only).
        self.log_table = log_table or f"{table}_commits"

    # commit-log protocol -------------------------------------------------

    def _ensure_log(self, spark: SparkSession) -> None:
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.log_table} "
            "(batch_id BIGINT, committed_at TIMESTAMP) USING iceberg")

    def is_committed(self, spark: SparkSession, batch_id: int) -> bool:
        if self.protocol == "wap":
            # single-commit: the batch id lives in the snapshot summary
            # of the MERGE commit itself (wap.id), read back from the
            # Iceberg snapshots metadata table.
            return (spark.sql(
                f"SELECT 1 FROM {self.table}.snapshots "
                f"WHERE summary['wap.id'] = '{int(batch_id)}'"
            ).limit(1).count() > 0)
        self._ensure_log(spark)
        return (spark.sql(
            f"SELECT 1 FROM {self.log_table} WHERE batch_id = {int(batch_id)}"
        ).limit(1).count() > 0)

    # writer --------------------------------------------------------------

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if self.is_committed(spark, batch_id):
            # replayed batch: skip the MERGE but still consume the
            # DataFrame — Spark 4 validates that stateful operators
            # commit their state stores for every executed batch
            # (see sink.ExactlyOnceTable.write_batch)
            batch_df.write.format("noop").mode("overwrite").save()
            return
        view = f"__merge_src_{int(batch_id)}"
        batch_df.createOrReplaceTempView(view)
        value_cols = [c for c in batch_df.columns
                      if c not in self.key_cols]
        merge = merge_into_sql(self.table, view, self.key_cols,
                               value_cols, self.order_col)
        if self.protocol == "wap":
            # stamp wap.id into the MERGE's own snapshot summary: data
            # and replay marker publish in ONE atomic Iceberg commit —
            # no crash window between them.
            spark.conf.set("spark.wap.id", str(int(batch_id)))
            try:
                spark.sql(merge)
            finally:
                spark.conf.unset("spark.wap.id")
            return
        spark.sql(merge)
        spark.sql(
            f"INSERT INTO {self.log_table} "
            f"VALUES ({int(batch_id)}, current_timestamp())")
