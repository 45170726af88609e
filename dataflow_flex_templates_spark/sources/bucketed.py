"""Bucketed table layout — shuffle-free co-located joins.

At 10^12 rows the dominant cost of the clip↔transcript join (and any
other recurring equi-join) is the exchange: both sides shuffle their
full width across the cluster EVERY time the join runs. Spark's
storage bucketing (`bucketBy` on write) moves that shuffle to WRITE
TIME, once: each side is hash-partitioned into the same number of
buckets on the join key as it lands, and every later join on that key
plans a SortMergeJoin with NO Exchange on either side — the scan
itself delivers the partitioning (`outputPartitioning` =
HashPartitioning(key, buckets)), so repeated joins, self-joins, and
incremental re-joins are all map-side.

This is the storage analogue of the reference's one-time
``CREATE INDEX`` DDL (reference CypherGenerator.java:145-154 emits
index/constraint DDL before loading): pay a layout cost at ingest so
the steady-state query never shuffles. The win compounds at 100 TB: a daily clip↔transcript
re-join over bucketed tables reads + joins in place, while unbucketed
tables re-shuffle 100 TB per run.

Caveats encoded here rather than discovered in production:

- Both sides must be bucketed INTO THE SAME BUCKET COUNT on the join
  key, or Spark falls back to shuffling the mismatched side.
- Broadcast joins bypass bucketing (cheaper anyway); the no-Exchange
  guarantee matters for the big-big case, so the plan check disables
  broadcast before asserting.
- Bucket pruning: an equality filter on the bucket key scans 1/N of
  the files (`isBucketScanEnabled` in the scan node).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str] | tuple[str, ...],
    num_buckets: int,
    sort_cols: list[str] | tuple[str, ...] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed (and optionally per-bucket sorted)
    catalog table. Sorting by the join key lets SortMergeJoin skip its
    Sort as well when each bucket is a single file — making the
    steady-state join a pure zip of pre-sorted streams."""
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    w = (df.write.format(fmt).mode(mode)
         .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)


@contextmanager
def no_broadcast(spark: SparkSession):
    """Temporarily disable broadcast joins — the big-big join regime
    where bucketing's no-Exchange guarantee is the one that matters."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        yield
    finally:
        spark.conf.set(key, old)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | tuple[str, ...] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key. The plan
    is an ordinary declarative join — Catalyst recognizes the matching
    HashPartitioning from both scans and elides the exchanges. Use
    :func:`join_exchange_count` to verify (tests assert 0)."""
    return spark.table(left_table).join(spark.table(right_table),
                                        on=on, how=how)


def join_exchange_count(df: DataFrame) -> int:
    """Number of Exchange operators in the EXECUTED plan — 0 for a
    correctly co-located join. Plan evidence, cheap enough to assert
    in CI on every layout change."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for line in plan.splitlines()
               if "Exchange" in line and "ReusedExchange" not in line)
