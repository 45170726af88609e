"""Writer-side output-shard sizing — the durable fix for hot-file skew.

The skew study (BASELINE.md "Skew") measured that the damaging regime
for a 100-TB audio corpus is not key skew (the decode path never
shuffles on codec/sr, so a hot key cannot form a hot reducer) but
LAYOUT damage: one giant file per codec collapses the scan to a
handful of splits and starves every core downstream — and salting,
the read-side remedy, costs a payload shuffle that measured BELOW
break-even for cheap PCM codecs (salt_recovery 0.675). The durable
fix named by that analysis is writer-side file sizing: never produce
the pathological layout in the first place. This module is that fix
as a first-class operator pair:

- ``assign_shards`` / ``shard_plan`` — a METADATA-ONLY binning of
  rows into target-byte output shards (cumulative-byte-space binning:
  a shard boundary falls at every multiple of ``target_bytes`` in the
  running per-key byte total). Pure integer window algebra — a SQL
  oracle reproduces every assignment bit-for-bit — and the payload
  column is never touched, so at 10^12-clip scale the plan runs over
  the metadata columns alone (size from ``dur_ms``/``sr_hz``/stored
  byte length, never ``length(bytes)`` on the hot path).
- ``write_sized`` — applies the assignment and writes ONE file per
  shard (``partitionBy(key, shard_idx)`` after a repartition on the
  same columns guarantees each shard directory is written by exactly
  one task), so every downstream scan of the table gets splits of
  ~``target_bytes`` regardless of key skew in the source.

Scale: ONE data-sized Exchange (hash on ``key_col`` for the running
sum — the same single-shuffle shape as ``audio_pack.pack_clip_batches``);
the per-shard summary aggregation exchanges only pre-aggregated
|shards|-sized rows. No global order exists anywhere: shards are
independent per key, and re-planning after new ingest is a per-key
job.

The reference engine (neo4j-partners/dataflow-flex-templates) has no
writer-side sizing — its sink batches by ROW COUNT only
(docs/README.md batching section); this is a §2.11 extension
motivated by the measured hotfile regime.

Shard-index semantics: ``shard_idx = (cum_bytes - size) div target``
— the bin is the multiple of ``target_bytes`` the row STARTS in. An
oversize row (size > target) occupies several bins' worth of
cumulative space, so indices may skip; non-empty shards carry between
``target - max_size + 1`` and ``target + max_size - 1`` bytes (the
last shard per key may carry less). Totals are exactly preserved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SHARD_COL = "shard_idx"


def _check_clash(df: DataFrame, *internal: str) -> None:
    clash = set(internal) & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} clash with internal "
            f"columns; rename them first")


def assign_shards(df: DataFrame, target_bytes: int,
                  key_col: str = "source", id_col: str = "doc_id",
                  size: Column | str = "size_bytes") -> DataFrame:
    """All input columns plus ``shard_idx``: the target-byte output
    shard this row belongs to within its ``key_col`` group.

    ``size`` is an integer byte count — a column name or a Column
    expression over METADATA (pass e.g. a duration-derived estimate
    for audio; never force a payload scan here). Rows bin in
    ``(key, id)`` order, so the assignment is total-order
    deterministic and identical across engines, partitionings and
    retries.
    """
    return (with_running_bytes(df, target_bytes, key_col, id_col, size)
            .withColumn(_SHARD_COL,
                        F.expr(f"(__cum_bytes - __sz) div "
                               f"{int(target_bytes)}").cast("long"))
            .drop("__sz", "__cum_bytes"))


def with_running_bytes(df: DataFrame, target_bytes: int, key_col: str,
                       id_col: str, size: Column | str) -> DataFrame:
    """Shared binning algebra: input columns plus ``__sz`` (the byte
    size as long) and ``__cum_bytes`` (the per-key running byte total
    in ``(key, id)`` order, inclusive of the current row). Factored so
    the streaming fold (`streaming/shard_stream.py`) bins with the
    IDENTICAL window expression the batch operator uses — the same
    shared-kernel argument as `dedup.band_buckets` for the LSH pair."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got "
                         f"{target_bytes}")
    _check_clash(df, _SHARD_COL, "__cum_bytes", "__sz")
    sz = F.col(size).cast("long") if isinstance(size, str) \
        else size.cast("long")
    w = (Window.partitionBy(key_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.withColumn("__sz", sz)
            .withColumn("__cum_bytes", F.sum("__sz").over(w)))


def shard_plan(df: DataFrame, target_bytes: int,
               key_col: str = "source", id_col: str = "doc_id",
               size: Column | str = "size_bytes") -> DataFrame:
    """One row per planned output shard:
    ``(key, shard_idx, n_rows, shard_bytes, first_id, last_id,
    fill_permille)`` where ``fill_permille = shard_bytes * 1000 div
    target_bytes`` (can exceed 1000 by up to the largest row — the
    overflow a next-fit bin accepts rather than splitting a row).

    The summary is the review surface: a pre-write audit of the file
    sizes a job is about to produce, against the measured rule that
    splits < cores starves the cluster (BASELINE.md hotfile regime).
    """
    assigned = assign_shards(df, target_bytes, key_col=key_col,
                             id_col=id_col, size=size)
    sz = F.col(size).cast("long") if isinstance(size, str) \
        else size.cast("long")
    return (assigned
            .groupBy(F.col(key_col), F.col(_SHARD_COL))
            .agg(F.count("*").alias("n_rows"),
                 F.sum(sz).alias("shard_bytes"),
                 F.min(id_col).alias("first_id"),
                 F.max(id_col).alias("last_id"))
            .withColumn("fill_permille",
                        F.expr(f"shard_bytes * 1000L div "
                               f"{int(target_bytes)}").cast("long")))


def write_sized(df: DataFrame, path: str, target_bytes: int,
                key_col: str = "source", id_col: str = "doc_id",
                size: Column | str = "size_bytes") -> int:
    """Write ``df`` to ``path`` as a parquet table laid out in
    ~``target_bytes`` shards: one directory (and exactly one data
    file) per planned shard, partitioned by ``(key_col, shard_idx)``.

    Returns the number of shards written. The repartition on the
    partitioning columns routes every row of a shard to one task, and
    ``partitionBy`` then splits each task's output by value — so each
    shard directory receives exactly one file even when two shards
    hash to the same task. The shard count (a |shards|-sized agg) is
    computed first to size the repartition; at 10^12-row scale that
    is a metadata-weight action.
    """
    assigned = assign_shards(df, target_bytes, key_col=key_col,
                             id_col=id_col, size=size)
    n_shards = (assigned.select(key_col, _SHARD_COL).distinct()
                .count())
    (assigned
     .repartition(max(1, n_shards), F.col(key_col), F.col(_SHARD_COL))
     .write.mode("overwrite")
     .partitionBy(key_col, _SHARD_COL)
     .parquet(path))
    return n_shards


def compaction_plan(files: DataFrame, target_bytes: int,
                    min_file_bytes: int, key_col: str = "source",
                    id_col: str = "file_id",
                    size_col: str = "size_bytes") -> DataFrame:
    """Small-file compaction planning — the read-side heal for layout
    damage that already happened (`write_sized` prevents it at write
    time; historical partitions predate that writer). Input is a FILE
    METADATA table ``(key_col, id_col, size_col)`` — parquet footers,
    an Iceberg manifest, or this repo's own `zonemap.zone_map` output
    — so the plan costs |files| rows, never a data scan.

    Per file, one of two actions:

    - ``keep``: ``size >= min_file_bytes`` — already healthy, never
      rewritten (compaction must not churn good files); also any
      small file that would sit ALONE in its rewrite group (merging
      one file with itself buys nothing — the group-size rule below).
    - ``rewrite`` + ``group_idx``: small files are binned into
      ~``target_bytes`` rewrite groups by the SAME running-sum
      binning algebra as `assign_shards` (`with_running_bytes` over
      the small-file subset, in ``(key, id)`` order) — one rewrite
      task per group lands one healthy file.

    Deterministic, metadata-only, ONE data-sized Exchange on
    ``key_col`` (the second window — the singleton-group demotion —
    reuses the same partitioning; plan-audited in the test). A SQL
    oracle reproduces every action/group bit-for-bit.
    """
    if min_file_bytes > target_bytes:
        raise ValueError(
            f"min_file_bytes ({min_file_bytes}) must be <= "
            f"target_bytes ({target_bytes}) — otherwise freshly "
            f"compacted ~target files are immediately 'small' again")
    _check_clash(files, "action", "group_idx", "__grp_n")
    files = files.withColumn(size_col, checked_size(files, size_col))
    small = files.where(F.col(size_col) < F.lit(int(min_file_bytes)))
    binned = (with_running_bytes(small, target_bytes, key_col, id_col,
                                 F.col(size_col))
              .withColumn("group_idx",
                          F.expr(f"(__cum_bytes - __sz) div "
                                 f"{int(target_bytes)}").cast("long"))
              .drop("__sz", "__cum_bytes"))
    kept = files.where(F.col(size_col)
                       >= F.lit(int(min_file_bytes))) \
        .withColumn("group_idx", F.lit(None).cast("long")) \
        .withColumn("action", F.lit("keep"))
    return demote_singleton_groups(binned, key_col).unionByName(kept)


def checked_size(df: DataFrame, size_col: str) -> Column:
    """``size_col`` as long, raising IN-PLAN on NULL: a file-metadata
    row without a size is a broken manifest, and silently dropping it
    (NULL fails both the small and the healthy predicate) would lose
    track of a real file — the permutation invariant the planner's
    tests pin. Same fail-fast device as ``merge_intervals``'
    end < start guard."""
    sz = F.col(size_col).cast("long")
    return F.when(sz.isNull(), F.raise_error(F.lit(
        f"compaction: NULL {size_col} — file metadata is incomplete; "
        f"repair or filter the manifest explicitly"))).otherwise(sz)


def demote_singleton_groups(binned: DataFrame,
                            key_col: str) -> DataFrame:
    """Shared demotion algebra (the ONE definition both the batch
    planner and `streaming/compaction_stream.py` fold through, so the
    fold law cannot drift): a file alone in its rewrite bin keeps —
    merging one file with itself buys nothing; larger bins rewrite.
    Input carries ``group_idx``; the window's (key, group) partition
    is a superset of the binning partitioning, so no new Exchange."""
    wg = Window.partitionBy(key_col, "group_idx")
    return (binned
            .withColumn("__grp_n", F.count(F.lit(1)).over(wg))
            .withColumn("group_idx",
                        F.when(F.col("__grp_n") > 1,
                               F.col("group_idx")))
            .withColumn("action",
                        F.when(F.col("__grp_n") > 1, F.lit("rewrite"))
                        .otherwise(F.lit("keep")))
            .drop("__grp_n"))
