"""Relational reshaping operators: explicit-values PIVOT.

The reference engine's mapping grammar has no pivot; a corpus
dashboard wants the codec × sample-rate matrix as ONE row per codec
with a column per rate (counts + total duration), not the long-form
group-by. Only the explicit-values form of pivot is scale-safe:
value discovery means an extra distinct() pass over the pivot
column, and an unbounded value set means an unbounded schema. At
10^12 rows the dimension lattice (codecs × rates) is a config-known
constant, so we require it up front — and compile the pivot to CASE
aggregates directly (see pivot_matrix for the plan comparison with
``groupBy().pivot()``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pivot_matrix(df: DataFrame, row_dim: str, col_dim: str,
                 col_values: list, measure_col: str) -> DataFrame:
    """One row per ``row_dim``; per ``col_values`` entry ``v`` two
    exact-integer columns ``n_<v>`` (row count) and ``sum_<v>``
    (total of ``measure_col``, 0 when the cell is empty), plus
    ``n_total``/``sum_total`` row margins.

    We compile the pivot to CASE aggregates ourselves rather than
    calling ``groupBy().pivot()``: with explicit values Spark's pivot
    still plans TWO shuffles (a (row, col)-lattice cell aggregate,
    then a pivotfirst rearrange on the row key) where the CASE form
    is ONE partial+final hash aggregate on the row key — measured on
    the executed plan, 2 Exchanges / 4 HashAggregates vs 1 / 2. The
    lattice shuffle is small, but at 10^12 rows there is no reason to
    pay it at all, and the CASE algebra is byte-identical to the SQL
    oracle.
    """
    cv = F.col(col_dim)
    cells = []
    for v in col_values:
        cells.append(F.sum(F.when(cv == v, 1).otherwise(0))
                     .cast("long").alias(f"n_{v}"))
    for v in col_values:
        cells.append(F.coalesce(F.sum(F.when(cv == v,
                                             F.col(measure_col))),
                                F.lit(0)).cast("long").alias(f"sum_{v}"))
    declared = cv.isin(col_values)
    return (df.groupBy(row_dim)
            .agg(*cells,
                 F.sum(F.when(declared, 1).otherwise(0))
                 .cast("long").alias("n_total"),
                 F.coalesce(F.sum(F.when(declared, F.col(measure_col))),
                            F.lit(0)).cast("long").alias("sum_total")))


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  compare_cols: list[str]) -> DataFrame:
    """Row-level diff between two corpus snapshots — the
    added/removed/changed/unchanged report a curation pipeline runs
    between crawl versions before retraining.

    Each side is reduced scan-side to (key, md5 fingerprint of the
    compared columns), then ONE full-outer join on the key decides
    the status. The encoding is PREFIX-FREE: every column value is
    length-prefixed (``len:value``) and NULL becomes the single token
    ``N`` — so no combination of values can collide with another
    (a bare separator joiner would let ('a\\x1fb','c') and
    ('a','b\\x1fc') hash equal, and NULL vs a literal sentinel string
    collide). At 100 TB the shuffle payload is (key, 32-byte fp) per
    row, never the documents themselves; the join is the irreducible
    cost of a diff. The same length-prefix/md5 algebra runs in the
    DuckDB oracle, so statuses are bit-exact cross-engine.
    """
    def enc(c):
        s = F.col(c).cast("string")
        return F.coalesce(
            F.concat(F.length(s).cast("string"), F.lit(":"), s),
            F.lit("N"))

    def fp():
        return F.md5(F.concat(*[enc(c) for c in compare_cols]))

    o = old.select(*key_cols, fp().alias("fp_old"))
    n = new.select(*key_cols, fp().alias("fp_new"))
    j = o.join(n, key_cols, "full_outer")
    status = (F.when(F.col("fp_old").isNull(), "added")
              .when(F.col("fp_new").isNull(), "removed")
              .when(F.col("fp_old") != F.col("fp_new"), "changed")
              .otherwise("unchanged"))
    return j.select(*key_cols, status.alias("status"),
                    "fp_old", "fp_new")


def top_n_per_group(df: DataFrame, part_cols: list[str],
                    order_cols: list, n: int,
                    rank_col: str = "rnk") -> DataFrame:
    """Top-N rows per group ("3 longest documents per (lang, source)",
    "5 best clips per speaker") — rank over a per-group window,
    filter rank <= n.

    Scale: Spark compiles the rank<=n filter into WindowGroupLimit
    (verified in PLANS.md) — each shuffle MAP side pre-prunes its
    partition to n rows per group BEFORE the exchange, so the shuffle
    carries at most n·groups·mappers rows instead of the full table;
    the reduce side then takes the true top-n. This is the same
    partial/final split as a TakeOrderedAndProject, generalized per
    group. Callers must pass a total order (tie-break column) for
    deterministic output. ``rank_col`` names the emitted rank column
    and must not already exist on the input (refusing beats silently
    clobbering caller data).
    """
    if rank_col in df.columns:
        raise ValueError(
            f"rank column {rank_col!r} already exists on the input; "
            "pass a different rank_col")
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (df.withColumn(rank_col, F.row_number().over(w))
            .filter(F.col(rank_col) <= n))


def funnel_steps(df: DataFrame, key_col: str, ts_col: str,
                 type_col: str, steps: list[str]) -> DataFrame:
    """Ordered funnel analysis ("view → click → purchase"): per key,
    the earliest time each step was completed IN ORDER (step i counts
    only at/after the key's step-i-1 time), plus the funnel depth.

    Formulated as CHAINED WINDOW AGGREGATES over one partitioning:
    ``t_i = min(ts) FILTER (type = step_i AND ts >= t_{i-1}) OVER
    (PARTITION BY key)`` — every window shares the same partition
    spec, so Spark plans ONE Exchange and stacks the Window operators
    on it (no per-step join, no self-join, no collect_list buffering).
    The identical nested-window algebra runs in an ANSI-SQL oracle,
    so tie semantics (``>=``) are engine-exact, not sort-order luck.

    Timestamps are epoch-microsecond integers (NTZ-safe under the
    session's pinned UTC). Output: one row per key with
    ``step_0_us .. step_{k-1}_us`` (NULL where the funnel stalled)
    and ``depth`` = number of steps completed in order.
    """
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = df.select(F.col(key_col), t_us.alias("t_us"),
                   F.col(type_col).alias("__et__"))
    w = Window.partitionBy(key_col)
    cur = ev
    for i, s in enumerate(steps):
        cond = F.col("__et__") == s
        if i > 0:
            cond = cond & (F.col("t_us") >= F.col(f"step_{i - 1}_us"))
        cur = cur.withColumn(
            f"step_{i}_us",
            F.min(F.when(cond, F.col("t_us"))).over(w))
    step_cols = [f"step_{i}_us" for i in range(len(steps))]
    per_key = (cur.groupBy(key_col)
               .agg(*[F.max(c).alias(c) for c in step_cols]))
    depth = F.lit(0)
    for i in range(len(steps)):
        depth = F.when(F.col(step_cols[i]).isNotNull(), i + 1) \
            .otherwise(depth)
    # depth must be the longest PREFIX completed: later steps are
    # NULL whenever an earlier one is (the chained >= guard), so the
    # reversed when-chain above lands on the last non-null step.
    return per_key.withColumn("depth", depth.cast("long"))


def scd2_history(df: DataFrame, key_cols: list[str], ts_col: str,
                 state_cols: list[str],
                 tiebreak_cols: list[str] | None = None) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change stream:
    per key, collapse consecutive identical states and emit one row
    per VERSION with its validity interval.

    The reference engine's MERGE mapping keeps only the last writer
    per natural key (`plans/compiler.py lww_latest`; reference
    CypherGenerator.java:63-71 MERGE-on-keys); SCD2 is the generalization a
    warehouse actually wants from the same change stream — every
    state the key passed through, with ``[valid_from, valid_to)``
    micro-second intervals, a per-key ``version`` ordinal, and
    ``is_current`` on the open interval. LWW is exactly the
    ``is_current = 1`` slice of this output.

    Semantics (deterministic, engine-exact):
    - rows are ordered per key by ``(ts_col, *tiebreak_cols)`` —
      callers must make that a total order per key or versions at
      equal timestamps are nondeterministic;
    - a row opens a new version iff its state tuple differs
      (null-safe) from the previous row's; runs of identical states
      collapse into the earlier version;
    - ``valid_to`` is the NEXT version's ``valid_from`` (half-open
      intervals tile the key's timeline exactly); NULL on the last
      version, where ``is_current`` = 1. Two changes at one
      timestamp yield a zero-width older version — pre-collapse with
      LWW per (key, ts) if that is unwanted.

    Plan shape at 10^12 rows: ONE hash exchange on the key and ONE
    sort — the change-marking lag, the post-filter lead/row_number,
    all share the (key)×(ts, tiebreak) window, and FilterExec
    preserves both partitioning and ordering, so Catalyst plans
    Exchange → Sort → Window → Filter → Window with no second
    shuffle/sort (verified in tests/test_relational.py via the
    executed plan). State comparison ships ONLY the state tuple
    through lag (a struct column), not the whole row.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    state = F.struct(*[F.col(c) for c in state_cols])
    clash = {"__prev__", "version", "valid_from",
             "valid_to", "is_current"} & set(df.columns)
    if clash:
        raise ValueError(f"input columns clash with SCD2 output "
                         f"columns: {sorted(clash)}")
    marked = df.withColumn("__prev__", F.lag(state).over(w))
    changes = marked.where(
        F.col("__prev__").isNull()
        | ~F.col("__prev__").eqNullSafe(state))
    return changes.select(
        *key_cols,
        F.row_number().over(w).alias("version"),
        *state_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().cast("long").alias("is_current"),
    )


def rollup_agg(df: DataFrame, dims: list[str],
               measure_col: str) -> DataFrame:
    """ROLLUP(dims...) counts + measure totals — computed as ONE
    finest-level aggregate plus re-aggregations OF THAT RESULT, not
    Spark's native ``df.rollup()``.

    Native rollup plans an Expand that replicates EVERY input row once
    per grouping level (k dims → k+1 copies) before the partial
    aggregate, so the map side hashes (k+1)·N rows. The algebraic
    identity ``subtotal = Σ finest cells`` means only the finest
    GROUP BY ever has to see the data: one shuffle over N rows, then
    k tiny re-aggregates over the (few-thousand-row) cell table, a
    plan that is level-for-level identical in output but moves
    (k+1)× less data at 10^12 rows. SUM/COUNT re-aggregate exactly;
    this rewrite is NOT valid for non-decomposable aggregates
    (DISTINCT, percentiles) — callers needing those pay for Expand.

    Output: dims (NULL where aggregated away), ``n_rows``,
    ``sum_<measure_col>``, and SQL-GROUPING()-compatible ``grp_<dim>``
    flags (1 = dim aggregated away at that level) so rolled-up NULLs
    are distinguishable from genuine NULL dim values.
    """
    mcol = f"sum_{measure_col}"
    dtypes = dict(df.dtypes)
    fine = (df.groupBy(*dims)
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.coalesce(F.sum(measure_col), F.lit(0))
                 .cast("long").alias(mcol)))
    pieces = []
    for k in range(len(dims), -1, -1):
        if k == len(dims):
            lvl = fine
        else:
            lvl = (fine.groupBy(*dims[:k])
                   .agg(F.sum("n_rows").cast("long").alias("n_rows"),
                        F.sum(mcol).cast("long").alias(mcol)))
            for d in dims[k:]:
                lvl = lvl.withColumn(
                    d, F.lit(None).cast(dtypes[d]))
        flags = [F.lit(1 if i >= k else 0).cast("long")
                 .alias(f"grp_{dims[i]}") for i in range(len(dims))]
        pieces.append(lvl.select(*dims, "n_rows", mcol, *flags))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out
