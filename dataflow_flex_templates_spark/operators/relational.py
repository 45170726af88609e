"""Relational reshaping operators: explicit-values PIVOT.

The reference engine's mapping grammar has no pivot; a corpus
dashboard wants the codec × sample-rate matrix as ONE row per codec
with a column per rate (counts + total duration), not the long-form
group-by. Spark's ``groupBy().pivot()`` does exactly this — but only
the explicit-values form is scale-safe: without a value list Spark
runs an extra distinct() pass over the pivot column to discover
values, and an unbounded value set means an unbounded schema. At
10^12 rows the dimension lattice (codecs × rates) is a config-known
constant, so we require it up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_matrix(df: DataFrame, row_dim: str, col_dim: str,
                 col_values: list, measure_col: str) -> DataFrame:
    """One row per ``row_dim``; per ``col_values`` entry ``v`` two
    exact-integer columns ``n_<v>`` (row count) and ``sum_<v>``
    (total of ``measure_col``, 0 when the cell is empty), plus
    ``n_total``/``sum_total`` row margins.

    Plans as a single partial+final hash aggregate over CASE
    expressions (the explicit-values pivot never shuffles twice and
    never scans for distinct pivot values). The SQL oracle is the
    same CASE algebra, so every cell is bit-exact cross-engine.
    """
    p = (df.groupBy(row_dim)
         .pivot(col_dim, col_values)
         .agg(F.count(F.lit(1)).alias("n"),  # count("*") is illegal in Pivot
              F.sum(measure_col).alias("s")))
    out = p.select(
        row_dim,
        *[F.coalesce(F.col(f"{v}_n"), F.lit(0)).cast("long")
          .alias(f"n_{v}") for v in col_values],
        *[F.coalesce(F.col(f"{v}_s"), F.lit(0)).cast("long")
          .alias(f"sum_{v}") for v in col_values],
    )
    n_total = sum((F.col(f"n_{v}") for v in col_values[1:]),
                  F.col(f"n_{col_values[0]}"))
    s_total = sum((F.col(f"sum_{v}") for v in col_values[1:]),
                  F.col(f"sum_{col_values[0]}"))
    return (out.withColumn("n_total", n_total.cast("long"))
            .withColumn("sum_total", s_total.cast("long")))
