"""Table profiling: the DESCRIBE/ANALYZE-style data-quality report
(null rate, exact distinct count, min/max) every ingest pipeline runs
before trusting a new drop — one row per profiled column.

Scale notes: all per-column aggregates are computed in ONE aggregation
pass; Spark plans the multiple COUNT(DISTINCT) via an Expand node
(each input row is replicated once per distinct-aggregate and
partially aggregated map-side), so the shuffle carries the per-column
partial distinct sets, never the table — the standard multi-distinct
strategy, linear in rows × profiled columns. min/max surface as
strings so heterogeneous column types fit one report schema
(cross-engine stable for the int/string columns a profile gates on;
floats keep full repr).

The reference engine has no profiling surface; §2.11 extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None
                  ) -> DataFrame:
    """One row per column: (column, n_rows, n_nulls, n_distinct,
    min_str, max_str). Exact distinct (not approx) so a SQL oracle
    matches bit-for-bit; NULLs are excluded from distinct/min/max
    (standard SQL aggregate semantics on both engines).
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(col).alias(f"__nd_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"__mn_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"__mx_{c}"))
    wide = df.agg(*aggs)
    per_col = F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col("n_rows").alias("n_rows"),
                 F.col(f"__nn_{c}").alias("n_nulls"),
                 F.col(f"__nd_{c}").alias("n_distinct"),
                 F.col(f"__mn_{c}").alias("min_str"),
                 F.col(f"__mx_{c}").alias("max_str"))
        for c in cols])
    return (wide.select(F.explode(per_col).alias("p"))
            .select("p.column", "p.n_rows", "p.n_nulls",
                    "p.n_distinct", "p.min_str", "p.max_str"))
