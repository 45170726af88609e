"""Mergeable cardinality sketches (HyperLogLog) as DataFrame plans.

At 10^12-row scale an exact COUNT(DISTINCT) shuffles every distinct
key; an HLL register table is 2^p integers per group no matter the
cardinality, merges by element-wise MAX (unions across partitions,
days, or tables for free), and is incrementally maintainable — the
standard OLAP sketch (Flajolet et al. 2007; the same design behind
Spark's approx_count_distinct, re-expressed here as an OPEN register
table instead of an opaque binary so it is storable, mergeable in
plain SQL, and oracle-checkable integer-for-integer).

Determinism contract: the hash is Spark's ``xxhash64`` (seed 42),
re-implemented byte-exactly by testing/xxh.py, so a DuckDB oracle can
reproduce every register from pinned per-key hashes while the
register/rho algebra itself is plain SQL in both engines (shift/mask/
bin/lpad/strpos — identical semantics, verified in tests).

Plan shape: one narrow projection (hash → reg_idx, rho), one hash
aggregation with map-side partial MAX — shuffle volume ≤ groups × 2^p
rows regardless of input cardinality.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | tuple[str, ...] = (),
    p: int = 6,
) -> DataFrame:
    """(group_cols..., reg_idx, max_rho) — the HLL register table.

    ``reg_idx`` = top ``p`` bits of xxhash64(value); ``max_rho`` = MAX
    over values of (1 + leading zeros of the remaining 64-p bits).
    Registers never observed by any value are simply absent (implicit
    rho 0) — keeps the output sparse and union-friendly.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    sfx_bits = 64 - p
    mask = (1 << sfx_bits) - 1
    h = F.xxhash64(F.col(value_col))
    idx = F.shiftright(h, sfx_bits).bitwiseAND(F.lit((1 << p) - 1))
    suffix = h.bitwiseAND(F.lit(mask))
    rho = (F.when(suffix == 0, F.lit(sfx_bits + 1))
           .otherwise(F.instr(F.lpad(F.bin(suffix), sfx_bits, "0"), "1")))
    return (df.select(*group_cols,
                      idx.cast("long").alias("reg_idx"),
                      rho.cast("long").alias("rho"))
            .groupBy(*group_cols, "reg_idx")
            .agg(F.max("rho").alias("max_rho")))


def hll_merge(*register_dfs: DataFrame,
              group_cols: list[str] | tuple[str, ...] = ()) -> DataFrame:
    """Union register tables (same p) — element-wise MAX. The whole
    point of the sketch: merging pre-aggregated days/tables/partitions
    without touching raw data."""
    out = register_dfs[0]
    for d in register_dfs[1:]:
        out = out.unionByName(d)
    return (out.groupBy(*group_cols, "reg_idx")
            .agg(F.max("max_rho").alias("max_rho")))


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | tuple[str, ...] = (),
    p: int = 6,
) -> DataFrame:
    """Cardinality estimate per group from a register table — the
    classic bias-corrected harmonic mean with the small-range
    linear-counting correction. Float math lives ONLY here, at the
    very end; construction and merge stay integer-exact."""
    m = 1 << p
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("_z_seen"),
        F.count("*").alias("_n_seen"))
    # absent registers contribute 2^0 = 1 each to the harmonic sum
    z = F.col("_z_seen") + (F.lit(m) - F.col("_n_seen"))
    zeros = F.lit(m) - F.col("_n_seen")  # registers still at 0
    raw = F.lit(alpha * m * m) / z
    est = F.when((raw <= 2.5 * m) & (zeros > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
                 ).otherwise(raw)
    return agg.select(*group_cols,
                      F.round(est).cast("long").alias("approx_distinct"))


def hll_error_bound(p: int = 6) -> float:
    """Typical relative standard error: 1.04 / sqrt(2^p)."""
    return 1.04 / math.sqrt(1 << p)
