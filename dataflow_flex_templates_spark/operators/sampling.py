"""Deterministic sampling for training-data pipelines.

`df.sample()` is seed-dependent per partitioning and irreproducible
across engines; at corpus scale a sample must be a PURE FUNCTION of
the row key so that (a) re-runs, retries, and different cluster sizes
select the same rows, (b) samples are consistent across joined tables
(sample the same doc_ids everywhere), and (c) an oracle can recompute
membership exactly. The selector here is an md5-prefix threshold —
md5 is md5 in every engine, so the DuckDB twin is the same SQL
expression, no pinned constants.

selector(id) = substr(md5(cast(id AS string)), 1, 8) < threshold_hex

The 8-hex-digit prefix is uniform on [0, 16^8); a fraction f maps to
threshold_hex = hex(floor(f * 16^8)) zero-padded to 8 digits.
Stratified sampling applies a per-stratum fraction (e.g. per source:
keep 100% of wiki, 10% of crawl) — the standard training-mix knob.
Samples NEST across fractions (the 10% sample is a subset of the 30%
sample), so shrinking or growing a mix never swaps rows in and out —
property-tested in tests/test_properties.py.

All expressions are JVM-side Catalyst (one scan, no shuffle, no UDF);
`sample_fraction` pushes the filter straight onto the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PREFIX_SPACE = 16 ** 8  # 8 hex digits


def fraction_to_hex_threshold(fraction: float) -> str:
    """Map a sampling fraction in [0, 1] to the 8-hex-digit threshold
    whose lexicographic comparison realizes it."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * _PREFIX_SPACE), _PREFIX_SPACE - 1),
                  "08x")


def sample_selector(id_col: Column, fraction: float) -> Column:
    """Boolean membership column: stable across engines, partitions,
    retries, and cluster sizes."""
    prefix = F.substring(F.md5(id_col.cast("string")), 1, 8)
    return prefix < F.lit(fraction_to_hex_threshold(fraction))


def sample_fraction(df: DataFrame, fraction: float,
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic ~fraction sample keyed on ``id_col``."""
    return df.filter(sample_selector(F.col(id_col), fraction))


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      stratum_col: str = "source",
                      id_col: str = "doc_id",
                      default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix knob
    (keep 100% of one source, 10% of another). Strata absent from
    ``fractions`` get ``default_fraction``."""
    sel = None
    for stratum, frac in sorted(fractions.items()):
        cond = ((F.col(stratum_col) == stratum)
                & sample_selector(F.col(id_col), frac))
        sel = cond if sel is None else sel | cond
    others = ~F.col(stratum_col).isin(list(fractions)) \
        & sample_selector(F.col(id_col), default_fraction)
    sel = others if sel is None else sel | others
    return df.filter(sel)


def stratified_sample_sql(fractions: dict[str, float],
                          stratum_col: str = "source",
                          id_col: str = "doc_id",
                          default_fraction: float = 0.0) -> str:
    """DuckDB twin of the membership predicate, rendered from the same
    fractions — one source of truth, no pinned constants."""
    def pred(frac: float) -> str:
        thr = fraction_to_hex_threshold(frac)
        return (f"substr(md5(CAST({id_col} AS VARCHAR)), 1, 8)"
                f" < '{thr}'")

    clauses = [
        f"({stratum_col} = '{s}' AND {pred(f)})"
        for s, f in sorted(fractions.items())
    ]
    strata = ", ".join(f"'{s}'" for s in fractions)
    clauses.append(
        f"({stratum_col} NOT IN ({strata}) AND {pred(default_fraction)})"
        if fractions else pred(default_fraction))
    return " OR ".join(clauses)


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    id_col: str = "doc_id",
                    scale: int = 10**9) -> DataFrame:
    """Deterministic weighted sampling without replacement: each row
    gets integer priority ``(h · scale) // w`` where ``h`` is the
    28-bit integer value of its id's md5 prefix (uniform) and ``w``
    its weight; the ``k`` smallest priorities win (ties break by id).
    Heavier rows draw proportionally smaller priorities, giving a
    reproducible weight-biased sample — the Efraimidis–Spirakis
    priority trick with a uniform (not exponential) numerator, traded
    deliberately: exponential priorities need ``ln`` and float order,
    which no SQL oracle can replay bit-for-bit; the integer form is
    exact in every engine. Rows with non-positive weight never
    qualify.

    Scale: one projection + global top-k = TakeOrderedAndProject —
    no shuffle of the full input, only k rows survive per partition.
    """
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 7),
               16, 10).cast("long")
    w = F.col(weight_col).cast("long")
    key = F.expr(f"__h__ * {scale} div __w__")
    return (df.withColumn("__h__", h).withColumn("__w__", w)
            .filter(F.col("__w__") > 0)
            .withColumn("priority_q", key)
            .orderBy(F.asc("priority_q"), F.asc(id_col))
            .limit(k)
            .drop("__h__", "__w__"))


def mixture_plan(df: DataFrame, group_col: str, size_col: str,
                 alpha: float = 0.5,
                 budget_tokens: int | None = None) -> DataFrame:
    """Temperature-based corpus mixture planning — the standard
    multi-source training-mix computation (Devlin et al.'s multilingual
    exponent-smoothed sampling): each source's natural share
    ``s_i = t_i / Σt`` is flattened through ``w_i ∝ s_i^alpha``
    (``alpha=1`` keeps natural proportions, ``alpha→0`` approaches
    uniform), and a token ``budget`` is split by the smoothed weights.

    One output row per source: ``(group, n_rows, tokens,
    natural_share_ppm, weight, planned_tokens, epochs_x1000)`` where
    ``natural_share_ppm`` is integer-exact (ppm, `div`), ``weight`` is
    the normalized smoothed share (double), ``planned_tokens = budget ×
    weight`` (double — the caller floors it; kept un-floored so the
    cross-engine hash can't straddle an integer boundary on a 1-ulp
    difference), and ``epochs_x1000`` is how many times the source
    would be repeated to meet its plan (planned/available ×1000,
    double) — the oversampling-pressure signal mix designers watch.

    Scale: ONE pass — a partial+final hash agg on the source key
    (≤ thousands of groups at any corpus size; collapses map-side),
    then the two corpus totals as unbounded-window sums OVER the
    per-source rows (a deliberate single-partition window: the input
    is the ALREADY-AGGREGATED |groups|-row frame, never the corpus —
    a crossJoin against separately-aggregated totals would re-scan
    the table for the second aggregate instead, measured as 2 scans /
    4 exchanges vs this plan's 1 scan / 2). The double algebra is a
    sum over |groups| pow() terms, stable to well past the 4-decimal
    oracle rounding.

    Reference parity: none (§2.11 extension — training-pipeline mix
    planning). Oracle: identical SQL algebra in DuckDB (pow/sum are
    IEEE-double in both engines).
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    from pyspark.sql import Window

    per = (df.groupBy(group_col)
           .agg(F.count("*").alias("n_rows"),
                F.sum(F.col(size_col).cast("long")).alias("tokens")))
    smoothed = F.pow(F.col("tokens").cast("double"), F.lit(float(alpha)))
    w = Window.partitionBy()  # |groups| rows by construction
    out = (per.withColumn("__tot__", F.sum("tokens").over(w))
           .withColumn("__wsum__", F.sum(smoothed).over(w))
           .withColumn("natural_share_ppm",
                       F.expr("tokens * 1000000L div __tot__"))
           .withColumn("weight", smoothed / F.col("__wsum__")))
    if budget_tokens is not None:
        out = (out.withColumn(
                   "planned_tokens",
                   F.col("weight") * F.lit(float(budget_tokens)))
               .withColumn(
                   "epochs_x1000",
                   F.col("planned_tokens") * F.lit(1000.0)
                   / F.col("tokens").cast("double")))
    return out.drop("__tot__", "__wsum__")
