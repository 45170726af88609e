"""HyperLogLog register-table sketch: twin-exact construction,
merge-by-MAX identity, estimate accuracy on known cardinalities."""

from __future__ import annotations

import pytest

from dataflow_flex_templates_spark.operators.sketch import (
    hll_error_bound,
    hll_estimate,
    hll_merge,
    hll_registers,
)


@pytest.fixture(scope="module")
def spark():
    from dataflow_flex_templates_spark.session import get_spark

    s = get_spark("test-sketch", cores=4)
    yield s


def _py_registers(values, p=6):
    from dataflow_flex_templates_spark.testing.xxh import xxh64_long

    regs = {}
    for v in values:
        u = xxh64_long(v) & ((1 << 64) - 1)
        idx = u >> (64 - p)
        sfx = u & ((1 << (64 - p)) - 1)
        rho = (64 - p) + 1 if sfx == 0 else (64 - p) - sfx.bit_length() + 1
        regs[idx] = max(regs.get(idx, 0), rho)
    return regs


def test_registers_match_python_twin(spark):
    vals = [i * 37 for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["reg_idx"]: r["max_rho"]
           for r in hll_registers(df, "v").collect()}
    assert got == _py_registers(vals)


def test_merge_equals_whole_and_partitioning_invariance(spark):
    vals = list(range(2000))
    whole = spark.createDataFrame([(v,) for v in vals], "v long")
    a = whole.filter("v % 3 = 0")
    b = whole.filter("v % 3 != 0")
    merged = hll_merge(hll_registers(a, "v"), hll_registers(b, "v"))
    direct = hll_registers(whole.repartition(7), "v")
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, direct.collect())))


@pytest.mark.parametrize("n_distinct", [10, 150, 3000])
def test_estimate_accuracy(spark, n_distinct):
    rows = [(i % n_distinct, "g") for i in range(3 * n_distinct)]
    df = spark.createDataFrame(rows, "v long, g string")
    est = hll_estimate(hll_registers(df, "v", ["g"]),
                       ["g"]).collect()[0]["approx_distinct"]
    # 3x the typical relative standard error (1.04/sqrt(64) ≈ 13%)
    assert abs(est - n_distinct) <= max(3, 3 * hll_error_bound(6) * n_distinct)
