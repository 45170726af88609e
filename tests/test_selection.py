"""Exact distributed order statistics (operators/selection.py):
bit-exact nearest-rank agreement with a sorted reference on adversarial
integer data, endpoint probes, NULL exclusion, the bottomk_quantiles
read-off agreement, and input guards."""

from __future__ import annotations

import random

import pytest

from dataflow_flex_templates_spark.operators.selection import (
    exact_quantiles,
    exact_quantiles_grouped,
)


def _ref(vals: list[int], p: int) -> int:
    s = sorted(vals)
    return s[(p * (len(s) - 1)) // 1000]  # 0-indexed nearest rank


PROBES = [0, 100, 250, 500, 750, 900, 999, 1000]


def test_exact_quantiles_adversarial(spark):
    """Negatives, heavy duplicates, huge gaps, and a singleton value
    band — every probe matches the sorted-list nearest rank."""
    rng = random.Random(3)
    vals = ([-(10**12)] * 7 + [0] * 500
            + [rng.randrange(-50, 50) for _ in range(3000)]
            + [10**14] * 3)
    df = spark.createDataFrame([(v,) for v in vals], "x long") \
        .repartition(8)
    got = {r["p_permille"]: r["q_value"]
           for r in exact_quantiles(df, "x", PROBES).collect()}
    for p in PROBES:
        assert got[p] == _ref(vals, p), p
    assert got[0] == min(vals) and got[1000] == max(vals)


def test_exact_quantiles_nulls_and_empty(spark):
    df = spark.createDataFrame(
        [(None,), (5,), (None,), (9,)], "x long")
    got = {r["p_permille"]: r["q_value"]
           for r in exact_quantiles(df, "x", [0, 500, 1000]).collect()}
    assert got == {0: 5, 500: 5, 1000: 9}
    empty = spark.createDataFrame([(None,)], "x long")
    assert exact_quantiles(empty, "x", [500]).count() == 0


def test_exact_quantiles_matches_bottomk_readoff(spark):
    """The two exact-rank formulas are the same object: on a full
    (k >= n) bottom-k sample, bottomk_quantiles' read-off equals
    exact_quantiles for every shared probe."""
    from dataflow_flex_templates_spark.operators.sketch import (
        bottomk_quantiles,
        bottomk_sample,
    )

    rng = random.Random(21)
    rows = [(i, rng.randrange(0, 10_000)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, x long")
    sample = bottomk_sample(df, "id", ["x"], k=400)
    via_sample = {r["p_permille"]: r["q_value"]
                  for r in bottomk_quantiles(
                      sample, "x", "id",
                      probs_permille=PROBES).collect()}
    via_bisect = {r["p_permille"]: r["q_value"]
                  for r in exact_quantiles(df, "x", PROBES).collect()}
    assert via_sample == via_bisect


def test_exact_quantiles_guards(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="probs_permille"):
        exact_quantiles(df, "x", [1001])
    with pytest.raises(ValueError, match="duplicate"):
        exact_quantiles(df, "x", [500, 500])


def test_exact_quantiles_grouped(spark):
    """Per-group bisection matches the per-group sorted reference —
    groups with wildly different ranges, sizes (incl. singleton), and
    duplicates; NULL groups/values excluded."""
    rng = random.Random(17)
    data = {
        "pcm": [rng.randrange(0, 100) for _ in range(997)],
        "adpcm": [rng.randrange(-10**9, 10**9) for _ in range(50)],
        "alaw": [42],
        "dup": [7] * 200,
    }
    rows = [(g, v) for g, vs in data.items() for v in vs]
    rows += [(None, 5), ("pcm", None)]
    df = spark.createDataFrame(rows, "codec string, x long") \
        .repartition(8)
    got = {(r["codec"], r["p_permille"]): r["q_value"]
           for r in exact_quantiles_grouped(
               df, "x", "codec", PROBES).collect()}
    assert len(got) == len(data) * len(PROBES)
    for g, vs in data.items():
        for p in PROBES:
            assert got[(g, p)] == _ref(vs, p), (g, p)


def test_exact_quantiles_grouped_guards(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "g string, x long")
    with pytest.raises(ValueError, match="max_groups"):
        exact_quantiles_grouped(df, "x", "g", [500], max_groups=1)
    with pytest.raises(ValueError, match="duplicate"):
        exact_quantiles_grouped(df, "x", "g", [1, 1])
