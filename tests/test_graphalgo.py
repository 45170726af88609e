"""Integer-exact PageRank: three independent implementations of one
recurrence (Spark loop, unrolled-CTE SQL, pure python) must agree
bit-for-bit — that identity is the whole point of the quantization."""

from __future__ import annotations

import random

import duckdb
import pytest

from dataflow_flex_templates_spark.operators.graphalgo import (
    SCALE,
    pagerank_int,
    pagerank_int_py,
    pagerank_unrolled_sql,
)


def test_pagerank_twin_closed_forms():
    # two-node cycle: symmetric — equal ranks, total mass conserved
    r = pagerank_int_py([(1, 2), (2, 1)], iterations=20)
    assert r[1] == r[2]
    assert abs(r[1] + r[2] - SCALE) <= 40  # floor-div loss ≤ 1/node/iter
    # star 1→{2,3,4}: leaves equal, hub gets only the base (no in-edges)
    r = pagerank_int_py([(1, 2), (1, 3), (1, 4)], iterations=10)
    assert r[2] == r[3] == r[4] > r[1]
    assert r[1] == ((SCALE // 4) * 15) // 100
    # chain sink accumulates more than its feeder
    r = pagerank_int_py([(1, 2), (2, 3)], iterations=10)
    assert r[3] > r[2] > r[1]


@pytest.mark.parametrize("iters", [1, 7])
def test_pagerank_spark_equals_python_and_sql(spark, iters):
    rng = random.Random(5)
    edges = sorted({(rng.randrange(30), rng.randrange(30))
                    for _ in range(150)})
    want = pagerank_int_py(edges, iterations=iters)

    e_df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank_q"]
           for r in pagerank_int(e_df, iterations=iters,
                                 checkpoint_every=3).collect()}
    assert got == want

    vals = ", ".join(f"({s}, {d})" for s, d in edges)
    sql = pagerank_unrolled_sql(
        "edges", iterations=iters,
        edges_sql=f"SELECT CAST(c0 AS BIGINT) AS src, "
                  f"CAST(c1 AS BIGINT) AS dst FROM (VALUES {vals}) "
                  f"t(c0, c1)")
    oracle = {int(n): int(q)
              for n, q in duckdb.sql(sql).fetchall()}
    assert oracle == want
