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


def test_triangle_counts_matches_bruteforce(spark):
    from dataflow_flex_templates_spark.operators.graphalgo import (
        triangle_counts,
        triangle_counts_py,
    )

    # K4 + pendant: every K4 vertex is in C(3,2)=3 triangles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = k4 + [(3, 9), (9, 9)]  # pendant + self-loop (ignored)
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(
        spark.createDataFrame(edges, "src long, dst long")).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 9: 0}

    import random
    rng = random.Random(11)
    rnd = [(rng.randrange(25), rng.randrange(25)) for _ in range(180)]
    # reversed duplicates must not double-count
    rnd += [(b, a) for a, b in rnd[:30]]
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(
        spark.createDataFrame(rnd, "src long, dst long")).collect()}
    want = triangle_counts_py(rnd)
    assert got == want
    assert sum(want.values()) % 3 == 0 and sum(want.values()) > 0


def test_bfs_levels_path_and_bound(spark):
    """BFS levels: min distance wins with multiple sources, the hop
    bound truncates the frontier, unreachable nodes are absent, and
    directed edges are respected (no implicit reverse)."""
    from dataflow_flex_templates_spark.operators.graphalgo import (
        bfs_levels,
    )

    # path 1->2->3->4->5->6, plus isolated 9, plus shortcut 10->4
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 4)],
        "src long, dst long")
    sources = spark.createDataFrame([(1,), (10,)], "node long")
    out = {r["node"]: r["level"]
           for r in bfs_levels(edges, sources, max_hops=3).collect()}
    # 4 is reached at hop 1 via 10 (min over sources), not hop 3 via 1
    assert out == {1: 0, 10: 0, 2: 1, 4: 1, 3: 2, 5: 2, 6: 3}
    # hop bound: max_hops=1 stops the frontier
    out1 = {r["node"]: r["level"]
            for r in bfs_levels(edges, sources, max_hops=1).collect()}
    assert out1 == {1: 0, 10: 0, 2: 1, 4: 1}
    # directed: nothing reaches 9, and 1 is never re-entered
    assert 9 not in out
