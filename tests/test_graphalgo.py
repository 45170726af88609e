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


def test_shortest_paths_twin_closed_forms():
    from dataflow_flex_templates_spark.operators.graphalgo import (
        shortest_paths_py,
    )

    # weighted triangle: the 2-edge path (1→2→3, cost 3) beats the
    # direct edge (cost 10) — the case BFS levels can't express
    edges = [(1, 2, 1), (2, 3, 2), (1, 3, 10)]
    assert shortest_paths_py(edges, [1], max_hops=1) == {
        1: 0, 2: 1, 3: 10}
    assert shortest_paths_py(edges, [1], max_hops=2) == {
        1: 0, 2: 1, 3: 3}
    # hop bound excludes the far tail entirely
    chain = [(1, 2, 5), (2, 3, 5), (3, 4, 5)]
    assert shortest_paths_py(chain, [1], max_hops=2) == {
        1: 0, 2: 5, 3: 10}
    # multi-source: nearest source wins
    assert shortest_paths_py(chain, [1, 4], max_hops=2) == {
        1: 0, 2: 5, 3: 10, 4: 0}


@pytest.mark.parametrize("hops", [1, 3, 6])
def test_shortest_paths_spark_equals_python_and_sql(spark, hops):
    from dataflow_flex_templates_spark.operators.graphalgo import (
        shortest_paths,
        shortest_paths_py,
        shortest_paths_unrolled_sql,
    )

    rng = random.Random(11)
    edges = sorted({(rng.randrange(25), rng.randrange(25))
                    for _ in range(120)})
    edges = [(s, d, rng.randrange(1, 20)) for s, d in edges]
    sources = [0, 7, 13]
    want = shortest_paths_py(edges, sources, max_hops=hops)

    e_df = spark.createDataFrame(edges, "src long, dst long, w long")
    s_df = spark.createDataFrame([(s,) for s in sources],
                                 "node long")
    got = {r["node"]: r["dist"]
           for r in shortest_paths(e_df, s_df, max_hops=hops,
                                   checkpoint_every=2).collect()}
    assert got == want

    vals = ", ".join(f"({s}, {d}, {w})" for s, d, w in edges)
    svals = ", ".join(f"({s})" for s in sources)
    sql = shortest_paths_unrolled_sql(
        "edges", "srcs", max_hops=hops,
        edges_sql=f"SELECT CAST(c0 AS BIGINT) AS src,"
                  f" CAST(c1 AS BIGINT) AS dst,"
                  f" CAST(c2 AS BIGINT) AS w"
                  f" FROM (VALUES {vals}) t(c0, c1, c2)",
        sources_sql=f"SELECT CAST(c0 AS BIGINT) AS node"
                    f" FROM (VALUES {svals}) t(c0)")
    oracle = {int(n): int(d) for n, d in duckdb.sql(sql).fetchall()}
    assert oracle == want


def test_shortest_paths_early_termination_equals_full(spark):
    from dataflow_flex_templates_spark.operators.graphalgo import (
        shortest_paths,
        shortest_paths_py,
    )

    # diameter-2 graph: rounds 3..8 are no-ops; the operator's empty-
    # frontier break must not change the result
    edges = [(1, 2, 3), (1, 3, 1), (3, 2, 1), (2, 4, 1)]
    e_df = spark.createDataFrame(edges, "src long, dst long, w long")
    s_df = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["dist"]
           for r in shortest_paths(e_df, s_df, max_hops=8).collect()}
    assert got == shortest_paths_py(edges, [1], max_hops=8)
    assert got == {1: 0, 2: 2, 3: 1, 4: 3}
