"""Iterative graph algorithms over edge DataFrames, built integer-
exact so a SQL oracle can replay every iteration bit-for-bit.

`operators/dedup.py` already covers connected components (pointer-
jumping min-label propagation); this module adds PageRank — the
canonical "iterate a join+aggregate to fixpoint" workload whose float
formulation is NOT cross-engine reproducible (each engine's SUM
reassociates differently, and after 10 iterations the drift is in the
leading digits of the tail ranks). The fix is the same quantization
discipline as the audio oracles: ranks live in integer nano-units,
every per-iteration operation is integer multiply / floor-divide /
sum — all exactly associative — so Spark, DuckDB (unrolled CTEs), and
a python twin produce identical int64 ranks after any number of
iterations.

Semantics (documented simplification, identical in every engine):
r_0(v) = SCALE // N;
r_{k+1}(v) = BASE + Σ_{u→v} (r_k(u) * d_num) // (d_den * outdeg(u))
with BASE = ((SCALE // N) * (d_den - d_num)) // d_den, damping
d_num/d_den = 85/100. Dangling-node mass is NOT redistributed (it
decays) — the classic simplification; ranks still order nodes
correctly and total mass is monotone, which is all a corpus-ranking
pipeline needs.

Scale shape: one shuffle per iteration (groupBy dst), contributions
computed edge-local after a rank⨝outdeg broadcast-or-shuffle join on
src. Iteration count is fixed (not convergence-tested) so the plan is
static; at 10^12 edges each iteration is exactly one fact-table
shuffle and `localCheckpoint(eager=True)` cuts the lineage between
iterations (the dedup_clusters pattern) so plan depth stays O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank_int(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    d_num: int = 85,
    d_den: int = 100,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Integer-exact PageRank over a directed edge list (duplicate
    edges count once — dedup upstream if needed). Returns
    (node, rank_q) with rank_q in SCALE-units. ``checkpoint_every``:
    localCheckpoint the rank frame every k iterations (0 = never;
    needed for long runs so lineage doesn't grow unboundedly)."""
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst"))
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n_nodes = nodes.count()  # one scalar job up front — static after
    r0 = SCALE // n_nodes
    base = (r0 * (d_den - d_num)) // d_den

    rank = nodes.withColumn("rank_q", F.lit(r0))
    for it in range(iterations):
        # integer floor-div: Spark's / on longs is double division —
        # use explicit DIV to stay in exact int64 arithmetic
        contrib = (e.join(rank, e["src"] == rank["node"])
                   .join(outdeg, "src")
                   .select(F.col("dst").alias("node"),
                           F.expr(f"(rank_q * {d_num}) div "
                                  f"({d_den} * outdeg)").alias("c_q")))
        rank = (nodes.join(contrib.groupBy("node")
                           .agg(F.sum("c_q").alias("s_q")),
                           "node", "left")
                .select("node",
                        (F.lit(base) + F.coalesce("s_q", F.lit(0)))
                        .alias("rank_q")))
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            rank = rank.localCheckpoint(eager=True)
    return rank


def pagerank_int_py(
    edges: list[tuple[int, int]],
    iterations: int = 10,
    d_num: int = 85,
    d_den: int = 100,
) -> dict[int, int]:
    """Pure-python twin of :func:`pagerank_int` — same integer
    recurrence, for tests (no Spark, no SQL)."""
    eset = sorted(set(edges))
    nodes = sorted({s for s, _ in eset} | {d for _, d in eset})
    outdeg: dict[int, int] = {}
    for s, _ in eset:
        outdeg[s] = outdeg.get(s, 0) + 1
    r0 = SCALE // len(nodes)
    base = (r0 * (d_den - d_num)) // d_den
    rank = {v: r0 for v in nodes}
    for _ in range(iterations):
        acc = {v: 0 for v in nodes}
        for s, d in eset:
            acc[d] += (rank[s] * d_num) // (d_den * outdeg[s])
        rank = {v: base + acc[v] for v in nodes}
    return rank


def pagerank_unrolled_sql(
    edges_cte: str,
    iterations: int = 10,
    d_num: int = 85,
    d_den: int = 100,
    edges_sql: str | None = None,
) -> str:
    """The DuckDB oracle: the SAME integer recurrence unrolled as
    ``iterations`` chained CTEs over ``edges_cte`` (a CTE name that
    must yield (src, dst) BIGINT rows; pass ``edges_sql`` to define it
    inline as the first CTE). Returns SQL selecting (node, rank_q)."""
    parts = []
    if edges_sql is not None:
        parts.append(f" {edges_cte} AS ({edges_sql})")
    parts.append(f"""
        nodes AS (SELECT src AS node FROM {edges_cte}
                  UNION SELECT dst FROM {edges_cte}),
        nn AS (SELECT COUNT(*) AS n FROM nodes),
        outdeg AS (SELECT src, COUNT(*) AS outdeg FROM {edges_cte}
                   GROUP BY src),
        consts AS (
          SELECT ({SCALE} // n) AS r0,
                 ((({SCALE} // n) * {d_den - d_num}) // {d_den}) AS base
          FROM nn),
        r0 AS (SELECT node, (SELECT r0 FROM consts) AS rank_q
               FROM nodes)""")
    prev = "r0"
    for k in range(1, iterations + 1):
        parts.append(f"""
        r{k} AS (
          SELECT n.node,
                 (SELECT base FROM consts)
                 + COALESCE(SUM((p.rank_q * {d_num})
                                // ({d_den} * o.outdeg)), 0) AS rank_q
          FROM nodes n
          LEFT JOIN {edges_cte} e ON e.dst = n.node
          LEFT JOIN {prev} p ON p.node = e.src
          LEFT JOIN outdeg o ON o.src = e.src
          GROUP BY n.node)""")
        prev = f"r{k}"
    return ("WITH " + ",".join(parts)
            + f" SELECT node, CAST(rank_q AS BIGINT) AS rank_q"
              f" FROM {prev}")


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over an undirected graph (duplicate /
    reversed / self-loop edges tolerated), via the degree-ordered
    orientation (Schank–Wagner): orient every edge from the lower
    (degree, node) endpoint to the higher, making a DAG in which each
    triangle appears exactly once as wedge u→v, u→w (v before w) plus
    edge v→w. Wedge fan-out is bounded by ORIENTED out-degree ≤
    O(sqrt(m)) — the standard O(m^1.5) bound — instead of raw degree,
    which is what makes this survive power-law graphs at scale.
    Returns (node, n_triangles) for every node (0 included).

    All joins are equi-joins on node ids; the order key is the struct
    (deg, node) compared lexicographically — a strict total order for
    ANY int64 node id / degree (no packed-64-bit overflow at ids ≥
    2^32), deterministic, and replayed bit-for-bit by a SQL oracle
    comparing (deg, node) tuples.
    """
    e_raw = edges.select(F.col(src_col).alias("a"),
                         F.col(dst_col).alias("b"))
    und = (e_raw.filter(F.col("a") != F.col("b"))
           .select(F.least("a", "b").alias("a"),
                   F.greatest("a", "b").alias("b"))
           .distinct())
    nodes = (und.select(F.col("a").alias("node"))
             .unionByName(und.select(F.col("b").alias("node")))
             .distinct())
    deg = (und.select(F.col("a").alias("node"))
           .unionByName(und.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    key = F.struct(F.col("deg").alias("d"),
                   F.col("node").alias("n")).alias("k")
    dk = deg.select("node", key)
    ea = und.join(dk.withColumnRenamed("node", "a")
                  .withColumnRenamed("k", "ka"), "a")
    eab = ea.join(dk.withColumnRenamed("node", "b")
                  .withColumnRenamed("k", "kb"), "b")
    oriented = eab.select(
        F.when(F.col("ka") < F.col("kb"), F.col("a"))
         .otherwise(F.col("b")).alias("u"),
        F.when(F.col("ka") < F.col("kb"), F.col("b"))
         .otherwise(F.col("a")).alias("v"),
        F.when(F.col("ka") < F.col("kb"), F.col("kb"))
         .otherwise(F.col("ka")).alias("kv"))
    o1 = oriented.select(F.col("u"), F.col("v"), F.col("kv"))
    o2 = (oriented.select(F.col("u"), F.col("v").alias("w"),
                          F.col("kv").alias("kw")))
    wedges = (o1.join(o2, "u")
              .filter(F.col("kv") < F.col("kw"))
              .select("u", "v", "w"))
    tri = wedges.join(oriented.select(F.col("u").alias("v"),
                                      F.col("v").alias("w")),
                      ["v", "w"])
    corners = (tri.select(F.col("u").alias("node"))
               .unionByName(tri.select(F.col("v").alias("node")))
               .unionByName(tri.select(F.col("w").alias("node"))))
    counts = corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles"))
    return (nodes.join(counts, "node", "left")
            .select("node", F.coalesce("n_triangles", F.lit(0))
                    .alias("n_triangles")))


def triangle_counts_py(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Pure-python twin: brute-force triangle membership counts."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({x for e in und for x in e})
    adj: dict[int, set] = {v: set() for v in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    out = {v: 0 for v in nodes}
    for a, b in und:
        for c in adj[a] & adj[b]:
            if c > b:  # count each triangle once per unordered triple
                out[a] += 1
                out[b] += 1
                out[c] += 1
    return out


def bfs_levels(edges: DataFrame, sources: DataFrame,
               max_hops: int = 6,
               checkpoint_every: int = 1) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any source node,
    following directed ``(src, dst)`` edges, bounded at ``max_hops``
    (nodes farther than the bound are absent — callers union reversed
    edges for undirected reach). Returns (node, level).

    Classic frontier expansion: each hop is one equi-join frontier×
    edges plus a left-anti against the visited set — the shuffle
    carries node ids only, and a level is FINAL when first assigned
    (min-level by construction), so no re-relaxation ever happens.
    Every frontier is localCheckpoint-ed eagerly: the emptiness test
    (the standard BFS termination probe, O(diameter) driver jobs)
    then reads the materialized frame instead of recomputing the
    join, and lineage stays O(1) like cluster_duplicates. Override
    ``checkpoint_every`` only to trade recompute for fewer
    materializations. The oracle is a bounded recursive CTE with
    min(level) GROUP BY — identical semantics including the hop
    bound.
    """
    levels = (sources.select(F.col("node").cast("long"))
              .distinct().withColumn("level", F.lit(0)))
    frontier = levels
    e = edges.select(F.col("src").cast("long"),
                     F.col("dst").cast("long"))
    for hop in range(1, max_hops + 1):
        nxt = (frontier.join(e, frontier["node"] == e["src"])
               .select(e["dst"].alias("node")).distinct()
               .join(levels.select("node"), "node", "left_anti")
               .withColumn("level", F.lit(hop)))
        if checkpoint_every and hop % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        levels = levels.unionByName(nxt)
        frontier = nxt
    return levels.withColumn("level", F.col("level").cast("long"))


def shortest_paths(edges: DataFrame, sources: DataFrame,
                   src_col: str = "src", dst_col: str = "dst",
                   weight_col: str = "w",
                   max_hops: int = 4,
                   checkpoint_every: int = 1) -> DataFrame:
    """Multi-source bounded-hop shortest paths (Bellman-Ford with the
    improvements-only frontier optimization) over directed weighted
    edges with non-negative integer weights. Returns (node, dist):
    the minimum total weight over paths of AT MOST ``max_hops`` edges
    from any source; nodes unreachable within the bound are absent.
    Unlike :func:`bfs_levels`, a node's distance can IMPROVE in a
    later hop (a longer-in-edges but lighter-in-weight path), so the
    visited set can't be frozen — instead each round keeps only the
    offers that beat the incumbent, and only improved nodes relax
    their out-edges next round (relaxing a non-improved node re-emits
    offers already beaten; standard SPFA argument — after round k,
    dists = exact min over <= k-edge paths, by induction).

    Scale shape: per hop, ONE equi-join frontier x edges (shuffle
    carries (node, dist) pairs only, never payloads), a map-side-
    combined min-agg collapsing parallel offers BEFORE the incumbent
    check, and a left-anti + union to fold improvements in. Integer
    weights + MIN are exactly associative, so the unrolled DuckDB
    oracle (:func:`shortest_paths_unrolled_sql`, which relaxes the
    FULL dist table each round — same fixpoint) replays every round
    bit-for-bit. Frontiers and the dist table are eagerly
    localCheckpoint-ed so the O(diameter) driver-side emptiness
    probes read materialized frames and lineage stays O(1).
    """
    dists = (sources.select(F.col("node").cast("long"))
             .distinct()
             .withColumn("dist", F.lit(0).cast("long")))
    frontier = dists
    e = edges.select(F.col(src_col).cast("long").alias("src"),
                     F.col(dst_col).cast("long").alias("dst"),
                     F.col(weight_col).cast("long").alias("w"))
    for hop in range(1, max_hops + 1):
        # dataset aliases, not DataFrame[col] refs: after hop 1 the
        # frontier's lineage includes `e`, so unqualified columns are
        # an ambiguous self-join
        offers = (frontier.alias("f")
                  .join(e.alias("e"),
                        F.col("f.node") == F.col("e.src"))
                  .select(F.col("e.dst").alias("node"),
                          (F.col("f.dist")
                           + F.col("e.w")).alias("dist"))
                  .groupBy("node").agg(F.min("dist").alias("dist")))
        improved = (offers.join(dists.select(
                        "node", F.col("dist").alias("cur")),
                        "node", "left")
                    .filter(F.col("cur").isNull()
                            | (F.col("dist") < F.col("cur")))
                    .select("node", "dist"))
        if checkpoint_every and hop % checkpoint_every == 0:
            improved = improved.localCheckpoint(eager=True)
        if improved.isEmpty():
            break
        dists = (dists.join(improved.select("node"), "node",
                            "left_anti")
                 .unionByName(improved))
        if checkpoint_every and hop % checkpoint_every == 0:
            dists = dists.localCheckpoint(eager=True)
        frontier = improved
    return dists.select(F.col("node").cast("long"),
                        F.col("dist").cast("long"))


def shortest_paths_unrolled_sql(edges_cte: str, sources_cte: str,
                                max_hops: int = 4,
                                edges_sql: str | None = None,
                                sources_sql: str | None = None) -> str:
    """The DuckDB oracle: Bellman-Ford unrolled as ``max_hops``
    chained CTEs, each relaxing the FULL incumbent table (offers
    UNION ALL incumbents, then MIN per node) — the textbook recurrence
    the frontier-optimized Spark operator is provably equal to.
    ``edges_cte`` must yield (src, dst, w) BIGINT rows and
    ``sources_cte`` (node) BIGINT rows; pass ``edges_sql`` /
    ``sources_sql`` to define them inline as leading CTEs."""
    parts = []
    if edges_sql is not None:
        parts.append(f" {edges_cte} AS ({edges_sql})")
    if sources_sql is not None:
        parts.append(f" {sources_cte} AS ({sources_sql})")
    parts.append(f"""
        d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist
               FROM {sources_cte})""")
    prev = "d0"
    for k in range(1, max_hops + 1):
        parts.append(f"""
        d{k} AS (
          SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM {prev}
            UNION ALL
            SELECT e.dst AS node, p.dist + e.w AS dist
            FROM {prev} p JOIN {edges_cte} e ON e.src = p.node)
          GROUP BY node)""")
        prev = f"d{k}"
    return ("WITH " + ",".join(parts)
            + f" SELECT node, CAST(dist AS BIGINT) AS dist"
              f" FROM {prev}")


def shortest_paths_py(edges: list[tuple[int, int, int]],
                      sources: list[int],
                      max_hops: int = 4) -> dict[int, int]:
    """Pure-python twin: full Bellman-Ford, ``max_hops`` rounds."""
    dist: dict[int, int] = {s: 0 for s in sources}
    for _ in range(max_hops):
        nxt = dict(dist)
        for s, d, w in edges:
            if s in dist and (d not in nxt or dist[s] + w < nxt[d]):
                nxt[d] = dist[s] + w
        dist = nxt
    return dist
