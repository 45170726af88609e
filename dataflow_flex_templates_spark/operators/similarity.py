"""Similarity search over an embedding column (array<float>).

- cosine_topk: brute-force exact top-k — the correctness baseline.
  Dot products via zip_with/aggregate higher-order functions (JVM-side);
  top-k via window row_number (Spark plans TakeOrdered per key).
- lsh_ann_topk: the scale path — random-hyperplane LSH buckets shrink
  the candidate set from O(n²) to O(n·bucket); exact cosine re-rank
  inside buckets. Recall is tunable via n_planes/n_tables.

At 100 TB the brute-force path is only for oracle validation; the LSH
path shuffles each vector to n_tables buckets (narrow explode) and
joins bucket-local — no cross join ever materializes.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm(vec_col) -> "F.Column":
    return F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b) -> "F.Column":
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k neighbours for each query row.

    ``queries`` has the same schema as ``vectors``. Self-matches
    (same id) are excluded. Output: (query_id, neighbor_id, cosine,
    rank) with rank 1..k. Broadcast the query side when it is small —
    Spark's optimizer does this automatically under AQE; we hint it."""
    dvec = F.col(vec_col).cast("array<double>")   # double-precision math
    v = vectors.select(F.col(id_col).alias("nid"), dvec.alias("nv"),
                       _norm(dvec).alias("nn"))
    q = queries.select(F.col(id_col).alias("qid"), dvec.alias("qv"),
                       _norm(dvec).alias("qn"))
    joined = v.crossJoin(F.broadcast(q)).filter(F.col("qid") != F.col("nid"))
    scored = joined.withColumn(
        "cosine", F.round(_dot(F.col("qv"), F.col("nv"))
                          / (F.col("qn") * F.col("nn")), 6))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(),
                                          F.col("nid").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(F.col("qid").alias("query_id"),
                          F.col("nid").alias("neighbor_id"),
                          "cosine", "rank"))


def _hyperplane(dim: int, plane_idx: int, table_idx: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane — seeded by (table,
    plane) so driver and tests derive identical planes with no RNG
    state. Box-Muller over a splitmix-style integer hash."""
    def h(i: int) -> float:
        x = (plane_idx * 0x9E3779B97F4A7C15 + table_idx * 0xBF58476D1CE4E5B9
             + i * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 30
        x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 27
        return (x / 2**64) * 2.0 - 1.0

    vals = [h(i) for i in range(dim)]
    nrm = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / nrm for v in vals]


def _sqdist(a, b) -> "F.Column":
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, x: acc + x)


def _argmin_centroids(vec_col, centroids: list[tuple[int, list[float]]],
                      n: int = 1) -> "F.Column":
    """Row-local nearest-centroid id(s): the centroid table is tiny, so
    it is inlined as a literal array and scanned per row inside one
    JVM expression — no crossJoin, no shuffle, whole-stage codegen.
    Returns an array of the ``n`` nearest centroid ids."""
    cent_arr = F.array(*[
        F.struct(F.lit(int(cid)).alias("cid"),
                 F.array(*[F.lit(float(x)) for x in cv]).alias("cv"))
        for cid, cv in centroids
    ])
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(_sqdist(vec_col, c["cv"]).alias("d"),
                           c["cid"].alias("cid")))
    return F.slice(F.transform(F.array_sort(scored), lambda s: s["cid"]),
                   1, n)


def ivf_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    lloyd_iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """IVF coarse quantizer: deterministic hash-ordered sample as the
    seed centroids, refined by ``lloyd_iters`` distributed k-means
    steps (assignment is row-local against broadcast-literal centroids;
    the mean is a posexplode + per-(cid,pos) avg — one narrow shuffle
    bounded by n_centroids x dim rows)."""
    dvec = F.col(vec_col).cast("array<double>")
    seed_rows = (vectors.select(dvec.alias("v"),
                                F.xxhash64(F.col(id_col)).alias("h"))
                 .orderBy("h").limit(n_centroids).collect())
    cents = [(i, list(r["v"])) for i, r in enumerate(seed_rows)]
    for _ in range(lloyd_iters):
        assigned = vectors.select(
            dvec.alias("v"),
            _argmin_centroids(dvec, cents, 1)[0].alias("cid"))
        means = (assigned.select("cid", F.posexplode("v").alias("pos", "x"))
                 .groupBy("cid", "pos").agg(F.avg("x").alias("m"))
                 .groupBy("cid")
                 .agg(F.array_sort(F.collect_list(
                     F.struct("pos", "m"))).alias("pm"))
                 .select("cid", F.transform("pm", lambda s: s["m"]).alias("v"))
                 .collect())
        cents = [(int(r["cid"]), list(r["v"])) for r in means]
    return cents


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 3,
    lloyd_iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-FLAT approximate top-k — the second scale path next to LSH.

    Index: every vector is assigned to its nearest coarse centroid
    (row-local argmin — zero shuffle). Search: each query probes its
    ``nprobe`` nearest cells; candidates are the vectors in those
    cells (a partitioned equi-join on cid — shuffle bounded by cell
    sizes; AQE splits a skewed hot cell); exact cosine re-rank on the
    candidate set only. Recall is tunable via nprobe/n_centroids."""
    cents = ivf_centroids(vectors, n_centroids, lloyd_iters,
                          vec_col, id_col)
    dvec = F.col(vec_col).cast("array<double>")
    assigned = vectors.select(
        F.col(id_col).alias("nid"), dvec.alias("nv"),
        _argmin_centroids(dvec, cents, 1)[0].alias("cid"))
    probes = queries.select(
        F.col(id_col).alias("qid"), dvec.alias("qv"),
        F.explode(_argmin_centroids(dvec, cents, nprobe)).alias("cid"))
    cands = (probes.join(assigned, "cid")
             .filter(F.col("qid") != F.col("nid"))
             .select("qid", "qv", "nid", "nv"))
    scored = cands.withColumn(
        "cosine", F.round(_dot(F.col("qv"), F.col("nv"))
                          / (_norm(F.col("qv")) * _norm(F.col("nv"))), 6))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(),
                                          F.col("nid").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(F.col("qid").alias("query_id"),
                          F.col("nid").alias("neighbor_id"),
                          "cosine", "rank"))


def lsh_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH signatures bucket the
    vectors per table; candidates = bucket collisions in ANY table;
    exact cosine re-rank on candidates only."""
    def sig_col(v):
        table_sigs = []
        for t in range(n_tables):
            bits = F.lit(0).cast("long")
            for p in range(n_planes):
                plane = _hyperplane(dim, p, t)
                proj = F.aggregate(
                    F.zip_with(v, F.array(*[F.lit(c) for c in plane]),
                               lambda x, y: x * y),
                    F.lit(0.0), lambda acc, x: acc + x)
                bits = bits + F.when(proj > 0,
                                     F.lit(1 << p).cast("long")).otherwise(0)
            table_sigs.append(F.struct(F.lit(t).alias("t"),
                                       bits.alias("sig")))
        return F.array(*table_sigs)

    def bucketize(df, prefix):
        dvec = F.col(vec_col).cast("array<double>")
        return (df.select(F.col(id_col).alias(f"{prefix}id"),
                          dvec.alias(f"{prefix}v"),
                          F.explode(sig_col(dvec)).alias("bk"))
                  .select(f"{prefix}id", f"{prefix}v",
                          F.col("bk.t").alias("t"),
                          F.col("bk.sig").alias("sig")))

    vb = bucketize(vectors, "n")
    qb = bucketize(queries, "q")
    cands = (qb.join(vb, ["t", "sig"])
               .filter(F.col("qid") != F.col("nid"))
               .select("qid", "qv", "nid", "nv")
               .distinct())
    scored = cands.withColumn(
        "cosine", F.round(_dot(F.col("qv"), F.col("nv"))
                          / (_norm(F.col("qv")) * _norm(F.col("nv"))), 6))
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(),
                                          F.col("nid").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(F.col("qid").alias("query_id"),
                          F.col("nid").alias("neighbor_id"),
                          "cosine", "rank"))
