"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale notes (the 100 TB story):
- exact_dedup is a single hash-aggregate on the fingerprint — one
  shuffle, map-side partial agg, no skew risk (md5 is uniform).
- ngram_jaccard_pairs is exact pairwise similarity via an inverted
  shingle index (explode → self-join on shingle → count) — the join is
  on the shingle hash, never a cross join; candidate pruning by
  shared-shingle count bounds the pair set.
- minhash_lsh_pairs is the sub-quadratic path: per-doc k minhashes →
  band buckets → join within buckets only. Hashing is xxhash64 with
  per-permutation seeds, all JVM-side.
- simhash_pairs: 64-bit simhash from token hashes; near-dup = equal
  bucket on bit-prefix + Hamming ≤ r verify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataflow_flex_templates_spark.operators.text import fingerprint, norm_text


# --------------------------------------------------------------- exact

def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """One row per distinct normalized text: keeper = min id, plus the
    duplicate count. Hash-groupBy — the canonical exact dedup."""
    return (df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
              .groupBy("fp")
              .agg(F.min(id_col).alias("keeper_id"),
                   F.count("*").alias("n_dupes"))
           )


# ------------------------------------------------------- shingles / jaccard

def _shingles(col, n: int = 3):
    """Distinct character n-gram shingles of the normalized text —
    pure higher-order functions (codegen'd, no UDF)."""
    t = norm_text(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1))),
            lambda i: t.substr(i, F.lit(n)),
        )
    )


def shingle_sets(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", n: int = 3) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        _shingles(F.col(text_col), n).alias("sh"),
    ).withColumn("sh_size", F.size("sh"))


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard over character n-gram shingle sets, computed via an
    inverted index (explode + equi-join on shingle), never a cross join.

    Returns (id_a, id_b, jaccard) for id_a < id_b with jaccard ≥ threshold.

    ``max_df`` bounds the posting lists: shingles whose document
    frequency exceeds it are dropped from CANDIDATE GENERATION only
    (a hot "the"-class shingle otherwise makes the self-join quadratic
    at corpus scale — df² pairs from one posting list). Verification is
    then exact: true intersection/union are recomputed from the FULL
    shingle sets (array_intersect) per candidate pair, so precision is
    always 1.0 and the only possible loss is a ≥-threshold pair whose
    every shared shingle is ultra-common — vanishingly unlikely for
    real thresholds, and impossible when max_df ≥ corpus size (the
    exact mode). At 100 TB pick max_df ≈ 1e4: posting-list join cost
    is then ≤ max_df² per shingle instead of corpus².
    """
    sets_ = shingle_sets(df, text_col, id_col, n)
    inv = sets_.select("id", "sh_size", F.explode("sh").alias("s"))
    if max_df is None:
        a = inv.alias("a")
        b = inv.alias("b")
        common = (
            a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
             .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                      F.col("a.sh_size").alias("sz_a"), F.col("b.sh_size").alias("sz_b"))
             .agg(F.count("*").alias("inter"))
        )
        jac = common.withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
        )
        return (jac.filter(F.col("jaccard") >= threshold)
                   .select("id_a", "id_b", "jaccard"))

    rare = (inv.groupBy("s").agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df).select("s"))
    bounded = inv.join(rare, "s")          # DF-bounded inverted index
    a, b = bounded.alias("a"), bounded.alias("b")
    cands = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
         .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
         .distinct()
    )
    sa = sets_.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"),
                      F.col("sh_size").alias("sz_a"))
    sb = sets_.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"),
                      F.col("sh_size").alias("sz_b"))
    verified = (cands.join(sa, "id_a").join(sb, "id_b")
                .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
                .withColumn("jaccard", F.round(
                    F.col("inter")
                    / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6)))
    return (verified.filter(F.col("jaccard") >= threshold)
                    .select("id_a", "id_b", "jaccard"))


# ------------------------------------------------------------ minhash + LSH

def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """k minhash values per doc: min over shingles of xxhash64(shingle,
    seeded per permutation). One explode + one hash-agg; everything
    stays in whole-stage codegen."""
    sets_ = shingle_sets(df, text_col, id_col, n)
    inv = sets_.select("id", F.explode("sh").alias("s"))
    aggs = [
        F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return inv.groupBy("id").agg(*aggs)


def band_buckets(sig: DataFrame, num_hashes: int = 32,
                 bands: int = 8) -> DataFrame:
    """(id, band, bh) bucket rows from a minhash-signature frame: each
    band's rows-per-band signature slice collapses to one xxhash64.
    Factored out so the batch pair generator and the streaming bucket
    store (`streaming/lsh_stream.py`) hash bands IDENTICALLY — the
    streaming fold's exactness depends on it."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    band_cols = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"mh_{b * rows_per_band + r}")
                         for r in range(rows_per_band)]).alias("bh"),
        )
        for b in range(bands)
    ])
    return (sig.select("id", F.explode(band_cols).alias("bk"))
            .select("id", F.col("bk.band").alias("band"),
                    F.col("bk.bh").alias("bh")))


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Banded-LSH candidate generation + exact-Jaccard verification.

    rows/band = num_hashes/bands; two docs become candidates iff some
    band of their signatures is identical (join on (band_idx, band
    hash) — sub-quadratic); candidates are then verified with exact
    shingle Jaccard so output precision is 1.0.
    """
    assert num_hashes % bands == 0
    sig = minhash_signatures(df, num_hashes, text_col, id_col, n)
    buckets = band_buckets(sig, num_hashes, bands)
    a, b = buckets.alias("a"), buckets.alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.id") < F.col("b.id")))
         .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
         .distinct()
    )
    # verify candidates with exact jaccard (inverted-index join restricted
    # to candidate ids — small by construction)
    cand_ids = (cands.select(F.col("id_a").alias("id"))
                .union(cands.select("id_b")).distinct())
    verified = ngram_jaccard_pairs(
        df.join(cand_ids.withColumnRenamed("id", id_col), id_col, "leftsemi"),
        threshold=threshold, text_col=text_col, id_col=id_col, n=n)
    return cands.join(verified, ["id_a", "id_b"]).select(
        "id_a", "id_b", "jaccard")


# ---------------------------------------------------------------- simhash

def _bit_mask(i: int) -> "F.Column":
    # bit 63 is the sign bit of a Java long: 1<<63 would overflow
    return F.lit(-(1 << 63) if i == 63 else (1 << i)).cast("long")


def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens: per bit, sign of the sum
    of ±1 contributions from each token's xxhash64 bit. Computed with
    explode + bitwise expressions — JVM-side, no UDF."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(norm_text(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = toks.groupBy("id").agg(*[
        F.sum(F.when(F.col("h").bitwiseAND(_bit_mask(i)) != 0,
                     1).otherwise(-1)).alias(f"b{i}")
        for i in range(64)
    ])
    sim = bit_sums.select(
        "id",
        sum(
            (F.when(F.col(f"b{i}") > 0, _bit_mask(i))
              .otherwise(F.lit(0).cast("long")))
            for i in range(64)
        ).alias("simhash"),
    )
    return sim


def simhash_pairs(df: DataFrame, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id",
                  n_blocks: int | None = None) -> DataFrame:
    """Near-dup pairs by SimHash with GUARANTEED recall 1.0.

    Pigeonhole blocking: the 64-bit simhash is split into
    ``max_hamming + 1`` bit blocks; any pair within Hamming distance
    ``max_hamming`` has at most that many differing bits, so at least
    one whole block is identical — bucketing every block and unioning
    candidates therefore misses NO qualifying pair (unlike a single
    bit-prefix bucket, whose recall drops ~40% at r=3). Exact
    bit_count(xor) verification keeps precision 1.0. Cost: each doc
    lands in ``n_blocks`` buckets (a narrow 2-int explode), joins stay
    bucket-local — sub-quadratic as long as any single block value is
    not shared by a huge fraction of the corpus (near-identical docs
    cluster by design; that is the output, not blowup).
    """
    nb = n_blocks or (max_hamming + 1)
    width = 64 // nb
    sim = simhash(df, text_col, id_col)

    def block(b: int):
        # unsigned shift so the sign bit never smears; last block takes
        # the remainder bits (a full 64-bit mask is -1 in two's
        # complement — (1<<64)-1 would overflow the long literal)
        w = width if b < nb - 1 else 64 - width * (nb - 1)
        mask = -1 if w == 64 else (1 << w) - 1
        return F.shiftrightunsigned("simhash", b * width).bitwiseAND(
            F.lit(mask).cast("long"))

    blocks = F.array(*[F.struct(F.lit(b).alias("blk"),
                                block(b).alias("bv"))
                       for b in range(nb)])
    bucketed = (sim.select("id", "simhash", F.explode(blocks).alias("bk"))
                .select("id", "simhash", F.col("bk.blk").alias("blk"),
                        F.col("bk.bv").alias("bv")))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.bv") == F.col("b.bv"))
               & (F.col("a.id") < F.col("b.id")))
         .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                 F.col("a.simhash").alias("sh_a"),
                 F.col("b.simhash").alias("sh_b"))
         .dropDuplicates(["id_a", "id_b"])
         .withColumn("hamming", F.bit_count(
             F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
         .filter(F.col("hamming") <= max_hamming)
         .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------------- embedding near-dup

def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cosine-similarity near-duplicate pairs over an array<float>
    column, via higher-order functions (zip_with dot product — JVM
    vectorizable, no Python). Pair generation is a self-join gated by
    id< to halve work; for the sub-quadratic scale path see
    operators.similarity.lsh_ann_topk."""
    dvec = F.col(vec_col).cast("array<double>")   # double-precision math
    v = df.select(
        F.col(id_col).alias("id"),
        dvec.alias("v"),
        F.sqrt(F.aggregate(dvec, F.lit(0.0),
                           lambda acc, x: acc + x * x)).alias("nrm"),
    )
    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
         .withColumn("cosine", F.round(
             dot / (F.col("a.nrm") * F.col("b.nrm")), 6))
         .filter(F.col("cosine") >= threshold)
         .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                 "cosine")
    )


# --------------------------------------------- duplicate clustering (CC)

def cluster_duplicates(
    pairs: DataFrame,
    ids: DataFrame | None = None,
    max_iters: int = 25,
) -> DataFrame:
    """Connected components over near-dup pairs → (id, cluster_rep).

    The dedup group assignment every pipeline needs after pair
    generation: each component's representative is its MINIMUM id
    (deterministic keeper). Min-label propagation WITH per-round
    pointer jumping (rep <- rep(rep), the large-star/small-star /
    path-compression idea): one edge-hop plus one jump per round
    reaches the component minimum over distance ~2^k after k rounds,
    so convergence is O(log diameter) — a crawl-mirror duplicate
    chain of diameter 100 closes in ~7 rounds where plain propagation
    needs 100. Convergence is checked by an aggregate (no collect of
    the data itself); each round is a bounded number of shuffles on
    id, and frames are localCheckpoint()ed to cut lineage so round
    N's plan doesn't replay rounds 1..N-1.

    Correctness of the jump step: labels start at own-id, are always
    the id of some node in the same component, and only decrease
    (least of component ids ≥ component min). At the fixpoint rep is
    constant per component and equals the minimum id.
    """
    edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    sym = edges.union(edges.select(F.col("b").alias("a"),
                                   F.col("a").alias("b")))
    nodes = (ids.select(F.col(ids.columns[0]).alias("id")) if ids is not None
             else sym.select(F.col("a").alias("id")).distinct())
    labels = nodes.select("id", F.col("id").alias("rep"))
    sym = sym.persist()
    converged = False
    for _ in range(max_iters):
        neigh_min = (sym.join(labels, sym["b"] == labels["id"])
                     .groupBy("a").agg(F.min("rep").alias("nrep")))
        new_labels = (labels.join(neigh_min,
                                  labels["id"] == neigh_min["a"], "left")
                      .select(F.col("id"),
                              F.least(F.col("rep"),
                                      F.coalesce(F.col("nrep"),
                                                 F.col("rep"))).alias("rep")))
        # pointer jumping: rep <- min(rep, rep(rep)). Every rep is a
        # node id, so the self-join resolves; doubling the pointer
        # distance each round is what makes the loop O(log diameter).
        reps = new_labels.select(F.col("id").alias("rid"),
                                 F.col("rep").alias("rrep"))
        new_labels = (new_labels
                      .join(reps, new_labels["rep"] == reps["rid"], "left")
                      .select(F.col("id"),
                              F.least(F.col("rep"),
                                      F.coalesce(F.col("rrep"),
                                                 F.col("rep"))).alias("rep")))
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .filter(F.col("n.rep") != F.col("o.rep")).count())
        labels = new_labels
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        # A component with diameter > max_iters would silently keep >1
        # representative (dedup_keep would then under-delete). Surface
        # it loudly — callers can raise max_iters or pre-contract.
        import logging

        logging.getLogger(__name__).warning(
            "cluster_duplicates: min-label propagation did NOT converge "
            "within %d rounds; some components may carry multiple "
            "representatives", max_iters)
    return labels.select(F.col("id"), F.col("rep").alias("cluster_rep"))


def embedding_neardup_lsh(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 10,
    n_tables: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Sub-quadratic embedding near-dup pairs: random-hyperplane LSH
    buckets generate candidates (self-join within (table, signature)
    buckets only — never a cross join), exact cosine verifies, so
    precision is 1.0 and recall is tuned by n_planes/n_tables. The
    scale path for ``embedding_neardup_pairs``.
    """
    from dataflow_flex_templates_spark.operators.similarity import (
        _dot,
        _norm,
        lsh_ann_topk,
    )

    # reuse the ANN bucketizer's signature machinery via a small shim:
    # bucket the SAME frame on both sides of the join
    from dataflow_flex_templates_spark.operators.similarity import (
        _hyperplane,
    )

    dvec = F.col(vec_col).cast("array<double>")

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

    bucketed = (df.select(F.col(id_col).alias("id"), dvec.alias("v"),
                          F.explode(sig_col(dvec)).alias("bk"))
                .select("id", "v", F.col("bk.t").alias("t"),
                        F.col("bk.sig").alias("sig")))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cands = (a.join(b, (F.col("a.t") == F.col("b.t"))
                    & (F.col("a.sig") == F.col("b.sig"))
                    & (F.col("a.id") < F.col("b.id")))
             .select(F.col("a.id").alias("id_a"), F.col("a.v").alias("va"),
                     F.col("b.id").alias("id_b"), F.col("b.v").alias("vb"))
             .dropDuplicates(["id_a", "id_b"]))
    return (cands.withColumn(
                "cosine", F.round(_dot(F.col("va"), F.col("vb"))
                                  / (_norm(F.col("va")) * _norm(F.col("vb"))),
                                  6))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


def dedup_keep(
    pairs_df: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """The end-to-end dedup FILTER: given near-dup pairs, keep each
    component's representative (minimum id) plus every unpaired doc —
    the frame a training pipeline actually feeds downstream. One
    left-anti join against the non-representative ids."""
    clusters = cluster_duplicates(pairs_df)
    losers = clusters.filter(F.col("id") != F.col("cluster_rep")) \
                     .select(F.col("id").alias(id_col))
    return docs.join(losers, id_col, "left_anti")


# ------------------------------------------------ edit-distance verify

def edit_distance_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_df: int | None = 50,
    min_sim_permille: int = 700,
) -> DataFrame:
    """Near-dup pairs verified by exact Levenshtein distance — the
    strictest of the fuzzy-dedup verifiers (Jaccard/minhash measure
    set overlap; edit distance catches reorderings and small in-place
    edits the set view scores identically).

    Candidates come from the same DF-bounded shingle posting lists as
    :func:`ngram_jaccard_pairs` (never a cross join; hot shingles
    dropped from candidate generation only); each candidate is then
    scored with ``levenshtein(norm_a, norm_b)`` — a JVM built-in with
    identical semantics in DuckDB, so the whole operator has a genuine
    SQL oracle. ``sim_permille = (maxlen - lev) * 1000 div maxlen``
    keeps the output integer-exact.

    Scale: levenshtein is O(len_a × len_b) per pair — strictly a
    VERIFIER for bounded candidate sets, never a generator; with
    max_df ≈ 1e4 at corpus scale the pair set stays linear-ish and the
    quadratic cost is paid only on probable duplicates.
    """
    nt = df.select(F.col(id_col).alias("id"),
                   norm_text(F.col(text_col)).alias("nt"))
    sets_ = shingle_sets(df, text_col, id_col, n)
    inv = sets_.select("id", F.explode("sh").alias("s"))
    if max_df is not None:
        rare = (inv.groupBy("s").agg(F.count("*").alias("df"))
                .filter(F.col("df") <= max_df).select("s"))
        inv = inv.join(rare, "s")
    a, b = inv.alias("a"), inv.alias("b")
    cands = (a.join(b, (F.col("a.s") == F.col("b.s"))
                    & (F.col("a.id") < F.col("b.id")))
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"))
             .distinct())
    ta = nt.select(F.col("id").alias("id_a"), F.col("nt").alias("nt_a"))
    tb = nt.select(F.col("id").alias("id_b"), F.col("nt").alias("nt_b"))
    maxlen = F.greatest(F.length("nt_a"), F.length("nt_b")).cast("long")
    lev = F.levenshtein("nt_a", "nt_b").cast("long")
    return (cands.join(ta, "id_a").join(tb, "id_b")
            .withColumn("lev", lev)
            .withColumn("__maxlen__", maxlen)
            .withColumn("sim_permille",
                        F.when(F.col("__maxlen__") == 0, F.lit(1000))
                         .otherwise(F.expr(
                             "(__maxlen__ - lev) * 1000L div __maxlen__")))
            .drop("__maxlen__")
            .filter(F.col("sim_permille") >= min_sim_permille)
            .select("id_a", "id_b", "lev", "sim_permille"))
