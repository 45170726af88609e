"""The pure-Python twins (testing/xxh.py, testing/twins.py) must stay
bit-exact with the distributed operators — they are the independent
half of the driver's hash-operator oracles, so any drift here silently
invalidates the correctness gate."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_xxh64_matches_spark(spark):
    from dataflow_flex_templates_spark.testing.xxh import (
        xxh64_int,
        xxh64_long,
        xxh64_signed,
    )

    toks = ["", "a", "the", "spark stream", "x" * 7, "y" * 8, "z" * 31,
            "w" * 32, "mixed 123 !?", "café", "日本語テスト", "tail" * 11]
    got = {r["s"]: r["h"] for r in
           spark.createDataFrame([(t,) for t in toks], ["s"])
           .select("s", F.xxhash64("s").alias("h")).collect()}
    assert all(got[t] == xxh64_signed(t) for t in toks)

    longs = [0, 1, -1, 42, 2**40, -(2**40), 2**62]
    gotl = {r["v"]: r["h"] for r in
            spark.createDataFrame([(v,) for v in longs], "v: long")
            .select("v", F.xxhash64("v").alias("h")).collect()}
    assert all(gotl[v] == xxh64_long(v) for v in longs)

    # chained two-arg hash with an IntegerType literal (the minhash form)
    chained = {r["s"]: r["h"] for r in
               spark.createDataFrame([(t,) for t in toks[:4]], ["s"])
               .select("s", F.xxhash64("s", F.lit(7)).alias("h")).collect()}
    from dataflow_flex_templates_spark.testing.xxh import xxh64

    assert all(
        chained[t] == xxh64_int(7, seed=xxh64(t.encode("utf-8")))
        for t in toks[:4])


def test_simhash_twin_matches_operator(spark, sf_dir):
    from dataflow_flex_templates_spark.operators.dedup import simhash
    from dataflow_flex_templates_spark.testing.twins import simhash_twin

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter("doc_id < 60")
    got = {r["id"]: r["simhash"] for r in simhash(docs).collect()}
    for r in docs.select("doc_id", "text").collect():
        assert got[r["doc_id"]] == simhash_twin(r["text"]), r["doc_id"]


def test_minhash_twin_matches_operator(spark, sf_dir):
    from dataflow_flex_templates_spark.operators.dedup import (
        minhash_signatures,
    )
    from dataflow_flex_templates_spark.testing.twins import (
        minhash_sigs_twin,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .filter("doc_id < 20")
    texts = {r["doc_id"]: r["text"]
             for r in docs.select("doc_id", "text").collect()}
    for r in minhash_signatures(docs, num_hashes=8).collect():
        assert ([r[f"mh_{i}"] for i in range(8)]
                == minhash_sigs_twin(texts[r["id"]], num_hashes=8))


def test_lsh_sig_twin_matches_operator(spark, sf_dir):
    """Hyperplane LSH bucket membership is bit-exact between the
    sequential-fold twin and Spark's F.aggregate fold."""
    from dataflow_flex_templates_spark.operators.dedup import (
        embedding_neardup_lsh,
    )
    from dataflow_flex_templates_spark.testing.twins import (
        lsh_pair_candidates,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .filter("vec_id < 80")
    rows = emb.select("vec_id", "embedding").collect()
    vecs = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in rows]
    dim = len(vecs[0][1])
    # threshold=-1 surfaces the raw candidate set
    got = sorted((r["id_a"], r["id_b"]) for r in embedding_neardup_lsh(
        emb, threshold=-1.0, dim=dim, n_planes=4, n_tables=4).collect())
    assert got == lsh_pair_candidates(vecs, dim, n_planes=4, n_tables=4)


def test_ivf_twin_matches_operator(spark, sf_dir):
    """lloyd_iters=0 IVF: seed centroids, cell assignment, and probe
    order are bit-exact between Spark and the twin."""
    from pyspark.sql import functions as F

    from dataflow_flex_templates_spark.operators.similarity import (
        _argmin_centroids,
        ivf_centroids,
    )
    from dataflow_flex_templates_spark.testing.twins import (
        ivf_cell_order,
        ivf_seed_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .filter("vec_id < 120")
    rows = emb.select("vec_id", "embedding").collect()
    vecs = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in rows]
    cents = ivf_centroids(emb, n_centroids=8, lloyd_iters=0)
    assert cents == ivf_seed_centroids(vecs, 8)
    dvec = F.col("embedding").cast("array<double>")
    got = {r["vec_id"]: list(r["p"]) for r in emb.select(
        "vec_id", _argmin_centroids(dvec, cents, 3).alias("p")).collect()}
    for vid, v in vecs:
        assert got[vid] == ivf_cell_order(v, cents, 3), vid


def test_oracle_constants_fresh(sf_dir):
    """The pinned oracle constants must match a live twin recomputation
    for a spot-checked slice (guards against stale constants after a
    testdata regeneration)."""
    from dataflow_flex_templates_spark.testing.twins import simhash_twin

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "dataflow_flex_templates_spark", "testing", "oracle_constants.json")
    with open(path) as f:
        const = json.load(f)
    docs = pd.read_parquet(
        os.path.join(const["sf_dir"], "documents.parquet"),
        columns=["doc_id", "text"]).sort_values("doc_id")
    pinned = dict((i, s) for i, s in const["simhash"])
    for _, r in docs.head(25).iterrows():
        assert pinned[int(r["doc_id"])] == simhash_twin(r["text"])


def test_oracle_sql_coverage():
    """EVERY queries() entry ships an oracle (ivf_ann_topk joined the
    board via the deterministic lloyd_iters=0 index)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __spark_entry__ as entry

    no_oracle = set(entry.queries()) - set(entry.oracle_sql())
    assert no_oracle == set(), no_oracle
