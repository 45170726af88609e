"""Training-data pipeline operators over the driver's documents /
embeddings tables, each verified against an independent oracle
(DuckDB SQL or numpy)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_text_profile_vs_duckdb(docs, sf_dir):
    from dataflow_flex_templates_spark.operators.text import text_profile

    got = text_profile(docs).select(
        "doc_id", "n_tokens", "fp", "punct_ratio", "quality", "lang_pred"
    ).toPandas().set_index("doc_id").sort_index()
    oracle = duckdb.sql(f"""
        WITH t AS (
          SELECT doc_id, trim(text) AS tt,
                 lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS nt
          FROM '{sf_dir}/documents.parquet')
        SELECT doc_id,
               CASE WHEN length(tt)=0 THEN 0
                    ELSE len(regexp_split_to_array(tt, '\\s+')) END AS n_tokens,
               md5(nt) AS fp,
               round((length(tt) - length(regexp_replace(tt, '[.!?,;:]', '', 'g')))
                     / greatest(length(tt), 1), 6) AS punct_ratio
        FROM t
    """).df().set_index("doc_id").sort_index()
    assert (got["n_tokens"] == oracle["n_tokens"]).all()
    assert (got["fp"] == oracle["fp"]).all()
    np.testing.assert_allclose(got["punct_ratio"], oracle["punct_ratio"], atol=1e-6)
    assert set(got["lang_pred"].unique()) <= {"en", "unk"}
    assert got["quality"].between(-0.25, 1.0).all()


def test_exact_dedup(spark, docs, sf_dir):
    from dataflow_flex_templates_spark.operators.dedup import exact_dedup

    got = exact_dedup(docs).toPandas()
    oracle = duckdb.sql(f"""
        SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) fp,
               min(doc_id) keeper_id, count(*) n_dupes
        FROM '{sf_dir}/documents.parquet' GROUP BY 1
    """).df()
    assert len(got) == len(oracle)
    g = got.sort_values("fp").reset_index(drop=True)
    o = oracle.sort_values("fp").reset_index(drop=True)
    assert (g["keeper_id"].values == o["keeper_id"].values).all()
    assert (g["n_dupes"].values == o["n_dupes"].values).all()


@pytest.fixture(scope="module")
def neardup_docs(spark):
    """Synthetic corpus WITH near-duplicates (the driver docs have none):
    clusters of slightly-perturbed copies."""
    import random
    rng = random.Random(13)
    words = [f"word{i:03d}" for i in range(200)]
    rows = []
    did = 0
    for c in range(30):
        base = " ".join(rng.choice(words) for _ in range(40))
        for v in range(rng.choice([1, 1, 2, 3])):
            text = base
            if v:  # perturb a couple of words
                toks = text.split()
                for _ in range(2):
                    toks[rng.randrange(len(toks))] = rng.choice(words)
                text = " ".join(toks)
            rows.append((did, text, c))
            did += 1
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "cluster"])
    return pdf


def test_ngram_jaccard_pairs(spark, neardup_docs):
    from dataflow_flex_templates_spark.operators.dedup import ngram_jaccard_pairs

    pdf = neardup_docs
    df = spark.createDataFrame(pdf[["doc_id", "text"]])
    got = ngram_jaccard_pairs(df, threshold=0.6).toPandas()
    # numpy oracle: exact jaccard over 3-gram shingle sets
    def sh(t):
        t = " ".join(t.lower().split())
        return {t[i:i + 3] for i in range(max(len(t) - 2, 1))}
    want = []
    texts = dict(zip(pdf["doc_id"], pdf["text"]))
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sh(texts[a]), sh(texts[b])
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.6:
                want.append((a, b, round(j, 6)))
    got_set = {(r["id_a"], r["id_b"]) for _, r in got.iterrows()}
    want_set = {(a, b) for a, b, _ in want}
    assert got_set == want_set
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for _, r in got.iterrows()}
    for a, b, j in want:
        assert abs(jac[(a, b)] - j) < 1e-4
    # near-dups exist in the fixture (sanity)
    assert len(want) > 5


def test_ngram_jaccard_max_df(spark, neardup_docs):
    """DF-bounded candidate generation + exact array_intersect verify
    equals the unbounded exact path, and actually cuts hot shingles
    from the join input (the 100 TB hot-shingle defense)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dataflow_flex_templates_spark.operators.dedup import (
        ngram_jaccard_pairs,
        shingle_sets,
    )

    # adversarial corpus: every doc shares a hot boilerplate prefix
    pdf = neardup_docs.copy()
    pdf["text"] = "common header boilerplate " + pdf["text"]
    df = spark.createDataFrame(pdf[["doc_id", "text"]])

    exact = sorted(tuple(r) for r in
                   ngram_jaccard_pairs(df, threshold=0.5).collect())
    bounded = sorted(tuple(r) for r in
                     ngram_jaccard_pairs(df, threshold=0.5,
                                         max_df=15).collect())
    assert exact == bounded and len(exact) > 0

    # the cut is real: hot shingles exceed max_df and leave the index
    inv = shingle_sets(df).select("id", F.explode("sh").alias("s"))
    dfc = inv.groupBy("s").count()
    n_docs = len(pdf)
    hot = dfc.filter(F.col("count") > 15).count()
    assert hot > 0  # the boilerplate shingles are hot...
    # ...and the bounded join input excludes them entirely
    kept_max = (dfc.filter(F.col("count") <= 15)
                .agg(F.max("count")).first()[0])
    assert kept_max <= 15 < n_docs


def test_minhash_lsh_recall(spark, neardup_docs):
    """LSH candidates + exact verify: precision 1.0 by construction;
    recall ≥ 0.9 vs exact jaccard at the same threshold."""
    from dataflow_flex_templates_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    df = spark.createDataFrame(neardup_docs[["doc_id", "text"]])
    exact = {(r["id_a"], r["id_b"])
             for r in ngram_jaccard_pairs(df, threshold=0.6).collect()}
    approx = {(r["id_a"], r["id_b"])
              for r in minhash_lsh_pairs(df, num_hashes=32, bands=8,
                                         threshold=0.6).collect()}
    assert approx <= exact          # precision 1.0 (verified pairs)
    recall = len(approx & exact) / max(len(exact), 1)
    assert recall >= 0.9, (recall, len(exact))


def test_simhash_pairs_exact_recall(spark, neardup_docs):
    """Pigeonhole block bucketing finds EXACTLY the brute-force Hamming
    pairs (recall 1.0, precision 1.0) — vs the pure-Python twin."""
    from dataflow_flex_templates_spark.operators.dedup import simhash_pairs
    from dataflow_flex_templates_spark.testing.twins import (
        simhash_pairs_twin,
    )

    df = spark.createDataFrame(neardup_docs[["doc_id", "text"]])
    for r in (3, 10):
        got = sorted(tuple(row) for row in
                     simhash_pairs(df, max_hamming=r).collect())
        want = simhash_pairs_twin(
            sorted(zip(neardup_docs["doc_id"], neardup_docs["text"])),
            max_hamming=r)
        assert got == want, (r, len(got), len(want))
    # hamming of identical docs is 0
    dup = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["same words here"] * 2}))
    p = simhash_pairs(dup, max_hamming=0).toPandas()
    assert len(p) == 1 and p.iloc[0]["hamming"] == 0


def test_embedding_neardup_and_topk_vs_duckdb(spark, emb, sf_dir):
    from dataflow_flex_templates_spark.operators.dedup import embedding_neardup_pairs
    from dataflow_flex_templates_spark.operators.similarity import cosine_topk

    sample = emb.filter("vec_id < 100")
    got = embedding_neardup_pairs(sample, threshold=0.8).toPandas()
    oracle = duckdb.sql(f"""
        SELECT a.vec_id id_a, b.vec_id id_b,
               round(list_cosine_similarity(a.embedding, b.embedding), 6) cosine
        FROM '{sf_dir}/embeddings.parquet' a, '{sf_dir}/embeddings.parquet' b
        WHERE a.vec_id < b.vec_id AND a.vec_id < 100 AND b.vec_id < 100
          AND list_cosine_similarity(a.embedding, b.embedding) >= 0.8
    """).df()
    gs = {(r["id_a"], r["id_b"]) for _, r in got.iterrows()}
    os_ = {(r["id_a"], r["id_b"]) for _, r in oracle.iterrows()}
    assert gs == os_

    # top-k: query first 10 vectors against first 100
    q = emb.filter("vec_id < 10")
    topk = cosine_topk(sample, q, k=3).toPandas()
    ok = duckdb.sql(f"""
        WITH s AS (SELECT * FROM '{sf_dir}/embeddings.parquet' WHERE vec_id < 100),
             q AS (SELECT * FROM s WHERE vec_id < 10),
             sc AS (SELECT q.vec_id query_id, s.vec_id neighbor_id,
                    round(list_cosine_similarity(q.embedding, s.embedding),6) cosine,
                    row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.embedding, s.embedding) DESC,
                                s.vec_id ASC) rank
                    FROM q, s WHERE q.vec_id != s.vec_id)
        SELECT * FROM sc WHERE rank <= 3
    """).df()
    g = topk.sort_values(["query_id", "rank"]).reset_index(drop=True)
    o = ok.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (g["neighbor_id"].values == o["neighbor_id"].values).all()
    np.testing.assert_allclose(g["cosine"], o["cosine"], atol=1e-5)


def test_lsh_ann_recall(spark, emb):
    from dataflow_flex_templates_spark.operators.similarity import (
        cosine_topk,
        lsh_ann_topk,
    )

    vectors = emb.filter("vec_id < 200")
    q = emb.filter("vec_id < 20")
    exact = cosine_topk(vectors, q, k=5).toPandas()
    # random embeddings have weakly-similar top-k (cos≈0.3) → hyperplane
    # agreement p≈0.6; recall ≈ 1-(1-p^planes)^tables: 3×16 ⇒ ~0.97
    approx = lsh_ann_topk(vectors, q, k=5, dim=64,
                          n_planes=3, n_tables=16).toPandas()
    e = {(r["query_id"], r["neighbor_id"]) for _, r in exact.iterrows()}
    a = {(r["query_id"], r["neighbor_id"]) for _, r in approx.iterrows()}
    recall = len(e & a) / len(e)
    assert recall >= 0.7, recall   # ANN: tunable recall, sanity bound


def test_multimodal_stub_plumbing(spark):
    from dataflow_flex_templates_spark.operators.multimodal import (
        extract_media_features,
        frame_sample_plan,
    )
    import pyspark.sql.functions as F

    rows = [("m1", b"\x01\x02\x03\x04" * 10, "jpeg", 4, 4),
            ("m2", b"", "png", 2, 2),          # poison row → null feat
            ("m3", b"\xff" * 64, "jpeg", 8, 8)]
    df = spark.createDataFrame(rows, "media_id string, bytes binary, "
                                     "format string, width int, height int")
    out = extract_media_features(df).toPandas().set_index("media_id")
    assert out.loc["m1", "feat"] is not None and len(out.loc["m1", "feat"]) == 8
    assert out.loc["m2", "feat"] is None       # bad row skipped, not fatal
    assert out.loc["m3", "n_bytes"] == 64

    vid = spark.createDataFrame([("v1", 3500), ("v2", 400)],
                                "media_id string, dur_ms int")
    plan = frame_sample_plan(vid, every_ms=1000).toPandas().set_index("media_id")
    assert plan.loc["v1", "n_frames"] == 3
    assert plan.loc["v2", "n_frames"] == 1


def test_ivf_ann_recall(spark, emb):
    """IVF-FLAT ANN: recall@5 vs exact brute-force above threshold;
    deterministic across runs (hash-seeded centroids + Lloyd step)."""
    from dataflow_flex_templates_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    vecs = emb.filter("vec_id < 300")
    qs = emb.filter("vec_id < 12")
    exact = cosine_topk(vecs, qs, k=5).toPandas()
    approx = ivf_topk(vecs, qs, k=5, n_centroids=12, nprobe=4).toPandas()
    approx2 = ivf_topk(vecs, qs, k=5, n_centroids=12, nprobe=4).toPandas()
    assert approx.sort_values(["query_id", "rank"]).reset_index(drop=True) \
        .equals(approx2.sort_values(["query_id", "rank"])
                .reset_index(drop=True))

    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall


def test_winnow_fingerprints(spark, docs):
    """Winnowing rolling-hash fingerprints: Spark UDF == pure-numpy
    oracle per doc; near-identical docs share fingerprints, unrelated
    docs don't."""
    from dataflow_flex_templates_spark.operators.text import (
        winnow_fingerprints,
        winnow_fingerprints_np,
    )

    sub = docs.filter("doc_id < 40")
    got = {r["doc_id"]: list(r["fingerprints"])
           for r in winnow_fingerprints(sub).select(
               "doc_id", "fingerprints").collect()}
    for r in sub.select("doc_id", "text").collect():
        norm = " ".join((r["text"] or "").lower().split())
        assert got[r["doc_id"]] == winnow_fingerprints_np(norm), r["doc_id"]

    a = set(winnow_fingerprints_np(
        "the quick brown fox jumps over the lazy dog near the river"))
    b = set(winnow_fingerprints_np(
        "the quick brown fox leaps over the lazy dog near the river"))
    c = set(winnow_fingerprints_np(
        "entirely unrelated text with no overlap whatsoever present"))
    assert a & b and not (a & c)


def test_repetition_profile_closed_form(spark):
    """Repetition signals on constructed docs: exact fractions for a
    degenerate repeated doc, a clean doc, ties broken to the
    lexicographically smallest word, and 1-word docs defined."""
    from dataflow_flex_templates_spark.operators.text import (
        repetition_profile,
    )

    rows = [
        (0, "spam spam spam spam"),          # all one word
        (1, "alpha beta gamma delta"),       # no repetition
        (2, "bb aa bb aa"),                  # tie on count → 'aa'
        (3, "solo"),                         # single word, no 2-grams
    ]
    got = {r["doc_id"]: r for r in repetition_profile(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()}

    assert got[0]["top_word"] == "spam"
    assert got[0]["top_word_frac"] == 1.0
    # "spam spam" 2-gram occurs 3x (all dup) → frac 1.0
    assert got[0]["dup_2gram_frac"] == 1.0
    assert got[0]["keep_repetition"] is False

    assert got[1]["top_word_frac"] == round(5 / 19, 6)  # 'alpha'/'delta' tie → 'alpha'
    assert got[1]["top_word"] == "alpha"
    assert got[1]["dup_2gram_frac"] == 0.0

    assert got[2]["top_word"] == "aa"
    # "bb aa" ×2 dup, "aa bb" ×1 → dup chars 2*5 of total 3*5
    assert got[2]["dup_2gram_frac"] == round(10 / 15, 6)

    assert got[3]["top_word"] == "solo"
    assert got[3]["dup_2gram_frac"] == 0.0
    assert got[3]["keep_repetition"] is False  # top_word_frac 1.0


def test_pii_scan_counts_and_masking(spark):
    """PII counts + masking: emails masked before the ipv4 pattern can
    see their dotted domains; masked text is exact."""
    from dataflow_flex_templates_spark.operators.text import pii_scan

    rows = [
        (0, "mail a.b@x.co and c@y.org, call 555-123-4567, "
            "host 10.0.0.1"),
        (1, "no pii here"),
    ]
    got = {r["doc_id"]: r for r in pii_scan(
        spark.createDataFrame(rows, "doc_id long, text string")
    ).collect()}
    assert (got[0]["n_email"], got[0]["n_phone"], got[0]["n_ipv4"]) \
        == (2, 1, 1)
    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_ipv4"]) \
        == (0, 0, 0)
    import hashlib

    masked = ("mail [EMAIL] and [EMAIL], call [PHONE], host [IPV4]")
    assert got[0]["masked_md5"] == hashlib.md5(masked.encode()).hexdigest()
    assert got[1]["masked_md5"] == hashlib.md5(b"no pii here").hexdigest()


def test_deterministic_sampling(spark):
    """md5-prefix sampling: membership is a pure function of the key
    (identical across partitionings and engines), fractions land near
    target, strata compose, and edge fractions are exact."""
    import hashlib

    import pyspark.sql.functions as F

    from dataflow_flex_templates_spark.operators.sampling import (
        fraction_to_hex_threshold,
        sample_fraction,
        stratified_sample,
    )

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    got = {r["doc_id"] for r in sample_fraction(df, 0.3).collect()}
    # python twin of the same predicate
    thr = fraction_to_hex_threshold(0.3)
    want = {i for i in range(2000)
            if hashlib.md5(str(i).encode()).hexdigest()[:8] < thr}
    assert got == want
    assert 0.25 < len(got) / 2000 < 0.35
    # partitioning-independence
    got2 = {r["doc_id"]
            for r in sample_fraction(df.repartition(13), 0.3).collect()}
    assert got2 == got
    # exact edges
    assert sample_fraction(df, 0.0).count() == 0
    assert sample_fraction(df, 1.0).count() == 2000

    strat = df.withColumn(
        "source",
        F.concat(F.lit("s"), (F.col("doc_id") % 2).cast("string")))
    out = stratified_sample(strat, {"s0": 1.0, "s1": 0.0})
    rows = out.groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in rows} == {"s0": 1000}


def test_lang_id_ngram_profiles(spark):
    """Trigram-profile language ID: classifies short samples of each
    profiled language, falls back to 'unk' with zero trigram hits, and
    the per-language scores equal a direct Python count (the DuckDB
    oracle re-derives the same arithmetic on the driver board)."""
    from dataflow_flex_templates_spark.operators.text import (
        LANG_TRIGRAMS,
        lang_id_ngram,
    )

    rows = [
        (0, "the king and the queen are singing of the morning"),
        (1, "der richter und die leute verstehen die rechnung nicht"),
        (2, "les autres questions restent une affaire pour la cour"),
        (3, "los abogados de la corte piden que el juicio pare"),
        (4, "zzz qqq xxx"),
        (5, ""),
    ]
    got = {r["doc_id"]: r for r in lang_id_ngram(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}
    assert got[0]["lang"] == "en"
    assert got[1]["lang"] == "de"
    assert got[2]["lang"] == "fr"
    assert got[3]["lang"] == "es"
    assert got[4]["lang"] == "unk" and got[5]["lang"] == "unk"

    # score twin: python occurrence count over the same normalization
    import re

    for doc_id, text in rows:
        nt = re.sub(r"\s+", " ", text.strip()).lower()
        for lang, grams in LANG_TRIGRAMS.items():
            want = sum(nt.count(g) for g in grams)
            assert got[doc_id][f"score_{lang}"] == want, (doc_id, lang)


def test_cluster_duplicates_log_diameter_convergence(spark, caplog):
    """Pointer jumping makes convergence O(log diameter): a path
    component of diameter 100 (the crawl-mirror duplicate-chain shape)
    must converge well inside 10 rounds — plain min-label propagation
    would need 100 and trip the non-convergence warning."""
    import logging

    from dataflow_flex_templates_spark.operators.dedup import (
        cluster_duplicates,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "id_a long, id_b long")
    with caplog.at_level(
            logging.WARNING,
            logger="dataflow_flex_templates_spark.operators.dedup"):
        got = cluster_duplicates(pairs, max_iters=10).collect()
    assert not any("did NOT converge" in r.message for r in caplog.records)
    assert len(got) == 101
    assert all(r["cluster_rep"] == 0 for r in got)


def test_cluster_duplicates_union_find_oracle(spark, neardup_docs):
    """Connected-components dedup grouping == python union-find over the
    same exact-jaccard pairs."""
    from dataflow_flex_templates_spark.operators.dedup import (
        cluster_duplicates,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(neardup_docs[["doc_id", "text"]])
    pairs = ngram_jaccard_pairs(docs, threshold=0.18, n=3)
    got = {r["id"]: r["cluster_rep"]
           for r in cluster_duplicates(pairs).collect()}

    # union-find oracle
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    pl = pairs.collect()
    assert pl
    for r in pl:
        ra, rb = find(r["id_a"]), find(r["id_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want
    # representative is the min id of its component
    for x, rep in got.items():
        assert rep <= x


def test_embedding_neardup_lsh_recall(spark, emb):
    """LSH-prefiltered embedding near-dup: precision 1.0 (exact cosine
    verify) and recall vs the brute-force pairs above threshold."""
    from dataflow_flex_templates_spark.operators.dedup import (
        embedding_neardup_lsh,
        embedding_neardup_pairs,
    )

    vecs = emb.filter("vec_id < 300")
    exact = {(r["id_a"], r["id_b"])
             for r in embedding_neardup_pairs(vecs, threshold=0.3).collect()}
    approx = {(r["id_a"], r["id_b"])
              for r in embedding_neardup_lsh(
                  vecs, threshold=0.3, n_planes=4, n_tables=16).collect()}
    assert exact, "fixture produced no near-dup pairs"
    assert approx <= exact                      # precision 1.0
    recall = len(approx & exact) / len(exact)
    # cos 0.3 ≈ 72 deg → per-plane collision ~0.6; 4 planes x 16 tables
    # gives ~0.94 measured recall on the fixture
    assert recall >= 0.8, recall


def test_dedup_keep_filter(spark, neardup_docs):
    """dedup_keep retains exactly one representative per near-dup
    component plus all unpaired docs."""
    from dataflow_flex_templates_spark.operators.dedup import (
        dedup_keep,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(neardup_docs[["doc_id", "text"]])
    pairs = ngram_jaccard_pairs(docs, threshold=0.18, n=3)
    kept = {r["doc_id"] for r in dedup_keep(pairs, docs).collect()}
    paired = {r["id_a"] for r in pairs.collect()} | \
             {r["id_b"] for r in pairs.collect()}
    all_ids = set(neardup_docs["doc_id"])
    # unpaired docs always kept
    assert (all_ids - paired) <= kept
    # each component keeps exactly its min id
    from dataflow_flex_templates_spark.operators.dedup import (
        cluster_duplicates,
    )
    comp = {r["id"]: r["cluster_rep"]
            for r in cluster_duplicates(pairs).collect()}
    for x, rep in comp.items():
        assert (x in kept) == (x == rep)


def test_winnow_overlap_pairs(spark, neardup_docs):
    """Shared-fingerprint pair counts equal a pure-numpy recomputation;
    max_df drops boilerplate fingerprints but same-cluster pairs keep
    their rare shared substrings."""
    from dataflow_flex_templates_spark.operators.text import (
        winnow_fingerprints_np,
        winnow_overlap_pairs,
    )

    pdf = neardup_docs
    df = spark.createDataFrame(pdf[["doc_id", "text"]])
    got = {(r["id_a"], r["id_b"]): r["shared_fp"]
           for r in winnow_overlap_pairs(df, min_shared=2).collect()}

    fps = {}
    for _, r in pdf.iterrows():
        norm = " ".join((r["text"] or "").lower().split())
        fps[r["doc_id"]] = set(winnow_fingerprints_np(norm))
    ids = sorted(fps)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            n = len(fps[a] & fps[b])
            if n >= 2:
                want[(a, b)] = n
    assert got == want
    assert len(want) > 0

    # DF-bounded index: output is a subset with counts never larger
    bounded = {(r["id_a"], r["id_b"]): r["shared_fp"]
               for r in winnow_overlap_pairs(df, min_shared=2,
                                             max_df=10).collect()}
    assert set(bounded) <= set(want)
    assert all(bounded[k] <= want[k] for k in bounded)


def test_image_codecs_roundtrip_and_stats(spark):
    """Real uncompressed-image path: encode→decode identity for
    PPM/PGM/BMP (incl. BMP row padding at w%4≠0), nearest resize
    matches direct index math, poison rows yield nulls not failures."""
    import numpy as np

    from dataflow_flex_templates_spark.operators.multimodal import (
        decode_image_np,
        encode_bmp,
        encode_pgm,
        encode_ppm,
        image_stats,
        resize_nearest_np,
    )
    from dataflow_flex_templates_spark.testing.images import doc_image_np

    rng = np.random.default_rng(9)
    for w, h in [(16, 8), (17, 9), (18, 10), (31, 15)]:  # padding cases
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_image_np(encode_ppm(img), "ppm") == img).all()
        assert (decode_image_np(encode_bmp(img), "bmp") == img).all()
        gray = img[:, :, 0]
        dec = decode_image_np(encode_pgm(gray), "pgm")
        assert (dec[:, :, 0] == gray).all() and (dec[:, :, 2] == gray).all()

    img, w, h, _ = doc_image_np(7)
    small = resize_nearest_np(img, 8, 4)
    ys = (np.arange(4) * h) // 4
    xs = (np.arange(8) * w) // 8
    assert (small == img[ys[:, None], xs[None, :]]).all()

    rows = [("good", encode_ppm(img), "ppm"),
            ("poison", b"NOT AN IMAGE", "ppm"),
            ("compressed", b"\x89PNG...", "png")]
    out = {r["media_id"]: r for r in image_stats(
        spark.createDataFrame(
            rows, "media_id string, bytes binary, format string")).collect()}
    assert out["good"]["mean_r"] is not None
    assert out["poison"]["mean_r"] is None
    assert out["compressed"]["mean_r"] is None  # no codec → null, no crash


def test_compressed_codec_swap_point_contract(spark):
    """The documented one-line swap for JPEG/PNG on a real cluster:
    register_codec() plugs a decoder into image_stats /
    extract_media_features via the closure-captured registry snapshot,
    and the stats flow through unchanged — proven here with a fake
    'jpeg' decoder (payload = raw RGB with a 4-byte w,h header) since
    the sandbox has no codec libs."""
    import numpy as np

    from dataflow_flex_templates_spark.operators.multimodal import (
        extract_media_features,
        image_stats,
        register_codec,
        unregister_codec,
    )

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    payload = (img.shape[1].to_bytes(2, "big")
               + img.shape[0].to_bytes(2, "big") + img.tobytes())

    def fake_jpeg(buf: bytes) -> np.ndarray:
        w = int.from_bytes(buf[:2], "big")
        h = int.from_bytes(buf[2:4], "big")
        return np.frombuffer(buf, np.uint8, w * h * 3, 4).reshape(h, w, 3)

    rows = [("j", payload, "jpeg")]
    schema = "media_id string, bytes binary, format string"

    register_codec("JPEG", fake_jpeg)  # case-insensitive registration
    try:
        got = image_stats(
            spark.createDataFrame(rows, schema)).collect()[0]
        assert (got["width"], got["height"]) == (9, 6)
        m = img.reshape(-1, 3).mean(axis=0)
        assert abs(got["mean_r"] - m[0]) < 1e-9
        assert abs(got["mean_b"] - m[2]) < 1e-9
        feat = extract_media_features(
            spark.createDataFrame(rows, schema)).collect()[0]["feat"]
        assert feat[5] == 9.0 and feat[6] == 6.0  # real decode, not stub
    finally:
        unregister_codec("jpeg")

    # after unregistration the same payload is a poison row again
    # (null stats) — the stub/fallback path is unchanged
    got2 = image_stats(spark.createDataFrame(rows, schema)).collect()[0]
    assert got2["mean_r"] is None


def test_video_frame_extraction(spark):
    """Raw-video offset math: extracted frames are pixel-exact; the
    stats op emits correct means/motion and flags truncated payloads
    as poison rows."""
    import numpy as np

    from dataflow_flex_templates_spark.operators.multimodal import (
        decode_video_frame_np,
        video_frame_stats,
    )
    from dataflow_flex_templates_spark.testing.images import doc_video_np

    vid, w, h, nf = doc_video_np(11)
    buf = vid.tobytes()
    for k in range(nf):
        assert (decode_video_frame_np(buf, w, h, k) == vid[k]).all()

    rows = [("v", buf, w, h, nf),
            ("truncated", buf[: w * h * 2 - 5], w, h, nf)]
    df = spark.createDataFrame(
        rows, "media_id string, bytes binary, width int, height int, "
              "n_frames int")
    out = video_frame_stats(df, every_n=1).collect()
    good = sorted((r["frame_idx"], r["mean_v"], r["motion"])
                  for r in out if r["media_id"] == "v")
    assert len(good) == nf
    for k, mean_v, motion in good:
        assert abs(mean_v - ((w - 1) / 2 + k * (h - 1) / 2)) < 1e-9
        assert abs(motion - (0.0 if k == 0 else (h - 1) / 2)) < 1e-9
    poison = [r for r in out if r["media_id"] == "truncated"]
    assert len(poison) >= 1 and poison[-1]["mean_v"] is None


def test_chunk_documents_closed_form(spark):
    """Chunk boundaries, overlap, and remainder tail verified against
    hand-computed values; short/empty docs handled."""
    import hashlib

    from dataflow_flex_templates_spark.operators.text import (
        chunk_documents,
    )

    toks = [f"w{i}" for i in range(25)]
    rows = [
        (1, " ".join(toks)),        # 25 tokens → chunks of 10/step 6
        (2, "one two three"),       # 3 tokens → single chunk
        (3, ""),                    # empty → no chunks
        (4, "   "),                 # whitespace-only → no chunks
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=10, overlap=4)
    got = {(r["doc_id"], r["chunk_idx"]):
           (r["start_tok"], r["chunk_len"], r["chunk_md5"])
           for r in out.collect()}
    # doc 1: n=25, step=6 → nc = 1 + ceil(15/6) = 4; starts 0,6,12,18
    assert {k for k in got if k[0] == 1} == {(1, i) for i in range(4)}
    for idx, (start, length) in enumerate([(0, 10), (6, 10),
                                           (12, 10), (18, 7)]):
        s, ln, md = got[(1, idx)]
        assert (s, ln) == (start, length)
        exp = " ".join(toks[start:start + 10])
        assert md == hashlib.md5(exp.encode()).hexdigest()
    # consecutive chunks overlap by exactly 4 tokens
    assert got[(2, 0)] == (0, 3,
                           hashlib.md5(b"one two three").hexdigest())
    assert not any(k[0] in (3, 4) for k in got)


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from dataflow_flex_templates_spark.operators.text import (
        chunk_documents,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)


def test_decontaminate_ngram_overlap(spark):
    """A doc is contaminated iff it shares a full word n-gram with the
    benchmark — substring/partial overlaps don't count; the benchmark
    side is broadcast (plan asserted)."""
    from dataflow_flex_templates_spark.operators.text import (
        decontaminate,
    )

    bench_text = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, f"prefix words {bench_text} suffix words"),   # contains 9-tok bench → hits
        (2, "the quick brown fox jumps over the lazy"),   # 8-gram prefix → hit
        (3, "quick brown fox jumps over the lazy cat"),   # differs in 8th token
        (4, "completely unrelated text with enough tokens here ok"),
        (5, ""),                                          # empty
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(100, bench_text)],
                                  "doc_id long, text string")
    out = decontaminate(docs, bench, n=8)
    got = {r["doc_id"]: (r["hit_ngrams"], r["contaminated"])
           for r in out.collect()}
    assert got[1] == (2, True)     # both 8-grams of the 9-token bench
    assert got[2] == (1, True)
    assert got[3] == (0, False)
    assert got[4] == (0, False)
    assert got[5] == (0, False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_pack_chunks_budget_invariants(spark):
    """Packing invariants on the real chunk stream: offsets stay in
    [0, budget); within a (shard, seq) tokens are contiguous; chunks
    never cross shards; straddles flags exactly the budget-crossing
    chunks; and full sequences carry exactly `budget` tokens."""
    from dataflow_flex_templates_spark.operators.text import (
        chunk_documents,
        pack_chunks,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    chunks = chunk_documents(docs, chunk_tokens=40, overlap=8)
    budget = 128
    rows = (pack_chunks(chunks, budget_tokens=budget, n_shards=4)
            .orderBy("shard", "doc_id", "chunk_idx").collect())
    assert rows
    pos = {}
    for r in rows:
        assert r["shard"] == r["doc_id"] % 4
        assert 0 <= r["offset"] < budget
        # global token position within the shard's concat stream
        gpos = pos.get(r["shard"], 0)
        assert r["seq_id"] == gpos // budget
        assert r["offset"] == gpos % budget
        assert r["straddles"] == (
            (gpos + r["chunk_len"] - 1) // budget != gpos // budget)
        pos[r["shard"]] = gpos + r["chunk_len"]


def test_chunk_dedup_keeper_and_counts(spark):
    """Duplicate chunks collapse to the lowest (doc_id, chunk_idx);
    counts are exact."""
    from dataflow_flex_templates_spark.operators.text import chunk_dedup

    rows = [
        (1, 0, 0, 5, "aaa"), (1, 1, 3, 5, "bbb"),
        (2, 0, 0, 5, "aaa"), (3, 2, 6, 5, "aaa"), (3, 0, 0, 2, "ccc"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, chunk_idx long, start_tok long, "
              "chunk_len long, chunk_md5 string")
    got = {r["chunk_md5"]: (r["keeper_id"], r["keeper_chunk_idx"],
                            r["n_dupes"])
           for r in chunk_dedup(df).collect()}
    assert got == {"aaa": (1, 0, 3), "bbb": (1, 1, 1), "ccc": (3, 0, 1)}


def test_edit_distance_pairs_semantics(spark):
    """Levenshtein verification: reordered-token near-dups score high,
    unrelated docs never pair, and lev/sim values are exact."""
    from dataflow_flex_templates_spark.operators.dedup import (
        edit_distance_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, base.replace("lazy", "hazy")),        # 1 substitution
        (3, "Completely different material about spark plans"),
        (4, base + " tail"),                      # small append
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): (r["lev"], r["sim_permille"])
           for r in edit_distance_pairs(df, max_df=10,
                                        min_sim_permille=700).collect()}
    n = len(base)
    assert got[(1, 2)] == (1, (n - 1) * 1000 // n)
    assert got[(1, 4)] == (5, n * 1000 // (n + 5))
    assert not any(3 in k for k in got)


def test_vocabulary_ranking_and_df(spark):
    """Counts, doc frequency, and the deterministic tie-break."""
    from dataflow_flex_templates_spark.operators.text import vocabulary

    rows = [(1, "b b a c"), (2, "a b  C."), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["rank"], r["word"], r["n_occurrences"], r["n_docs"])
           for r in vocabulary(df, k=10).orderBy("rank").collect()]
    # tokens are norm_text whitespace tokens (case-folded, punctuation
    # KEPT — same contract as token_count): b:3(2 docs), then the
    # a < c < c. tie-break on count 1-vs-2
    assert got == [(1, "b", 3, 2), (2, "a", 2, 2),
                   (3, "c", 1, 1), (4, "c.", 1, 1)]
    # k truncates deterministically
    top2 = [r["word"] for r in vocabulary(df, k=2).collect()]
    assert top2 == ["b", "a"]


def test_oov_stats_counts(spark):
    """OOV counts against an explicit vocab; empty docs report (0, 0);
    the vocab side is broadcast."""
    from dataflow_flex_templates_spark.operators.text import oov_stats

    docs = spark.createDataFrame(
        [(1, "a b a zz"), (2, "zz yy"), (3, "")],
        "doc_id long, text string")
    vocab = spark.createDataFrame([("a",), ("b",)], "word string")
    out = oov_stats(docs, vocab)
    got = {r["doc_id"]: (r["n_tokens"], r["oov_tokens"])
           for r in out.collect()}
    assert got == {1: (4, 1), 2: (2, 2), 3: (0, 0)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_compression_stats_signal(spark):
    """Repetitive text flags, natural-ish text doesn't; empty docs
    read as ratio 1000; values match the twin exactly."""
    from dataflow_flex_templates_spark.operators.text import (
        compression_profile_np,
        compression_stats,
    )

    natural = ("the quarterly report shows varied results across seven "
               "regions with notable divergence between urban retail "
               "and rural wholesale channels during the spring months")
    rows = [(1, "spam " * 200), (2, natural), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_stats(df).collect()}
    assert got[1]["repetitive"] and not got[2]["repetitive"]
    assert got[3]["ratio_permille"] == 1000 and got[3]["raw_len"] == 0
    for did, text in rows:
        raw, comp = compression_profile_np(text)
        assert (got[did]["raw_len"], got[did]["comp_len"]) == (raw, comp)


def test_salient_terms_integer_scores(spark):
    """Rarity-weighted top-k: hand-checkable integer scores, exact
    ties broken by term, rare terms dominate frequent ones."""
    from dataflow_flex_templates_spark.operators.text import salient_terms

    docs = spark.createDataFrame(
        [(1, "alpha alpha common"), (2, "beta common"),
         (3, "common common gamma")],
        "doc_id long, text string")
    out = {(r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"],
                                      r["score_q"])
           for r in salient_terms(docs, k=2, scale=600).collect()}
    # df: alpha 1, beta 1, gamma 1, common 3 → weights 600, 600, 600, 200
    assert out[(1, 1)] == ("alpha", 2, 1, 1200)   # tf 2 · 600
    assert out[(1, 2)] == ("common", 1, 3, 200)
    assert out[(2, 1)] == ("beta", 1, 1, 600)
    assert out[(3, 1)] == ("gamma", 1, 1, 600)
    assert out[(3, 2)] == ("common", 2, 3, 400)


def test_weighted_sample_bias_and_determinism(spark):
    """Heavier rows must be overrepresented, the selection must be a
    pure function of (ids, weights), and priorities must follow the
    integer recurrence exactly."""
    import hashlib

    from dataflow_flex_templates_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, 100 if i % 10 == 0 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [(r["doc_id"], r["priority_q"])
           for r in weighted_sample(df, k=100, weight_col="w").collect()]

    def prio(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:7], 16)
        return (h * 10**9) // w

    want = sorted(((prio(i, w), i) for i, w in rows))[:100]
    assert got == [(i, p) for p, i in want]
    # 10% of rows carry 100x weight → they should dominate the sample
    heavy = sum(1 for i, _ in got if i % 10 == 0)
    assert heavy > 60
    # zero/negative weights never qualify
    df2 = spark.createDataFrame([(1, 0), (2, -5), (3, 7)],
                                "doc_id long, w long")
    assert [r["doc_id"] for r in
            weighted_sample(df2, 10, "w").collect()] == [3]


def test_cusum_kernel_and_batch(spark):
    """Hand-traced CUSUM: accumulation, reset-on-alarm, floor at 0 —
    and the batch operator reproduces the kernel per key with
    unsorted input."""
    from datetime import datetime, timezone

    from dataflow_flex_templates_spark.operators.changepoint import (
        cusum_alarms,
        run_cusum,
    )

    # target 5, slack 1, threshold 6: x=10 → S=4; x=9 → S=7 ALARM,
    # reset; x=2 → floor at 0; x=12 → S=6 ALARM
    items = [(1, 10), (2, 9), (3, 2), (4, 12)]
    alarms, s = run_cusum(items, target=5, slack=1, threshold=6)
    assert alarms == [(2, 7), (4, 6)] and s == 0
    # carried state across chunks == one-shot
    a1, s1 = run_cusum(items[:2], 5, 1, 6)
    a2, s2 = run_cusum(items[2:], 5, 1, 6, s=s1)
    assert a1 + a2 == alarms and s2 == s

    def t(us):
        return datetime.fromtimestamp(us / 1e6, tz=timezone.utc)

    rows = [("a", t(u), x) for u, x in items[::-1]]  # reversed arrival
    rows += [("b", t(1), 100)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, x long")
    got = sorted((r["k"], r["ts"].timestamp(), r["s_q"]) for r in
                 cusum_alarms(df, "k", "x", target=5, slack=1,
                              threshold=6).collect())
    assert got == [("a", 2e-6, 7), ("a", 4e-6, 6), ("b", 1e-6, 94)]


def test_corpus_health_rollup_levels(spark):
    """ROLLUP levels carry exact integer measures, and the explicit
    gid bits disambiguate a NULL dimension value from a rolled-up
    one (the classic ROLLUP ambiguity)."""
    from dataflow_flex_templates_spark.operators.text import corpus_health

    rows = [(1, "en", "web", 10), (2, "en", "web", 30),
            (3, "en", "book", 5), (4, "de", "web", 7),
            (5, None, "web", 100)]  # NULL lang ≠ rolled-up lang
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long")
    out = {(r["lang"], r["source"], r["gid"]): r
           for r in corpus_health(df).collect()}
    leaf = out[("en", "web", 0)]
    assert (leaf["n_docs"], leaf["sum_chars"], leaf["max_chars"],
            leaf["avg_chars_q"]) == (2, 40, 30, 20)
    sub = out[("en", None, 1)]           # source rolled up
    assert (sub["n_docs"], sub["sum_chars"]) == (3, 45)
    # NULL-lang leaf (gid 0) and NULL-lang subtotal (gid 1) are
    # distinct rows ONLY because gid disambiguates them.
    assert out[(None, "web", 0)]["n_docs"] == 1
    assert out[(None, None, 1)]["n_docs"] == 1
    total = out[(None, None, 3)]
    assert (total["n_docs"], total["sum_chars"], total["max_chars"],
            total["avg_chars_q"]) == (5, 152, 100, 30)
    assert len(out) == 8  # 4 leaves + 3 lang subtotals + grand total


def test_bigram_novelty_hand_counts(spark):
    """Hand-verifiable corpus: with k=1 the head is the most frequent
    bigram ('a b', tie-broken by name); everything else is novel."""
    from dataflow_flex_templates_spark.operators.text import (
        bigram_novelty,
    )

    rows = [(1, "a b a b"),     # bigrams: a b, b a, a b
            (2, "a b c"),       # bigrams: a b, b c
            (3, "x"),           # no bigrams → absent from output
            (4, "")]            # no tokens → absent
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in bigram_novelty(df, k=1).collect()}
    assert set(out) == {1, 2}
    r1 = out[1]
    assert (r1["n_bigrams"], r1["n_novel"], r1["n_novel_distinct"],
            r1["novelty_permille"]) == (3, 1, 1, 333)
    r2 = out[2]
    assert (r2["n_bigrams"], r2["n_novel"], r2["n_novel_distinct"],
            r2["novelty_permille"]) == (2, 1, 1, 500)


def test_pivot_matrix_cells_and_margins(spark):
    """Explicit-values pivot: empty cells coalesce to 0, undeclared
    pivot values stay out of both the columns AND the margins."""
    from dataflow_flex_templates_spark.operators.relational import (
        pivot_matrix,
    )

    rows = [("s1", "en", 10), ("s1", "en", 20), ("s1", "de", 5),
            ("s2", "de", 7), ("s2", "xx", 1000)]  # xx undeclared
    df = spark.createDataFrame(rows, "source string, lang string, n_chars long")
    out = {r["source"]: r for r in pivot_matrix(
        df, "source", "lang", ["de", "en"], "n_chars").collect()}
    s1, s2 = out["s1"], out["s2"]
    assert (s1["n_de"], s1["n_en"], s1["sum_de"], s1["sum_en"],
            s1["n_total"], s1["sum_total"]) == (1, 2, 5, 30, 3, 35)
    # s2: en cell is empty → 0 not null; 'xx' invisible everywhere
    assert (s2["n_de"], s2["n_en"], s2["sum_de"], s2["sum_en"],
            s2["n_total"], s2["sum_total"]) == (1, 0, 7, 0, 1, 7)


def test_snapshot_diff_statuses(spark):
    """Full-outer fingerprint diff: added/removed/changed/unchanged,
    NULL vs empty-string compare values must NOT collide (0x00
    sentinel), multi-column fingerprints are order-sensitive."""
    from dataflow_flex_templates_spark.operators.relational import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None), (5, "")],
        "k long, v string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, ""), (5, None), (6, "f")],
        "k long, v string")
    out = {r["k"]: r["status"]
           for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "changed",   # NULL -> '' is a change, not equal
                   5: "changed", 6: "added"}

    # two compare columns: swap must read as changed
    old2 = spark.createDataFrame([(1, "x", "y")], "k long, a string, b string")
    new2 = spark.createDataFrame([(1, "y", "x")], "k long, a string, b string")
    r = snapshot_diff(old2, new2, ["k"], ["a", "b"]).collect()[0]
    assert r["status"] == "changed"

    # prefix-free encoding regressions: values containing a would-be
    # separator must not alias across the column boundary, and NULL
    # must differ from any literal sentinel-like string
    old3 = spark.createDataFrame(
        [(1, "a\x1fb", "c"), (2, None, "z")],
        "k long, a string, b string")
    new3 = spark.createDataFrame(
        [(1, "a", "b\x1fc"), (2, "N", "z")],
        "k long, a string, b string")
    got = {r["k"]: r["status"]
           for r in snapshot_diff(old3, new3, ["k"], ["a", "b"]).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_wer_stats_dataframe(spark):
    """WER table over a pair DataFrame: known S/D/I mixes, NULL
    permille on an empty reference (WER undefined, not 0), case/
    whitespace-insensitive tokenization."""
    from dataflow_flex_templates_spark.operators.asr import wer_stats

    rows = [(1, "the cat sat", "the cat sat"),        # exact
            (2, "the cat sat", "the dog sat"),        # 1 sub
            (3, "a b c d", "a c d"),                  # 1 del
            (4, "a b", "a x b y"),                    # 2 ins
            (5, "", "hello world"),                   # empty ref
            (6, "A  B", "a b")]                       # norm equal
    df = spark.createDataFrame(rows, "doc_id long, ref string, hyp string")
    out = {r["doc_id"]: r for r in wer_stats(df).collect()}
    assert (out[1]["wer_distance"], out[1]["wer_permille"]) == (0, 0)
    assert (out[2]["wer_distance"], out[2]["wer_permille"]) == (1, 333)
    assert (out[3]["wer_distance"], out[3]["ref_words"]) == (1, 4)
    assert (out[4]["wer_distance"], out[4]["hyp_words"]) == (2, 4)
    assert out[5]["wer_distance"] == 2
    assert out[5]["wer_permille"] is None
    assert out[6]["wer_distance"] == 0


def test_word_timestamps_boundaries(spark):
    """Integer-exact word timing: last word ends exactly at dur_ms,
    boundaries are monotone and gap-free, empty transcripts vanish."""
    from dataflow_flex_templates_spark.operators.asr import (
        word_timestamps,
    )

    df = spark.createDataFrame(
        [(1, 9000, "a bb ccc dddd eeeee ffffff ggggggg"),
         (2, 5000, "   "),            # whitespace-only -> 0 rows
         (3, 100, "one")],
        "doc_id long, dur_ms long, text string")
    out = word_timestamps(df).orderBy("doc_id", "word_idx").collect()
    assert {r["doc_id"] for r in out} == {1, 3}
    d1 = [r for r in out if r["doc_id"] == 1]
    assert d1[0]["start_ms"] == 0 and d1[-1]["end_ms"] == 9000
    for prev, cur in zip(d1, d1[1:]):
        assert prev["end_ms"] == cur["start_ms"]      # gap-free
        assert cur["start_ms"] <= cur["end_ms"]
    # proportional-to-length: 'dddd' covers cum 6..10 of 28 chars
    assert (d1[3]["start_ms"], d1[3]["end_ms"]) == (1928, 3214)
    d3 = [r for r in out if r["doc_id"] == 3]
    assert (d3[0]["start_ms"], d3[0]["end_ms"]) == (0, 100)


def test_subtitle_cues_grid_and_cps(spark):
    """Cue grid: words grouped by start bucket in timeline order,
    tight start/end, zero-duration cues -> NULL cps, cue monotone."""
    from dataflow_flex_templates_spark.operators.asr import (
        subtitle_cues,
    )

    df = spark.createDataFrame(
        [(5, 9000, "a bb ccc dddd eeeee ffffff ggggggg"),
         (4, 0, "zero duration words"),     # all words at ms 0
         (3, 5000, " ")],                   # no words -> no cues
        "doc_id long, dur_ms long, text string")
    out = subtitle_cues(df, cue_ms=3000).orderBy(
        "doc_id", "cue_idx").collect()
    d5 = [r for r in out if r["doc_id"] == 5]
    assert [r["cue_idx"] for r in d5] == [0, 1, 2]
    assert [r["text"] for r in d5] == [
        "a bb ccc dddd", "eeeee ffffff", "ggggggg"]
    assert d5[0]["start_ms"] == 0 and d5[-1]["end_ms"] == 9000
    # adjacent cues share the word boundary (tight, not grid-aligned)
    assert d5[0]["end_ms"] == d5[1]["start_ms"] == 3214
    assert all(r["cps_x10"] > 0 for r in d5)
    d4 = [r for r in out if r["doc_id"] == 4]
    assert len(d4) == 1 and d4[0]["n_words"] == 3
    assert d4[0]["cps_x10"] is None          # zero-duration cue
    assert not [r for r in out if r["doc_id"] == 3]


def test_word_fold_max_words_poison(spark):
    """max_words overflow guard: transcripts beyond the cap skip the
    O(words²) fold and surface as ONE all-NULL-payload poison row per
    id (word_timestamps AND subtitle_cues), while rows under the cap
    are byte-identical to the unguarded output; invalid caps raise."""
    import pytest as _pytest

    from dataflow_flex_templates_spark.operators.asr import (
        subtitle_cues,
        word_timestamps,
    )

    long_text = " ".join(f"w{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, 9000, "a bb ccc dddd"),
         (2, 60_000, long_text)],            # 50 words > max_words=8
        "doc_id long, dur_ms long, text string")

    wt = word_timestamps(df, max_words=8).orderBy(
        "doc_id", "word_idx").collect()
    d1 = [r for r in wt if r["doc_id"] == 1]
    d2 = [r for r in wt if r["doc_id"] == 2]
    assert len(d1) == 4 and d1[-1]["end_ms"] == 9000   # under cap: real
    assert len(d2) == 1                                 # poison marker
    assert all(d2[0][c] is None
               for c in ("word_idx", "word", "start_ms", "end_ms"))

    sc = subtitle_cues(df, cue_ms=3000, max_words=8).collect()
    c1 = [r for r in sc if r["doc_id"] == 1]
    c2 = [r for r in sc if r["doc_id"] == 2]
    assert len(c1) >= 1 and all(r["text"] is not None for r in c1)
    assert len(c2) == 1
    assert all(c2[0][c] is None
               for c in ("cue_idx", "start_ms", "end_ms", "n_words",
                         "text", "cps_x10"))

    # default cap leaves a 50-word transcript untouched (oracle parity)
    assert word_timestamps(df).filter("doc_id = 2").count() == 50

    with _pytest.raises(ValueError, match="max_words"):
        word_timestamps(df, max_words=0)
    with _pytest.raises(ValueError, match="max_words"):
        subtitle_cues(df, max_words=-1)


def test_srt_render_sequence_and_timing(spark):
    """SRT rendering: per-doc sequence numbers are 1-based contiguous
    even when cue grid cells are skipped; the timing line is
    %02d/%03d-padded div/mod millisecond algebra; the block is
    seq\\ntiming\\ntext with NULL propagation (poison rows render a
    NULL block, not a fragment)."""
    from dataflow_flex_templates_spark.operators.asr import (
        srt_render,
        subtitle_cues,
    )

    # one word per second for 10 s → words at 0,1,...; 3 s cues at
    # buckets 0,1,2,3 (contiguous here); plus a >1 h doc to exercise
    # the HH field, and a poison doc via max_words
    df = spark.createDataFrame(
        [(1, 12000, "aa bb cc dd ee ff gg hh ii jj kk ll"),
         (2, 7_260_000, "x " * 3),       # 2 h 1 min spread over 3 words
         (3, 9000, " ".join(f"w{i}" for i in range(40)))],
        "doc_id long, dur_ms long, text string")
    out = srt_render(subtitle_cues(df, cue_ms=3000, max_words=30))
    rows = {(r["doc_id"], r["srt_seq"]): r for r in out.collect()}

    d1 = sorted(k[1] for k in rows if k[0] == 1)
    assert d1 == list(range(1, len(d1) + 1))     # contiguous, 1-based
    first = rows[(1, 1)]
    assert first["timing"] == "00:00:00,000 --> 00:00:03,000"
    assert first["srt_block"] == f"1\n{first['timing']}\n{first['text']}"

    d2 = [rows[k] for k in rows if k[0] == 2]
    assert any(r["timing"].startswith("01:") or r["timing"].startswith(
        "02:") for r in d2)                       # hour field engaged

    d3 = [rows[k] for k in rows if k[0] == 3]
    assert len(d3) == 1 and d3[0]["srt_block"] is None  # poison → NULL


def test_mixture_plan_temperature_algebra(spark):
    """Mixture planning: natural shares are integer-exact ppm; alpha<1
    flattens the mix (small source gets MORE than natural share, big
    source less); weights sum to 1; budget splits by weight; alpha<=0
    raises."""
    import pytest as _pytest

    from dataflow_flex_templates_spark.operators.sampling import (
        mixture_plan,
    )

    rows = [("big", 100) for _ in range(90)] + [("small", 100)
                                                for _ in range(10)]
    df = spark.createDataFrame(rows, "source string, n long")
    out = {r["source"]: r for r in mixture_plan(
        df, "source", "n", alpha=0.5, budget_tokens=1000).collect()}

    assert out["big"]["natural_share_ppm"] == 900_000
    assert out["small"]["natural_share_ppm"] == 100_000
    w_big, w_small = out["big"]["weight"], out["small"]["weight"]
    assert abs(w_big + w_small - 1.0) < 1e-12
    assert 0.1 < w_small < 0.5 and w_small > 0.1   # flattened up
    assert w_big < 0.9                              # flattened down
    assert abs(out["big"]["planned_tokens"] - 1000 * w_big) < 1e-9
    # small source must repeat ~0.25x vs big's ~0.08x plan density
    assert (out["small"]["epochs_x1000"]
            > out["big"]["epochs_x1000"])

    with _pytest.raises(ValueError, match="alpha"):
        mixture_plan(df, "source", "n", alpha=0.0)


def test_specaugment_plan_determinism_and_bounds(spark):
    """SpecAugment planning: masks are in-range (time mask inside the
    clip, freq mask inside n_mels), deterministic across re-runs, time
    width <= min(max_t, n_frames//2), and zero-frame rows emit NULL
    masks."""
    from dataflow_flex_templates_spark.operators.asr import (
        specaugment_plan,
    )

    df = spark.createDataFrame(
        [(i, 40 * (i * 37 % 300)) for i in range(200)] + [(999, 0)],
        "doc_id long, dur_ms long")
    out = specaugment_plan(df).collect()
    a = {r["doc_id"]: r for r in out}
    for r in out:
        if r["doc_id"] == 999:
            assert all(r[c] is None for c in
                       ("t_mask_start", "t_mask_w",
                        "f_mask_start", "f_mask_w"))
            continue
        if r["n_frames"] < 1:
            continue
        assert 0 <= r["t_mask_w"] <= min(100, r["n_frames"] // 2)
        assert 0 <= r["t_mask_start"] <= r["n_frames"] - r["t_mask_w"]
        assert 0 <= r["f_mask_w"] <= 27
        assert 0 <= r["f_mask_start"] <= 80 - r["f_mask_w"] - 1
    b = {r["doc_id"]: r for r in specaugment_plan(df).collect()}
    assert a == b                                   # plan, not draw


def test_pack_clip_batches_padding_economics(spark):
    """Sorted batching: batches are cut from per-shard duration order,
    padded_ms = max*count, and total padding waste is never worse
    than arrival-order batching on the same shards."""
    from dataflow_flex_templates_spark.operators.audio_pack import (
        pack_clip_batches,
    )

    # one shard (n_shards=1) so the economics are easy to read:
    # durs 100..1600 step 100, batch_size=4 -> 4 batches of 4
    rows = [(i, ((i * 7) % 16 + 1) * 100) for i in range(16)]
    df = spark.createDataFrame(rows, "clip_id long, dur_ms int")
    out = pack_clip_batches(df, batch_size=4, n_shards=1).collect()
    assert len(out) == 4
    by_batch = {r["batch_id"]: r for r in out}
    # sorted order -> batch 0 holds durs 100..400, batch 3 1300..1600
    assert by_batch[0]["max_dur_ms"] == 400
    assert by_batch[3]["max_dur_ms"] == 1600
    for r in out:
        assert r["n_clips"] == 4
        assert r["padded_ms"] == r["max_dur_ms"] * 4
        assert 0 <= r["waste_permille"] < 1000
    # sorted-batch total padded time strictly beats one arrival-order
    # shuffle of the same clips into 4er batches (worst-case mixing)
    sorted_padded = sum(r["padded_ms"] for r in out)
    durs = [d for _, d in rows]
    arrival_padded = sum(max(durs[i:i + 4]) * len(durs[i:i + 4])
                         for i in range(0, 16, 4))
    assert sorted_padded <= arrival_padded


def test_snapshot_diff_randomized_consistency(spark):
    """Seeded random snapshots: statuses must equal the set-algebra
    ground truth computed independently in Python, and the diff must
    partition the key universe exactly."""
    import random

    from dataflow_flex_templates_spark.operators.relational import (
        snapshot_diff,
    )

    rnd = random.Random(42)
    vals = ["a", "b", "c", None, ""]
    old = {k: rnd.choice(vals) for k in range(300) if rnd.random() < 0.7}
    new = {k: rnd.choice(vals) for k in range(300) if rnd.random() < 0.7}
    old_df = spark.createDataFrame(list(old.items()), "k long, v string")
    new_df = spark.createDataFrame(list(new.items()), "k long, v string")
    got = {r["k"]: r["status"]
           for r in snapshot_diff(old_df, new_df, ["k"], ["v"]).collect()}
    expect = {}
    for k in set(old) | set(new):
        if k not in old:
            expect[k] = "added"
        elif k not in new:
            expect[k] = "removed"
        elif old[k] != new[k]:
            expect[k] = "changed"
        else:
            expect[k] = "unchanged"
    assert got == expect


def test_top_n_per_group(spark):
    """Grouped top-N: deterministic under ties via the total order,
    groups smaller than n return all rows, rank is 1-based."""
    from pyspark.sql import functions as F

    from dataflow_flex_templates_spark.operators.relational import (
        top_n_per_group,
    )

    rows = [("g1", 1, 50), ("g1", 2, 90), ("g1", 3, 90), ("g1", 4, 10),
            ("g2", 5, 7)]
    df = spark.createDataFrame(rows, "g string, id long, score long")
    out = top_n_per_group(
        df, ["g"], [F.col("score").desc(), F.col("id").asc()], 2).collect()
    got = {(r["g"], r["id"]): r["rnk"] for r in out}
    # tie on score 90 -> id 2 then id 3; id 1 (score 50) is cut
    assert got == {("g1", 2): 1, ("g1", 3): 2, ("g2", 5): 1}


def test_segment_clips_boundaries(spark):
    """Decode-window planning: coverage is gapless with the declared
    overlap, the last segment ends exactly at clip end, short clips
    yield one whole segment, and overlap >= max is rejected."""
    import pytest

    from dataflow_flex_templates_spark.operators.audio_pack import (
        segment_clips,
    )

    rows = [("a", 2000),    # <= max -> one segment [0,2000)
            ("b", 3000),    # == max -> one segment
            ("c", 3001),    # just over -> two, second is tiny
            ("d", 8000)]    # 0-3000, 2500-5500, 5000-8000
    df = spark.createDataFrame(rows, "clip_id string, dur_ms int")
    segs = {}
    for r in segment_clips(df, max_ms=3000, overlap_ms=500).collect():
        segs.setdefault(r["clip_id"], []).append(
            (r["seg_idx"], r["start_ms"], r["end_ms"], r["seg_ms"]))
    for v in segs.values():
        v.sort()
    assert segs["a"] == [(0, 0, 2000, 2000)]
    assert segs["b"] == [(0, 0, 3000, 3000)]
    assert segs["c"] == [(0, 0, 3000, 3000), (1, 2500, 3001, 501)]
    assert segs["d"] == [(0, 0, 3000, 3000), (1, 2500, 5500, 3000),
                         (2, 5000, 8000, 3000)]
    # every consecutive pair overlaps by EXACTLY overlap_ms (the
    # earlier segment of a pair is never the truncated tail), and the
    # union covers [0, dur)
    for cid, dur in rows:
        v = segs[cid]
        assert v[0][1] == 0 and v[-1][2] == dur
        for (_, s1, e1, _), (_, s2, e2, _) in zip(v, v[1:]):
            assert e1 - s2 == 500

    with pytest.raises(ValueError):
        segment_clips(df, max_ms=1000, overlap_ms=1000)


def test_funnel_steps_ordering(spark):
    """Funnel order matters: a click BEFORE the first view does not
    count; a later in-order click does; depth is the longest
    completed prefix; same-timestamp step transitions count (>=)."""
    import datetime as dt

    from dataflow_flex_templates_spark.operators.relational import (
        funnel_steps,
    )

    t0 = dt.datetime(2024, 1, 1)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        # u1: full funnel in order
        (1, at(10), "view"), (1, at(20), "click"), (1, at(30), "purchase"),
        # u2: click precedes view -> funnel stalls at view
        (2, at(10), "click"), (2, at(20), "view"),
        # u3: purchase before click -> depth 2 only
        (3, at(10), "view"), (3, at(15), "purchase"), (3, at(20), "click"),
        # u4: no view at all -> depth 0 despite click+purchase
        (4, at(10), "click"), (4, at(20), "purchase"),
        # u5: view and click share a timestamp -> >= counts it
        (5, at(10), "view"), (5, at(10), "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    out = {r["user_id"]: r for r in funnel_steps(
        df, "user_id", "ts", "event_type",
        ["view", "click", "purchase"]).collect()}
    assert out[1]["depth"] == 3
    assert out[2]["depth"] == 1 and out[2]["step_1_us"] is None
    assert out[3]["depth"] == 2
    assert out[4]["depth"] == 0 and out[4]["step_0_us"] is None
    assert out[5]["depth"] == 2


def test_profile_table_nulls_and_distinct(spark):
    """Profile semantics: NULLs counted separately and excluded from
    distinct/min/max; n_rows constant across columns; strings and
    ints share the one report schema."""
    from dataflow_flex_templates_spark.operators.profile import (
        profile_table,
    )

    rows = [(1, "a"), (2, None), (2, "b"), (None, "a")]
    df = spark.createDataFrame(rows, "x long, s string")
    out = {r["column"]: r for r in profile_table(df).collect()}
    assert set(out) == {"x", "s"}
    x, s = out["x"], out["s"]
    assert x["n_rows"] == s["n_rows"] == 4
    assert (x["n_nulls"], x["n_distinct"], x["min_str"], x["max_str"]) \
        == (1, 2, "1", "2")
    assert (s["n_nulls"], s["n_distinct"], s["min_str"], s["max_str"]) \
        == (1, 2, "a", "b")


def test_vocabulary_coverage_curve(spark):
    """Coverage curve: monotone non-decreasing, total counts the WHOLE
    corpus (not just the head), full-vocab head converges to 1000."""
    from dataflow_flex_templates_spark.operators.text import (
        vocabulary_coverage,
    )

    rows = [(1, "a a a b"), (2, "a b c"), (3, "c d")]
    # occurrences: a=4, b=2, c=2, d=1; total=9
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted((r["rank"], r["word"], r["cum_occurrences"],
                  r["total_occ"], r["coverage_permille"])
                 for r in vocabulary_coverage(df, k=2).collect())
    assert out == [(1, "a", 4, 9, 444), (2, "b", 6, 9, 666)]
    full = sorted((r["rank"], r["coverage_permille"])
                  for r in vocabulary_coverage(df, k=10).collect())
    assert full[-1] == (4, 1000)
    perms = [p for _, p in full]
    assert perms == sorted(perms)


def test_scd2_history_versions(spark):
    """SCD2 semantics: consecutive identical states collapse; equal-ts
    changes give a zero-width older version (tiebreak order); NULL
    state runs collapse too; intervals tile per key; is_current marks
    exactly the open interval."""
    from dataflow_flex_templates_spark.operators.relational import (
        scd2_history,
    )

    rows = [
        ("u1", 10, 1, "a"), ("u1", 20, 2, "a"), ("u1", 30, 3, "b"),
        ("u1", 40, 4, "b"), ("u1", 50, 5, "a"),
        ("u2", 10, 6, "x"), ("u2", 10, 7, "y"),
        ("u3", 5, 8, None), ("u3", 9, 9, None), ("u3", 12, 10, "z"),
    ]
    df = spark.createDataFrame(
        rows, "user string, ts long, eid long, st string")
    got = [tuple(r) for r in
           scd2_history(df, ["user"], "ts", ["st"], ["eid"])
           .orderBy("user", "version").collect()]
    assert got == [
        ("u1", 1, "a", 10, 30, 0),
        ("u1", 2, "b", 30, 50, 0),
        ("u1", 3, "a", 50, None, 1),
        ("u2", 1, "x", 10, 10, 0),   # zero-width: same-ts change
        ("u2", 2, "y", 10, None, 1),
        ("u3", 1, None, 5, 12, 0),   # NULL run collapsed
        ("u3", 2, "z", 12, None, 1),
    ]
    # intervals tile: every closed valid_to equals the next
    # valid_from, checked by construction above; clash guard:
    import pytest as _pytest
    bad = df.withColumnRenamed("eid", "version")
    with _pytest.raises(ValueError, match="clash"):
        scd2_history(bad, ["user"], "ts", ["st"])


def test_scd2_history_single_exchange_plan(spark):
    """The whole history is ONE hash exchange + ONE sort (both window
    passes share them; FilterExec preserves ordering) — the plan shape
    the docstring promises for 10^12-row change streams."""
    from pyspark.sql import functions as F

    from dataflow_flex_templates_spark.operators.relational import (
        scd2_history,
    )

    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .select("user_id",
                  F.unix_micros(F.col("ts").cast("timestamp"))
                  .alias("ts_us"), "event_id", "event_type"))
    out = scd2_history(ev, ["user_id"], "ts_us", ["event_type"],
                       ["event_id"])
    out.collect()
    plan = (out._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort ") == 1


def test_scd2_lww_is_current_slice(spark):
    """The reference's MERGE last-writer-wins result is exactly the
    is_current=1 slice of the SCD2 history (the docstring's claim)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataflow_flex_templates_spark.operators.relational import (
        scd2_history,
    )

    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .select("user_id",
                  F.unix_micros(F.col("ts").cast("timestamp"))
                  .alias("ts_us"), "event_id", "event_type"))
    cur = (scd2_history(ev, ["user_id"], "ts_us", ["event_type"],
                        ["event_id"])
           .where("is_current = 1")
           .select("user_id", F.col("event_type").alias("state")))
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts_us"), F.desc("event_id"))
    lww = (ev.withColumn("rn", F.row_number().over(w))
           .where("rn = 1")
           .select("user_id", F.col("event_type").alias("state")))
    assert sorted(map(tuple, cur.collect())) == \
        sorted(map(tuple, lww.collect()))


def test_rollup_agg_matches_native_rollup(spark):
    """The re-aggregation rewrite is level-for-level identical to
    Spark's native Expand-based rollup (values AND grouping flags),
    while its executed plan reuses the single data-sized exchange
    (ReusedExchange) and contains no Expand."""
    from pyspark.sql import functions as F

    from dataflow_flex_templates_spark.operators.relational import (
        rollup_agg,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ours = rollup_agg(d, ["source", "lang"], "n_chars")
    native = (d.rollup("source", "lang")
              .agg(F.count("*").cast("long").alias("n_rows"),
                   F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long")
                   .alias("sum_n_chars"),
                   F.grouping("source").cast("long")
                   .alias("grp_source"),
                   F.grouping("lang").cast("long").alias("grp_lang")))
    cols = ["source", "lang", "n_rows", "sum_n_chars",
            "grp_source", "grp_lang"]
    a = sorted(map(tuple, ours.select(*cols).collect()), key=repr)
    b = sorted(map(tuple, native.select(*cols).collect()), key=repr)
    assert a == b
    ours.collect()
    plan = (ours._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert "ReusedExchange" in plan
    assert "Expand" not in plan
