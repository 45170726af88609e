"""Incremental (streaming) MinHash-LSH near-duplicate detection.

The batch operator (`operators/dedup.py minhash_lsh_pairs`) re-joins
the FULL banded-signature table against itself — at 10^12 accumulated
documents a continuous pipeline cannot re-run that per micro-batch.
The fold implemented here emits each near-dup pair exactly once, the
moment its LATER document arrives, touching only batch-sized and
keyed-lookup state:

- ``buckets`` store (id, band, bh): APPEND-ONLY banded signature
  rows, written once per document at first sight. Candidate lookup
  joins the BATCH's bucket rows against it keyed on (band, bh) — the
  point-lookup pattern of a bucket-keyed store, never a store×store
  self-join.
- ``shingles`` store (id, sh, sh_size): APPEND-ONLY normalized
  shingle sets, written once per document, read back only for the
  old side of candidate verification (keyed lookup by candidate id).

Per micro-batch fold (`lsh_apply_batch`):

1. drop batch docs whose id is already in the store (redelivery
   safety: a document is signed exactly once);
2. minhash-sign the batch and band it with the SAME
   `band_buckets` hashing the batch operator uses (factored shared);
3. candidates = batch-buckets ⋈ store-buckets on (band, bh)
   (new↔old) ∪ batch-buckets self-join (new↔new, id_a < id_b),
   distinct — identical to the batch operator's candidate rule
   because band equality is symmetric and time-independent;
4. verify candidates with EXACT shingle Jaccard (array_intersect
   over the two shingle sets, round 6) — precision 1.0, same
   arithmetic as the batch verifier;
5. append the batch's bucket and shingle rows.

Exactness: a pair (a, b) collides in some band iff it does in the
batch operator (same signatures, same band hashes), and it is
generated exactly once — in the batch where the later of a, b
arrives (both-new pairs by the in-batch join, new-old pairs by the
store join; once both are old the pair can never be generated
again). Verification computes the same rounded Jaccard from the same
shingle sets. Hence union-of-emitted-pairs over ANY batch split ==
`minhash_lsh_pairs` over the union of the batches — the law pinned
by tests/test_streaming.py::test_lsh_incremental_equals_batch and
held to the batch row's oracle by the driver row
`stream_minhash_lsh`.

Scale shape per micro-batch: one signature pass over the batch (one
explode + hash-agg, whole-stage codegen), one keyed candidate lookup
sized by the batch's bucket rows, one keyed shingle lookup sized by
the candidates. Nothing ever rescans the accumulated corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataflow_flex_templates_spark.operators.dedup import (
    band_buckets,
    minhash_signatures,
    shingle_sets,
)


def lsh_apply_batch(batch_docs: DataFrame, buckets: DataFrame,
                    shingles: DataFrame, num_hashes: int = 32,
                    bands: int = 8, threshold: float = 0.5,
                    text_col: str = "text", id_col: str = "doc_id",
                    n: int = 3,
                    ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fold one micro-batch of documents into the LSH store.

    ``buckets``:  (id long, band int, bh long) — append-only.
    ``shingles``: (id long, sh array<string>, sh_size int) —
    append-only. Returns ``(new_pairs, new_bucket_rows,
    new_shingle_rows)``; the caller appends the latter two. Pair rows
    are (id_a, id_b, jaccard), id_a < id_b, each emitted exactly once
    across the stream's lifetime.
    """
    seen = shingles.select(F.col("id").alias(id_col))
    fresh = (batch_docs
             .withColumn(id_col, F.col(id_col).cast("long"))
             .dropDuplicates([id_col])
             .join(seen, id_col, "left_anti"))

    new_sh = shingle_sets(fresh, text_col, id_col, n)
    sig = minhash_signatures(fresh, num_hashes, text_col, id_col, n)
    new_bk = band_buckets(sig, num_hashes, bands).localCheckpoint(
        eager=True)

    nb, ob = new_bk.alias("nb"), buckets.alias("ob")
    old_cands = (nb.join(ob, (F.col("nb.band") == F.col("ob.band"))
                         & (F.col("nb.bh") == F.col("ob.bh")))
                 .select(F.least("nb.id", "ob.id").alias("id_a"),
                         F.greatest("nb.id", "ob.id").alias("id_b")))
    b2 = new_bk.alias("b2")
    new_cands = (nb.join(b2, (F.col("nb.band") == F.col("b2.band"))
                         & (F.col("nb.bh") == F.col("b2.bh"))
                         & (F.col("nb.id") < F.col("b2.id")))
                 .select(F.col("nb.id").alias("id_a"),
                         F.col("b2.id").alias("id_b")))
    cands = old_cands.unionByName(new_cands).distinct()

    # verify with exact jaccard: shingle sets come from the store for
    # old ids and from this batch for new ids (keyed lookups both)
    all_sh = shingles.unionByName(new_sh)
    sa = all_sh.select(F.col("id").alias("id_a"),
                       F.col("sh").alias("sh_a"),
                       F.col("sh_size").alias("sz_a"))
    sb = all_sh.select(F.col("id").alias("id_b"),
                       F.col("sh").alias("sh_b"),
                       F.col("sh_size").alias("sz_b"))
    new_pairs = (cands.join(sa, "id_a").join(sb, "id_b")
                 .withColumn("inter",
                             F.size(F.array_intersect("sh_a", "sh_b")))
                 .withColumn("jaccard", F.round(
                     F.col("inter")
                     / (F.col("sz_a") + F.col("sz_b")
                        - F.col("inter")), 6))
                 .filter(F.col("jaccard") >= threshold)
                 .select("id_a", "id_b", "jaccard"))
    return new_pairs, new_bk, new_sh
