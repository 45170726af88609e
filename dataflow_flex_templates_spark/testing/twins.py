"""Single-process twins of the hash-based operators.

Each function here recomputes, in plain Python/numpy, what a
distributed operator computes in Spark — token hashes via the
pure-Python XXH64 (testing/xxh.py), LSH signatures via the same
deterministic hyperplane definition, sequence matches via the shared
automaton. They serve two purposes:

1. pytest ground truth for the approximate/hash operators;
2. the generator inputs for the driver-oracle constant tables
   (scripts/gen_oracle_constants.py) — candidate pair sets and
   signatures are pinned from THESE twins (never from Spark), and the
   final similarity verification runs in DuckDB SQL, so the driver's
   correctness check stays independent of the engine under test.

Float determinism note: Spark's ``F.aggregate`` folds arrays
sequentially left→right in double precision; the twins use the same
fold order with Python floats (IEEE double), so LSH projections match
bit-for-bit — sign decisions cannot diverge.
"""

from __future__ import annotations

import re

from dataflow_flex_templates_spark.testing.xxh import (
    xxh64,
    xxh64_long,
    xxh64_signed,
)

_M64 = (1 << 64) - 1


def norm_text_py(text: str | None) -> str:
    """Twin of operators.text.norm_text: F.trim (spaces only) →
    ``\\s+``→' ' (Java \\s is ASCII) → lower."""
    t = (text or "").strip(" ")
    t = re.sub(r"\s+", " ", t, flags=re.ASCII)
    return t.lower()


# ------------------------------------------------------------- simhash

def simhash_twin(text: str | None) -> int:
    """Twin of operators.dedup.simhash for one document (signed i64).

    Matches the Spark plan exactly: tokens = split(norm, ' ') INCLUDING
    empty strings, per-token xxhash64(seed 42), per-bit ±1 sums, bit
    set iff sum > 0."""
    toks = norm_text_py(text).split(" ")
    sums = [0] * 64
    for tok in toks:
        h = xxh64(tok.encode("utf-8"))
        for i in range(64):
            sums[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(64):
        if sums[i] > 0:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out


def hamming64(a: int, b: int) -> int:
    return ((a ^ b) & _M64).bit_count()


def simhash_pairs_twin(docs: list[tuple[int, str]], max_hamming: int = 3
                       ) -> list[tuple[int, int, int]]:
    """Brute-force Hamming pairs over simhash_twin values —
    the recall-1.0 reference for the blocked simhash_pairs operator."""
    sims = [(i, simhash_twin(t)) for i, t in docs]
    out = []
    for x in range(len(sims)):
        for y in range(x + 1, len(sims)):
            (ia, ha), (ib, hb) = sims[x], sims[y]
            if ia > ib:
                (ia, ha), (ib, hb) = (ib, hb), (ia, ha)
            d = hamming64(ha, hb)
            if d <= max_hamming:
                out.append((ia, ib, d))
    return sorted(out)


# ------------------------------------------------------------- minhash

def shingles_py(text: str | None, n: int = 3) -> list[str]:
    """Twin of operators.dedup._shingles: distinct char n-grams of the
    normalized text; texts shorter than n contribute their (padded)
    substr(1, n) exactly as Spark's substr does."""
    t = norm_text_py(text)
    m = max(len(t) - (n - 1), 1)
    seen: dict[str, None] = {}
    for i in range(m):
        seen.setdefault(t[i:i + n], None)
    return list(seen)


def minhash_sigs_twin(text: str | None, num_hashes: int = 32, n: int = 3
                      ) -> list[int]:
    """Twin of operators.dedup.minhash_signatures for one doc.

    Spark computes ``min(xxhash64(s, lit(i)))``; the two-arg xxhash64
    chains: hash = xxh64(utf8(s), 42) then hashInt(i, prev) — the
    permutation index is an IntegerType literal, so the 4-byte path."""
    from dataflow_flex_templates_spark.testing.xxh import xxh64_int

    out = []
    sh = shingles_py(text, n)
    hs = [xxh64(s.encode("utf-8")) for s in sh]
    for i in range(num_hashes):
        out.append(min(xxh64_int(i, seed=h) for h in hs))
    return out


def minhash_band_candidates(
    docs: list[tuple[int, str]],
    num_hashes: int = 32,
    bands: int = 16,
    n: int = 3,
) -> list[tuple[int, int]]:
    """Twin of the banded-LSH candidate generation: two docs are
    candidates iff some band of their signatures is identical. (The
    band hash ``xxhash64(mh_r0, .., mh_rk)`` collides exactly when the
    band values are equal — modulo 64-bit hash collisions, which the
    exact-Jaccard verify step absorbs anyway — so the twin compares
    band tuples directly.)"""
    rows_per_band = num_hashes // bands
    sigs = {i: minhash_sigs_twin(t, num_hashes, n) for i, t in docs}
    buckets: dict[tuple, list[int]] = {}
    for i, sig in sigs.items():
        for b in range(bands):
            key = (b, tuple(sig[b * rows_per_band:(b + 1) * rows_per_band]))
            buckets.setdefault(key, []).append(i)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                pairs.add((ids[x], ids[y]))
    return sorted(pairs)


# ------------------------------------------------------ hyperplane LSH

def lsh_table_sigs(vec: list[float], dim: int, n_planes: int,
                   n_tables: int) -> list[tuple[int, int]]:
    """Twin of the signature column in similarity.lsh_ann_topk /
    dedup.embedding_neardup_lsh: per table, one bit per hyperplane —
    sign of the sequential-fold dot product (bit-exact with Spark's
    F.aggregate, see module docstring)."""
    from dataflow_flex_templates_spark.operators.similarity import (
        _hyperplane,
    )

    out = []
    for t in range(n_tables):
        bits = 0
        for p in range(n_planes):
            plane = _hyperplane(dim, p, t)
            acc = 0.0
            for x, c in zip(vec, plane):
                acc = acc + (float(x) * c)
            if acc > 0:
                bits += 1 << p
        out.append((t, bits))
    return out


def lsh_pair_candidates(
    vecs: list[tuple[int, list[float]]],
    dim: int,
    n_planes: int,
    n_tables: int,
) -> list[tuple[int, int]]:
    """Candidates for embedding_neardup_lsh: (id_a < id_b) colliding in
    any (table, signature) bucket."""
    buckets: dict[tuple[int, int], list[int]] = {}
    for vid, v in vecs:
        for key in lsh_table_sigs(v, dim, n_planes, n_tables):
            buckets.setdefault(key, []).append(vid)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                pairs.add((ids[x], ids[y]))
    return sorted(pairs)


def lsh_query_candidates(
    vecs: list[tuple[int, list[float]]],
    queries: list[tuple[int, list[float]]],
    dim: int,
    n_planes: int,
    n_tables: int,
) -> list[tuple[int, int]]:
    """Candidates for lsh_ann_topk: (query_id, neighbor_id) colliding
    in any table bucket, self-matches excluded."""
    buckets: dict[tuple[int, int], list[int]] = {}
    for vid, v in vecs:
        for key in lsh_table_sigs(v, dim, n_planes, n_tables):
            buckets.setdefault(key, []).append(vid)
    out = set()
    for qid, qv in queries:
        for key in lsh_table_sigs(qv, dim, n_planes, n_tables):
            for nid in buckets.get(key, ()):
                if nid != qid:
                    out.add((qid, nid))
    return sorted(out)


# ------------------------------------------------------------ IVF-FLAT

def ivf_seed_centroids(vecs: list[tuple[int, list[float]]],
                       n_centroids: int) -> list[tuple[int, list[float]]]:
    """Twin of similarity.ivf_centroids with lloyd_iters=0: the seed
    centroids are the n vectors with the smallest xxhash64(vec_id)
    (LongType path), centroid ids assigned in hash order."""
    seeds = sorted(vecs, key=lambda iv: xxh64_long(iv[0]))[:n_centroids]
    return [(i, [float(x) for x in v]) for i, (_, v) in enumerate(seeds)]


def _sqdist_fold(v: list[float], c: list[float]) -> float:
    # same IEEE op sequence as similarity._sqdist: per-element
    # (x-y)*(x-y) then a sequential left fold of additions
    acc = 0.0
    for x, y in zip(v, c):
        d = float(x) - y
        acc = acc + d * d
    return acc


def ivf_cell_order(v: list[float],
                   cents: list[tuple[int, list[float]]],
                   n: int) -> list[int]:
    """Twin of similarity._argmin_centroids: centroids sorted by
    (distance, cid) — matches array_sort over struct<d, cid>."""
    scored = sorted((( _sqdist_fold(v, cv), cid) for cid, cv in cents))
    return [cid for _, cid in scored[:n]]


def ivf_candidates(
    vecs: list[tuple[int, list[float]]],
    queries: list[tuple[int, list[float]]],
    n_centroids: int,
    nprobe: int,
) -> list[tuple[int, int]]:
    """(query_id, neighbor_id) candidate pairs of the lloyd_iters=0
    IVF index: every vector in any of the query's nprobe nearest
    cells, self-matches excluded."""
    cents = ivf_seed_centroids(vecs, n_centroids)
    by_cell: dict[int, list[int]] = {}
    for vid, v in vecs:
        by_cell.setdefault(ivf_cell_order(v, cents, 1)[0], []).append(vid)
    out = set()
    for qid, qv in queries:
        for cid in ivf_cell_order(qv, cents, nprobe):
            for nid in by_cell.get(cid, ()):
                if nid != qid:
                    out.add((qid, nid))
    return sorted(out)


__all__ = [
    "norm_text_py", "simhash_twin", "hamming64", "simhash_pairs_twin",
    "shingles_py", "minhash_sigs_twin", "minhash_band_candidates",
    "lsh_table_sigs", "lsh_pair_candidates", "lsh_query_candidates",
    "ivf_seed_centroids", "ivf_cell_order", "ivf_candidates",
    "xxh64", "xxh64_long", "xxh64_signed",
]
