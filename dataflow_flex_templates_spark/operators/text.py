"""Text-analysis operators for training-data pipelines (documents table).

All hot-path logic is JVM-side Catalyst expressions (whole-stage
codegen) — no Python in the loop. Each operator is written so the SAME
semantics are expressible in DuckDB ANSI SQL for the driver's oracle
comparison (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Tiny English stopword list used by the language-ID heuristic and the
# quality score. Keep SORTED and in sync with the oracle SQL.
STOPWORDS = ["a", "and", "are", "as", "at", "be", "by", "for", "from",
             "has", "he", "in", "is", "it", "its", "of", "on", "that",
             "the", "to", "was", "were", "will", "with"]


def norm_text(col: Column) -> Column:
    """Whitespace-collapsed, lowercased text (shared normalization)."""
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def token_count(col: Column) -> Column:
    """Whitespace token count (empty string → 0)."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of the normalized text. Stable across
    engines (md5 is md5) — the exact-dedup key."""
    return F.md5(norm_text(col))


def punct_ratio(col: Column) -> Column:
    t = F.trim(col)
    stripped = F.regexp_replace(t, r"[.!?,;:]", "")
    return (F.length(t) - F.length(stripped)) / F.greatest(F.length(t), F.lit(1))


def stopword_ratio(col: Column) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    toks = F.split(norm_text(col), " ")
    hits = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length factor + stopword
    presence − punctuation excess. (Gopher-rules-style scoring distilled
    to three cross-engine-expressible terms.)"""
    length_f = F.least(token_count(col) / F.lit(100.0), F.lit(1.0))
    stop_f = F.least(stopword_ratio(col) * F.lit(4.0), F.lit(1.0))
    punct_pen = F.least(punct_ratio(col) * F.lit(5.0), F.lit(1.0))
    return F.round(
        F.lit(0.5) * length_f + F.lit(0.5) * stop_f - F.lit(0.25) * punct_pen, 6
    )


def lang_id(col: Column) -> Column:
    """n-gram-free language-ID heuristic: ≥2 stopword hits and ≥15%
    stopword ratio → 'en', else 'unk'. (A real fasttext model would be
    an external dep; the Spark-side plumbing — vectorized expression on
    a text column — is identical.)"""
    toks = F.split(norm_text(col), " ")
    hits = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    ratio = hits / F.greatest(F.size(toks), F.lit(1))
    return F.when((hits >= 2) & (ratio >= 0.15), F.lit("en")).otherwise(F.lit("unk"))


#: Character-trigram profiles for the n-gram language-ID heuristic.
#: All trigrams are length-3 ASCII (space = word boundary in the
#: normalized text) so occurrence counting via replace() arithmetic is
#: exact and identical in Spark and DuckDB. Profiles overlap across
#: languages (they do in reality too); ties break by the fixed
#: priority en > de > fr > es. Keep in sync with the oracle SQL
#: rendered by :func:`lang_trigram_sql`.
LANG_TRIGRAMS = {
    "en": [" th", "the", "he ", "ing", " an", "and", "nd ", " of",
           "of ", "ion", "ed ", " to", "to ", "er ", "at "],
    "de": [" de", "der", "ich", "sch", "ein", "cht", "und", " un",
           "gen", "ung", " di", "die", "ver", "ite", "rde"],
    "fr": [" le", "les", "ent", "que", " qu", "ue ", "ait", "eur",
           " la", "ons", "oir", "ais", "une", " un", "res"],
    "es": [" de", "de ", "os ", " la", "la ", "que", " qu", "ado",
           "los", " lo", "ien", " el", "el ", "nte", "cio"],
}

LANGS = list(LANG_TRIGRAMS)  # priority order for tie-breaks


def lang_trigram_scores(col: Column) -> dict:
    """Per-language trigram occurrence counts over the normalized text.

    count(t in s) = (len(s) - len(replace(s, t, ''))) / 3 — pure JVM
    string arithmetic, whole-stage codegen, one projection for all
    four languages (60 replace terms)."""
    s = norm_text(col)
    out = {}
    for lang, grams in LANG_TRIGRAMS.items():
        total = None
        for g in grams:
            c = (F.length(s) - F.length(F.replace(s, F.lit(g), F.lit("")))
                 ) / F.lit(3)
            total = c if total is None else total + c
        out[lang] = total.cast("long")
    return out


def lang_id_ngram(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """N-gram language ID: (id, score_en..score_es, lang).

    lang = highest-scoring profile (priority order on ties), 'unk'
    when no profile trigram occurs at all. Counts are raw integers —
    deterministic and hash-stable across engines."""
    sc = lang_trigram_scores(F.col(text_col))
    e, d, f_, s_ = (sc[lang] for lang in LANGS)
    best = (F.when((e >= d) & (e >= f_) & (e >= s_) & (e > 0), "en")
            .when((d >= f_) & (d >= s_) & (d > 0), "de")
            .when((f_ >= s_) & (f_ > 0), "fr")
            .when(s_ > 0, "es")
            .otherwise("unk"))
    return df.select(
        id_col,
        *[sc[lang].alias(f"score_{lang}") for lang in LANGS],
        best.alias("lang"),
    )


def lang_trigram_sql(text_expr: str = "text") -> dict[str, str]:
    """Render the DuckDB twin of :func:`lang_trigram_scores`: one SQL
    expression per language over the SAME normalized text, from the
    same LANG_TRIGRAMS source of truth."""
    norm = (f"lower(regexp_replace(trim({text_expr}, ' '), "
            f"'\\s+', ' ', 'g'))")
    out = {}
    for lang, grams in LANG_TRIGRAMS.items():
        terms = [f"(length(nt) - length(replace(nt, '{g}', ''))) / 3"
                 for g in grams]
        out[lang] = "CAST(" + " + ".join(terms) + " AS BIGINT)"
    out["__norm__"] = norm
    return out


def repetition_profile(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       top_word_max: float = 0.10,
                       dup_2gram_max: float = 0.40) -> DataFrame:
    """Gopher-style repetition signals per document.

    - ``top_word_frac``: characters of the most frequent word (count ×
      word length) over total word characters; ties break to the
      lexicographically smallest word so both engines pick the same
      one.
    - ``dup_2gram_frac``: characters covered by 2-grams occurring ≥2
      times (count × gram length) over total 2-gram characters.
    - ``keep_repetition``: both fractions under their thresholds.

    One explode + hash-agg per signal, shuffles keyed on (doc, gram) —
    bounded by document size, embarrassingly parallel across docs.
    """
    d = df.select(F.col(id_col).alias("doc_id"),
                  F.split(norm_text(F.col(text_col)), " ").alias("w"))
    words = (d.select("doc_id", F.explode("w").alias("word"))
             .filter(F.length("word") > 0)
             .groupBy("doc_id", "word").agg(F.count("*").alias("c")))
    top2 = (words.groupBy("doc_id")
            .agg(F.max("c").alias("maxc"),
                 F.sum(F.col("c") * F.length("word")).alias("tot_chars")))
    top_word = (words.join(top2, "doc_id")
                .filter(F.col("c") == F.col("maxc"))
                .groupBy("doc_id", "maxc", "tot_chars")
                .agg(F.min("word").alias("top_word"))
                .select("doc_id", "top_word",
                        F.round(F.col("maxc") * F.length("top_word")
                                / F.col("tot_chars"), 6)
                        .alias("top_word_frac")))
    grams = (d.select(
        "doc_id",
        F.explode(F.expr(
            "CASE WHEN size(w) >= 2 THEN "
            "transform(sequence(0, size(w) - 2), "
            "i -> concat(w[i], ' ', w[i + 1])) "
            "ELSE CAST(array() AS array<string>) END")).alias("g"))
        .groupBy("doc_id", "g").agg(F.count("*").alias("c")))
    dup = (grams.groupBy("doc_id")
           .agg((F.sum(F.when(F.col("c") >= 2,
                              F.col("c") * F.length("g")).otherwise(0))
                 / F.sum(F.col("c") * F.length("g"))).alias("raw"))
           .select("doc_id", F.round("raw", 6).alias("dup_2gram_frac")))
    return (top_word.join(dup, "doc_id", "left")
            .select("doc_id", "top_word", "top_word_frac",
                    F.coalesce("dup_2gram_frac", F.lit(0.0))
                    .alias("dup_2gram_frac"))
            .withColumn("keep_repetition",
                        (F.col("top_word_frac") <= top_word_max)
                        & (F.col("dup_2gram_frac") <= dup_2gram_max)))


#: PII patterns — ASCII-only, valid in BOTH Java regex (Spark) and
#: RE2 (DuckDB), so counts and masking match across engines exactly.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[- ]\d{3}[- ]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scan(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Per-document PII counts + masked-text fingerprint.

    Counts each PII class and masks matches with ``[CLASS]`` tokens
    (emails first — an email contains dots that the ipv4 pattern must
    not see). Emits ``masked_md5`` rather than the masked text so the
    oracle compares a fingerprint, not megabytes. Single projection,
    JVM regex, no shuffle."""
    c = F.col(text_col)
    masked = c
    for name, pat in PII_PATTERNS.items():
        masked = F.regexp_replace(masked, pat, f"[{name.upper()}]")
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[F.regexp_count(c, F.lit(pat)).cast("long")
          .alias(f"n_{name}") for name, pat in PII_PATTERNS.items()],
        F.md5(masked).alias("masked_md5"),
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All text-analysis columns in one projection (one scan, no shuffle)."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        fingerprint(c).alias("fp"),
        F.round(punct_ratio(c), 6).alias("punct_ratio"),
        F.round(stopword_ratio(c), 6).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
    )


# ---------------------------------------------------------------- winnowing

WINNOW_BASE = 1_000_003          # polynomial rolling-hash base
WINNOW_MASK = (1 << 61) - 1      # Mersenne-prime modulus (2^61-1)


def winnow_fingerprints_np(text: str, k: int = 5, window: int = 4
                           ) -> list[int]:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS) of one
    normalized document: k-gram POLYNOMIAL ROLLING hashes, then the
    minimum hash of every sliding window of ``window`` consecutive
    k-grams, deduplicated by position. Pure numpy — vectorized per doc,
    used inside the Arrow-batched pandas UDF below and as the test
    oracle."""
    import numpy as np

    n = len(text)
    if n < k:
        return []
    codes = np.array([ord(c) & 0xFFFF for c in text], dtype=np.uint64)
    m = len(codes) - k + 1
    base = np.uint64(WINNOW_BASE)
    mask = np.uint64(WINNOW_MASK)
    # prefix polynomial hashes mod 2^64 (intentional uint64 wraparound),
    # windowed via H[i..i+k) = P[i+k] - P[i]*base^k (all mod 2^64)
    with np.errstate(over="ignore"):
        powers = np.empty(len(codes) + 1, dtype=np.uint64)
        powers[0] = 1
        np.multiply.accumulate(
            np.full(len(codes), base, dtype=np.uint64), out=powers[1:])
        prefix = np.zeros(len(codes) + 1, dtype=np.uint64)
        acc = np.uint64(0)
        for i, c in enumerate(codes):      # scalar loop is per-char but
            acc = acc * base + c           # C-speed uint64 ops; docs are
            prefix[i + 1] = acc            # small relative to decode cost
        grams = prefix[k:] - prefix[:-k] * powers[k]
        grams &= mask                      # fold into 61-bit space
    if m < window:
        pos = int(np.argmin(grams))
        return [int(grams[pos])]
    sw = np.lib.stride_tricks.sliding_window_view(grams, window)
    mins = sw.min(axis=1)
    argmins = sw.argmin(axis=1) + np.arange(len(mins))
    keep = np.ones(len(mins), dtype=bool)
    keep[1:] = argmins[1:] != argmins[:-1]   # robust winnowing dedup
    return [int(x) for x in mins[keep]]


def winnow_fingerprints(df: DataFrame, text_col: str = "text",
                        k: int = 5, window: int = 4) -> DataFrame:
    """Rolling-hash document fingerprinting as a training-data op:
    per-doc winnowing fingerprint set (array<long>), Arrow-batched.
    Shared fingerprints between documents witness copied substrings ≥
    k + window - 1 chars — the near-dup primitive exact hashing misses."""
    @pandas_udf(T.ArrayType(T.LongType()))
    def _fp(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            norm = " ".join((t or "").lower().split())
            out.append(winnow_fingerprints_np(norm, k, window))
        return pd.Series(out)

    return df.withColumn("fingerprints", _fp(F.col(text_col)))


def winnow_overlap_pairs(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", k: int = 5,
                         window: int = 4, min_shared: int = 2,
                         max_df: int | None = None) -> DataFrame:
    """Near-dup pairs by SHARED winnowing fingerprints — the MOSS
    plagiarism-detection primitive: two documents sharing a fingerprint
    share a ≥ k+window-1-char substring, so the shared count witnesses
    copied content that whole-document hashing misses.

    Inverted index on fingerprint (explode → equi-join → count), never
    a cross join. ``max_df`` drops fingerprints appearing in more than
    that many documents from the index — same hot-posting-list defense
    as ngram_jaccard_pairs (boilerplate shared by half the corpus would
    otherwise make its posting list quadratic); unlike Jaccard there is
    no verify step because the shared COUNT over the bounded index is
    itself the (conservative) output metric.

    Returns (id_a, id_b, shared_fp) with shared_fp ≥ min_shared.
    """
    fp = (winnow_fingerprints(df, text_col, k, window)
          .select(F.col(id_col).alias("id"),
                  F.explode("fingerprints").alias("fp"))
          .distinct())   # winnowing may emit one value at many positions
    if max_df is not None:
        rare = (fp.groupBy("fp").agg(F.count("*").alias("df"))
                .filter(F.col("df") <= max_df).select("fp"))
        fp = fp.join(rare, "fp")
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp"))
               & (F.col("a.id") < F.col("b.id")))
         .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
         .agg(F.count("*").alias("shared_fp"))
         .filter(F.col("shared_fp") >= min_shared)
    )


#: GPT-2-style pre-tokenizer pattern (contractions, words, numbers,
#: punctuation runs) — the "BPE-ish" token estimate. Java regex here;
#: keep semantically aligned with the RE2 twin in the DuckDB oracle.
BPE_SPLIT_PATTERN = (r"'s|'t|'re|'ve|'m|'ll|'d"
                     r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+")


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count: matches of the GPT-2 pre-tokenizer pattern
    (a good proxy for LLM token budgeting without shipping a merges
    table). Pure JVM regex — whole-stage codegen."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_SPLIT_PATTERN), F.lit(0))
                  ).cast("long")


# ------------------------------------------------------- gopher-style flags

def gopher_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-rules-style quality FLAGS (Rae et al. 2021 distilled to
    cross-engine-expressible predicates), one boolean column per rule
    plus the rolled-up keep decision. All JVM expressions, one scan:

      flag_too_few_tokens    < 5 whitespace tokens
      flag_mean_word_len     mean token length outside [2, 12]
      flag_symbol_heavy      >10% of characters are #/… symbols
      flag_ellipsis_lines    text is mostly ellipsis-terminated
      flag_no_stopwords      zero stopword hits (gibberish signal)
    """
    c = F.col(text_col)
    toks = F.split(norm_text(c), " ")
    n_tok = F.size(toks)
    mean_len = (F.aggregate(toks, F.lit(0),
                            lambda acc, x: acc + F.length(x))
                / F.greatest(n_tok, F.lit(1)))
    n_chars = F.greatest(F.length(c), F.lit(1))
    n_sym = (F.length(c)
             - F.length(F.regexp_replace(c, r"[#@~^*+=|<>]", "")))
    n_ellipsis = (F.length(c)
                  - F.length(F.regexp_replace(c, r"\.\.\.", ""))) / 3
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    flags = {
        "flag_too_few_tokens": n_tok < 5,
        "flag_mean_word_len": (mean_len < 2.0) | (mean_len > 12.0),
        "flag_symbol_heavy": (n_sym / n_chars) > 0.10,
        "flag_ellipsis_lines": (n_ellipsis * 10.0) > n_tok,
        "flag_no_stopwords": stop_hits == 0,
    }
    out = df.select("*", *[v.alias(k) for k, v in flags.items()])
    keep = None
    for k in flags:
        keep = ~F.col(k) if keep is None else keep & ~F.col(k)
    return out.withColumn("keep", keep)


# --------------------------------------------------- training-data chunking

def chunk_documents(df: DataFrame, chunk_tokens: int = 128,
                    overlap: int = 32, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split documents into overlapping token-bounded training chunks —
    the context-window packing primitive of an LLM data pipeline.

    Tokens are the engine's canonical whitespace tokens over
    :func:`norm_text` (same tokenization as token_count / gopher_flags,
    so budgets compose). Chunk starts advance by ``chunk_tokens -
    overlap``; the last chunk is the remainder (always > ``overlap``
    tokens by construction). Output per chunk: (id, chunk_idx,
    start_tok, chunk_len, chunk_md5) — ints + md5 only, so oracle
    comparison is exact.

    Scale: pure JVM (split → explode(sequence) → slice → md5) in one
    whole-stage-codegen pass, no UDF, no shuffle — the explode fan-out
    is local and output-proportional, exactly what 100 TB wants.
    """
    step = chunk_tokens - overlap
    if step <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    nt = norm_text(F.col(text_col))
    toks = F.split(nt, " ")
    n = F.when(nt == "", F.lit(0)).otherwise(F.size(toks)).cast("long")
    base = df.select(F.col(id_col), toks.alias("__toks__"),
                     n.alias("__n__"))
    n_col = F.col("__n__")
    n_chunks = (F.when(n_col <= 0, F.lit(0))
                 .when(n_col <= chunk_tokens, F.lit(1))
                 .otherwise(F.lit(1) + ((n_col - chunk_tokens + step - 1)
                                        / step).cast("long")))
    start = (F.col("chunk_idx") * step).cast("long")
    chunk = F.slice(F.col("__toks__"),
                    (F.col("chunk_idx") * step + 1).cast("int"),
                    chunk_tokens)
    return (base
            .withColumn("__nc__", n_chunks)
            .filter(F.col("__nc__") > 0)
            .select(F.col(id_col),
                    F.explode(F.sequence(
                        F.lit(0).cast("long"),
                        (F.col("__nc__") - 1).cast("long")))
                     .alias("chunk_idx"),
                    "__toks__")
            .select(F.col(id_col), F.col("chunk_idx"),
                    start.alias("start_tok"),
                    F.size(chunk).cast("long").alias("chunk_len"),
                    F.md5(F.array_join(chunk, " ")).alias("chunk_md5")))


# ------------------------------------------------ benchmark decontamination

def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                  text_col: str = "text", id_col: str = "doc_id"
                  ) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word ``n``-gram with a benchmark/test set (the standard n-gram
    overlap rule, e.g. GPT-3 appendix C / PaLM's 8-gram variant).

    Both sides tokenize via :func:`norm_text`; documents shorter than
    ``n`` tokens produce no n-grams and cannot be contaminated.
    Returns one row per doc: (id, hit_ngrams, contaminated).

    Scale: the benchmark n-gram set is small (test suites, not corpora)
    — distinct-ed and **broadcast**, so the corpus side never
    shuffles: explode n-grams → broadcast-hash semi join → partial
    count-distinct per doc. The only exchange is the per-doc rollup,
    bounded by hit rows (rare), then a broadcast-back left join onto
    the doc ids.
    """
    def ngrams(d: DataFrame, *cols):
        toks = F.split(norm_text(F.col(text_col)), " ")
        # guard: sequence(1, 0) is DESCENDING in Spark ([1, 0]), so a
        # doc shorter than n tokens must yield an empty gram array, not
        # a slice(start=0) error
        grams = F.when(
            F.size(toks) < n, F.array().cast("array<string>")
        ).otherwise(F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " ")))
        return d.select(*cols, F.explode(grams).alias("ngram"))

    bench = ngrams(benchmark).select("ngram").distinct()
    hits = (ngrams(docs, F.col(id_col))
            .join(F.broadcast(bench), "ngram")
            .groupBy(id_col)
            .agg(F.count_distinct("ngram").alias("hit_ngrams")))
    return (docs.select(id_col)
            .join(hits, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("hit_ngrams", F.lit(0)).cast("long")
                     .alias("hit_ngrams"))
            .withColumn("contaminated", F.col("hit_ngrams") > 0))


# ---------------------------------------------------- sequence packing

def pack_chunks(chunks: DataFrame, budget_tokens: int = 512,
                n_shards: int = 8, id_col: str = "doc_id"
                ) -> DataFrame:
    """Pack training chunks into fixed token-budget sequences — the
    concat-and-cut packing LLM pipelines apply after chunking: within
    a shard, chunks are laid end-to-end in (id, chunk_idx) order and
    the token stream is cut every ``budget_tokens``; a chunk whose
    span crosses a cut is flagged ``straddles`` (pipelines either
    accept the split or re-pad — the flag makes the choice explicit).

    Output per chunk: shard, seq_id (sequence ordinal within the
    shard), offset (token position within the sequence), chunk_len,
    straddles — all exact integer window arithmetic over a running
    sum, so a SQL oracle reproduces it bit-for-bit.

    Scale: ONE shuffle, on ``shard`` (= id % n_shards — deterministic
    and engine-independent); the running sum is a per-shard window, so
    with n_shards sized to the cluster (10^5 at petabyte scale) no
    global ordering or driver-side state exists anywhere. Packing is
    deterministic for any shard count, and sequences never cross
    shards — the property that makes re-packing after incremental
    ingest a per-shard (not global) job.
    """
    from pyspark.sql import Window

    shard = (F.col(id_col) % n_shards).alias("shard")
    w = (Window.partitionBy("shard")
         .orderBy(id_col, "chunk_idx")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("chunk_len").over(w)
    # true integer div (`div`), not double-divide + cast: the cumulative
    # token offset exceeds double's 2^53 exact range long before a
    # 10^12-clip corpus does, and the SQL oracle uses integer div
    return (chunks
            .select(shard, F.col(id_col), "chunk_idx", "chunk_len")
            .withColumn("__cum__", cum.cast("long"))
            .withColumn("seq_id", F.expr(
                f"(__cum__ - chunk_len) div {budget_tokens}"))
            .withColumn("offset", F.expr(
                f"__cum__ - chunk_len - seq_id * {budget_tokens}L"))
            .withColumn("straddles", F.expr(
                f"(__cum__ - 1) div {budget_tokens} != seq_id"))
            .drop("__cum__"))


# --------------------------------------------------- chunk-level dedup

def chunk_dedup(chunks: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Paragraph/chunk-level exact dedup (the C4 move, on chunks):
    group identical chunk_md5, keep the lowest (id, chunk_idx) as
    keeper. One hash-shuffle on the md5 — map-side combine bounds it
    by distinct chunks."""
    return (chunks.groupBy("chunk_md5")
            .agg(F.min(F.struct(id_col, "chunk_idx")).alias("k"),
                 F.count("*").alias("n_dupes"))
            .select("chunk_md5",
                    F.col(f"k.{id_col}").alias("keeper_id"),
                    F.col("k.chunk_idx").alias("keeper_chunk_idx"),
                    "n_dupes"))


# ----------------------------------------------------- vocabulary builder

def vocabulary(df: DataFrame, k: int = 1000, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` corpus vocabulary with counts and document frequency —
    the tokenizer-training / OOV-analysis precursor. Tokens are the
    engine's canonical whitespace tokens over :func:`norm_text`.
    Returns (rank, word, n_occurrences, n_docs), rank by
    (count DESC, word ASC) so ties are deterministic cross-engine.

    Scale: explode → ONE hash agg with map-side combine (word keys are
    near-uniform; the "the" head is exactly what partial aggregation
    collapses before the exchange) → TakeOrderedAndProject(k) — the
    global sort never materializes, only k rows survive to the final
    (single-partition but k-sized) rank window.
    """
    from pyspark.sql import Window

    toks = F.split(norm_text(F.col(text_col)), " ")
    words = (df.select(F.col(id_col).alias("id"),
                       F.explode(toks).alias("word"))
             .filter(F.length("word") > 0))
    counts = (words.groupBy("word")
              .agg(F.count("*").alias("n_occurrences"),
                   F.count_distinct("id").alias("n_docs")))
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("word")).limit(k)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("word"))
    return (top.withColumn("rank", F.row_number().over(w).cast("long"))
            .select("rank", "word", "n_occurrences", "n_docs"))


def oov_stats(df: DataFrame, vocab: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Per-document out-of-vocabulary stats against a vocabulary table
    (`word` column, e.g. :func:`vocabulary` output) — the coverage
    signal tokenizer/vocab decisions are made on. Returns (id,
    n_tokens, oov_tokens) — exact integers.

    Scale: the vocab is broadcast (top-K is small by construction);
    the corpus explodes words and left-joins without shuffling; the
    per-doc rollup is the only exchange, keyed on the doc id."""
    toks = F.split(norm_text(F.col(text_col)), " ")
    words = (df.select(F.col(id_col).alias("id"),
                       F.explode(toks).alias("word"))
             .filter(F.length("word") > 0))
    v = vocab.select("word").distinct().withColumn("__in__", F.lit(1))
    joined = words.join(F.broadcast(v), "word", "left")
    counts = (joined.groupBy("id")
              .agg(F.count("*").alias("n_tokens"),
                   F.sum(F.when(F.col("__in__").isNull(), 1)
                         .otherwise(0)).alias("oov_tokens")))
    return (df.select(F.col(id_col).alias("id")).distinct()
            .join(counts, "id", "left")
            .select(F.col("id").alias(id_col),
                    F.coalesce("n_tokens", F.lit(0)).cast("long")
                     .alias("n_tokens"),
                    F.coalesce("oov_tokens", F.lit(0)).cast("long")
                     .alias("oov_tokens")))


# ------------------------------------------------ compression-ratio signal

def compression_profile_np(text: str, level: int = 6) -> tuple[int, int]:
    """(raw_len, comp_len) of the whitespace-normalized lowercased
    text under zlib at a fixed level — deterministic for a given zlib
    version, so the same function is the Spark kernel and the no-Spark
    oracle twin (the winnowing pattern). Empty text → (0, 0)."""
    import zlib

    norm = " ".join((text or "").lower().split())
    if not norm:
        return (0, 0)
    raw = norm.encode("utf-8")
    return (len(raw), len(zlib.compress(raw, level)))


def compression_stats(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", level: int = 6,
                      min_ratio_permille: int = 300) -> DataFrame:
    """Per-doc compression-ratio quality signal — the cheap
    perplexity proxy LM pipelines use: highly repetitive / templated
    text compresses far below natural prose. Returns (id, raw_len,
    comp_len, ratio_permille, repetitive) with integer arithmetic
    flags (``ratio_permille = comp_len*1000 div raw_len``; flag when
    below ``min_ratio_permille``). One Arrow pass (zlib is C-speed on
    batch strings), one scan, no shuffle."""

    @pandas_udf(T.StructType([
        T.StructField("raw_len", T.LongType()),
        T.StructField("comp_len", T.LongType()),
    ]))
    def _comp(texts: pd.Series) -> pd.DataFrame:
        rows = [compression_profile_np(t, level) for t in texts]
        return pd.DataFrame(rows, columns=["raw_len", "comp_len"])

    c = _comp(F.col(text_col))
    out = (df.select(F.col(id_col), c.alias("__c__"))
           .select(id_col, F.col("__c__.raw_len"),
                   F.col("__c__.comp_len")))
    ratio = (F.when(F.col("raw_len") == 0, F.lit(1000))
             .otherwise((F.col("comp_len") * 1000 / F.col("raw_len"))
                        .cast("long")))
    return (out.withColumn("ratio_permille", ratio)
            .withColumn("repetitive",
                        F.col("ratio_permille") < min_ratio_permille))


def salient_terms(df: DataFrame, k: int = 3, text_col: str = "text",
                  id_col: str = "doc_id",
                  scale: int = 1_000_000) -> DataFrame:
    """Top-``k`` salient terms per document — the TF-IDF family with
    the rarity weight kept in EXACT integer arithmetic so a SQL oracle
    reproduces every score bit-for-bit: ``weight_q(term) = scale //
    df(term)`` (integer inverse document frequency; a log-IDF would
    ride each engine's libm and is not cross-engine stable at the
    rounding boundary), ``score_q = tf · weight_q``. Ranking by
    (score_q DESC, term ASC) makes ties deterministic.

    Scale shape: explode → tf hash-agg (map-side combine collapses the
    Zipf head) → df hash-agg (vocabulary-sized, broadcast-able) → one
    per-doc top-k window, which Spark plans with WindowGroupLimit
    pushdown (partial top-k before the shuffle)."""
    from pyspark.sql import Window

    toks = F.split(norm_text(F.col(text_col)), " ")
    words = (df.select(F.col(id_col), F.explode(toks).alias("term"))
             .filter(F.length("term") > 0))
    tf = words.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = (words.groupBy("term")
             .agg(F.count_distinct(id_col).alias("df")))
    scored = (tf.join(dfreq, "term")
              .withColumn("score_q",
                          F.col("tf") * F.expr(f"{scale} div df")))
    w = (Window.partitionBy(id_col)
         .orderBy(F.desc("score_q"), F.asc("term")))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select(id_col, "rank", "term", "tf", "df", "score_q"))


def corpus_health(df: DataFrame, dims: tuple[str, str] = ("lang", "source"),
                  size_col: str = "n_chars") -> DataFrame:
    """Multi-level corpus composition report — one ROLLUP pass over the
    grouping dimensions (per (lang, source), per lang subtotal, grand
    total) with explicit grouping bits so subtotal rows stay
    unambiguous even when a dimension itself contains NULLs. The
    training-data counterpart of the reference's per-target row
    counters (provenance mix / size budget monitoring).

    All measures are exact integers: doc count, total/max size, and an
    integer-quantized mean (``sum div count``) — a float mean would
    ride cross-engine rounding. ``gid`` is ``grouping(dim1)*2 +
    grouping(dim2)`` (0 = leaf, 1 = dim2 rolled up, 3 = grand total).

    Scale shape: Spark plans ROLLUP as Expand (L+1 rows per input row)
    feeding ONE partial+final hash aggregate — a single shuffle whose
    width is the distinct (lang, source) lattice, not the corpus. At
    10^12 docs the Expand multiplier is absorbed by map-side combine;
    no per-level rescan of the input."""
    d1, d2 = dims
    # grouping() is only legal inside the ROLLUP aggregate itself, so
    # gid is computed in agg(), not a downstream select.
    gid = (F.grouping(d1).cast("long") * 2
           + F.grouping(d2).cast("long")).alias("gid")
    return (df.rollup(d1, d2)
            .agg(gid,
                 F.count("*").cast("long").alias("n_docs"),
                 F.sum(size_col).cast("long").alias("sum_chars"),
                 F.max(size_col).cast("long").alias("max_chars"))
            .withColumn("avg_chars_q",
                        F.expr("sum_chars div n_docs")))


def bigram_novelty(df: DataFrame, k: int = 100, text_col: str = "text",
                   id_col: str = "doc_id", scale: int = 1000) -> DataFrame:
    """Per-document language-model-style novelty score: the share of a
    document's word bigrams that fall OUTSIDE the corpus's top-``k``
    bigram head. High-novelty docs are either valuable long-tail data
    or garbage — either way the docs a curation pipeline wants ranked.

    Kept exactly integer (counts + a ``div``-quantized permille) so the
    SQL oracle reproduces every value: a real LM perplexity would ride
    libm ``log`` rounding cross-engine. Docs with fewer than two
    tokens have no bigrams and are absent from the output by design.

    Scale shape: bigrams are built array-side (slice + transform —
    whole-stage codegen, no shuffle), then ONE corpus-wide hash agg
    for the head (map-side combine collapses the Zipf head), a global
    top-k (TakeOrderedAndProject, never a full sort), and a broadcast
    membership probe — the per-doc agg shuffles on doc_id only. The
    head is k rows, always broadcast-able; nothing all-pairs."""
    toks = F.filter(F.split(norm_text(F.col(text_col)), " "),
                    lambda x: F.length(x) > 0)
    words = df.select(F.col(id_col), toks.alias("w"))
    bg = F.explode(F.expr(
        "transform(slice(w, 1, greatest(size(w) - 1, 0)),"
        " (x, i) -> concat(x, ' ', element_at(w, i + 2)))"))
    doc_bg = words.select(id_col, bg.alias("bigram"))
    head = (doc_bg.groupBy("bigram").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("bigram")).limit(k)
            .select("bigram", F.lit(1).alias("is_head")))
    return (doc_bg.join(F.broadcast(head), "bigram", "left")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_bigrams"),
                 F.sum(F.when(F.col("is_head").isNull(), 1)
                       .otherwise(0)).alias("n_novel"),
                 F.count_distinct(
                     F.when(F.col("is_head").isNull(),
                            F.col("bigram"))).alias("n_novel_distinct"))
            .withColumn("novelty_permille",
                        F.expr(f"n_novel * {scale} div n_bigrams")))


def vocabulary_coverage(df: DataFrame, k: int = 50,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Tokenizer-economics curve: for each top-``k`` vocabulary rank,
    the cumulative permille of ALL corpus token occurrences covered
    by ranks 1..r — the "how big must the vocab be" read-off before
    committing to a tokenizer size.

    The total is computed array-side per row (size of the filtered
    split — the same token definition as :func:`vocabulary`, no
    explode, no second shuffle) and broadcast as one scalar; the
    cumulative sum is a window over the k-row head only. Integer
    permille throughout (``cum*1000 div total``), so the SQL oracle
    is exact.
    """
    from pyspark.sql import Window

    vocab = vocabulary(df, k, text_col, id_col)
    toks = F.filter(F.split(norm_text(F.col(text_col)), " "),
                    lambda x: F.length(x) > 0)
    total = df.agg(F.sum(F.size(toks)).cast("long").alias("total_occ"))
    w = (Window.orderBy("rank")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (vocab.crossJoin(F.broadcast(total))
            .withColumn("cum_occurrences",
                        F.sum("n_occurrences").over(w).cast("long"))
            .withColumn("coverage_permille",
                        (F.col("cum_occurrences") * 1000
                         / F.col("total_occ")).cast("long"))
            .select("rank", "word", "n_occurrences", "cum_occurrences",
                    "total_occ", "coverage_permille"))
