"""Word-error-rate (WER) metrics between transcript pairs.

The canonical ASR-pipeline quality metric: word-level Levenshtein
distance between a reference transcript and a hypothesis (a second
ASR pass, a human correction, a " rev2" revision). A speech-dataset
curation pipeline uses it to gate pairs whose transcripts diverge too
far (mis-aligned audio, hallucinated decodes) before training.

Spark side: an Arrow-batched numpy DP kernel — per-row work, zero
shuffle, vocabulary-independent (no corpus-wide word dictionary is
ever built, so the operator's cost is O(rows x len^2 words) flat
regardless of corpus size; at 100 TB it is an embarrassingly parallel
map over whatever partitioning the pair table already has).

The driver oracle (see ``__spark_entry__``) recomputes the same
distances with a COMPLETELY different algorithm — encode each distinct
word as one unicode char corpus-wide, then DuckDB's built-in
char-level ``levenshtein`` — so agreement is a genuine cross-algebra
proof, not the same code run twice.

Reference parity note: the reference engine has no ASR metrics; this
is a §2.11 extension motivated by the audio+transcript input shape
(BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf


def wer_distance_np(ref: str, hyp: str) -> tuple[int, int, int]:
    """(word_distance, ref_words, hyp_words) between two transcripts.

    Words are the lowercased whitespace-split tokens (empty tokens
    dropped — ``str.split()`` semantics, which on whitespace-normalized
    text equals split-on-single-space). Pure numpy; also serves as the
    no-Spark twin in tests.

    The DP is the classic two-row Levenshtein with the sequential
    insertion cascade vectorized as a prefix-min:
    ``cur[j] = j + min_{k<=j}(e[k] - k)`` where ``e`` is the
    elementwise min of the deletion and substitution candidates.
    """
    r = (ref or "").lower().split()
    h = (hyp or "").lower().split()
    if not r or not h:
        return (max(len(r), len(h)), len(r), len(h))
    vocab: dict[str, int] = {}

    def enc(ws: list[str]) -> np.ndarray:
        return np.fromiter((vocab.setdefault(w, len(vocab)) for w in ws),
                           dtype=np.int32, count=len(ws))

    a, b = enc(r), enc(h)
    n = len(b)
    idx = np.arange(n + 1, dtype=np.int32)
    prev = idx.copy()
    e = np.empty(n + 1, dtype=np.int32)
    for i, ai in enumerate(a, 1):
        e[0] = i
        np.minimum(prev[1:] + 1, prev[:-1] + (b != ai), out=e[1:])
        prev = idx + np.minimum.accumulate(e - idx)
    return (int(prev[n]), len(r), len(h))


def wer_stats(df: DataFrame, ref_col: str = "ref", hyp_col: str = "hyp",
              id_col: str = "doc_id") -> DataFrame:
    """Per-pair WER table: (id, ref_words, hyp_words, wer_distance,
    wer_permille). ``wer_permille = 1000 * distance div ref_words``
    (NULL when the reference is empty — WER is undefined, not 0).
    One Arrow pass over the pair table, no shuffle, no corpus state.
    """

    @pandas_udf(T.StructType([
        T.StructField("wer_distance", T.LongType()),
        T.StructField("ref_words", T.LongType()),
        T.StructField("hyp_words", T.LongType()),
    ]))
    def _wer(refs: pd.Series, hyps: pd.Series) -> pd.DataFrame:
        rows = [wer_distance_np(r, h) for r, h in zip(refs, hyps)]
        return pd.DataFrame(
            rows, columns=["wer_distance", "ref_words", "hyp_words"])

    w = _wer(F.col(ref_col), F.col(hyp_col))
    out = (df.select(F.col(id_col), w.alias("__w__"))
           .select(id_col, "__w__.ref_words", "__w__.hyp_words",
                   "__w__.wer_distance"))
    # true integer div (not double-divide + cast): bit-exact vs the
    # integer-div SQL oracle even past double's 2^53 exact range
    permille = (F.when(F.col("ref_words") == 0, F.lit(None))
                .otherwise(F.expr(
                    "wer_distance * 1000L div ref_words")))
    return out.withColumn("wer_permille", permille)
