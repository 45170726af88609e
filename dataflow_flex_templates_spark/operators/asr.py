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


def speaking_rate_gate(df: DataFrame, dur_col: str = "dur_ms",
                       transcript_col: str = "transcript",
                       min_wpm: int = 150,
                       max_wpm: int = 900) -> DataFrame:
    """Cross-modal alignment gate: words-per-minute of the transcript
    against the AUDIO duration — the cheap curation check that catches
    clip↔transcript mis-pairings (a 3 s clip carrying a paragraph, an
    hour of audio with one sentence) before any decode or WER pass
    runs. Appends per-row integer columns:

    - ``n_words`` / ``n_chars`` — whitespace tokens / trimmed length
      (empty or all-space transcript → 0 words, not 1 — the
      split-of-empty-string trap handled explicitly);
    - ``wpm_x10`` / ``cps_x10`` — rate × 10, true integer ``div`` (so
      the SQL oracle is bit-exact; NULL when duration is 0);
    - ``rate_flag`` — 'slow' / 'ok' / 'fast' vs [min_wpm, max_wpm];
      'undetermined' when the rate is NULL (zero/NULL duration) — a
      clip whose rate cannot be computed must NOT silently pass the
      gate (the NULL-falls-through-when()-to-otherwise trap).

    Scale: pure JVM expressions over the existing partitioning — zero
    shuffle, zero Python; the gate runs BEFORE decode so mis-paired
    payload bytes are never touched. Reference parity: a §2.11
    extension over the north-rule clip+transcript table shape."""
    t = F.trim(F.col(transcript_col))
    n_words = (F.when(F.length(t) == 0, F.lit(0))
               .otherwise(F.size(F.split(t, r"\s+"))).cast("long"))
    out = (df.withColumn("n_words", n_words)
           .withColumn("n_chars", F.length(t).cast("long"))
           .withColumn("wpm_x10", F.expr(
               f"n_words * 600000L div nullif(cast({dur_col} as "
               f"bigint), 0)"))
           .withColumn("cps_x10", F.expr(
               f"n_chars * 10000L div nullif(cast({dur_col} as "
               f"bigint), 0)")))
    return out.withColumn(
        "rate_flag",
        F.when(F.col("wpm_x10").isNull(), F.lit("undetermined"))
        .when(F.col("wpm_x10") < min_wpm * 10, F.lit("slow"))
        .when(F.col("wpm_x10") > max_wpm * 10, F.lit("fast"))
        .otherwise(F.lit("ok")))


def word_timestamps(df: DataFrame, id_col: str = "doc_id",
                    dur_col: str = "dur_ms",
                    text_col: str = "text",
                    max_words: int = 4096) -> DataFrame:
    """Per-word timing interpolation: spread a clip's duration over
    its transcript words proportionally to word length — the standard
    fallback when the ASR decoder emits only utterance-level
    boundaries but the training pipeline needs word-level timestamps
    (CTC-less forced-alignment substitute; also the subtitle-cue
    splitter's input).

    One output row per word: ``(id, word_idx, word, start_ms,
    end_ms)`` with integer-exact boundaries::

        total      = sum(length(word_i))           -- spaces excluded
        start_ms_i = dur_ms * cum_before_i div total
        end_ms_i   = dur_ms * (cum_before_i + len_i) div total

    so ``end_ms`` of the last word is exactly ``dur_ms``, boundaries
    are monotone, and adjacent words share a boundary (no gaps/overlap
    — subtitle-safe). Empty/whitespace-only transcripts produce zero
    rows (not a zero-length word).

    Scale: zero shuffle — the cumulative offsets are computed INSIDE
    the per-row word array with one ``aggregate`` fold, then
    ``posexplode``d; no window function, so no (id, word) shuffle ever
    happens and the operator inherits the input partitioning. The
    fold's ``array_append`` is O(words²) per ROW (not per key) — words
    per transcript is bounded by the row width (~10²), unlike the
    per-key series the streaming EWMA kernel handles, so the quadratic
    term is a few KB of copying per row.

    ``max_words`` bounds that quadratic term against adversarial input
    (an hour-long talk fed as ONE row is ~10⁴ words → ~10⁸ struct
    copies per row): transcripts with more than ``max_words`` words
    skip the fold entirely and surface as a single POISON row — the id
    with every payload column NULL (``word_idx`` included) — so the
    caller can count/route them instead of silently losing rows or
    stalling an executor. The default (4096 ≈ 27 min of speech) is far
    above any sane per-clip transcript; pass a larger value only with
    the quadratic cost in mind.

    Reference parity: none (§2.11 extension; the reference has no
    audio/ASR surface). Oracle: identical integer algebra in DuckDB
    via unnest + generate_subscripts + window cumsum.
    """
    if max_words <= 0:
        raise ValueError(f"max_words must be positive, got {max_words}")
    words = F.expr(
        f"filter(split(trim({text_col}), '\\\\s+'), w -> w != '')")
    # fold → array<struct<w, s, e>> of (word, cum_before, cum_after)
    timed = F.expr("""
        aggregate(
          __words__,
          struct(cast(array() as array<struct<w:string,s:bigint,e:bigint>>)
                   AS acc,
                 0L AS cum),
          (st, w) -> struct(
            array_append(st.acc,
                         struct(w AS w, st.cum AS s,
                                st.cum + length(w) AS e)),
            st.cum + length(w)),
          st -> st.acc)
    """)
    total = F.expr("aggregate(__words__, 0L, (a, w) -> a + length(w))")
    ex = (df.select(F.col(id_col), F.col(dur_col).cast("long")
                    .alias("__dur__"), words.alias("__words__"))
          .filter(F.size("__words__") > 0)
          # overflow guard: null the word array BEFORE the fold so the
          # O(words²) copy never runs; aggregate(NULL,...) is NULL and
          # posexplode_outer(NULL) emits exactly one all-NULL poison row
          .withColumn("__words__", F.expr(
              f"if(size(__words__) <= {int(max_words)}, __words__, "
              "cast(null as array<string>))"))
          .select(id_col, "__dur__", timed.alias("__timed__"),
                  total.alias("__total__"))
          # *_outer: Generate with outer=false triggers Catalyst's
          # InferFiltersFromGenerate, which clones the whole fold into
          # a Filter condition (size(..)>0 AND isnotnull(..)) and
          # evaluates it up to 3x per row; outer=true skips the
          # inferred filter, and the words-filter above already
          # guarantees the array is non-empty (no null rows appear)
          .select(id_col, "__dur__", "__total__",
                  F.posexplode_outer("__timed__")
                  .alias("word_idx", "__t__")))
    return ex.select(
        F.col(id_col),
        F.col("word_idx").cast("long").alias("word_idx"),
        F.col("__t__.w").alias("word"),
        F.expr("__dur__ * __t__.s div __total__").alias("start_ms"),
        F.expr("__dur__ * __t__.e div __total__").alias("end_ms"))


def subtitle_cues(df: DataFrame, cue_ms: int = 3000,
                  id_col: str = "doc_id", dur_col: str = "dur_ms",
                  text_col: str = "text",
                  max_words: int = 4096) -> DataFrame:
    """Subtitle-cue segmentation: cut each clip's word-level timeline
    (the :func:`word_timestamps` interpolation) into display cues on a
    fixed ``cue_ms`` media-time grid — a word belongs to the cue
    containing its start (``start_ms div cue_ms``), so cues never
    reorder words and every word lands in exactly one cue. The fixed
    grid (vs greedy char-capped packing) is the same deterministic-
    grid-over-running-state choice ``text.pack_chunks`` makes: it
    keeps the operator stateless per row AND bit-reproducible in ANSI
    SQL, where a greedy fold would need a recursive CTE.

    One output row per cue: ``(id, cue_idx, start_ms, end_ms,
    n_words, text, cps_x10)`` where ``start_ms``/``end_ms`` are the
    first word's start / last word's end (tighter than the grid cell),
    ``text`` is the words in timeline order, and ``cps_x10`` is the
    reading-speed QA gate subtitle pipelines apply (chars/sec × 10,
    spaces included, integer div — the usual accept bar is ≤ ~20 cps,
    i.e. ``cps_x10 <= 200``).

    Scale: zero shuffle, like :func:`word_timestamps` — timing AND
    cue grouping are two ``aggregate`` folds INSIDE the per-row word
    array (cue buckets are monotone along the timeline, so grouping is
    a last-element merge), then one ``posexplode``. The merge's
    slice-and-copy is O(words²) per ROW, bounded by row width — and
    hard-bounded by ``max_words``: transcripts longer than that skip
    both folds and surface as a single all-NULL-payload POISON row
    (same contract as :func:`word_timestamps`), so an hour-long
    transcript fed as one row degrades to a routable marker instead of
    an executor stall.

    Reference parity: none (§2.11 extension). Oracle: GROUP BY
    ``start_ms // cue_ms`` over the word_timestamps integer algebra.
    """
    if cue_ms <= 0:
        raise ValueError(f"cue_ms must be positive, got {cue_ms}")
    if max_words <= 0:
        raise ValueError(f"max_words must be positive, got {max_words}")
    words = F.expr(
        f"filter(split(trim({text_col}), '\\\\s+'), w -> w != '')")
    total = F.expr("aggregate(__words__, 0L, (a, w) -> a + length(w))")
    # fold 1 → array<struct<w, s, e>> with integer-exact ms boundaries
    timed = F.expr("""
        aggregate(
          __words__,
          struct(cast(array() as array<struct<w:string,s:bigint,e:bigint>>)
                   AS acc,
                 0L AS cum),
          (st, w) -> struct(
            array_append(st.acc,
              named_struct(
                'w', w,
                's', __dur__ * st.cum div __total__,
                'e', __dur__ * (st.cum + length(w)) div __total__)),
            st.cum + length(w)),
          st -> st.acc)
    """)
    # fold 2 → array<struct<b, s, e, n, txt>>: merge-into-last while
    # the word's cue bucket matches the open cue (buckets are monotone)
    cues = F.expr(f"""
        aggregate(
          __timed__,
          cast(array() as
               array<struct<b:bigint,s:bigint,e:bigint,n:bigint,txt:string>>),
          (acc, t) -> if(
            size(acc) > 0
              and element_at(acc, -1).b = t.s div {cue_ms}L,
            concat(
              slice(acc, 1, size(acc) - 1),
              array(named_struct(
                'b',   element_at(acc, -1).b,
                's',   element_at(acc, -1).s,
                'e',   t.e,
                'n',   element_at(acc, -1).n + 1L,
                'txt', concat(element_at(acc, -1).txt, ' ', t.w)))),
            array_append(acc, named_struct(
              'b', t.s div {cue_ms}L, 's', t.s, 'e', t.e,
              'n', 1L, 'txt', t.w))))
    """)
    ex = (df.select(F.col(id_col), F.col(dur_col).cast("long")
                    .alias("__dur__"), words.alias("__words__"))
          .filter(F.size("__words__") > 0)
          # overflow guard (see word_timestamps): NULL array short-
          # circuits both folds; explode_outer(NULL) = one poison row
          .withColumn("__words__", F.expr(
              f"if(size(__words__) <= {int(max_words)}, __words__, "
              "cast(null as array<string>))"))
          .withColumn("__total__", total)
          .withColumn("__timed__", timed)
          .select(id_col, cues.alias("__cues__"))
          # explode_outer for the same InferFiltersFromGenerate reason
          # as word_timestamps: keeps the double fold evaluated ONCE
          .select(id_col, F.explode_outer("__cues__").alias("__c__")))
    return ex.select(
        F.col(id_col),
        F.col("__c__.b").alias("cue_idx"),
        F.col("__c__.s").alias("start_ms"),
        F.col("__c__.e").alias("end_ms"),
        F.col("__c__.n").alias("n_words"),
        F.col("__c__.txt").alias("text"),
        # chars/sec x10, zero-duration cues -> NULL (integer div by 0)
        F.expr("if(__c__.e > __c__.s, "
               "length(__c__.txt) * 10000L div (__c__.e - __c__.s), "
               "cast(null as bigint))").alias("cps_x10"))


def srt_render(cues: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Render :func:`subtitle_cues` output into SubRip (SRT) fields —
    the sequence number, the ``HH:MM:SS,mmm --> HH:MM:SS,mmm`` timing
    line, and the assembled block — the exact text a subtitle sink
    writes per cue.

    SRT sequence numbers must be 1-based and CONTIGUOUS per document
    even though cue grid cells can be empty (a cell with no word
    STARTS in it emits no cue), so the operator ranks cues by
    ``cue_idx`` inside each document: ONE keyed shuffle on the id —
    the only exchange (the timing/format algebra is per-row). All
    timestamp arithmetic is bigint div/mod on milliseconds; the
    format itself is C-style %02d/%03d padding, identical across
    engines, so the rendered strings hash-compare exactly.

    Reference parity: none (§2.11 extension). Oracle: row_number +
    printf over the subtitle_cues algebra.
    """
    from pyspark.sql import Window

    seq = F.row_number().over(
        Window.partitionBy(id_col).orderBy("cue_idx"))

    def _ts(col: str) -> list:
        return [F.expr(f"{col} div 3600000"),
                F.expr(f"{col} div 60000 % 60"),
                F.expr(f"{col} div 1000 % 60"),
                F.expr(f"{col} % 1000")]

    timing = F.format_string(
        "%02d:%02d:%02d,%03d --> %02d:%02d:%02d,%03d",
        *_ts("start_ms"), *_ts("end_ms"))
    out = (cues.withColumn("srt_seq", seq)
           .withColumn("timing", timing)
           # concat (not concat_ws): NULL text/timing — the poison rows
           # the max_words guard emits — must propagate to a NULL
           # block, matching SQL || semantics, not be silently skipped
           .withColumn("srt_block",
                       F.concat(F.col("srt_seq").cast("string"),
                                F.lit("\n"), F.col("timing"),
                                F.lit("\n"), F.col("text"))))
    return out.select(id_col, "srt_seq", "cue_idx", "start_ms",
                      "end_ms", "timing", "text", "srt_block")


#: LCG multiplier/increment (glibc's rand constants) — the point is a
#: deterministic, engine-portable integer recurrence, not entropy.
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2147483648  # 2^31


def specaugment_plan(df: DataFrame, id_col: str = "doc_id",
                     dur_col: str = "dur_ms", hop_ms: int = 10,
                     n_mels: int = 80, max_t: int = 100,
                     max_f: int = 27) -> DataFrame:
    """SpecAugment mask PLANNING (Park et al. 2019): for each clip,
    derive one time mask and one frequency mask over its mel
    spectrogram — deterministically, so the plan (not the draw) is
    what ships to the masking UDF and every re-run/retry/engine
    re-derives identical masks. Randomness is a seeded LCG on the row
    id: three chained ``(a·x + c) mod 2^31`` steps pick t-width,
    t-start, f-width/f-start — pure bigint algebra, bit-equal in any
    SQL engine, no RNG state on executors.

    Widths follow the paper's policy shapes: ``t_w = r mod (min(max_t,
    n_frames div 2) + 1)`` (time mask capped at half the clip so short
    clips are never obliterated), ``f_w = r mod (max_f + 1)`` capped
    at ``n_mels - 1``; starts are uniform over the valid range.
    ``n_frames = dur_ms div hop_ms``; rows too short for even one
    frame emit NULL mask columns (poison-style, routable).

    Scale: zero shuffle — five integer expressions per row on top of
    the scan; the plan inherits input partitioning and composes with
    the decode/mel UDF in the same stage.

    Reference parity: none (§2.11 extension — augmentation planning
    for ASR training pipelines). Oracle: the identical LCG algebra.
    """
    if hop_ms <= 0 or n_mels <= 1 or max_t <= 0 or max_f <= 0:
        raise ValueError("hop_ms/max_t/max_f must be positive, "
                         "n_mels > 1")
    n_frames = F.expr(f"cast({dur_col} as bigint) div {hop_ms}")
    d = (df.select(F.col(id_col),
                   n_frames.alias("n_frames"))
         .withColumn("__r1__", F.expr(
             f"(cast({id_col} as bigint) * {_LCG_A} + {_LCG_C}) "
             f"% {_LCG_M}"))
         .withColumn("__r2__", F.expr(
             f"(__r1__ * {_LCG_A} + {_LCG_C}) % {_LCG_M}"))
         .withColumn("__r3__", F.expr(
             f"(__r2__ * {_LCG_A} + {_LCG_C}) % {_LCG_M}")))
    t_cap = f"least(cast({max_t} as bigint), n_frames div 2)"
    f_cap = f"least(cast({max_f} as bigint), {n_mels - 1})"
    d = (d.withColumn("t_mask_w", F.expr(
            f"if(n_frames >= 1, __r1__ % ({t_cap} + 1L), "
            "cast(null as bigint))"))
         .withColumn("t_mask_start", F.expr(
            "if(n_frames >= 1, "
            "__r2__ % (n_frames - t_mask_w + 1L), "
            "cast(null as bigint))"))
         .withColumn("f_mask_w", F.expr(
            f"if(n_frames >= 1, __r2__ % ({f_cap} + 1L), "
            "cast(null as bigint))"))
         .withColumn("f_mask_start", F.expr(
            f"if(n_frames >= 1, "
            f"__r3__ % ({n_mels}L - f_mask_w), "
            "cast(null as bigint))")))
    return d.select(id_col, "n_frames", "t_mask_start", "t_mask_w",
                    "f_mask_start", "f_mask_w")
