"""Bloom-gated streaming first-occurrence dedup — O(1)-memory dedup
state at 10^12-key scale.

The north rule's keyed LWW dedup (streaming/dedup_state.py) holds one
state entry per live key; at 10^12 distinct keys even watermark-evicted
exact state is the dominant cost. The classic trade is a per-shard
Bloom filter: "definitely new" keys emit and insert, "maybe seen" keys
are suppressed — no duplicate ever emits twice (no false negatives),
at the price of wrongly suppressing a tiny, DETERMINISTIC set of
first occurrences (false positives of the hash positions, a pure
function of the key sequence — not of timing). State per shard is
exactly ``m_bits/64`` int64 words, forever, regardless of key count.

Determinism contract: keys route to shards by ``xxh64(key) % n_shards``
and each shard processes rows in (event_time, ordinal) order via the
same watermark-gated buffer pattern as streaming/cep.py — so emissions
are a pure function of the input set, byte-equal between the batch
path, the streaming path, and the pure-python twin the oracle pins its
false-positive victims from. All hashing is the pure-python XXH64 twin
(testing/xxh.py) — the kernel never depends on a JVM hash, so the
no-Spark oracle reproduces it exactly.

Output: emission records (key, event_time, ordinal), narrow by design
(payloads join back on the unique triple).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dataflow_flex_templates_spark.testing.xxh import xxh64_long

_M63 = (1 << 63)
_M64 = (1 << 64) - 1


def _positions(key: int, m_bits: int, k: int) -> list[int]:
    """Kirsch–Mitzenmacher double hashing over one XXH64 (same scheme
    as operators/sketch.py bloom, but via the python twin so the
    kernel is engine-independent)."""
    h = xxh64_long(int(key)) & _M64
    h1 = (h >> 32) & 0xFFFFFFFF
    h2 = ((h & 0xFFFFFFFF) | 1)
    return [(h1 + i * h2) % m_bits for i in range(k)]


def run_bloom_dedup(
    items: list[tuple[int, int, int]],
    words: list[int],
    m_bits: int,
    k: int,
) -> tuple[list[tuple[int, int, int]], list[int]]:
    """Feed time-ordered (ts_us, ord, key) triples through the bloom
    gate. Returns (emitted triples, updated words). Pure python —
    shared by the streaming state function, the batch path, and the
    oracle twin. ``words`` is a mutable list of m_bits/64 ints
    (signed-int64 range, two's complement)."""
    emitted: list[tuple[int, int, int]] = []
    for ts, o, key in items:
        pos = _positions(key, m_bits, k)
        seen = True
        for p in pos:
            w = words[p >> 6] & _M64
            if not (w >> (p & 63)) & 1:
                seen = False
                break
        if not seen:
            for p in pos:
                w = (words[p >> 6] & _M64) | (1 << (p & 63))
                words[p >> 6] = w - (1 << 64) if w & _M63 else w
            emitted.append((ts, o, key))
    return emitted, words


def _out_schema(key_field: T.StructField) -> T.StructType:
    return T.StructType([
        key_field,
        T.StructField("event_time", T.TimestampType()),
        T.StructField("ord", T.LongType()),
    ])


def _shard_col(key_col: str, n_shards: int):
    # JVM xxhash64 == python twin (verified in tests/test_twins.py),
    # so routing agrees between Spark planning and the python kernel.
    return F.pmod(F.xxhash64(F.col(key_col).cast("long")),
                  F.lit(n_shards)).alias("__shard__")


def _collect_triples(pdf: pd.DataFrame, key_col: str,
                     event_time_col: str,
                     ordinal_col: str | None) -> list[tuple[int, int, int]]:
    ts = (pdf[event_time_col].astype("datetime64[us]").astype("int64"))
    ords = (pdf[ordinal_col].astype("int64") if ordinal_col
            else pd.Series([0] * len(pdf), index=pdf.index))
    keys = pdf[key_col].astype("int64")
    return list(zip((int(x) for x in ts), (int(o) for o in ords),
                    (int(v) for v in keys)))


def _emit_frame(emitted, key_col: str) -> pd.DataFrame:
    # explicit dtypes so a zero-emission frame keeps timestamp/int64
    # columns (an empty plain list infers float64, which Arrow refuses
    # to cast to timestamp)
    return pd.DataFrame({
        key_col: pd.Series([v for _, _, v in emitted], dtype="int64"),
        "event_time": pd.to_datetime([t for t, _, _ in emitted],
                                     unit="us"),
        "ord": pd.Series([o for _, o, _ in emitted], dtype="int64"),
    })


def bloom_dedup_batch(
    df: DataFrame,
    key_col: str,
    event_time_col: str = "event_time",
    ordinal_col: str | None = None,
    m_bits: int = 1 << 15,
    n_shards: int = 8,
    k: int = 4,
) -> DataFrame:
    """Batch bloom-gated first-occurrence dedup: one Arrow pass per
    shard group, rows scanned in (event_time, ordinal) order through
    the shared kernel."""
    key_field = df.schema[key_col]
    out_schema = _out_schema(key_field)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        triples = sorted(_collect_triples(pdf, key_col, event_time_col,
                                          ordinal_col))
        emitted, _ = run_bloom_dedup(triples, [0] * (m_bits // 64),
                                     m_bits, k)
        return _emit_frame(emitted, key_col)

    return (df.withColumn("__shard__", _shard_col(key_col, n_shards))
            .groupBy("__shard__").applyInPandas(fn, out_schema))


_STATE_SCHEMA = T.StructType([
    T.StructField("buf_ts", T.ArrayType(T.LongType())),   # micros
    T.StructField("buf_ord", T.ArrayType(T.LongType())),
    T.StructField("buf_key", T.ArrayType(T.LongType())),
    T.StructField("words", T.ArrayType(T.LongType())),
])


def bloom_dedup_stream(
    df: DataFrame,
    key_col: str,
    event_time_col: str = "event_time",
    ordinal_col: str | None = None,
    m_bits: int = 1 << 15,
    n_shards: int = 8,
    k: int = 4,
    idle_evict_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming bloom dedup over a watermarked DataFrame: rows buffer
    per shard until the watermark finalizes them, then run through
    :func:`run_bloom_dedup` in event-time order. Unlike the other
    stateful ops the words array is the PRODUCT, not scaffolding — the
    shard's filter persists for the stream's lifetime (that's the O(1)
    guarantee), so the idle timeout only re-arms; it never removes."""
    key_field = df.schema[key_col]
    out_schema = _out_schema(key_field)
    n_words = m_bits // 64

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        buf_ts, buf_ord, buf_key, words = (
            state.get if state.exists else ([], [], [], [0] * n_words))
        pending = list(zip(buf_ts, buf_ord, buf_key))
        if not state.hasTimedOut:
            for pdf in pdfs:
                if pdf.empty:
                    continue
                pending.extend(_collect_triples(
                    pdf, key_col, event_time_col, ordinal_col))
            pending.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000
        cut = 0
        while cut < len(pending) and pending[cut][0] <= wm_us:
            cut += 1
        final, rest = pending[:cut], pending[cut:]
        emitted, words = run_bloom_dedup(final, list(words), m_bits, k)
        state.update(([t for t, _, _ in rest], [o for _, o, _ in rest],
                      [v for _, _, v in rest], words))
        # buffered rows must flush as soon as the watermark passes them
        # even if this shard sees no new traffic: arm the timeout just
        # past the current watermark; idle (empty-buffer) shards re-arm
        # on the long eviction horizon instead.
        wm_ms = max(wm_us // 1000, 0)
        state.setTimeoutTimestamp(wm_ms + (1 if rest else idle_evict_ms))
        if emitted:
            yield _emit_frame(emitted, key_col)

    return (df.withColumn("__shard__", _shard_col(key_col, n_shards))
            .groupBy("__shard__").applyInPandasWithState(
                fn,
                outputStructType=out_schema,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            ))
