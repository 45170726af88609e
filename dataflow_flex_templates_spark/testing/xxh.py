"""Pure-Python XXH64 — independent twin of Spark's ``F.xxhash64``.

XXH64 is a public, fully specified algorithm (Yann Collet's xxHash,
BSD-licensed spec); this is a from-scratch implementation used ONLY as
a test/oracle twin so hash-derived operators (simhash, minhash) can be
verified against something that is not Spark itself. Spark's
``xxhash64(col)`` hashes a string column's UTF-8 bytes with seed 42 and
returns the result as a SIGNED 64-bit long; ``xxh64_signed`` mirrors
that convention.

Performance does not matter here (oracle-side only); clarity does.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1

#: Spark's default seed for xxhash64 (Catalyst XxHash64 expression).
SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M64


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data`` → unsigned 64-bit int."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while pos + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[pos:pos + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[pos + 8:pos + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[pos + 16:pos + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[pos + 24:pos + 32], "little"))
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        k1 = _round(0, int.from_bytes(data[pos:pos + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        pos += 8
    if pos + 4 <= n:
        h ^= (int.from_bytes(data[pos:pos + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxh64_signed(data: bytes | str, seed: int = SPARK_SEED) -> int:
    """Java-long view of :func:`xxh64` (what Spark's column returns).
    Strings are hashed as UTF-8, matching Catalyst's UTF8String path."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    return _to_signed(xxh64(data, seed))


def xxh64_long(value: int, seed: int = SPARK_SEED) -> int:
    """Spark's xxhash64 of a LongType column: the raw 8-byte
    little-endian value through one tail-round (Catalyst hashes fixed
    64-bit inputs via hashLong). Returns signed."""
    return _to_signed(xxh64(int(value).to_bytes(8, "little", signed=True),
                            seed))


def xxh64_int(value: int, seed: int = SPARK_SEED) -> int:
    """Spark's xxhash64 of an IntegerType value (e.g. ``F.lit(i)`` for
    a small Python int): Catalyst's hashInt — the 4-byte XXH64 tail
    path. Returns signed."""
    return _to_signed(
        xxh64((int(value) & 0xFFFFFFFF).to_bytes(4, "little"), seed))
