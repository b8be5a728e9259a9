"""Hash functions.

Two families, for two different jobs:

1. ``xxhash64_str`` — xxHash64 (seed 0) of UTF-8 bytes, the hash the
   reference system uses for query hashing and ``other_content_ids``
   keys (reference: pipeline/.../common/util/StringUtil.java:41-48,
   which pins "compatible with cespare/xxhash Sum64String").
   Spark's built-in ``xxhash64()`` uses seed 42 over Spark's internal
   row encoding, so it is NOT wire-compatible — this is a from-spec
   pure-Python implementation (xxHash is a public spec/BSD reference),
   exposed as a vectorized pandas UDF for the rare hot path that needs
   it. Golden-value tests pin the spec vectors.

2. ``portable_hash60`` — a 60-bit hash derived from md5 that has the
   SAME value when computed by Spark SQL and by DuckDB SQL
   (``conv(substr(md5(x),1,15),16,10)`` vs
   ``('0x'||substr(md5(x),1,15))::BIGINT``). Used wherever an operator
   result containing hashes must cross-check against the DuckDB oracle
   (exact dedup keys, shingle ids, MinHash bases). md5 is JVM-side and
   codegen'd in Spark — no Python in the hot path.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# portable md5-based hash (Spark SQL <-> DuckDB SQL parity)
# ---------------------------------------------------------------------------

_MASK64 = (1 << 64) - 1


def portable_hash60(col: Column | str) -> Column:
    """60-bit non-negative hash of a string column; JVM-side (md5+conv).

    15 hex chars = 60 bits, always fits a signed 64-bit long.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def portable_hash60_sql(expr: str) -> str:
    """The DuckDB-SQL spelling of :func:`portable_hash60`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------------------
# xxHash64, seed 0, from the public spec
# ---------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _MASK64
    return (_rotl(acc, 31) * _P1) & _MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _MASK64


def xxhash64_bytes(data: bytes, seed: int = 0) -> int:
    """xxHash64 of ``data`` with the given seed (default 0)."""
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK64
        v2 = (seed + _P2) & _MASK64
        v3 = seed
        v4 = (seed - _P1) & _MASK64
        i = 0
        limit = n - 32
        while i <= limit:
            lanes = struct.unpack_from("<4Q", data, i)
            v1 = _round(v1, lanes[0])
            v2 = _round(v2, lanes[1])
            v3 = _round(v3, lanes[2])
            v4 = _round(v4, lanes[3])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK64
        i = 0
    h = (h + n) & _MASK64
    while i + 8 <= n:
        (k1,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k1)
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK64
        i += 8
    if i + 4 <= n:
        (k1,) = struct.unpack_from("<I", data, i)
        h ^= (k1 * _P1) & _MASK64
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK64
        h = (_rotl(h, 11) * _P1) & _MASK64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK64
    h ^= h >> 29
    h = (h * _P3) & _MASK64
    h ^= h >> 32
    return h


def xxhash64_str(s: str, seed: int = 0) -> int:
    return xxhash64_bytes(s.encode("utf-8"), seed)


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


@F.pandas_udf(T.LongType())
def xxhash64_udf(s: pd.Series) -> pd.Series:  # pragma: no cover - thin wrapper
    """Vectorized (Arrow-batched) xxHash64-seed-0 of a string column,
    returned as a signed 64-bit long (two's complement, matching how a
    JVM long would carry it).

    Hashes each DISTINCT value once per Arrow batch and fans the
    result back out through a lookup table: the per-string Python
    xxhash is the expensive part, and the real inputs (query strings,
    content ids) repeat heavily — at sf0.1 the counter job hashes
    ~60k rows with only ~100 distinct queries, so the LUT cuts the
    Python hash work ~600x for identical output. Worst case (all
    values unique) adds one dict build over the batch — noise next
    to the hashing itself."""
    lut = {
        x: _to_signed64(xxhash64_str(x)) for x in pd.unique(s.dropna())
    }
    return s.map(lambda x: None if x is None else lut[x])


def java_string_hash(s: str) -> int:
    """Java ``String.hashCode`` — the 32-bit polynomial hash the
    reference keys other-content-id maps on (StringUtil.hash,
    common/util/StringUtil.java:75-82; the reference pins it with its
    own test so the JDK can't drift under it). Signed 32-bit result."""
    h = 0
    for ch in s:
        h = (31 * h + ord(ch)) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h
