"""xxHash64 (seed 0) as pure ANSI/DuckDB SQL — the oracle-side twin of
``functions.hashing.xxhash64_str``.

The reference pins query hashing to cespare/xxhash ``Sum64String``
(reference: common/util/StringUtil.java:41-58, FlatUtil.java:845-882).
The Spark path computes it with the vectorized pandas UDF
(``hashing.xxhash64_udf``, golden-pinned in tests/test_hashing.py).
For the DuckDB correctness oracle the same hash must be expressible in
SQL, so this module *generates* an unrolled xxHash64 over the string's
bytes:

- valid for ASCII strings of ``strlen(s) <= 31`` — below the 32-byte
  stripe threshold, xxHash64 is a straight line of at most 3×8-byte
  chunks, one 4-byte chunk and 3 tail bytes, each step guarded by a
  CASE on the length. (Query keys in the test data are <= 4 chars;
  tests/test_hashing.py verifies the generator against the Python
  implementation for random strings of every length 0..31.)
- every step is its own nested-subquery projection level: a lateral
  alias chain would textually inline each step into the next and grow
  the expression tree exponentially.
- 64×64-bit modular multiplication splits the variable operand into
  32-bit halves so partial products stay under signed INT128.
"""

from __future__ import annotations

M = 1 << 64
PRIME1 = 11400714785074694791
PRIME2 = 14029467366897019727
PRIME3 = 1609587929392839161
PRIME4 = 9650029242287828579
PRIME5 = 2870177450012600261


def _mul(a: str, b: int) -> str:
    # 64x64 -> mod 2^64 without overflowing signed INT128: split `a`
    # into 32-bit halves; each partial product stays < 2^96.
    hi = f"((((({a}) // {1 << 32}) * {b}::HUGEINT) % {1 << 32}) * {1 << 32})"
    lo = f"((({a}) % {1 << 32}) * {b}::HUGEINT)"
    return f"((({hi}) + ({lo})) % {M})"


def _rotl(x: str, r: int) -> str:
    # disjoint bit ranges, so | is +
    return f"(((({x}) * {1 << r}) % {M}) + (({x}) // {1 << (64 - r)}))"


def _xor(a: str, b: str) -> str:
    return f"xor(({a})::UBIGINT, ({b})::UBIGINT)::HUGEINT"


def xxhash64_sql(
    inner_sql: str, s: str = "__q", out: str = "__hash", seed: int = 0
) -> str:
    """Wrap subquery ``inner_sql`` (producing string column ``s`` plus
    any passthrough columns) in nested projections that add ``out`` =
    xxhash64(``seed``) of ``s`` as HUGEINT in [0, 2^64). ASCII-only,
    strlen(s) <= 31 (no 32-byte stripe loop). seed=0 matches the
    reference's cespare Sum64String; seed=42 matches Spark's built-in
    ``xxhash64(string_col)`` (UTF8String bytes, same straight line)."""

    def chunk(off: str, nbytes: int) -> str:
        # little-endian integer of `nbytes` bytes at 1-based offset
        return (
            "("
            + " + ".join(
                f"ord(substr({s}, ({off}) + {j}, 1))::HUGEINT * {1 << (8 * j)}"
                for j in range(nbytes)
            )
            + ")"
        )

    L = f"strlen({s})"
    q = (
        f"(SELECT *, ({(seed + PRIME5) % M} + {L}) % {M} AS __h0"
        f" FROM ({inner_sql}))"
    )
    h = "__h0"
    for j in range(3):  # up to 3 full 8-byte chunks
        k = _mul(_rotl(_mul(chunk(str(8 * j + 1), 8), PRIME2), 31), PRIME1)
        nh = f"(({_mul(_rotl(_xor(h, k), 27), PRIME1)} + {PRIME4}) % {M})"
        q = (
            f"(SELECT *, CASE WHEN {L} >= {8 * (j + 1)} THEN {nh} "
            f"ELSE {h} END AS __h{j + 1} FROM {q})"
        )
        h = f"__h{j + 1}"
    off4 = f"(8 * (({L}) // 8) + 1)"  # 4-byte chunk when (len % 8) >= 4
    nh = f"(({_mul(_rotl(_xor(h, _mul(chunk(off4, 4), PRIME1)), 23), PRIME2)} + {PRIME3}) % {M})"
    q = f"(SELECT *, CASE WHEN ({L}) % 8 >= 4 THEN {nh} ELSE {h} END AS __h4 FROM {q})"
    h = "__h4"
    rem = f"(CASE WHEN ({L}) % 8 >= 4 THEN ({L}) % 4 ELSE ({L}) % 8 END)"
    for t in range(3):  # up to 3 tail bytes
        pos = f"(({L}) - {rem} + 1 + {t})"
        byte = f"(ord(substr({s}, {pos}, 1))::HUGEINT * {PRIME5}) % {M}"
        nh = _mul(_rotl(_xor(h, byte), 11), PRIME1)
        q = (
            f"(SELECT *, CASE WHEN {rem} >= {t + 1} THEN {nh} "
            f"ELSE {h} END AS __h{5 + t} FROM {q})"
        )
        h = f"__h{5 + t}"
    # avalanche
    q = f"(SELECT *, {_xor(h, f'({h}) // {1 << 33}')} AS __av1 FROM {q})"
    q = f"(SELECT *, {_mul('__av1', PRIME2)} AS __av2 FROM {q})"
    q = f"(SELECT *, {_xor('__av2', f'__av2 // {1 << 29}')} AS __av3 FROM {q})"
    q = f"(SELECT *, {_mul('__av3', PRIME3)} AS __av4 FROM {q})"
    q = f"(SELECT *, {_xor('__av4', f'__av4 // {1 << 32}')} AS {out} FROM {q})"
    return q


def query_hex_sql(inner_sql: str, s: str = "__q", out: str = "query_hex") -> str:
    """Java ``Long.toHexString(xxhash64(s))``: lowercase hex, no
    leading zeros (FlatUtil.getQueryHashHex). Wraps ``xxhash64_sql``."""
    hashed = xxhash64_sql(inner_sql, s=s, out="__qh")
    return (
        f"(SELECT *, lower(hex(__qh::UBIGINT)) AS {out} FROM {hashed})"
    )


def xxhash64_long_sql(
    inner_sql: str, v: str = "__v", out: str = "__hash", seed: int = 42
) -> str:
    """Spark's built-in ``xxhash64(bigint_col)`` — XxHash64.hashLong
    with Spark's default seed 42 — as DuckDB SQL, so sketches keyed on
    the JVM-codegen hash are reproducible in the oracle.

    Wraps subquery ``inner_sql`` (producing non-null BIGINT column
    ``v`` plus passthrough columns) in projections that add ``out`` =
    the hash as HUGEINT in [0, 2^64). An 8-byte input is one straight
    line: h = seed + P5 + 8; one chunk fold; the avalanche — no length
    CASEs needed (cross-checked against pyspark in
    tests/test_sketches.py).
    """
    u = f"(CASE WHEN ({v}) < 0 THEN ({v})::HUGEINT + {M} ELSE ({v})::HUGEINT END)"
    q = f"(SELECT *, {u} AS __u FROM ({inner_sql}))"
    h0 = (seed + PRIME5 + 8) % M
    k1 = _mul(_rotl(_mul("__u", PRIME2), 31), PRIME1)
    q = f"(SELECT *, {k1} AS __k1 FROM {q})"
    h = f"(({_mul(_rotl(_xor(str(h0), '__k1'), 27), PRIME1)} + {PRIME4}) % {M})"
    q = f"(SELECT *, {h} AS __hl FROM {q})"
    # avalanche (same constants as the string path)
    q = f"(SELECT *, {_xor('__hl', f'__hl // {1 << 33}')} AS __la1 FROM {q})"
    q = f"(SELECT *, {_mul('__la1', PRIME2)} AS __la2 FROM {q})"
    q = f"(SELECT *, {_xor('__la2', f'__la2 // {1 << 29}')} AS __la3 FROM {q})"
    q = f"(SELECT *, {_mul('__la3', PRIME3)} AS __la4 FROM {q})"
    q = f"(SELECT *, {_xor('__la4', f'__la4 // {1 << 32}')} AS {out} FROM {q})"
    return q
