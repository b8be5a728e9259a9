"""Mergeable, engine-exact approximation sketches.

Closes the two "single-node seams" documented in docs/SCALE.md: exact
``countDistinct`` and exact sort-based percentiles don't scale, but
Spark's built-in sketches (``approx_count_distinct`` HLL++,
``approx_percentile`` KLL) aren't reproducible outside the JVM, so
they could never be oracle-gated. These twins are:

- ``hll_registers`` / ``hll_estimate`` — classic HyperLogLog (Flajolet
  et al. 2007, the public paper — NOT Spark's HLL++ variant) keyed on
  Spark's built-in ``xxhash64`` (seed 42, whole-stage codegen; the
  DuckDB twin is ``functions.hashing_sql.xxhash64_long_sql``). Every
  intermediate that could depend on aggregation order is an exact
  integer: the register is ``max(rho)`` (associative/commutative), the
  harmonic-mean denominator is summed as ``2^(rho_max-rho)`` scaled
  integers (DECIMAL(38,0) in Spark, HUGEINT in DuckDB), and the only
  float math is a straight-line expression over those exact integers,
  generated from ONE shared SQL template for both engines
  (IEEE-identical given identical operands and operation order).
- ``hist_percentiles`` — fixed-grid histogram quantiles: bucket
  counts (map-side combined), cumulative counts per group, the
  estimate is the grid value of the first bucket whose cumulative
  count reaches ``ceil(q*n)``. Error is bounded by the grid width;
  every step is integer or a single deterministic double op.

Round 7 adds the other two classic sketches under the same contract:
``cms_*`` (Count-Min frequencies / heavy hitters) and ``bloom_*``
(membership) — see their section docstrings below.

100 TB posture: every sketch here shuffles O(groups × sketch size),
never O(rows): HLL registers are ≤ 2^p rows per group with a map-side
``max`` partial; histogram buckets are O(value_range / width) rows
per group with a map-side ``count`` partial; CMS counters are
depth × width ``count`` rows; the Bloom bitmap is ≤ bits/32 ``bit_or``
words. All four states are associative aggregates (max / count /
count / bit_or), hence MERGEABLE — daily sketch tables re-aggregate
without re-reading history, and a watermarked streaming aggregation
maintains any of them with no custom state machine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_P = 12  # 2^12 = 4096 registers → ~1.6% standard error

# The float tail of the estimate, shared TEXTUALLY between the Spark
# expression and the DuckDB oracle so both engines execute the same
# IEEE ops in the same order on the same exact-integer inputs.
# Placeholders: {m} = register count, {s} = scaled harmonic-sum column
# (exact integer, cast to DOUBLE inside), {v} = zero-register count,
# {scale} = 2^rho_max, the harmonic-sum scale (a power of two, so the
# ``.0`` float literal is exact).
_RAW_EST = (
    "((0.7213 / (1.0 + 1.079 / {m}.0)) * {m}.0 * {m}.0 * "
    "{scale}.0 / CAST({s} AS DOUBLE))"
)
_EST = (
    "(CASE WHEN {raw} <= 2.5 * {m}.0 AND {v} > 0 "
    "THEN {m}.0 * ln({m}.0 / CAST({v} AS DOUBLE)) "
    "ELSE {raw} END)"
)


def _rho_max(p: int) -> int:
    """Largest rho a register can hold; also fixes the harmonic-sum
    scale 2^rho_max (the rho=0 empty-register contribution). p is
    bounded so every ``2^(rho_max - rho)`` term stays a non-negative
    BIGINT shift: an unchecked p < 4 once produced a negative shift
    that Spark's 6-bit shiftleft mask and DuckDB's power() evaluated
    DIFFERENTLY — garbage estimates that also broke the engine-exact
    contract."""
    assert 4 <= p <= 16, f"HLL precision p={p} outside supported [4, 16]"
    return 64 - p + 1


def hll_estimate_sql(s: str, v: str, p: int = HLL_P) -> str:
    """The estimate as one SQL expression (BIGINT) — valid in both
    Spark SQL and DuckDB. ``s`` = scaled harmonic sum column/expr,
    ``v`` = zero-register count column/expr."""
    m = 1 << p
    raw = _RAW_EST.format(m=m, s=s, scale=1 << _rho_max(p))
    est = _EST.format(raw=raw, m=m, v=v)
    return f"CAST(floor({est} + 0.5) AS BIGINT)"


def hll_register_cols(value_col: str, p: int = HLL_P):
    """The narrow register projection as two Columns ``(bucket, rho)``
    over a BIGINT or STRING ``value_col`` (caller must pre-filter
    NULLs — :func:`hll_registers` does) — pure codegen (xxhash64 +
    bit ops + ``length(bin())``; exact integer semantics, no float
    log2), so it drops into batch AND streaming plans unchanged."""
    m = 1 << p
    rho_max = _rho_max(p)
    h = F.xxhash64(F.col(value_col))
    w = F.expr(f"shiftrightunsigned(xxhash64({value_col}), {p})")
    bucket = (h.bitwiseAND(F.lit(m - 1))).alias("bucket")
    rho = (
        F.when(w == 0, F.lit(rho_max))
        .otherwise(F.lit(rho_max) - F.length(F.bin(w)))
        .alias("rho")
    )
    return bucket, rho


def hll_registers(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    p: int = HLL_P,
) -> DataFrame:
    """HLL register table: ``group_cols + (bucket, rho)``, one row per
    non-empty register. ``value_col`` may be BIGINT or STRING (Spark
    xxhash64 handles both; the DuckDB twin's string generator is
    ASCII/len<=31, an oracle-side-only constraint). NULL values are
    dropped HERE, by construction: Spark's xxhash64 would silently
    skip a NULL input's contribution to the hash (emitting a register
    for the remaining columns) while the SQL twin propagates NULL —
    filtering inside the operator keeps both engines agreeing without
    every caller remembering the null gate.

    bucket = low ``p`` bits of xxhash64(value); rho = 1 + leading
    zeros of the remaining ``64-p`` bits. One shuffle of ≤ 2^p rows
    per group (map-side ``max`` partial).
    """
    bucket, rho = hll_register_cols(value_col, p)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, bucket, rho)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge_registers(
    reg: DataFrame, group_cols: Sequence[str], p: int = HLL_P
) -> DataFrame:
    """Merge register tables (e.g. collapse a day-keyed sketch onto
    coarser groups): ``max`` per (group, bucket) — associative, so
    merged sketches are bit-identical to a sketch built directly on
    the union of the inputs."""
    return reg.groupBy(*group_cols, "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(
    reg: DataFrame,
    group_cols: Sequence[str],
    p: int = HLL_P,
    out: str = "approx_distinct",
) -> DataFrame:
    """Collapse a register table to per-group estimates:
    ``group_cols + (out BIGINT, registers_used BIGINT)``."""
    m = 1 << p
    rho_max = _rho_max(p)
    agg = reg.groupBy(*group_cols).agg(
        F.count("*").alias("registers_used"),
        F.sum(
            F.expr(
                f"CAST(shiftleft(CAST(1 AS BIGINT), {rho_max} - rho)"
                " AS DECIMAL(38,0))"
            )
        ).alias("__ssum"),
    )
    # exact-integer harmonic sum: empty registers contribute 2^rho_max
    s = (
        f"(CAST({m} - registers_used AS DECIMAL(38,0)) * {1 << rho_max}"
        " + __ssum)"
    )
    v = f"({m} - registers_used)"
    return agg.select(
        *group_cols,
        F.expr(hll_estimate_sql(s, v, p)).alias(out),
        "registers_used",
    )


def hll_registers_sql(
    inner_sql: str,
    group_exprs: str,
    value_col: str,
    p: int = HLL_P,
    value_is_string: bool = False,
) -> str:
    """DuckDB twin of :func:`hll_registers`: a subquery producing
    ``group_exprs..., bucket, rho`` from ``inner_sql`` (which must
    expose ``value_col``). BIGINT values hash via
    ``xxhash64_long_sql``; with ``value_is_string`` the seed-42 string
    generator is used instead (oracle-side only constraint: ASCII,
    length <= 31 — the Spark side has no limit)."""
    from openmetrics_spark.functions.hashing_sql import (
        xxhash64_long_sql,
        xxhash64_sql,
    )

    m = 1 << p
    rho_max = _rho_max(p)
    # NULL gate mirrors hll_registers: both engines drop NULL values
    # by construction (Spark xxhash64 ignores a NULL input; DuckDB
    # propagates it — unguarded they build different registers).
    gated = (
        f"SELECT {group_exprs}, {value_col} AS __v FROM ({inner_sql})"
        f" WHERE {value_col} IS NOT NULL"
    )
    if value_is_string:
        hashed = xxhash64_sql(gated, s="__v", seed=42)
    else:
        hashed = xxhash64_long_sql(gated)
    return f"""(
  SELECT {group_exprs}, bucket, max(rho) AS rho
  FROM (
    SELECT {group_exprs}, __hash % {m} AS bucket,
           CASE WHEN __hash // {m} = 0 THEN {rho_max}
                ELSE {rho_max} - length(bin(__hash // {m})) END AS rho
    FROM {hashed}
  ) GROUP BY ALL
)"""


def hll_estimate_from_registers_sql(
    registers_sql: str, group_exprs: str, p: int = HLL_P,
    out: str = "approx_distinct",
) -> str:
    """DuckDB twin of :func:`hll_estimate` over a register subquery."""
    m = 1 << p
    rho_max = _rho_max(p)
    s = (
        f"(({m} - registers_used)::HUGEINT * {1 << rho_max} + __ssum)"
    )
    v = f"({m} - registers_used)"
    return f"""(
  SELECT {group_exprs}, {hll_estimate_sql(s, v, p)} AS {out},
         registers_used
  FROM (
    SELECT {group_exprs}, count(*) AS registers_used,
           SUM(CAST(power(2, {rho_max} - rho) AS HUGEINT)) AS __ssum
    FROM {registers_sql} GROUP BY ALL
  )
)"""


def hist_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    width: float,
    qs: Sequence[float],
    out: str = "approx_value",
    weight_col: str | None = None,
) -> DataFrame:
    """Fixed-grid histogram percentiles per group: for each q in
    ``qs`` the smallest grid point ``bucket*width`` whose cumulative
    count reaches ``ceil(q*n)``. Output: ``group_cols + (q DOUBLE,
    out DOUBLE, n BIGINT)``; estimate error ≤ ``width``.

    With ``weight_col`` (a non-negative BIGINT — integer weights keep
    every cumulative sum exact) the result is the weighted quantile:
    e.g. value = tokens-per-doc weighted by tokens gives "the doc
    length a median TOKEN sits in", the number that actually governs
    training-batch composition.

    One map-side-combined count shuffle of O(range/width) buckets per
    group; the window + quantile probe run on the post-agg frame.
    Null values are excluded (they have no grid cell).
    """
    bucket = F.floor(F.col(value_col) / F.lit(float(width))).cast("long")
    w_expr = (
        F.count("*") if weight_col is None else F.sum(weight_col)
    ).alias("cnt")
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, bucket.alias("bucket"))
        .agg(w_expr)
    )
    return hist_percentiles_from_counts(counts, group_cols, width, qs, out)


def hist_percentiles_from_counts(
    counts: DataFrame,
    group_cols: Sequence[str],
    width: float,
    qs: Sequence[float],
    out: str = "approx_value",
) -> DataFrame:
    """The probe half of :func:`hist_percentiles`, over an ALREADY
    AGGREGATED bucket-count frame (``group_cols + (bucket, cnt)``).
    Split out because the count half is what a persisted or STREAMING
    histogram maintains (count is associative — a watermarked window
    aggregate IS the sketch maintainer, like the HLL register max);
    the probe then runs batch-side on the drained sink."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*group_cols)
    cum = counts.select(
        *group_cols,
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    probes = cum.withColumn(
        "q", F.explode(F.array(*[F.lit(float(q)) for q in qs]))
    ).filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
    return probes.groupBy(*group_cols, "q").agg(
        (F.min("bucket") * F.lit(float(width))).alias(out),
        F.max("n").alias("n"),
    )


# ---------------------------------------------------------------------------
# Count-Min Sketch (Cormode & Muthukrishnan 2005, the public paper) —
# engine-exact like the HLL above: counters are plain integer counts,
# the d hash rows come from Spark's built-in xxhash64 seed-chaining
# (xxhash64(lit(j), key) == hashLong(key, hashLong(j, 42))), and the
# DuckDB twin replays the identical straight-line hash via
# xxhash64_long_sql with the per-row seed precomputed in Python.
#
# 100 TB posture: the counter table is O(groups × depth × width) rows
# with a map-side count partial — never O(rows) — and counters are
# ADDITIVE, so per-day (or per-micro-batch) counter tables merge by
# SUM into global ones: incremental heavy-hitter tracking without
# re-reading history, and the streaming twin needs no custom state
# machine (Spark's windowed count IS the sketch maintainer).
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH_BITS = 10  # 1024 buckets per hash row


def cms_seeds(depth: int = CMS_DEPTH) -> tuple[int, ...]:
    """The chained seeds Spark's ``xxhash64(lit(j), key)`` uses: seed_j
    = hashLong(j, 42), unsigned. Python-side so the SQL twin can embed
    them as literals."""
    import struct

    from openmetrics_spark.functions.hashing import xxhash64_bytes

    return tuple(
        xxhash64_bytes(struct.pack("<q", j), 42) for j in range(depth)
    )


def cms_bucket_rows(
    value_col: str, depth: int = CMS_DEPTH, wbits: int = CMS_WIDTH_BITS
):
    """Generator column producing one (j, b) row per hash row for a
    BIGINT ``value_col`` — pure codegen (xxhash64 + AND), alias it
    with ``.alias("j", "b")`` in a select."""
    m = 1 << wbits
    return F.posexplode(
        F.array(
            *[
                F.xxhash64(F.lit(j).cast("long"), F.col(value_col)).bitwiseAND(
                    F.lit(m - 1)
                )
                for j in range(depth)
            ]
        )
    )


def cms_counters(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    depth: int = CMS_DEPTH,
    wbits: int = CMS_WIDTH_BITS,
) -> DataFrame:
    """Count-min counter table ``group_cols + (j, b, c)``. NULL values
    are dropped here, by construction — same cross-engine rule as
    :func:`hll_registers`. One shuffle of ≤ depth × 2^wbits rows per
    group (map-side count partial)."""
    rows = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, cms_bucket_rows(value_col, depth, wbits).alias("j", "b")
    )
    return rows.groupBy(*group_cols, "j", "b").agg(
        F.count(F.lit(1)).alias("c")
    )


def cms_point_estimate(
    counters: DataFrame,
    keys: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    depth: int = CMS_DEPTH,
    wbits: int = CMS_WIDTH_BITS,
    out: str = "est_count",
) -> DataFrame:
    """Point estimates for candidate ``keys`` (group_cols + value_col
    rows): est = min over the depth hash rows (missing counter row =
    0). Never reads the raw stream — O(|keys| × depth) join rows."""
    kb = keys.select(
        *group_cols,
        value_col,
        cms_bucket_rows(value_col, depth, wbits).alias("j", "b"),
    )
    return (
        kb.join(counters, [*group_cols, "j", "b"], "left")
        .groupBy(*group_cols, value_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias(out))
    )


def cms_rows_sql(
    inner_sql: str,
    value_col: str,
    select_exprs: str = "",
    depth: int = CMS_DEPTH,
    wbits: int = CMS_WIDTH_BITS,
) -> str:
    """DuckDB twin of :func:`cms_bucket_rows` over every row of
    ``inner_sql``: a subquery producing ``select_exprs..., j, b``
    (NULL values dropped, mirroring cms_counters)."""
    from openmetrics_spark.functions.hashing_sql import xxhash64_long_sql

    m = 1 << wbits
    pre = f"{select_exprs}, " if select_exprs else ""
    parts = []
    for j, seed in enumerate(cms_seeds(depth)):
        hashed = xxhash64_long_sql(
            f"SELECT {pre}{value_col} AS __v FROM ({inner_sql})"
            f" WHERE {value_col} IS NOT NULL",
            seed=seed,
        )
        parts.append(
            f"SELECT {pre}{j} AS j, __hash % {m} AS b FROM {hashed}"
        )
    return "(" + "\nUNION ALL\n".join(parts) + ")"


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) — the set-MEMBERSHIP sketch completing the
# family (HLL: distinct counts; CMS: frequencies; Bloom: membership).
# Same engine-exactness recipe: positions from the xxhash64 seed chain
# (cms_seeds), the bitmap is 32-bit masks OR-aggregated into BIGINT
# words — bit_or is associative/commutative, so the build is a plain
# map-side-combined aggregate in BOTH engines AND mergeable across
# partitions/days/streams.
#
# 100 TB posture: the built filter is O(words) rows (256 for 2^13
# bits) — broadcastable as a semi-join PRE-FILTER so the probe side
# never shuffles on the join key; false positives only ever ADMIT
# extra rows into the real join, never drop real ones.
# ---------------------------------------------------------------------------

BLOOM_BITS_LOG2 = 13  # 8192 bits
_BLOOM_WORD_BITS = 32  # 32 bits/word keeps every mask a positive BIGINT
BLOOM_K = 4  # hash rows (shares cms_seeds)


def _bloom_positions(value_col: str, bits_log2: int, k: int):
    m = 1 << bits_log2
    return [
        F.xxhash64(F.lit(j).cast("long"), F.col(value_col)).bitwiseAND(
            F.lit(m - 1)
        )
        for j in range(k)
    ]


def bloom_build(
    df: DataFrame,
    value_col: str,
    bits_log2: int = BLOOM_BITS_LOG2,
    k: int = BLOOM_K,
) -> DataFrame:
    """Build the bitmap: one (word, mask BIGINT) row per non-empty
    32-bit word. NULL values dropped by construction (the cross-
    engine rule shared with hll_registers/cms_counters)."""
    pos = F.explode(
        F.array(*_bloom_positions(value_col, bits_log2, k))
    ).alias("p")
    rows = df.filter(F.col(value_col).isNotNull()).select(pos)
    return (
        rows.select(
            F.expr(f"p DIV {_BLOOM_WORD_BITS}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" CAST(p % {_BLOOM_WORD_BITS} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
    )


def bloom_probe(
    bloom: DataFrame,
    candidates: DataFrame,
    value_col: str,
    bits_log2: int = BLOOM_BITS_LOG2,
    k: int = BLOOM_K,
    out: str = "maybe_present",
) -> DataFrame:
    """Membership probe: candidates + ``out`` boolean (true iff ALL k
    bits are set — one-sided error: a true member is NEVER false).
    The bloom side is O(words) rows; Spark broadcasts it, so the probe
    is a map-side lookup, no shuffle of the candidate stream."""
    pos = F.posexplode(
        F.array(*_bloom_positions(value_col, bits_log2, k))
    ).alias("j", "p")
    kb = candidates.select(value_col, pos).select(
        value_col,
        F.expr(f"p DIV {_BLOOM_WORD_BITS}").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT),"
            f" CAST(p % {_BLOOM_WORD_BITS} AS INT))"
        ).alias("mask"),
    )
    hit = F.when(
        F.col("bm").isNotNull()
        & (F.col("bm").bitwiseAND(F.col("mask")) == F.col("mask")),
        1,
    ).otherwise(0)
    return (
        kb.join(
            F.broadcast(bloom.select("word", F.col("mask").alias("bm"))),
            "word",
            "left",
        )
        .select(value_col, hit.alias("h"))
        .groupBy(value_col)
        .agg((F.sum("h") == k).alias(out))
    )


def bloom_build_sql(
    inner_sql: str,
    value_col: str,
    bits_log2: int = BLOOM_BITS_LOG2,
    k: int = BLOOM_K,
) -> str:
    """DuckDB twin of :func:`bloom_build` — a (word, mask) subquery."""
    rows = cms_rows_sql(inner_sql, value_col, depth=k, wbits=bits_log2)
    return f"""(
  SELECT b // {_BLOOM_WORD_BITS} AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(b % {_BLOOM_WORD_BITS} AS INT))
           AS mask
  FROM {rows} GROUP BY 1
)"""


def bloom_probe_sql(
    bloom_sql: str,
    candidates_sql: str,
    value_col: str,
    bits_log2: int = BLOOM_BITS_LOG2,
    k: int = BLOOM_K,
    out: str = "maybe_present",
) -> str:
    """DuckDB twin of :func:`bloom_probe` over a candidate subquery
    (must expose ``value_col``)."""
    rows = cms_rows_sql(
        candidates_sql, value_col, select_exprs=value_col,
        depth=k, wbits=bits_log2,
    )
    return f"""(
  SELECT {value_col},
         (sum(CASE WHEN bm IS NOT NULL
                    AND (bm & mask) = mask THEN 1 ELSE 0 END) = {k}) AS {out}
  FROM (
    SELECT {value_col}, b // {_BLOOM_WORD_BITS} AS word,
           CAST(1 AS BIGINT) << CAST(b % {_BLOOM_WORD_BITS} AS INT) AS mask
    FROM {rows}
  ) LEFT JOIN (SELECT word, mask AS bm FROM {bloom_sql}) USING (word)
  GROUP BY {value_col}
)"""
