"""Sketch queries: engine-exact HLL distinct counts + histogram
percentiles (operators/sketches.py).

These replace the two exact-only shapes docs/SCALE.md listed as
"single-node seams": ``countDistinct`` (daily metrics / retention) and
per-group sort percentiles. Unlike Spark's built-in
``approx_count_distinct`` / ``approx_percentile`` — whose sketch
internals aren't reproducible outside the JVM — every step here is
deterministic and expressible in ANSI SQL, so the driver hash-gates
the approximate result itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmetrics_spark.operators.sketches import (
    hist_percentiles,
    hll_estimate,
    hll_estimate_from_registers_sql,
    hll_merge_registers,
    hll_registers,
    hll_registers_sql,
)
from openmetrics_spark.queries import register
from openmetrics_spark.tables import pin, table


def _hll_direct_oracle() -> str:
    reg = hll_registers_sql(
        "SELECT o_orderpriority, o_custkey FROM orders",
        "o_orderpriority",
        "o_custkey",
    )
    est = hll_estimate_from_registers_sql(
        reg, "o_orderpriority", out="approx_customers"
    )
    return (
        "SELECT o_orderpriority, approx_customers, registers_used "
        f"FROM {est}"
    )


@register(
    "approx_distinct_customers_hll",
    oracle=_hll_direct_oracle(),
    headline=True,
    tags=("sketch", "agg"),
)
def approx_distinct_customers_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct customers per order priority via the
    engine-exact HLL sketch (p=12, ~1.6% error). At 100 TB this is
    the distinct-user count that exact ``countDistinct`` can't do:
    one shuffle of ≤4096 register rows per group (map-side ``max``
    partial) instead of shuffling every (group, user) pair. The sf0.01
    data lands in the linear-counting branch, sf0.1 in the raw-HLL
    branch — both regimes are driver-gated across rounds."""
    orders = table(spark, sf_dir, "orders")
    reg = hll_registers(orders, ["o_orderpriority"], "o_custkey")
    return hll_estimate(reg, ["o_orderpriority"], out="approx_customers")


def _hll_merge_oracle() -> str:
    monthly = hll_registers_sql(
        "SELECT o_orderpriority,"
        " year(o_orderdate) * 100 + month(o_orderdate) AS ym, o_custkey"
        " FROM orders",
        "o_orderpriority, ym",
        "o_custkey",
    )
    merged = (
        f"(SELECT o_orderpriority, bucket, max(rho) AS rho FROM {monthly}"
        " GROUP BY ALL)"
    )
    est = hll_estimate_from_registers_sql(
        merged, "o_orderpriority", out="approx_customers"
    )
    return f"""
SELECT e.o_orderpriority, e.approx_customers, e.registers_used, m.n_sketches
FROM {est} e
JOIN (SELECT o_orderpriority, CAST(count(DISTINCT ym) AS BIGINT) AS n_sketches
      FROM {monthly} GROUP BY 1) m
  ON e.o_orderpriority = m.o_orderpriority
"""


@register(
    "hll_merge_monthly_sketches",
    oracle=_hll_merge_oracle(),
    tags=("sketch", "agg"),
)
def hll_merge_monthly_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeability proof, driver-gated: build one HLL register
    table per (priority, order month) — the shape a pipeline would
    persist daily — then merge the monthly sketches by ``max(rho)``
    and estimate. Because ``max`` is associative, the merged estimate
    is bit-identical to sketching the whole range directly
    (tests/test_sketches.py asserts equality against
    approx_distinct_customers_hll), which is what makes incremental
    distinct counting sound: history is never re-read, only its
    O(groups × 4096) register table is."""
    orders = table(spark, sf_dir, "orders").withColumn(
        "ym", F.year("o_orderdate") * 100 + F.month("o_orderdate")
    )
    monthly = hll_registers(orders, ["o_orderpriority", "ym"], "o_custkey")
    merged = hll_merge_registers(monthly, ["o_orderpriority"])
    est = hll_estimate(merged, ["o_orderpriority"], out="approx_customers")
    n_sk = monthly.groupBy("o_orderpriority").agg(
        F.countDistinct("ym").alias("n_sketches")
    )
    # monthly is intentionally consumed twice (estimate + sketch
    # count): in the persisted-register deployment both consumers read
    # the materialized register table, not the raw events.
    return est.join(F.broadcast(n_sk), "o_orderpriority").select(
        "o_orderpriority", "approx_customers", "registers_used", "n_sketches"
    )


_PCTL_ORACLE = """
WITH counts AS (
  SELECT event_type, CAST(floor(value / 1.0) AS BIGINT) AS bucket,
         count(*) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), cum AS (
  SELECT event_type, bucket,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM counts
), probe AS (
  SELECT event_type, q, bucket, n
  FROM cum, (SELECT unnest([0.5, 0.9, 0.99]) AS q) qs
  WHERE cum >= ceil(q * n)
)
SELECT event_type, q, min(bucket) * 1.0 AS approx_value,
       CAST(max(n) AS BIGINT) AS n
FROM probe GROUP BY 1, 2
"""


@register(
    "approx_value_percentiles",
    oracle=_PCTL_ORACLE,
    tags=("sketch", "agg"),
)
def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of event value per event type from a fixed-grid
    histogram (width 1.0 → error ≤ 1.0). The scale path for the exact
    sort-percentile seam: events reduce map-side to O(range/width)
    bucket counts per group; the cumulative scan and quantile probe
    run on that post-agg frame, so no executor ever sorts raw rows."""
    ev = table(spark, sf_dir, "events")
    return hist_percentiles(
        ev, ["event_type"], "value", width=1.0, qs=(0.5, 0.9, 0.99)
    )


def _hll_overlap_oracle() -> str:
    reg = hll_registers_sql(
        "SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'A' ELSE 'B' END"
        " AS seg, o_custkey FROM orders"
        " WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')",
        "seg",
        "o_custkey",
    )
    per_seg = hll_estimate_from_registers_sql(reg, "seg", out="d")
    merged = (
        f"(SELECT 'ALL' AS seg, bucket, max(rho) AS rho FROM {reg}"
        " GROUP BY ALL)"
    )
    union_est = hll_estimate_from_registers_sql(merged, "seg", out="u")
    return f"""
WITH seg AS (SELECT seg, d FROM {per_seg}),
     uni AS (SELECT u FROM {union_est})
SELECT a_distinct, b_distinct, union_distinct,
       a_distinct + b_distinct - union_distinct AS overlap_est,
       CAST(floor((a_distinct + b_distinct - union_distinct) * 10000.0
                  / union_distinct + 0.5) AS BIGINT) AS jaccard_e4
FROM (
  SELECT max(CASE WHEN seg = 'A' THEN d END) AS a_distinct,
         max(CASE WHEN seg = 'B' THEN d END) AS b_distinct,
         (SELECT u FROM uni) AS union_distinct
  FROM seg
)
"""


@register(
    "hll_segment_overlap",
    oracle=_hll_overlap_oracle(),
    headline=True,
    tags=("sketch", "agg"),
)
def hll_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL set algebra, driver-gated: distinct-customer OVERLAP between
    the URGENT and HIGH order segments by inclusion–exclusion —
    |A∩B| = |A| + |B| − |A∪B| — where |A∪B| comes from MERGING the two
    segments' register tables (``max(rho)``), never re-reading events.
    This is the audience-overlap / cross-segment-reach query at 100 TB:
    the raw data is touched once to build per-segment sketches; every
    pairwise overlap after that is O(4096) register arithmetic. The
    overlap inherits ~3× the single-sketch error (three estimates);
    the Jaccard lands as exact 1e-4 units so the driver hash-gates the
    approximate values themselves."""
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    segs = orders.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("seg"),
        "o_custkey",
    )
    # pin: the per-segment estimate and the merged-union estimate are
    # separate plan branches; without it the orders scan + register
    # aggregation run twice and the raw data is NOT touched once
    reg = pin(hll_registers(segs, ["seg"], "o_custkey"))
    per_seg = hll_estimate(reg, ["seg"], out="d")
    merged = hll_merge_registers(
        reg.withColumn("seg", F.lit("ALL")), ["seg"]
    )
    union_est = hll_estimate(merged, ["seg"], out="u").select("u")
    wide = per_seg.groupBy().agg(
        F.max(F.when(F.col("seg") == "A", F.col("d"))).alias("a_distinct"),
        F.max(F.when(F.col("seg") == "B", F.col("d"))).alias("b_distinct"),
    )
    overlap = (
        F.col("a_distinct") + F.col("b_distinct") - F.col("union_distinct")
    )
    return (
        wide.crossJoin(F.broadcast(union_est.withColumnRenamed("u", "union_distinct")))
        .select(
            "a_distinct",
            "b_distinct",
            "union_distinct",
            overlap.alias("overlap_est"),
            F.floor(
                overlap * F.lit(10000.0) / F.col("union_distinct") + F.lit(0.5)
            )
            .cast("long")
            .alias("jaccard_e4"),
        )
    )


def _hll_string_oracle() -> str:
    reg = hll_registers_sql(
        "SELECT year(o.o_orderdate) * 100 + month(o.o_orderdate) AS ym,"
        " c.c_name"
        " FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey",
        "ym",
        "c_name",
        value_is_string=True,
    )
    est = hll_estimate_from_registers_sql(reg, "ym", out="approx_buyers")
    return (
        f"SELECT CAST(ym AS INT) AS ym, approx_buyers, registers_used FROM {est}"
    )


@register(
    "approx_distinct_buyers_hll",
    oracle=_hll_string_oracle(),
    tags=("sketch", "agg", "join"),
)
def approx_distinct_buyers_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct buyers (by customer NAME — a string key)
    per order month: broadcast-join orders to the customer dim, then
    sketch. Spark's built-in ``xxhash64`` hashes strings JVM-side with
    zero Python in the path; the oracle twin hashes the same UTF-8
    bytes with the seed-42 string generator. The string path matters
    because real distinct-count keys (log_user_id, query strings,
    session ids) are strings — no cast-to-long escape hatch exists at
    100 TB."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    joined = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym"),
        "c_name",
    )
    reg = hll_registers(joined, ["ym"], "c_name")
    return hll_estimate(reg, ["ym"], out="approx_buyers")


def _profile_oracle() -> str:
    pairs = (
        "SELECT 'event_id' AS c, CAST(event_id AS VARCHAR) AS v FROM events"
        " UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events"
        " UNION ALL SELECT 'event_type', event_type FROM events"
        " UNION ALL SELECT 'props', props FROM events"
    )
    regs = hll_registers_sql(
        f"SELECT c, v FROM ({pairs}) WHERE v IS NOT NULL"
        " AND c IN ('event_id', 'user_id', 'event_type')",
        "c",
        "v",
        value_is_string=True,
    )
    est = hll_estimate_from_registers_sql(regs, "c", out="approx_distinct")
    return f"""
WITH pairs AS ({pairs}),
stats AS (
  SELECT c, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
  FROM pairs GROUP BY 1
)
SELECT s.c AS col_name, s.n_rows, s.n_null, e.approx_distinct
FROM stats s LEFT JOIN {est} e ON s.c = e.c
"""


@register(
    "events_profile", oracle=_profile_oracle(), tags=("sketch", "profile")
)
def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling at scale: one row per column with row count,
    null count and HLL approx-distinct. The shape is the point — each
    row explodes once into (column, value-string) pairs, so ANY number
    of profiled columns costs ONE scan plus two map-side-combined
    aggregates (stats + sketch registers), instead of a per-column
    aggregate pass; at 100 TB that is the difference between a
    profiler that runs nightly and one that can't. Distincts come from
    the engine-exact HLL, so the driver hash-gates the approximate
    profile itself (props is profiled for nulls only: the oracle-side
    string-hash generator is bounded to short ASCII, a documented
    oracle-only constraint)."""
    ev = table(spark, sf_dir, "events")
    profiled = [
        ("event_id", F.col("event_id").cast("string")),
        ("user_id", F.col("user_id").cast("string")),
        ("event_type", F.col("event_type")),
        ("props", F.col("props")),
    ]
    # pin: the stats aggregate AND the register aggregate both consume
    # this frame, and Spark plans them as independent subtrees (no
    # cross-branch exchange reuse) — without the pin the events scan +
    # explode would run twice, breaking the one-scan claim above
    pairs = pin(
        ev.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(n).alias("c"), v.alias("v"))
                        for n, v in profiled
                    ]
                )
            ).alias("p")
        ).select("p.c", "p.v")
    )
    stats = pairs.groupBy("c").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_null"),
    )
    hashable = pairs.filter(
        F.col("c").isin("event_id", "user_id", "event_type")
        & F.col("v").isNotNull()
    )
    est = hll_estimate(hll_registers(hashable, ["c"], "v"), ["c"]).select(
        "c", "approx_distinct"
    )
    return stats.join(est, "c", "left").select(
        F.col("c").alias("col_name"), "n_rows", "n_null", "approx_distinct"
    )


# ---------------------------------------------------------------------------
# approx_heavy_hitters_cms — Count-Min point estimates + a heavy-
# hitter gate, engine-exact (operators/sketches.py::cms_*).
# ---------------------------------------------------------------------------


def _cms_hh_oracle() -> str:
    from openmetrics_spark.operators.sketches import cms_rows_sql

    ev = "SELECT user_id FROM events"
    counter_rows = cms_rows_sql(ev, "user_id")
    key_rows = cms_rows_sql(
        "SELECT DISTINCT user_id FROM events", "user_id", "user_id"
    )
    return f"""
WITH counters AS (
  SELECT j, b, count(*) AS c FROM {counter_rows} GROUP BY j, b
), tot AS (
  SELECT count(*) AS n, count(DISTINCT user_id) AS d
  FROM events WHERE user_id IS NOT NULL
), kb AS (
  SELECT * FROM {key_rows}
), est AS (
  SELECT user_id, CAST(min(coalesce(c, 0)) AS BIGINT) AS est_count
  FROM kb LEFT JOIN counters USING (j, b)
  GROUP BY user_id
)
SELECT est.user_id, est.est_count
FROM est, tot
WHERE est.est_count * 5 * tot.d >= 6 * tot.n
"""


@register(
    "approx_heavy_hitters_cms",
    oracle=_cms_hh_oracle(),
    tags=("sketch", "agg"),
)
def approx_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via an engine-exact Count-Min sketch: one counter
    table (4 hash rows × 1024 buckets — O(4096) shuffle rows with a
    map-side count partial, never O(events)), point estimates for the
    candidate keys as min-over-rows, and a relative gate est ≥
    1.2·(N/D) evaluated in integer space (est·5·D ≥ 6·N). CMS
    OVERestimates under collisions by design (the testdata's ~uniform
    users at 1500 keys / 1024 buckets makes that visible honestly) —
    the driver hash-gates the estimates themselves, so both engines
    must reproduce every collision bit-exactly. The exact distinct D
    in the gate keeps the oracle 1:1; at 100 TB the HLL estimate
    (same module) replaces it and candidates come from a sampled or
    sketched key stream rather than DISTINCT."""
    from openmetrics_spark.operators.sketches import (
        cms_counters,
        cms_point_estimate,
    )

    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    counters = cms_counters(ev, [], "user_id")
    keys = ev.select("user_id").distinct()
    tot = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("d"),
    )
    est = cms_point_estimate(counters, keys, "user_id")
    return (
        est.crossJoin(F.broadcast(tot))
        .filter(F.col("est_count") * 5 * F.col("d") >= 6 * F.col("n"))
        .select("user_id", "est_count")
    )


# ---------------------------------------------------------------------------
# bloom_customer_prefilter — engine-exact Bloom membership
# (operators/sketches.py::bloom_*): the semi-join pre-filter shape.
# ---------------------------------------------------------------------------


def _bloom_oracle() -> str:
    from openmetrics_spark.operators.sketches import (
        bloom_build_sql,
        bloom_probe_sql,
    )

    bloom = bloom_build_sql("SELECT o_custkey FROM orders", "o_custkey")
    probe = bloom_probe_sql(
        bloom, "SELECT c_custkey AS o_custkey FROM customer", "o_custkey"
    )
    return f"""
SELECT p.o_custkey AS c_custkey, p.maybe_present,
       (o.o_custkey IS NOT NULL) AS has_orders
FROM {probe} p
LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o USING (o_custkey)
"""


@register(
    "bloom_customer_prefilter",
    oracle=_bloom_oracle(),
    tags=("sketch", "join"),
)
def bloom_customer_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pre-filter, engine-exact: build the
    bitmap over ordering customers (one bit_or aggregate → ≤256
    (word, mask) rows — mergeable, broadcastable), probe EVERY
    customer map-side (no shuffle of the probe stream), and emit the
    probe verdict beside ground truth. One-sided by construction:
    has_orders ⇒ maybe_present, so using the filter before the real
    join can only admit extra rows, never drop matches — exactly how
    Spark's own runtime bloom pruning works, but reproducible outside
    the JVM and therefore driver-gated bit-for-bit (false positives
    must match too). At 100 TB the bitmap (scaled up via bits_log2)
    replaces shuffling the 25x-larger probe side into a semi-join."""
    from openmetrics_spark.operators.sketches import bloom_build, bloom_probe

    orders = table(spark, sf_dir, "orders").select("o_custkey")
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    probe = bloom_probe(bloom_build(orders, "o_custkey"), cust, "o_custkey")
    truth = orders.distinct().withColumn("has_orders", F.lit(True))
    return (
        probe.join(truth, "o_custkey", "left")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "maybe_present",
            F.coalesce(F.col("has_orders"), F.lit(False)).alias("has_orders"),
        )
    )


# ---------------------------------------------------------------------------
# value_stats_winsorized — robust metrics via the histogram sketch:
# clamp values at the grid P1/P99 before aggregating (the standard
# outlier-hardening step for revenue/latency metrics).
# ---------------------------------------------------------------------------

_WINSOR_ORACLE = """
WITH v AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL
), counts AS (
  SELECT event_type, CAST(floor(value / 1.0) AS BIGINT) AS bucket,
         count(*) AS cnt
  FROM v GROUP BY ALL
), cum AS (
  SELECT event_type, bucket,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM counts
), b AS (
  SELECT event_type,
         min(CASE WHEN cum >= ceil(0.01 * n) THEN bucket END) AS p01,
         min(CASE WHEN cum >= ceil(0.99 * n) THEN bucket END) AS p99,
         max(n) AS n
  FROM cum GROUP BY event_type
), w AS (
  SELECT v.event_type,
         CAST(floor(greatest(least(v.value, p99 * 1.0), p01 * 1.0) * 100
                    + 0.5) AS BIGINT) AS cents
  FROM v JOIN b USING (event_type)
)
SELECT b.event_type, CAST(b.n AS BIGINT) AS n,
       CAST(b.p01 AS BIGINT) AS p01, CAST(b.p99 AS BIGINT) AS p99,
       CAST(sum(cents) AS BIGINT) AS wsum_cents,
       CAST(sum(cents) // b.n AS BIGINT) AS wmean_cents
FROM w JOIN b USING (event_type)
GROUP BY b.event_type, b.n, b.p01, b.p99
"""


@register(
    "value_stats_winsorized",
    oracle=_WINSOR_ORACLE,
    tags=("sketch", "metrics"),
)
def value_stats_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-type value stats: percentile bounds come from
    the engine-exact grid histogram (hist_percentiles — P1/P99 land
    on integer grid floors, so the clamp bounds are exact in both
    engines), each value is clamped THEN quantized to exact cents, and
    the mean is an integer division — no order-dependent float sum
    anywhere, so the robust metric itself is hash-gated. 100 TB shape:
    the bounds are one histogram sketch (O(range/width) rows), the
    clamp+sum is one scan with a broadcast bounds join — same cost as
    an unclamped sum, unlike a sort-based trim."""
    from openmetrics_spark.functions.money import exact_units

    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pct = hist_percentiles(
        ev, ["event_type"], "value", width=1.0, qs=(0.01, 0.99)
    )
    b = pct.groupBy("event_type").agg(
        F.min(F.when(F.col("q") == 0.01, F.col("approx_value"))).alias("p01d"),
        F.min(F.when(F.col("q") == 0.99, F.col("approx_value"))).alias("p99d"),
        F.max("n").alias("n"),
    )
    w = ev.join(F.broadcast(b), "event_type").select(
        "event_type",
        "n",
        F.col("p01d"),
        F.col("p99d"),
        exact_units(
            F.greatest(F.least(F.col("value"), F.col("p99d")), F.col("p01d")),
            100,
        ).alias("cents"),
    )
    return w.groupBy("event_type", "n", "p01d", "p99d").agg(
        F.sum("cents").cast("long").alias("wsum_cents"),
        F.expr("CAST(sum(cents) DIV max(n) AS BIGINT)").alias("wmean_cents"),
    ).select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("p01d").cast("long").alias("p01"),
        F.col("p99d").cast("long").alias("p99"),
        "wsum_cents",
        "wmean_cents",
    )
