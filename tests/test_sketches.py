"""Sketch operators: engine-exact HLL + histogram percentiles.

The correctness bar here is double-sided: the sketches must be close
to the exact answer (approximation quality) AND bit-identical between
Spark and DuckDB (the driver hash-gates the approximate values
themselves)."""

from __future__ import annotations

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from openmetrics_spark.operators.sketches import (
    hist_percentiles,
    hll_estimate,
    hll_estimate_sql,
    hll_merge_registers,
    hll_registers,
)
from openmetrics_spark.tables import table


def test_xxhash64_long_sql_matches_spark(spark):
    """The DuckDB generator reproduces Spark's built-in xxhash64
    (seed 42) on longs across the value range, including negatives
    and the int64 extremes."""
    from openmetrics_spark.functions.hashing_sql import xxhash64_long_sql

    rng = random.Random(42)
    vals = (
        [0, 1, -1, 2**63 - 1, -(2**63), 42, -42]
        + [rng.randint(-(2**63), 2**63 - 1) for _ in range(200)]
    )
    expect = {
        r["v"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in vals], "v long")
        .select("v", F.xxhash64("v").alias("h"))
        .collect()
    }
    inner = (
        "SELECT * FROM (VALUES "
        + ",".join(f"(CAST({v} AS BIGINT))" for v in vals)
        + ") t(__v)"
    )
    got = duckdb.sql(
        f"SELECT __v, __hash FROM {xxhash64_long_sql(inner)}"
    ).fetchall()
    assert len(got) == len(vals)
    for v, h in got:
        h = int(h)
        signed = h - (1 << 64) if h >= (1 << 63) else h
        assert signed == expect[v], v


def test_xxhash64_string_seed42_matches_spark(spark):
    """The seed-parameterized string generator reproduces Spark's
    built-in xxhash64 on strings (UTF8String bytes, seed 42) across
    lengths 0..31 — the string-key sketch path's oracle twin."""
    from openmetrics_spark.functions.hashing_sql import xxhash64_sql

    rng = random.Random(9)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789#_-"
    vals = [
        "".join(rng.choice(alpha) for _ in range(ln)) for ln in range(32)
    ] + ["Customer#000000001", "Q12345"]
    expect = {
        r["v"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in vals], "v string")
        .select("v", F.xxhash64("v").alias("h"))
        .collect()
    }
    inner = (
        "SELECT * FROM (VALUES "
        + ",".join(f"('{v}')" for v in vals)
        + ") t(__q)"
    )
    got = duckdb.sql(
        f"SELECT __q, __hash FROM {xxhash64_sql(inner, seed=42)}"
    ).fetchall()
    assert len(got) == len(vals)
    for v, h in got:
        h = int(h)
        signed = h - (1 << 64) if h >= (1 << 63) else h
        assert signed == expect[v], v


def test_hll_close_to_exact_and_bounded(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    reg = hll_registers(orders, ["o_orderpriority"], "o_custkey")
    est = hll_estimate(reg, ["o_orderpriority"], out="approx")
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact")
    )
    rows = est.join(exact, "o_orderpriority").collect()
    assert rows
    for r in rows:
        # p=12 → 1.6% standard error; allow ~4σ. (At sf0.1 classic
        # HLL sits in its known biased transition zone just above the
        # linear-counting cutoff and runs ~3-5% high — the bias
        # HLL++'s correction tables exist to remove; documented, and
        # still far beyond what exact countDistinct could do at scale.)
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.065
        assert r["registers_used"] <= 4096


def test_hll_merge_is_exactly_direct(spark, sf_dir):
    """max(rho) is associative: merging per-month sketches must give
    the SAME registers — and therefore the same estimate, bit for bit
    — as sketching the whole range directly."""
    orders = table(spark, sf_dir, "orders").withColumn(
        "ym", F.year("o_orderdate") * 100 + F.month("o_orderdate")
    )
    monthly = hll_registers(orders, ["o_orderpriority", "ym"], "o_custkey")
    merged = hll_merge_registers(monthly, ["o_orderpriority"])
    direct = hll_registers(orders, ["o_orderpriority"], "o_custkey")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_hll_non_default_p_cross_engine(spark):
    """p is a real parameter, not an alias of 12: at p=10 the
    harmonic-sum scale must follow rho_max (a hardcoded 2^53 scale
    once made ``53 - rho`` negative here, which Spark's shiftleft and
    DuckDB's power() evaluate DIFFERENTLY — garbage that also broke
    cross-engine agreement). Build registers + estimate in BOTH
    engines on the same values and require identical BIGINTs."""
    from openmetrics_spark.operators.sketches import (
        hll_estimate_from_registers_sql,
        hll_registers_sql,
    )

    p = 10
    vals = [i * 2_654_435_761 % 1_000_003 for i in range(5_000)]
    df = spark.createDataFrame([(v,) for v in vals], "v LONG").withColumn(
        "g", F.lit(1)
    )
    est = hll_estimate(hll_registers(df, ["g"], "v", p=p), ["g"], p=p).collect()
    assert len(est) == 1
    spark_est = est[0]["approx_distinct"]
    exact = len(set(vals))
    assert abs(spark_est - exact) / exact < 0.15  # ~4σ at p=10
    duck = duckdb.connect()
    duck.execute("CREATE TABLE t AS SELECT unnest(?::BIGINT[]) AS v", [vals])
    regs = hll_registers_sql("SELECT 1 AS g, v FROM t", "g", "v", p=p)
    duck_est = duck.execute(
        f"SELECT approx_distinct FROM {hll_estimate_from_registers_sql(regs, 'g', p=p)}"
    ).fetchone()[0]
    assert int(duck_est) == int(spark_est)


def test_hll_overlap_close_to_exact(spark, sf_dir):
    """Inclusion–exclusion overlap (|A|+|B|−|A∪B| on merged registers)
    must land near the exact intersection — the error budget is ~3
    sketch errors wide, so allow a loose absolute band scaled by the
    union size."""
    from openmetrics_spark.queries.sketch_q import hll_segment_overlap

    got = hll_segment_overlap(spark, sf_dir).collect()
    assert len(got) == 1
    r = got[0]
    orders = table(spark, sf_dir, "orders")
    a = {
        x[0]
        for x in orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
        .collect()
    }
    b = {
        x[0]
        for x in orders.filter(F.col("o_orderpriority") == "2-HIGH")
        .select("o_custkey")
        .distinct()
        .collect()
    }
    exact = len(a & b)
    union = len(a | b)
    assert abs(r["overlap_est"] - exact) <= max(0.10 * union, 20)
    assert r["union_distinct"] <= r["a_distinct"] + r["b_distinct"]


def test_hll_p_out_of_range_rejected():
    with pytest.raises(AssertionError):
        hll_estimate_sql("0", "v", p=3)
    with pytest.raises(AssertionError):
        hll_estimate_sql("0", "v", p=17)


def test_linear_counting_branch_cross_engine(spark):
    """The one float op whose cross-engine determinism isn't
    guaranteed by IEEE 754 is ln() (libm vs JVM may differ in the
    last ulp). Enumerate EVERY reachable linear-counting input
    (V in 1..4096) and assert the rounded estimates agree, pinning
    the branch empirically for the shipped register count."""
    expr = hll_estimate_sql(s="0", v="v")  # s unused in the LC branch
    # force the LC branch: s=0 would divide-by-zero in the raw branch,
    # so evaluate only the branch formula both engines actually share
    lc = "CAST(floor(4096.0 * ln(4096.0 / CAST(v AS DOUBLE)) + 0.5) AS BIGINT)"
    spark_vals = {
        r["v"]: r["e"]
        for r in spark.range(1, 4097)
        .select(F.col("id").alias("v"))
        .selectExpr("v", f"{lc} AS e")
        .collect()
    }
    duck_vals = dict(
        duckdb.sql(
            f"SELECT v, {lc} AS e FROM (SELECT unnest(range(1, 4097)) AS v)"
        ).fetchall()
    )
    assert spark_vals == duck_vals
    assert expr  # the shared template builds


def test_hist_percentiles_within_width(spark):
    rng = random.Random(7)
    rows = [("a", rng.gauss(50, 10)) for _ in range(4000)] + [
        ("b", rng.expovariate(0.05)) for _ in range(4000)
    ]
    df = spark.createDataFrame(rows, "g string, value double")
    width = 1.0
    got = {
        (r["g"], r["q"]): (r["approx_value"], r["n"])
        for r in hist_percentiles(
            df, ["g"], "value", width=width, qs=(0.5, 0.9, 0.99)
        ).collect()
    }
    by_g = {"a": sorted(v for g, v in rows if g == "a"),
            "b": sorted(v for g, v in rows if g == "b")}
    for (g, q), (approx, n) in got.items():
        assert n == 4000
        exact = by_g[g][math.ceil(q * n) - 1]
        # the estimate is the containing bucket's left edge
        assert approx <= exact < approx + 2 * width
    assert len(got) == 6


def test_hist_counts_merge_is_exactly_direct(spark, sf_dir):
    """Histogram sketches merge by SUM: per-month bucket counts
    re-aggregated must equal the whole-range counts exactly, so
    persisted daily histograms answer range-percentile queries without
    re-reading history (the same incremental story as HLL's max)."""
    ev = table(spark, sf_dir, "events").withColumn(
        "ym", F.year("ts") * 100 + F.month("ts")
    )
    bucket = F.floor(F.col("value") / F.lit(1.0)).cast("long").alias("bucket")
    monthly = ev.groupBy("event_type", "ym", bucket).agg(
        F.count("*").alias("cnt")
    )
    merged = monthly.groupBy("event_type", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )
    direct = ev.groupBy("event_type", bucket).agg(F.count("*").alias("cnt"))
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_hll_registers_duplication_invariant(spark, sf_dir):
    """The multiset property that makes HLL a DISTINCT counter:
    feeding every row twice must produce byte-identical registers."""
    orders = table(spark, sf_dir, "orders")
    once = hll_registers(orders, ["o_orderpriority"], "o_custkey")
    twice = hll_registers(
        orders.unionByName(orders), ["o_orderpriority"], "o_custkey"
    )
    assert once.exceptAll(twice).count() == 0
    assert twice.exceptAll(once).count() == 0


def test_hist_percentiles_weighted(spark):
    """Integer-weighted quantiles: value v with weight w must behave
    exactly as v repeated w times."""
    rows = [("a", 1.0, 3), ("a", 5.0, 1), ("a", 9.0, 2)]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    expanded = spark.createDataFrame(
        [("a", v) for g, v, w in rows for _ in range(w)], "g string, v double"
    )
    got_w = {
        r["q"]: (r["approx_value"], r["n"])
        for r in hist_percentiles(
            df, ["g"], "v", width=1.0, qs=(0.5, 0.99), weight_col="w"
        ).collect()
    }
    got_e = {
        r["q"]: (r["approx_value"], r["n"])
        for r in hist_percentiles(
            expanded, ["g"], "v", width=1.0, qs=(0.5, 0.99)
        ).collect()
    }
    assert got_w == got_e
    assert got_w[0.5] == (1.0, 6)  # median of {1,1,1,5,9,9} -> bucket 1
    assert got_w[0.99] == (9.0, 6)


def test_hist_percentiles_null_and_single_bucket(spark):
    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.2), ("a", None), ("a", 5.9)],
        "g string, value double",
    )
    rows = hist_percentiles(df, ["g"], "value", width=1.0, qs=(0.5,)).collect()
    assert len(rows) == 1
    assert rows[0]["n"] == 3  # null excluded
    assert rows[0]["approx_value"] == 5.0


def test_hll_registers_shuffle_is_post_agg(spark, sf_dir):
    """The scale claim: raw rows reduce map-side; the exchange carries
    (group, bucket, rho) partials, bounded by groups × 4096 — assert a
    partial max aggregate sits below the shuffle."""
    orders = table(spark, sf_dir, "orders")
    reg = hll_registers(orders, ["o_orderpriority"], "o_custkey")
    plan = reg._jdf.queryExecution().executedPlan().toString()
    first_exchange = plan.find("Exchange")
    assert first_exchange != -1
    below = plan[first_exchange:]
    assert "partial_max" in below or "partial" in below


def test_cms_seed_chaining_matches_spark(spark):
    """cms_seeds' claim: xxhash64(lit(j), v) == hashLong(v, seed_j).
    Cross-checked via the DuckDB twin with the precomputed seed."""
    import duckdb

    from openmetrics_spark.functions.hashing_sql import xxhash64_long_sql
    from openmetrics_spark.operators.sketches import cms_seeds

    vals = [0, 1, -5, 123456789, -(2**62), 2**62 + 17]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({v})" for v in vals)
        + ") x(__v)"
    )
    for j, seed in enumerate(cms_seeds()):
        got = [
            r[0]
            for r in df.select(
                F.xxhash64(F.lit(j).cast("long"), F.col("v"))
            ).collect()
        ]
        q = xxhash64_long_sql("SELECT __v FROM t", seed=seed)
        want = [
            int(u) - (1 << 64) if int(u) >= (1 << 63) else int(u)
            for (u,) in con.execute(f"SELECT __hash FROM {q}").fetchall()
        ]
        assert got == want, f"hash row {j}"


def test_cms_estimate_upper_bounds_exact_counts(spark, sf_dir):
    """CMS guarantees est >= true count (one-sided error), and with
    the additive merge, per-day counters summed == global counters."""
    from openmetrics_spark.operators.sketches import (
        cms_counters,
        cms_point_estimate,
    )
    from openmetrics_spark.tables import table

    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    counters = cms_counters(ev, [], "user_id")
    keys = ev.select("user_id").distinct()
    est = {
        r.user_id: r.est_count
        for r in cms_point_estimate(counters, keys, "user_id").collect()
    }
    exact = {
        r.user_id: r.c
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    # additive merge: day-keyed counters sum to the global table
    day = ev.withColumn(
        "day", (F.unix_millis("ts") / 86_400_000).cast("long")
    )
    daily = cms_counters(day, ["day"], "user_id")
    merged = {
        (r.j, r.b): r.c
        for r in daily.groupBy("j", "b")
        .agg(F.sum("c").cast("long").alias("c"))
        .collect()
    }
    glob = {(r.j, r.b): r.c for r in counters.collect()}
    assert merged == glob


def test_bloom_one_sided_and_mergeable(spark, sf_dir):
    """A true member is NEVER reported absent (one-sided error), and
    bit_or-merged partial bitmaps equal the bitmap built in one shot
    (the property that makes the filter streamable/incremental)."""
    from openmetrics_spark.operators.sketches import bloom_build, bloom_probe
    from openmetrics_spark.tables import table

    orders = table(spark, sf_dir, "orders").select("o_custkey")
    bl = bloom_build(orders, "o_custkey")
    members = orders.distinct()
    got = bloom_probe(bl, members, "o_custkey").collect()
    assert all(r.maybe_present for r in got)  # no false negatives
    # split-build + bit_or merge == one-shot build
    b1 = bloom_build(orders.filter(F.col("o_custkey") % 2 == 0), "o_custkey")
    b2 = bloom_build(orders.filter(F.col("o_custkey") % 2 == 1), "o_custkey")
    merged = {
        (r.word, r.mask)
        for r in b1.unionByName(b2)
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
        .collect()
    }
    assert merged == {(r.word, r.mask) for r in bl.collect()}
