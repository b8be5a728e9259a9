"""Skew salting and bucketed co-location: results must be identical
to the plain operators, and the bucketed join's physical plan must
actually drop the Exchange (the whole point of bucketing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openmetrics_spark.operators.scale import (
    bucketed_table,
    salted_join,
    write_bucketed,
)
from openmetrics_spark.tables import table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_inner(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    # skewed build: fold most users onto one hot key
    hot = ev.withColumn(
        "user_id", F.when(F.col("user_id") % 10 != 0, F.lit(1)).otherwise(F.col("user_id"))
    )
    dim = (
        table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn("grp", (F.col("user_id") % 5).cast("int"))
    )
    plain = hot.join(dim, ["user_id"], "inner")
    salted = salted_join(hot, dim, ["user_id"], n_salts=8, how="inner")
    assert _rows(salted) == _rows(plain)


def test_salted_join_matches_plain_left(spark, sf_dir):
    ev = table(spark, sf_dir, "events").select("event_id", "user_id")
    dim = (
        table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .filter(F.col("user_id") % 2 == 0)  # half the keys unmatched
        .withColumn("even", F.lit(True))
    )
    plain = ev.join(dim, ["user_id"], "left")
    salted = salted_join(ev, dim, ["user_id"], n_salts=4, how="left")
    assert _rows(salted) == _rows(plain)
    # unmatched left rows survive exactly once
    assert salted.count() == ev.count()


def test_salted_join_refuses_right_outer(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    import pytest

    with pytest.raises(ValueError):
        salted_join(ev, ev, ["event_id"], how="right")


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(
        li, "t_li_bucketed", str(tmp_path / "li"), ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    write_bucketed(
        o, "t_o_bucketed", str(tmp_path / "o"), ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    )
    try:
        lb = bucketed_table(spark, "t_li_bucketed")
        ob = bucketed_table(spark, "t_o_bucketed")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan, plan
            # and it still computes the right thing
            want = li.join(o, li.l_orderkey == o.o_orderkey).count()
            assert joined.count() == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_o_bucketed")


def test_bucketed_groupby_has_no_exchange(spark, sf_dir, tmp_path):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(
        li, "t_li_bucketed_agg", str(tmp_path / "li_agg"), ["l_orderkey"], 8
    )
    try:
        lb = bucketed_table(spark, "t_li_bucketed_agg")
        agg = lb.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        want = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        assert _rows(agg) == _rows(want)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed_agg")


def test_optimize_layout_makes_file_stats_disjoint(spark, sf_dir, tmp_path):
    import pyarrow.parquet as pq
    from pathlib import Path

    from openmetrics_spark.operators.scale import optimize_layout

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    out = str(tmp_path / "clustered")
    optimize_layout(ev, ["user_id"], n_files=4).write.parquet(out)

    # each output file must own a user_id range that doesn't overlap
    # any other file's — that's what makes scan-time pruning effective
    ranges = []
    for f in sorted(Path(out).glob("*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        names = md.schema.to_arrow_schema().names
        idx = names.index("user_id")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2, "expected multiple clustered files"
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {(lo1, hi1)} vs {(lo2, hi2)}"

    # and the layout changes nothing semantically
    assert spark.read.parquet(out).count() == ev.count()


def test_aqe_skew_split_engages_on_hot_join(spark):
    """The inferred join's production risk is keyBy skew (reference:
    CombineDeliveryLog.java:25-27). Deterministic half of the proof:
    with AQE's skew thresholds scaled to the fixture, a sort-merge
    join whose left side has one key owning ~30% of rows must come
    out of adaptive planning with the skew=true split engaged."""
    import pyspark

    # one key owns 80% of rows; thresholds scale the default 256MB/5x
    # skew test down to the fixture's KB-sized partitions (the RATIO
    # logic under test is size-invariant)
    n = 400_000
    left = spark.range(n).select(
        F.when(F.col("id") % 10 < 8, F.lit(7)).otherwise(F.col("id") % 5000).alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    right = spark.range(5000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # aggregate AFTER the join so the collect is tiny, and drive
        # the SAME DataFrame's queryExecution (count() would plan a
        # separate execution and leave this one un-finalized)
        joined = left.join(right, "k").groupBy().count()
        assert joined.collect()[0][0] == n
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_inferred_join_hot_key_runtime_within_bound(spark):
    """Adversarial-fixture half: one user owning ~30% of all events
    must not blow the inferred join up. The scope shuffle is a
    union+window plan (no row explosion — state scales with the
    partition, not the square of it), so the hot run must stay within
    2x of the uniform run plus a fixed-overhead floor. Measured pairs
    are recorded in docs/SCALE.md."""
    import time

    from openmetrics_spark.operators.joins import Scope, inferred_join

    def fixture(hot: bool):
        n_v, n_c, n_users = 60_000, 15_000, 1500
        base = 1_700_000_000_000
        uid = F.col("id") % n_users
        if hot:
            uid = F.when(F.col("id") % 10 < 3, F.lit(7)).otherwise(uid)
        views = spark.range(n_v).select(
            uid.alias("user_id"),
            (F.col("id") % 40).cast("string").alias("kk"),
            F.timestamp_millis(F.lit(base) + F.col("id") * 500).alias("ts"),
            F.col("id").alias("view_id"),
            (F.lit(base) + F.col("id") * 500).alias("view_ms"),
        )
        clicks = spark.range(n_c).select(
            (F.col("id") + 1_000_000).alias("click_id"),
            uid.alias("user_id"),
            (F.col("id") % 40).cast("string").alias("kk"),
            F.timestamp_millis(
                F.lit(base) + F.col("id") * 2000 + 250
            ).alias("ts"),
        )
        return views, clicks

    def run(hot: bool) -> tuple[float, int]:
        views, clicks = fixture(hot)
        t0 = time.time()
        out = inferred_join(
            views,
            clicks,
            scopes=[Scope(("user_id", "kk")), Scope(("user_id",))],
            fk=None,
            left_ts="ts",
            right_ts="ts",
            window_before_ms=600_000,
            window_after_ms=0,
            left_payload=["view_id", "view_ms"],
            right_id="click_id",
            right_outer=True,
        )
        cnt = out.count()
        return time.time() - t0, cnt

    run(False)  # warm codegen/exchange machinery
    t_uniform, n_uniform = run(False)
    t_hot, n_hot = run(True)
    assert n_uniform == 15_000 and n_hot == 15_000  # right_outer keeps all
    # 2x + 2s floor: at test scale fixed overhead dominates both runs;
    # the assert exists to catch a quadratic/explosive hot-key path,
    # which would blow past this bound by orders of magnitude
    assert t_hot <= 2 * t_uniform + 2.0, (t_hot, t_uniform)


def test_add_latest_impressions_hot_user_runtime_within_bound(spark):
    """Adversarial-fixture half of the r7 pair-free rewrite: ONE user
    owning ~all impressions AND actions must not blow the operator up.
    The old act⋈imp-on-user interval join enumerated n_imp × n_act
    pairs for the hot user (~4.5e8 at this fixture — minutes); the
    seq equi-join does O(actions × max_state) work and must stay
    within 2x of a uniform run plus a fixed-overhead floor."""
    import time

    from openmetrics_spark.operators.enrich import add_latest_impressions

    def fixture(hot: bool):
        n_imp, n_act, n_users = 45_000, 10_000, 1000
        base = 1_700_000_000_000
        uid_i = F.lit(7) if hot else F.col("id") % n_users
        uid_a = F.lit(7) if hot else F.col("id") % n_users
        imps = spark.range(n_imp).select(
            uid_i.alias("user_id"),
            F.col("id").alias("impression_id"),
            (F.lit(base) + F.col("id") * 400).alias("imp_ms"),
            (F.col("id") % 500).alias("content_id"),
        )
        acts = spark.range(n_act).select(
            uid_a.alias("user_id"),
            (F.col("id") + 10_000_000).alias("action_id"),
            (F.lit(base) + F.col("id") * 1800 + 7).alias("act_ms"),
            (F.col("id") % 500 + 10_000).alias("content_id"),  # no exclusions
        )
        return imps, acts

    def run(hot: bool) -> tuple[float, int]:
        imps, acts = fixture(hot)
        t0 = time.time()
        n = add_latest_impressions(imps, acts).count()
        return time.time() - t0, n

    run(False)  # warm codegen/exchange machinery
    t_uniform, n_uniform = run(False)
    t_hot, n_hot = run(True)
    # most actions have ≥ max_output prior in-lookback impressions;
    # both runs emit O(n_act × max_output) rows (measured ~180k/~250k)
    assert n_uniform > 150_000 and n_hot > 150_000
    assert t_hot <= 2 * t_uniform + 2.0, (t_hot, t_uniform)


def test_scale_join_strategies_bucketed_leg_plan(spark, sf_dir):
    """The registered query's bucketed leg must keep its co-location
    promise: SortMergeJoin with no Exchange above either bucketed
    scan (the salted/plain legs shuffle by design)."""
    from openmetrics_spark.queries.scale_q import _bucketed_leg

    joined = _bucketed_leg(spark, sf_dir)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan


def test_scale_join_strategies_legs_agree(spark, sf_dir):
    """All three strategies must produce identical per-priority rows
    (the driver's hash gate proves this vs DuckDB; this is the fast
    local invariant)."""
    from openmetrics_spark.queries.scale_q import scale_join_strategies

    out = scale_join_strategies(spark, sf_dir).collect()
    by_strategy = {}
    for r in out:
        by_strategy.setdefault(r.strategy, set()).add(
            (r.o_orderpriority, r.n_items, r.revenue_e4)
        )
    assert set(by_strategy) == {"plain", "salted", "bucketed"}
    assert by_strategy["plain"] == by_strategy["salted"]
    assert by_strategy["plain"] == by_strategy["bucketed"]
