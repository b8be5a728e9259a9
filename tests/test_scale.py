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
