"""TPC-H-style queries over the driver test tables.

These exercise the general engine surface (scan + filter pushdown,
multi-way joins with broadcastable dims, partial/final aggregation,
window top-k) that every operator in SURVEY §2 ultimately leans on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openmetrics_spark.queries import register
from openmetrics_spark.tables import table


from openmetrics_spark.functions.money import exact_sum as _exact_sum


_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0, 2) AS sum_base_price,
  round(SUM(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) / 10000.0, 2) AS sum_disc_price,
  round(SUM(CAST(floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000 + 0.5) AS BIGINT)) / 1000000.0, 2) AS sum_charge,
  round(sum(l_quantity) / count(*), 6) AS avg_qty,
  round(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0 / count(*), 6) AS avg_price,
  round(SUM(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) / 100.0 / count(*), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=_Q1_ORACLE, headline=True, tags=("agg",))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: wide aggregate with filter pushdown. One shuffle,
    map-side partials over a tiny group space."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(_exact_sum(F.col("l_extendedprice"), 100), 2).alias(
                "sum_base_price"
            ),
            F.round(_exact_sum(disc_price, 10000), 2).alias("sum_disc_price"),
            F.round(
                _exact_sum(disc_price * (1 + F.col("l_tax")), 1000000), 2
            ).alias("sum_charge"),
            F.round(F.sum("l_quantity") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(
                _exact_sum(F.col("l_extendedprice"), 100) / F.count(F.lit(1)), 6
            ).alias("avg_price"),
            F.round(
                _exact_sum(F.col("l_discount"), 100) / F.count(F.lit(1)), 6
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q3_ORACLE = """
SELECT
  l_orderkey,
  round(SUM(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) / 10000.0, 2) AS revenue,
  CAST(o_orderdate AS DATE) AS o_orderdate,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_ORACLE, headline=True, tags=("join",))
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective dim filter (customer broadcasts), fact-fact
    join, top-10 as TakeOrderedAndProject."""
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                _exact_sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
                ),
                2,
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


_Q5_ORACLE = """
SELECT n_name, round(SUM(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) / 10000.0, 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@register("q5_local_supplier_volume", oracle=_Q5_ORACLE, headline=True, tags=("join",))
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; all dimensions broadcast, the only
    big shuffle is lineitem⋈orders."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                _exact_sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000
                ),
                2,
            ).alias("revenue")
        )
    )


_Q6_ORACLE = """
SELECT round(SUM(CAST(floor((l_extendedprice * l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0, 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_ORACLE, tags=("scan",))
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+agg — every predicate must reach the
    parquet reader (PushedFilters)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                _exact_sum(
                    F.col("l_extendedprice") * F.col("l_discount"), 10000
                ),
                2,
            ).alias("revenue")
        )
    )


_TOPK_ORACLE = """
SELECT p_brand, rank, p_partkey, p_retailprice
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         CAST(row_number() OVER (
           PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey
         ) AS BIGINT) AS rank
  FROM part
)
WHERE rank <= 3
"""


@register("topk_parts_per_brand", oracle=_TOPK_ORACLE, tags=("window",))
def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window (TopNEmitter analog,
    reference: pipeline/.../job/counter/TopNEmitter.java:20-170)."""
    part = table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("p_brand", "rank", "p_partkey", "p_retailprice")
    )


_Q12_ORACLE = """
SELECT
  l_linestatus,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag = 'R'
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
"""


@register("q12_priority_lines", oracle=_Q12_ORACLE, tags=("join", "agg"))
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape on the driver tables' columns (no shipmode/
    receiptdate there): selective fact filter pushed to the lineitem
    scan (returnflag × 1-year ship window) before the orders join,
    then a conditional-count aggregate over a tiny group space."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    filt = li.filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        filt.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


_Q14_ORACLE = """
SELECT
  round(100.00 * (SUM(CAST(floor((CASE WHEN p_type LIKE 'PROMO%%'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END) * 10000 + 0.5) AS BIGINT)) / 10000.0)
        / (SUM(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) / 10000.0), 6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
"""


@register("q14_promo_effect", oracle=_Q14_ORACLE, tags=("join", "agg"))
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: one-month fact slice joined to the part dim (Catalyst
    broadcasts it at test SFs; at 100 TB AQE picks broadcast vs SMJ by
    the post-filter size), global ratio aggregate."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0 * _exact_sum(promo, 10000) / _exact_sum(rev, 10000), 6
            ).alias("promo_revenue")
        )
    )
