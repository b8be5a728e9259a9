"""Extended TPC-H-style coverage: the relational shapes the base
``tpch.py`` block doesn't exercise — EXISTS / NOT-EXISTS (semi and
anti joins), correlated and scalar aggregate subqueries, disjunctive
join predicates, NOT IN exclusion sets, and two-level aggregation
(distribution queries).

The driver tables have no partsupp and no commit/receipt dates, so
queries that need them are adapted: lateness is ``l_shipdate >
o_orderdate + N days``, part value comes from lineitem revenue, and
customer dormancy is "no orders after 2000-01-01". Semantics stay
faithful to the TPC-H shapes; predicates are chosen to be selective
but non-vacuous at every driver SF.

Scale notes (100 TB): every dim side (nation, region, supplier, the
scalar aggregate frames) is broadcast; EXISTS/NOT-EXISTS become
left_semi/left_anti joins that Spark pushes into the shuffle plan
rather than correlated per-row probes; the only unavoidable big
shuffles are lineitem⋈orders on orderkey and the lineitem self
aggregations on l_orderkey/l_partkey, both equi-key and AQE-skew
handled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmetrics_spark.queries import register
from openmetrics_spark.tables import table


def _ts(s: str):
    return F.lit(s).cast("timestamp")


from openmetrics_spark.functions.money import (  # noqa: E402
    cents as _cents,
    sum_cents as _sum_cents,
    sum_money4 as _sum_money4,
)


_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
"""


@register("q4_order_priority", oracle=_Q4_ORACLE, tags=("join", "semi"))
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS → left_semi join). The semi join carries
    only (orderkey, orderdate) from the probe side and dedups on the
    build side before the aggregate — no row explosion for orders
    with many qualifying lines."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    li = table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       floor(SUM(CAST(floor(volume * 10000 + 0.5) AS BIGINT)) / 100.0 + 0.5) / 100.0 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey
    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", oracle=_Q7_ORACLE, tags=("join",))
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: two nation aliases with a disjunctive pair filter.
    Both nation joins broadcast; the pair predicate is applied after
    (Catalyst can't push a cross-side disjunction into either scan,
    but the nation dims are tiny so the filter is cheap)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    o = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_sum_money4(F.col("volume")).alias("revenue"))
    )


_Q8_ORACLE = """
SELECT o_year,
       round(CAST(SUM(CASE WHEN nation = 'NATION_3'
                           THEN CAST(floor(volume * 100 + 0.5) AS BIGINT)
                           ELSE 0 END) AS DOUBLE)
             / SUM(CAST(floor(volume * 100 + 0.5) AS BIGINT)), 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    AND p_type = 'PROMO'
)
GROUP BY o_year
"""


@register("q8_market_share", oracle=_Q8_ORACLE, tags=("join", "agg"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — 8-way join where every
    non-fact side broadcasts, conditional-sum ratio per year."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_3", _cents(F.col("volume")))
                    .otherwise(F.lit(0).cast("long"))
                ).cast("double")
                / F.sum(_cents(F.col("volume"))),
                6,
            ).alias("mkt_share")
        )
    )


_Q9_ORACLE = """
SELECT nation, o_year,
       floor(SUM(CAST(floor(amount * 10000 + 0.5) AS BIGINT)) / 100.0 + 0.5) / 100.0 AS sum_profit
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount)
           - 0.5 * p_retailprice * l_quantity AS amount
  FROM part, supplier, lineitem, orders, nation
  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
    AND p_type = 'ECONOMY'
)
GROUP BY nation, o_year
"""


@register("q9_product_profit", oracle=_Q9_ORACLE, tags=("join", "agg"))
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit by supplier nation × order year). The
    driver tables have no partsupp supplycost, so cost is priced off
    the part dim (0.5 × retail × qty)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(_sum_money4(F.col("amount")).alias("sum_profit"))
    )


_Q10_ORACLE = """
SELECT c_custkey, c_name,
       floor(SUM(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) / 100.0 + 0.5) / 100.0 AS revenue,
       c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10_ORACLE, tags=("join", "agg"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue in a
    quarter. Ends in TakeOrderedAndProject — no global sort."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-04-01 00:00:00"))
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            _sum_money4(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


_Q11_ORACLE = """
SELECT l_partkey,
       SUM(CAST(floor(l_extendedprice * l_quantity * 100 + 0.5) AS BIGINT)) / 100.0 AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING SUM(CAST(floor(l_extendedprice * l_quantity * 100 + 0.5) AS BIGINT)) > (
  SELECT 1.1 * SUM(CAST(floor(l_extendedprice * l_quantity * 100 + 0.5) AS BIGINT))
           / count(DISTINCT l_partkey)
  FROM lineitem
)
"""


@register("q11_important_parts", oracle=_Q11_ORACLE, tags=("agg", "subquery"))
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (HAVING vs a global scalar subquery): parts
    whose lineitem value exceeds 1.1× the mean per-part value. The
    scalar is a one-row frame broadcast into the filter — never a
    driver-side collect. Threshold is relative (mean-based) so the
    query stays selective-but-non-empty at every SF. The membership
    GATE compares exact integer cents on both sides (not just the
    output column): a raw-double gate is summation-order-dependent at
    the last ulp, and a part sitting within an ulp of the threshold
    would flip membership between engines."""
    li = table(spark, sf_dir, "lineitem")
    val = F.col("l_extendedprice") * F.col("l_quantity")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_cents(val)).alias("__cents"),
        _sum_cents(val).alias("part_value"),
    )
    thresh = li.agg(
        (1.1 * F.sum(_cents(val)) / F.count_distinct(F.col("l_partkey"))).alias(
            "__thresh"
        )
    )
    return (
        per_part.join(F.broadcast(thresh))
        .filter(F.col("__cents") > F.col("__thresh"))
        .select("l_partkey", "part_value")
    )


_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
    AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


@register("q13_customer_distribution", oracle=_Q13_ORACLE, tags=("join", "agg"))
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: left outer join with a join-side filter, then a
    distribution (two chained aggregations, the second over a tiny
    key space)."""
    cust = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        cust.join(o, cust.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         floor(SUM(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) / 100.0 + 0.5) / 100.0 AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", oracle=_Q15_ORACLE, tags=("agg", "subquery"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) hitting the max quarterly revenue — the
    max is a broadcast scalar, not a driver round-trip."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    supp = table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _sum_money4(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    top = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        revenue.join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q16_ORACLE = """
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_size IN (1, 10, 25, 40)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type
"""


@register("q16_supplier_part_counts", oracle=_Q16_ORACLE, tags=("agg", "anti"))
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (NOT IN → left_anti join + COUNT DISTINCT).
    The exclusion set (suppliers in arrears) broadcasts; the distinct
    count shuffles (brand, type, suppkey) — already near-minimal."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size").isin(1, 10, 25, 40))
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


_Q17_ORACLE = """
SELECT floor(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 7.0 + 0.5) / 100.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS pk, 0.5 * avg(l_quantity) AS half_avg
  FROM lineitem GROUP BY l_partkey
) ON l_partkey = pk
WHERE p_brand = 'Brand#1' AND l_quantity < half_avg
"""


@register("q17_small_qty_revenue", oracle=_Q17_ORACLE, tags=("agg", "subquery"))
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (correlated avg-per-part subquery → group + re-join).
    The per-part average frame is one row per part — broadcast at
    test SFs, AQE-decided at 100 TB (it's ~#parts rows, far smaller
    than lineitem)."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    half_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(half_avg), li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (
                F.floor(F.sum(_cents(F.col("l_extendedprice"))) / 7.0 + F.lit(0.5))
                / 100.0
            ).alias("avg_yearly")
        )
    )


_Q18_ORACLE = """
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
       SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0 AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING sum(l_quantity) > 270
  )
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
"""


@register("q18_large_volume_customer", oracle=_Q18_ORACLE, tags=("join", "semi"))
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (IN-subquery → left_semi join against a HAVING
    aggregate). l_quantity is integer-valued so the >270 threshold is
    exact in both engines."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 270)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(
            F.broadcast(big), li.l_orderkey == F.col("big_orderkey"), "left_semi"
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .groupBy(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
        )
        .agg(_sum_cents(F.col("l_quantity")).alias("total_qty"))
    )


_Q19_ORACLE = """
SELECT floor(SUM(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000 + 0.5) AS BIGINT)) / 100.0 + 0.5) / 100.0 AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
"""


@register("q19_disjunctive_revenue", oracle=_Q19_ORACLE, tags=("join",))
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive mixed-side predicate on an equi-join.
    The partkey equi-condition still drives the join strategy (hash,
    broadcast-able); the OR-of-ANDs evaluates post-join. Catalyst
    additionally pushes the per-side OR envelopes (brand∈{...},
    quantity ranges) down to each scan."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(clause)
        .agg(
            _sum_money4(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


_Q21_ORACLE = """
SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


@register("q21_waiting_supplier", oracle=_Q21_ORACLE, tags=("join", "anti"))
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (sole-late-supplier in multi-supplier orders;
    lateness adapted to shipdate > orderdate + 90d — no receipt/commit
    dates in the driver tables). Instead of translating the EXISTS /
    NOT-EXISTS pair into two correlated self-joins, one aggregation
    per order computes (#suppliers, #late suppliers) and the filter
    `n_supp >= 2 AND n_late = 1` selects exactly the rows the
    subqueries would. Collapsing to (orderkey, suppkey) first keeps
    the per-order aggregate free of COUNT DISTINCT — mixed distincts
    in one aggregate make Catalyst Expand every input row 3×, which
    triples the shuffle at 100 TB."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    lines = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("late"),
    )
    per_ls = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("late")
    )
    per_order = per_ls.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("late").cast("int")).alias("n_late"),
        F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_suppkey"),
    )
    # one row per orderkey survives the filter, so the per-supplier
    # order count is a plain count — no distinct machinery needed
    sole_late = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
    ).select("l_orderkey", "late_suppkey")
    return (
        sole_late.join(F.broadcast(supp), F.col("late_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


_Q22_ORACLE = """
SELECT c_nationkey, count(*) AS numcust,
       SUM(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0 AS totacctbal
FROM customer
WHERE c_acctbal > (
    SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY c_nationkey
"""


@register("q22_dormant_customers", oracle=_Q22_ORACLE, tags=("anti", "subquery"))
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (no phone column: "dormant" = no orders since
    2000-01-01; grouped by nationkey). Scalar avg broadcasts into the
    filter; NOT EXISTS is a left_anti join on custkey."""
    cust = table(spark, sf_dir, "customer")
    recent = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("2000-01-01 00:00:00"))
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _sum_cents(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


_Q2_ORACLE = """
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(l_extendedprice / l_quantity) AS ps_supplycost
  FROM lineitem GROUP BY 1, 2
),
rs AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier, nation, region
  WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
    AND r_name = 'ASIA'
)
SELECT rs.s_acctbal, rs.s_name, rs.n_name, p_partkey, p_brand,
       round(ps.ps_supplycost, 2) AS supplycost
FROM part, ps, rs
WHERE p_partkey = ps.ps_partkey AND rs.s_suppkey = ps.ps_suppkey
  AND p_type = 'ECONOMY' AND p_size <= 15
  AND ps.ps_supplycost = (
    SELECT min(ps2.ps_supplycost) FROM ps ps2, rs rs2
    WHERE ps2.ps_partkey = p_partkey AND rs2.s_suppkey = ps2.ps_suppkey)
"""


@register("q2_min_cost_supplier", oracle=_Q2_ORACLE, tags=("join", "subquery"))
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest regional supplier per qualifying part.
    The driver tables carry no partsupp, so the part-supplier catalog
    is derived from lineitem (supply cost = min observed unit price per
    (part, supplier) — same grain as ps_supplycost). The correlated
    scalar-min subquery becomes one extra aggregate over the SAME
    region-filtered frame plus an equi-join back on (partkey, cost):
    Catalyst would decorrelate the SQL form to exactly this. Scale:
    the only big shuffle is the lineitem groupBy on (partkey, suppkey);
    the region-filtered supplier side and the qualifying-part side are
    dims and broadcast, and min-cost re-attach joins two frames already
    partitioned by partkey."""
    li = table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost")
    )
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rs = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps_r = ps.join(F.broadcast(rs), ps.ps_suppkey == rs.s_suppkey)
    min_cost = ps_r.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    part_f = (
        table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "ECONOMY") & (F.col("p_size") <= 15))
        .select("p_partkey", "p_brand")
    )
    return (
        ps_r.join(
            min_cost,
            (ps_r.ps_partkey == min_cost.mc_partkey)
            & (ps_r.ps_supplycost == min_cost.min_cost),
        )
        .join(F.broadcast(part_f), ps_r.ps_partkey == part_f.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round("ps_supplycost", 2).alias("supplycost"),
        )
    )


_Q20_ORACLE = """
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         sum(l_quantity) AS total_qty,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                   AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                  THEN l_quantity ELSE 0 END) AS qty_1997
  FROM lineitem GROUP BY 1, 2
)
SELECT DISTINCT s_suppkey, s_name, n_name
FROM supplier, nation, ps
WHERE s_nationkey = n_nationkey
  AND s_suppkey = ps.ps_suppkey
  AND ps.qty_1997 > 0.25 * ps.total_qty
  AND ps.ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  AND n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'EUROPE')
"""


@register("q20_excess_suppliers", oracle=_Q20_ORACLE, tags=("semi", "subquery"))
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding "excess" stock of a named
    part family in one region. Availability is derived from lineitem
    (no partsupp): a (part, supplier) pair is excess when its 1997
    shipments exceed a quarter of its all-time quantity — the same
    availqty-vs-halfyear comparison re-expressed over observable
    columns. The IN-subqueries become left_semi joins against
    broadcast dims; the supplier emerges via one more semi join, so
    no row ever fans out and DISTINCT falls out of the semi-join
    (supplier side stays unique)."""
    li = table(spark, sf_dir, "lineitem")
    in_97 = (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00")) & (
        F.col("l_shipdate") < _ts("1998-01-01 00:00:00")
    )
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.sum("l_quantity").alias("total_qty"),
        F.sum(F.when(in_97, F.col("l_quantity")).otherwise(F.lit(0.0))).alias(
            "qty_1997"
        ),
    )
    red_parts = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    excess = (
        ps.filter(F.col("qty_1997") > 0.25 * F.col("total_qty"))
        .join(F.broadcast(red_parts), F.col("ps_partkey") == F.col("p_partkey"), "left_semi")
        .select("ps_suppkey")
    )
    nation = table(spark, sf_dir, "nation")
    europe = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(
            F.broadcast(europe.select("r_regionkey")),
            nation.n_regionkey == F.col("r_regionkey"),
            "left_semi",
        )
        .join(excess, F.col("s_suppkey") == excess.ps_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "n_name")
    )
