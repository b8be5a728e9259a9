"""Graph analytics beyond connected components: an ENGINE-EXACT
PageRank (Page et al. 1999) over the customer–supplier purchase graph.

Iterative distributed algorithms usually can't be oracle-gated —
float damping sums depend on aggregation order. This one can: ranks
live in integer 1e-9 units, the per-edge contribution is integer
division by out-degree, and the damping step is ``85 * inflow DIV
100`` — every iteration is exact integer arithmetic, so Spark and
DuckDB (5 unrolled CTE iterations) produce bit-identical ranks. The
floor divisions leak a little probability mass (bounded by
edges × 1e-9 per iteration) — an accepted, DETERMINISTIC quantization,
unlike order-dependent float error.

100 TB shape: each iteration is one join of the rank table to the
edge list on src plus one sum-by-dst — the textbook Pregel/GraphX
cost, expressed as plain DataFrame ops so AQE handles skewed hubs.
The rank frame is pinned per iteration (at cluster scale:
localCheckpoint) so iteration k+1's plan starts from materialized
ranks instead of replaying the whole chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmetrics_spark.queries import register
from openmetrics_spark.tables import pin, table

_ITERS = 5
_SCALE = 1_000_000_000  # rank unit = 1e-9
_BASE = 150_000_000  # (1 - d) * SCALE with d = 0.85
_TOPK = 50


def _pagerank_oracle() -> str:
    ctes = [
        """e0 AS (
  SELECT DISTINCT 2 * o_custkey AS src, 2 * l_suppkey + 1 AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), edges AS (
  SELECT src, dst FROM e0
  UNION
  SELECT dst AS src, src AS dst FROM e0
), nodes AS (
  SELECT DISTINCT src AS node FROM edges
), deg AS (
  SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src
), nn AS (
  SELECT count(*) AS n FROM nodes
), r0 AS (
  SELECT node, CAST(1000000000 // (SELECT n FROM nn) AS BIGINT) AS r
  FROM nodes
)"""
    ]
    for k in range(1, _ITERS + 1):
        ctes.append(
            f"""r{k} AS (
  SELECT nodes.node,
         CAST({_BASE} // (SELECT n FROM nn)
              + 85 * coalesce(infl.s, 0) // 100 AS BIGINT) AS r
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node, sum(rp.r // d.outdeg) AS s
    FROM edges e
    JOIN r{k - 1} rp ON rp.node = e.src
    JOIN deg d ON d.node = e.src
    GROUP BY e.dst
  ) infl USING (node)
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT node, r AS rank_e9 FROM r{_ITERS}
ORDER BY r DESC, node
LIMIT {_TOPK}
"""
    )


def pagerank_ranks(e0: DataFrame, iters: int = _ITERS) -> DataFrame:
    """Integer-exact PageRank core over a directed edge list ``e0``
    (src, dst — deduped by the caller or not, we dedupe): symmetrize,
    then ``iters`` damped rounds of one src-join + one dst-sum each.
    Returns (node, r) BIGINT ranks. The rank frame is pinned per
    iteration so plans stay linear in ``iters``."""
    edges = pin(
        e0.select("src", "dst")
        .union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    n = nodes.count()  # one scalar; the loop below is data-parallel
    ranks = pin(
        nodes.select("node", F.lit(_SCALE // n).cast("long").alias("r"))
    )
    base = _BASE // n
    contrib_edges = edges.join(deg, edges.src == deg.node).select(
        "src", "dst", "outdeg"
    )
    for _ in range(iters):
        inflow = (
            contrib_edges.join(ranks, contrib_edges.src == ranks.node)
            .select("dst", F.expr("r DIV outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = pin(
            nodes.join(inflow, nodes.node == inflow.dst, "left").select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr("85 * coalesce(s, 0) DIV 100")
                ).alias("r"),
            )
        )
    return ranks


@register("supplier_pagerank", oracle=_pagerank_oracle(), tags=("graph",))
def supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-iteration integer-exact PageRank (d = 0.85) on the symmetric
    customer↔supplier graph (edge per distinct purchase relationship;
    node ids prefix-coded 2·custkey / 2·suppkey+1 to disjoin the key
    spaces); returns the top-50 nodes by final rank, deterministic
    tiebreak on node id. Every arithmetic step is BIGINT (see module
    docstring), so the driver hash-gates the ranks themselves."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank_ranks(e0)
    return (
        ranks.orderBy(F.col("r").desc(), F.col("node").asc())
        .limit(_TOPK)
        .select("node", F.col("r").alias("rank_e9"))
    )
