"""Extended SQL analytics surface: percentiles, ROLLUP, pivot,
histogram — the reporting shapes (§2.6 adjacents) a metrics consumer
writes against the event store once the core pipeline delivers it.

All follow the registry conventions: epoch-millis day keys via
``unix_millis(ts) div`` so both engines hash identical longs, doubles
rounded in both engines, DuckDB SUM(BIGINT) widened back to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openmetrics_spark.functions.money import exact_sum, exact_units
from openmetrics_spark.operators.counters import epoch_bucket_ms
from openmetrics_spark.queries import register
from openmetrics_spark.tables import table

_DAY_MS = 86_400_000


# ---------------------------------------------------------------------------
# value_percentiles_by_type — exact percentiles (interpolated), the
# latency/value distribution report.
# ---------------------------------------------------------------------------

_PCT_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events
GROUP BY event_type
"""


@register("value_percentiles_by_type", oracle=_PCT_ORACLE, tags=("metrics",))
def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type exact p50/p90/p99 of `value` (linear
    interpolation — Spark `percentile` and DuckDB `quantile_cont`
    agree bit-for-bit after rounding). Exact percentile sorts within
    each group; at 100 TB the drop-in scale path is
    `approx_percentile(value, ..., accuracy)` — same query shape, no
    per-group sort, mergeable sketches — which we don't oracle-gate
    because the sketch isn't reproducible in DuckDB."""
    ev = table(spark, sf_dir, "events")
    p = F.expr("percentile(value, array(0.5, 0.9, 0.99))")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(p[0], 4).alias("p50"),
        F.round(p[1], 4).alias("p90"),
        F.round(p[2], 4).alias("p99"),
    )


# ---------------------------------------------------------------------------
# daily_rollup_metrics — ROLLUP(day, event_type) with subtotal rows
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = f"""
SELECT (epoch_ms(ts) // {_DAY_MS}) * {_DAY_MS} AS day_ms,
       event_type,
       CAST(grouping(event_type) AS BIGINT) AS is_subtotal,
       CAST(count(*) AS BIGINT) AS n_events,
       round(SUM(CAST(floor((value) * 100 + 0.5) AS BIGINT)) / 100.0, 2) AS total_value
FROM events
GROUP BY ROLLUP ((epoch_ms(ts) // {_DAY_MS}) * {_DAY_MS}, event_type)
HAVING day_ms IS NOT NULL
"""


@register("daily_rollup_metrics", oracle=_ROLLUP_ORACLE, tags=("metrics",))
def daily_rollup_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day × event-type metrics with per-day subtotal rows via ROLLUP
    — one pass, Spark's Expand operator emits both grouping sets into
    the same map-side partial aggregation (two shuffled rows per
    input row, never two scans). The grand-total row is dropped so
    the output keys stay non-null for the hash compare."""
    ev = table(spark, sf_dir, "events")
    day = epoch_bucket_ms("ts", _DAY_MS).alias(
        "day_ms"
    )
    return (
        ev.select(day, "event_type", "value")
        .rollup("day_ms", "event_type")
        .agg(
            F.grouping("event_type").cast("long").alias("is_subtotal"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(exact_sum(F.col("value"), 100), 2).alias("total_value"),
        )
        .filter(F.col("day_ms").isNotNull())
    )


# ---------------------------------------------------------------------------
# daily_type_pivot — wide per-day table (explicit CASE pivot)
# ---------------------------------------------------------------------------

_PIVOT_ORACLE = f"""
SELECT (epoch_ms(ts) // {_DAY_MS}) * {_DAY_MS} AS day_ms,
       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS views,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS clicks,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
         AS purchases,
       round(SUM(CAST(floor((CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) * 100 + 0.5) AS BIGINT)) / 100.0, 2)
         AS revenue
FROM events
GROUP BY 1
"""


@register("daily_type_pivot", oracle=_PIVOT_ORACLE, tags=("metrics",))
def daily_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot of the event stream: one row per day, one
    column per event type. Written as conditional aggregates (the
    plan `df.groupBy().pivot(...)` produces anyway when the pivot
    values are known) so the column set is static — on a cluster the
    unknown-values `pivot()` needs an extra distinct pass first."""
    ev = table(spark, sf_dir, "events")
    day = epoch_bucket_ms("ts", _DAY_MS).alias(
        "day_ms"
    )
    t = F.col("event_type")
    return ev.select(day, "event_type", "value").groupBy("day_ms").agg(
        F.sum(F.when(t == "view", 1).otherwise(0)).alias("views"),
        F.sum(F.when(t == "click", 1).otherwise(0)).alias("clicks"),
        F.sum(F.when(t == "purchase", 1).otherwise(0)).alias("purchases"),
        F.round(
            exact_sum(F.when(t == "purchase", F.col("value")).otherwise(0.0), 100), 2
        ).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# value_histogram — fixed-width bucket histogram of `value`
# ---------------------------------------------------------------------------

_HIST_BUCKET = 25.0

_HIST_ORACLE = f"""
SELECT CAST(floor(value / {_HIST_BUCKET}) AS BIGINT) AS bucket,
       round(CAST(floor(value / {_HIST_BUCKET}) AS BIGINT) * {_HIST_BUCKET}, 2)
         AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY 1
"""


@register("value_histogram", oracle=_HIST_ORACLE, tags=("metrics",))
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of `value` — a single map-side-combined
    aggregate over a derived bucket key; the classic profiling query
    that must never sort or collect at scale."""
    ev = table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / _HIST_BUCKET).cast("long")
    return ev.groupBy(bucket.alias("bucket")).agg(
        F.round(
            (F.col("bucket") * _HIST_BUCKET).cast("double"), 2
        ).alias("bucket_lo"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# user_retention_cohorts — cohort users by first-seen day, count who
# return N days later
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = f"""
WITH a AS (
  SELECT DISTINCT user_id, (epoch_ms(ts) // {_DAY_MS}) * {_DAY_MS} AS day_ms
  FROM events
), first_seen AS (
  SELECT user_id, min(day_ms) AS cohort_ms FROM a GROUP BY user_id
)
SELECT f.cohort_ms,
       CAST((a.day_ms - f.cohort_ms) // {_DAY_MS} AS BIGINT) AS day_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM a JOIN first_seen f USING (user_id)
GROUP BY 1, 2
"""


@register("user_retention_cohorts", oracle=_RETENTION_ORACLE, tags=("metrics",))
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users cohorted by first active day,
    active-user counts per (cohort, day offset). Two passes over the
    deduped (user, day) activity frame — the first-seen aggregate is
    one row per user, which at any scale is dimension-sized next to
    the event stream, so the re-join hash-partitions on user_id and
    AQE broadcasts it when it fits."""
    ev = table(spark, sf_dir, "events")
    a = ev.select(
        "user_id",
        epoch_bucket_ms("ts", _DAY_MS).alias("day_ms"),
    ).distinct()
    first_seen = a.groupBy("user_id").agg(F.min("day_ms").alias("cohort_ms"))
    return (
        a.join(first_seen, "user_id")
        .groupBy(
            "cohort_ms",
            ((F.col("day_ms") - F.col("cohort_ms")) / _DAY_MS)
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


# ---------------------------------------------------------------------------
# funnel_conversion — ordered view → click → purchase funnel
# ---------------------------------------------------------------------------

_FUNNEL_CONV_ORACLE = """
WITH v AS (
  SELECT user_id, min(epoch_ms(ts)) AS v_ms
  FROM events WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, min(epoch_ms(ts)) AS c_ms
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE event_type = 'click' AND epoch_ms(ts) > v_ms
  GROUP BY 1
), p AS (
  SELECT e.user_id, min(epoch_ms(ts)) AS p_ms
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE event_type = 'purchase' AND epoch_ms(ts) > c_ms
  GROUP BY 1
)
SELECT CAST(1 AS BIGINT) AS step, 'view' AS stage,
       CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
UNION ALL SELECT 2, 'click_after_view', (SELECT count(*) FROM c)
UNION ALL SELECT 3, 'purchase_after_click', (SELECT count(*) FROM p)
"""


@register("funnel_conversion", oracle=_FUNNEL_CONV_ORACLE, tags=("metrics",))
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked
    after their first view, then purchased after that first
    qualifying click. Three chained per-user min aggregates — each
    stage's frame is one row per surviving user (dimension-sized next
    to the event stream), so the stage joins hash-partition on
    user_id and shrink monotonically; the final count rollup is
    three scalars."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_millis("ts").alias("ms")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ms").alias("v_ms"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ms") > F.col("v_ms"))
        .groupBy("user_id")
        .agg(F.min("ms").alias("c_ms"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ms") > F.col("c_ms"))
        .groupBy("user_id")
        .agg(F.min("ms").alias("p_ms"))
    )
    def stage(df, step: int, name: str):
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(step).cast("long").alias("step"),
            F.lit(name).alias("stage"),
            F.col("n_users"),
        )

    return (
        stage(v, 1, "view")
        .unionByName(stage(c, 2, "click_after_view"))
        .unionByName(stage(p, 3, "purchase_after_click"))
    )


# ---------------------------------------------------------------------------
# hourly_anomaly_zscore — monitoring shape: z-score of each hour's
# event count against the same type's trailing 24 h window
# ---------------------------------------------------------------------------

_HOUR_MS = 3_600_000

_ANOMALY_ORACLE = f"""
WITH h AS (
  SELECT event_type, (epoch_ms(ts) // {_HOUR_MS}) * {_HOUR_MS} AS hour_ms,
         CAST(count(*) AS BIGINT) AS n
  FROM events
  GROUP BY 1, 2
), s AS (
  SELECT event_type, hour_ms, n,
         avg(n) OVER w AS mu,
         stddev_samp(n) OVER w AS sigma,
         count(*) OVER w AS w_n
  FROM h
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_ms
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour_ms, n,
       round(mu, 4) AS trailing_mean,
       CAST(floor((n - mu) / sigma * 100.0 + 0.5) AS BIGINT) AS zscore_e2
FROM s
WHERE w_n >= 12 AND sigma > 0
"""


@register("hourly_anomaly_zscore", oracle=_ANOMALY_ORACLE, tags=("metrics",))
def hourly_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each hour's event count scored against the same type's trailing
    24-hour mean/stddev — the monitoring query that pages on-call. The
    raw stream collapses to one map-side-combined (type, hour) count
    first; the window functions then run over the aggregated series
    (rows = types × hours — thousands at any event volume), so the
    sort is never over raw events. The z-score ships in integer 1e-2
    units (floor(x*100+0.5): pure IEEE arithmetic, engine-identical —
    round() is not, on exact boundary rationals)."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    h = (
        ev.select(
            "event_type",
            epoch_bucket_ms("ts", _HOUR_MS).alias(
                "hour_ms"
            ),
        )
        .groupBy("event_type", "hour_ms")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_ms")
        .rowsBetween(-24, -1)
    )
    s = h.select(
        "event_type",
        "hour_ms",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sigma"),
        F.count(F.lit(1)).over(w).alias("w_n"),
    )
    return s.filter((F.col("w_n") >= 12) & (F.col("sigma") > 0)).select(
        "event_type",
        "hour_ms",
        "n",
        F.round("mu", 4).alias("trailing_mean"),
        F.floor((F.col("n") - F.col("mu")) / F.col("sigma") * 100.0 + 0.5)
        .cast("long")
        .alias("zscore_e2"),
    )


# ---------------------------------------------------------------------------
# hourly_dense_series — gap-fill to a dense hourly grid + forward fill
# ---------------------------------------------------------------------------

_DENSE_ORACLE = f"""
WITH e AS (
  SELECT event_type, epoch_ms(ts) // {_HOUR_MS} AS h, value FROM events
), hourly AS (
  SELECT event_type, h, CAST(count(*) AS BIGINT) AS n, SUM(CAST(floor((value) * 100 + 0.5) AS BIGINT)) AS sv
  FROM e GROUP BY 1, 2
), b AS (
  SELECT min(h) AS h0, max(h) AS h1 FROM e
), g AS (
  SELECT unnest(generate_series(h0, h1)) AS h FROM b
), grid AS (
  SELECT event_type, h FROM (SELECT DISTINCT event_type FROM e) CROSS JOIN g
)
SELECT grid.event_type, grid.h * {_HOUR_MS} AS hour_ms,
       coalesce(n, 0) AS n_events,
       CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap,
       round(last_value(sv IGNORE NULLS) OVER (
         PARTITION BY grid.event_type ORDER BY grid.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) / 100.0, 2) AS filled_value
FROM grid LEFT JOIN hourly USING (event_type, h)
"""


@register("hourly_dense_series", oracle=_DENSE_ORACLE, tags=("metrics",))
def hourly_dense_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled dense hourly series per event type with
    forward-filled totals — the time-series report shape (dashboards,
    anomaly baselines) that raw groupBy can't produce because absent
    hours have no row to aggregate. The grid is types × sequence()
    over the global hour bounds (a broadcast one-row frame exploded —
    post-agg cardinality, tiny at any SF); the left join and the
    ignore-nulls last() window both run over that grid, never the raw
    events, so 100 TB of input still reduces before the gap logic."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_millis("ts") / F.lit(_HOUR_MS)).alias("h"),
        "value",
    )
    hourly = ev.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(exact_units(F.col("value"), 100)).alias("sv"),
    )
    bounds = ev.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.sequence("h0", "h1")).alias("h"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    n = F.col("n")
    return (
        grid.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            (F.col("h") * _HOUR_MS).alias("hour_ms"),
            F.coalesce(n, F.lit(0)).alias("n_events"),
            F.when(n.isNull(), F.lit(1)).otherwise(F.lit(0)).cast("long").alias("is_gap"),
            F.round(
                F.last("sv", ignorenulls=True).over(w) / 100.0, 2
            ).alias("filled_value"),
        )
    )


# ---------------------------------------------------------------------------
# user_set_ops — INTERSECT / EXCEPT over behavior cohorts (§2.6 set ops)
# ---------------------------------------------------------------------------

_SET_OPS_ORACLE = """
SELECT user_id, 'engaged' AS cohort FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'click'
)
UNION ALL
SELECT user_id, 'error_free_buyer' AS cohort FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  EXCEPT
  SELECT user_id FROM events WHERE event_type = 'error'
)
"""


@register("user_set_ops", oracle=_SET_OPS_ORACLE, tags=("setop",))
def user_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operator surface (§2.6): INTERSECT and EXCEPT over behavior
    cohorts, unioned with a tag. Both compile to aggregate+join plans
    over the pre-projected (user_id) column — the scan reads one
    column, and the distinct shuffles carry bare longs."""
    ev = table(spark, sf_dir, "events")

    def ids(t: str) -> DataFrame:
        return ev.filter(F.col("event_type") == t).select("user_id")

    engaged = (
        ids("purchase").intersect(ids("click"))
        .select("user_id", F.lit("engaged").alias("cohort"))
    )
    # subtract = EXCEPT DISTINCT (exceptAll is bag semantics: a user
    # with more purchases than errors would survive it)
    clean = (
        ids("purchase").subtract(ids("error"))
        .select("user_id", F.lit("error_free_buyer").alias("cohort"))
    )
    return engaged.unionByName(clean)

# ---------------------------------------------------------------------------
# events_zorder_layout — Z-order (Morton) clustering stats: the
# multi-dimensional data-layout op (Delta/Iceberg OPTIMIZE ZORDER).
# The reference partitions sinks by dt/hour only; this is the upgrade
# for tables queried by more than the time axis: interleaving user and
# time bits makes every layout bucket tight in BOTH dimensions, so
# file min/max stats prune range predicates on either one.
#
# Each dimension is first normalized to an 8-bit grid over its own
# min/max (integer arithmetic, mirrored exactly in the oracle via a
# scalar-stats CTE) — raw-value interleaving degenerates when the
# dimensions' scales differ (15 users vs 44k minutes at sf0.001 put
# every high z-bit on the time axis, i.e. time-only layout again).
# ---------------------------------------------------------------------------

_Z_MINUTE_BASE = 28_400_000  # minutes at 2024-01-01 (fixture epoch)
_Z_GRID_BITS = 8
_Z_BUCKET_SHIFT = 10  # 16-bit z >> 10 -> 64 layout buckets


def _zorder_oracle() -> str:
    from openmetrics_spark.functions.zorder import z_interleave_sql

    z = z_interleave_sql("xn", "yn", bits=_Z_GRID_BITS)
    return f"""
WITH d AS (
  SELECT (user_id & 65535) AS x,
         (((epoch_ms(ts) // 60000) - {_Z_MINUTE_BASE}) & 65535) AS y
  FROM events
), st AS (
  SELECT min(x) AS x0, max(x) - min(x) + 1 AS xs,
         min(y) AS y0, max(y) - min(y) + 1 AS ys
  FROM d
), g AS (
  SELECT ((x - x0) * 256) // xs AS xn, ((y - y0) * 256) // ys AS yn, x, y
  FROM d, st
)
SELECT ({z} >> {_Z_BUCKET_SHIFT}) AS z_bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       min(x) AS user_lo, max(x) AS user_hi,
       min(y) AS minute_lo, max(y) AS minute_hi
FROM g GROUP BY 1
"""


@register(
    "events_zorder_layout", oracle=_zorder_oracle(), tags=("layout",)
)
def events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-Z-bucket layout stats: events normalized to an 8-bit grid
    per dimension, mapped onto a Morton curve over (user, minute) and
    grouped into 64 layout buckets — the repartition key a Z-ordered
    writer would use. Each bucket's min/max on BOTH dimensions is
    tight (tests quantify the covered-area fraction vs time-only
    layout), which is exactly what makes file stats prune 2-D range
    predicates at 100 TB. Everything is integer bit math — one
    map-side-combined aggregate plus a broadcast stats scalar — so
    the layout decision itself is driver hash-gated."""
    from openmetrics_spark.functions.zorder import z_interleave

    ev = table(spark, sf_dir, "events")
    x = F.col("user_id").bitwiseAND(F.lit(65535))
    y = (
        F.floor(F.unix_millis("ts") / F.lit(60000)).cast("long")
        - F.lit(_Z_MINUTE_BASE)
    ).bitwiseAND(F.lit(65535))
    d = ev.select(x.alias("x"), y.alias("y"))
    st = d.agg(
        F.min("x").alias("x0"),
        (F.max("x") - F.min("x") + 1).alias("xs"),
        F.min("y").alias("y0"),
        (F.max("y") - F.min("y") + 1).alias("ys"),
    )
    g = d.crossJoin(F.broadcast(st)).select(
        F.expr("((x - x0) * 256) div xs").alias("xn"),
        F.expr("((y - y0) * 256) div ys").alias("yn"),
        "x",
        "y",
    )
    return (
        g.select(
            F.shiftrightunsigned(
                z_interleave(F.col("xn"), F.col("yn"), bits=_Z_GRID_BITS),
                _Z_BUCKET_SHIFT,
            ).alias("z_bucket"),
            "x",
            "y",
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("x").alias("user_lo"),
            F.max("x").alias("user_hi"),
            F.min("y").alias("minute_lo"),
            F.max("y").alias("minute_hi"),
        )
    )


# ---------------------------------------------------------------------------
# orders_rfm_segments — classic RFM customer segmentation (recency /
# frequency / monetary quintiles), sketch-bounded so the plan carries
# NO global sort. orders_rfm_ntile_spec below keeps the exact
# equal-population NTILE form as the oracle-gated spec twin (and the
# registry's NTILE coverage).
# ---------------------------------------------------------------------------

# Monetary histogram grid: $100 buckets (10_000 cents). recency (days)
# and frequency (order count) use width-1 grids — their ranges are
# already small integers.
_RFM_M_WIDTH = 10_000

_RFM_CUST_SQL = """
  SELECT o_custkey,
         CAST(date_diff('day', max(o_orderdate),
                   (SELECT max(o_orderdate) FROM orders)) AS BIGINT)
           AS recency_days,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY o_custkey
"""

_RFM_ORACLE = f"""
WITH cust AS ({_RFM_CUST_SQL}
), hist AS (
  SELECT metric, bucket, count(*) AS cnt FROM (
    SELECT 'r' AS metric, recency_days AS bucket FROM cust
    UNION ALL SELECT 'f', n_orders FROM cust
    UNION ALL SELECT 'm', cents // {_RFM_M_WIDTH} FROM cust
  ) GROUP BY ALL
), cum AS (
  SELECT metric, bucket,
         sum(cnt) OVER (PARTITION BY metric ORDER BY bucket) AS cum,
         sum(cnt) OVER (PARTITION BY metric) AS n
  FROM hist
), bounds AS (
  SELECT
    min(CASE WHEN metric = 'r' AND cum * 100 >= 20 * n THEN bucket END) AS r20,
    min(CASE WHEN metric = 'r' AND cum * 100 >= 40 * n THEN bucket END) AS r40,
    min(CASE WHEN metric = 'r' AND cum * 100 >= 60 * n THEN bucket END) AS r60,
    min(CASE WHEN metric = 'r' AND cum * 100 >= 80 * n THEN bucket END) AS r80,
    min(CASE WHEN metric = 'f' AND cum * 100 >= 20 * n THEN bucket END) AS f20,
    min(CASE WHEN metric = 'f' AND cum * 100 >= 40 * n THEN bucket END) AS f40,
    min(CASE WHEN metric = 'f' AND cum * 100 >= 60 * n THEN bucket END) AS f60,
    min(CASE WHEN metric = 'f' AND cum * 100 >= 80 * n THEN bucket END) AS f80,
    min(CASE WHEN metric = 'm' AND cum * 100 >= 20 * n THEN bucket END) AS m20,
    min(CASE WHEN metric = 'm' AND cum * 100 >= 40 * n THEN bucket END) AS m40,
    min(CASE WHEN metric = 'm' AND cum * 100 >= 60 * n THEN bucket END) AS m60,
    min(CASE WHEN metric = 'm' AND cum * 100 >= 80 * n THEN bucket END) AS m80
  FROM cum
)
SELECT o_custkey, recency_days, n_orders, cents,
       CAST(
         (1 + (recency_days > r20)::INT + (recency_days > r40)::INT
            + (recency_days > r60)::INT + (recency_days > r80)::INT) * 100
       + (5 - (n_orders > f20)::INT - (n_orders > f40)::INT
            - (n_orders > f60)::INT - (n_orders > f80)::INT) * 10
       + (5 - (cents // {_RFM_M_WIDTH} > m20)::INT
            - (cents // {_RFM_M_WIDTH} > m40)::INT
            - (cents // {_RFM_M_WIDTH} > m60)::INT
            - (cents // {_RFM_M_WIDTH} > m80)::INT)
       AS BIGINT) AS rfm
FROM cust, bounds
"""


def _rfm_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer RFM base: recency_days (anchored at the dataset's
    max order date), order count, exact-cents spend. One groupBy
    shuffle of orders; the anchor is a one-row scalar broadcast."""
    o = table(spark, sf_dir, "orders")
    anchor = o.agg(F.max("o_orderdate").alias("mx"))
    return (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_dt"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff(F.col("mx"), F.col("last_dt"))
            .cast("long")
            .alias("recency_days"),
            F.col("n_orders").cast("long").alias("n_orders"),
            "cents",
        )
    )


@register("orders_rfm_segments", oracle=_RFM_ORACLE, tags=("sketch", "agg"))
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe RFM segmentation: quintile BOUNDARIES come from the
    engine-exact fixed-grid histogram (the hist_percentiles shape,
    operators/sketches.py:244 — grids: 1 day / 1 order / $100), and
    the per-customer scan buckets against the broadcast one-row bounds
    — no global sort anywhere, mirroring the reference, whose only
    "rank everything" op is a heap/broadcast top-N
    (LP/job/counter/TopNEmitter.java:20-170). Boundary b_q = smallest
    grid point with cum*100 >= q*n (all-integer, so both engines agree
    bit-for-bit); score = 1 + #bounds-exceeded (recency ascending:
    quintile 1 = most recent) or 5 - #bounds-exceeded (frequency and
    monetary descending: quintile 1 = top). Grid ties all land in one
    quintile — the documented trade vs NTILE's exact equal-population
    splits (kept as orders_rfm_ntile_spec). 100 TB: histogram input is
    one map-side-combined (metric, bucket) count — O(grid) rows; the
    cumulative window partitions by metric over O(grid) rows; scoring
    is a broadcast join on the base scan."""
    cust = _rfm_cust(spark, sf_dir)
    hist = (
        cust.select(
            F.expr(
                "stack(3, 'r', recency_days, 'f', n_orders,"
                f" 'm', cents DIV {_RFM_M_WIDTH}) AS (metric, bucket)"
            )
        )
        .groupBy("metric", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = (
        Window.partitionBy("metric")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_n = Window.partitionBy("metric")
    cum = hist.select(
        "metric",
        "bucket",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_n).alias("n"),
    )

    def _b(metric: str, q: int):
        hit = (F.col("metric") == metric) & (
            F.col("cum") * 100 >= F.lit(q) * F.col("n")
        )
        return F.min(F.when(hit, F.col("bucket"))).alias(f"{metric}{q}")

    bounds = cum.groupBy().agg(
        *[_b(m, q) for m in ("r", "f", "m") for q in (20, 40, 60, 80)]
    )

    def _asc_score(col, prefix):
        return sum(
            (F.col(col) > F.col(f"{prefix}{q}")).cast("int")
            for q in (20, 40, 60, 80)
        ) + F.lit(1)

    scored = cust.crossJoin(F.broadcast(bounds))
    m_bucket = F.expr(f"cents DIV {_RFM_M_WIDTH}")
    return scored.select(
        "o_custkey",
        "recency_days",
        "n_orders",
        "cents",
        (
            _asc_score("recency_days", "r") * 100
            + (F.lit(6) - _asc_score("n_orders", "f")) * 10
            + (
                F.lit(6)
                - (
                    sum(
                        (m_bucket > F.col(f"m{q}")).cast("int")
                        for q in (20, 40, 60, 80)
                    )
                    + F.lit(1)
                )
            )
        )
        .cast("long")
        .alias("rfm"),
    )


_RFM_NTILE_ORACLE = f"""
WITH cust AS ({_RFM_CUST_SQL}
), scored AS (
  SELECT *,
         ntile(5) OVER (ORDER BY recency_days ASC, o_custkey) AS r_q,
         ntile(5) OVER (ORDER BY n_orders DESC, o_custkey) AS f_q,
         ntile(5) OVER (ORDER BY cents DESC, o_custkey) AS m_q
  FROM cust
)
SELECT o_custkey, recency_days, n_orders, cents,
       CAST(r_q * 100 + f_q * 10 + m_q AS BIGINT) AS rfm
FROM scored
"""


@register(
    "orders_rfm_ntile_spec", oracle=_RFM_NTILE_ORACLE, tags=("window", "agg")
)
def orders_rfm_ntile_spec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT equal-population RFM spec twin (and the registry's NTILE
    coverage): 3-digit quintile code via NTILE(5) with a total
    tiebreak (metric, custkey) — both engines implement standard NTILE
    remainder-to-leading-groups, so identical ordering ⇒ identical
    buckets. The global NTILE is a single-partition sort, fine at test
    SFs as the gateable spec; the REGISTERED scale path is
    orders_rfm_segments above (sketch boundaries + broadcast-bounds
    bucketing, no global sort)."""
    cust = _rfm_cust(spark, sf_dir)
    w_r = Window.orderBy(F.col("recency_days").asc(), F.col("o_custkey"))
    w_f = Window.orderBy(F.col("n_orders").desc(), F.col("o_custkey"))
    w_m = Window.orderBy(F.col("cents").desc(), F.col("o_custkey"))
    return cust.select(
        "o_custkey",
        "recency_days",
        "n_orders",
        "cents",
        (
            F.ntile(5).over(w_r) * 100
            + F.ntile(5).over(w_f) * 10
            + F.ntile(5).over(w_m)
        )
        .cast("long")
        .alias("rfm"),
    )
