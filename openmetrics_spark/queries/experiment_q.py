"""Experiment readout over cohort memberships — the downstream
consumer the reference's cohort_membership archival exists for
(LogRequestFilter.java:73-79 side-outputs memberships keyed
(platform, membership_id), RawKeys.java:40-45; marketplaces read the
archived table to compute per-arm lift).

Fixture: memberships are derived per (platform, user, cohort) with a
deterministic arm assignment (the hash-bucketing a real assignment
service does); outcomes are the user's purchase events. The report is
exact end to end: counts, integer cents, conversion in basis points
(integer DIV), and per-cohort TREATMENT-vs-CONTROL lift in bp —
no float anywhere, so the whole experiment readout is hash-gated.

100 TB: memberships are one distinct-user aggregate, outcomes one
user aggregate; the report is a (cohort, arm) rollup of ~cohorts×2
rows joined arm-to-arm — every shuffle is on keys that shrink, and
the final lift join is trivially broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmetrics_spark.queries import register
from openmetrics_spark.tables import table

_N_COHORTS = 3

_EXPERIMENT_ORACLE = f"""
WITH u AS (
  SELECT DISTINCT user_id % 4 AS platform_id, user_id AS uid
  FROM events
),
m AS (
  SELECT platform_id, uid, 'exp' || CAST(c AS VARCHAR) AS cohort_id,
         CAST((uid + c * 7) % 2 AS INT) AS arm
  FROM u, range({_N_COHORTS}) r(c)
  WHERE (uid + c) % 5 < 2
),
o AS (
  SELECT user_id AS uid,
         CAST(count(*) AS BIGINT) AS n_purchases,
         CAST(sum(CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS gmv_cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
arms AS (
  SELECT cohort_id, arm,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(count(o.uid) AS BIGINT) AS n_converters,
         CAST(coalesce(sum(o.n_purchases), 0) AS BIGINT) AS n_purchases,
         CAST(coalesce(sum(o.gmv_cents), 0) AS BIGINT) AS gmv_cents
  FROM m LEFT JOIN o ON m.uid = o.uid
  GROUP BY cohort_id, arm
),
wide AS (
  SELECT c.cohort_id,
         c.n_users AS control_users, t.n_users AS treat_users,
         CAST(c.n_converters * 10000 // c.n_users AS BIGINT) AS control_conv_bp,
         CAST(t.n_converters * 10000 // t.n_users AS BIGINT) AS treat_conv_bp,
         c.gmv_cents AS control_gmv_cents, t.gmv_cents AS treat_gmv_cents
  FROM (SELECT * FROM arms WHERE arm = 0) c
  JOIN (SELECT * FROM arms WHERE arm = 1) t USING (cohort_id)
)
SELECT cohort_id, control_users, treat_users, control_conv_bp,
       treat_conv_bp,
       CAST(treat_conv_bp - control_conv_bp AS BIGINT) AS lift_bp,
       control_gmv_cents, treat_gmv_cents
FROM wide
"""


@register(
    "cohort_experiment_report",
    oracle=_EXPERIMENT_ORACLE,
    tags=("experiment", "metrics"),
)
def cohort_experiment_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cohort treatment-vs-control conversion lift (see module
    docstring)."""
    ev = table(spark, sf_dir, "events")
    u = ev.select(
        (F.col("user_id") % 4).alias("platform_id"),
        F.col("user_id").alias("uid"),
    ).distinct()
    m = (
        u.select(
            "platform_id",
            "uid",
            F.explode(
                F.array(*[F.lit(c) for c in range(_N_COHORTS)])
            ).alias("c"),
        )
        .filter((F.col("uid") + F.col("c")) % 5 < 2)
        .select(
            "uid",
            F.concat(F.lit("exp"), F.col("c")).alias("cohort_id"),
            ((F.col("uid") + F.col("c") * 7) % 2).cast("int").alias("arm"),
        )
    )
    o = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("uid"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 100 + 0.5)
                .cast("long")
            )
            .cast("long")
            .alias("gmv_cents"),
        )
    )
    arms = (
        m.join(o, "uid", "left")
        .groupBy("cohort_id", "arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.count("n_purchases").cast("long").alias("n_converters"),
            F.coalesce(F.sum("n_purchases"), F.lit(0))
            .cast("long")
            .alias("n_purchases"),
            F.coalesce(F.sum("gmv_cents"), F.lit(0))
            .cast("long")
            .alias("gmv_cents"),
        )
        .withColumn(
            "conv_bp",
            F.expr("CAST(n_converters * 10000 DIV n_users AS BIGINT)"),
        )
    )
    c = arms.filter(F.col("arm") == 0).select(
        "cohort_id",
        F.col("n_users").alias("control_users"),
        F.col("conv_bp").alias("control_conv_bp"),
        F.col("gmv_cents").alias("control_gmv_cents"),
    )
    t = arms.filter(F.col("arm") == 1).select(
        "cohort_id",
        F.col("n_users").alias("treat_users"),
        F.col("conv_bp").alias("treat_conv_bp"),
        F.col("gmv_cents").alias("treat_gmv_cents"),
    )
    return c.join(t, "cohort_id").select(
        "cohort_id",
        "control_users",
        "treat_users",
        "control_conv_bp",
        "treat_conv_bp",
        (F.col("treat_conv_bp") - F.col("control_conv_bp"))
        .cast("long")
        .alias("lift_bp"),
        "control_gmv_cents",
        "treat_gmv_cents",
    )
