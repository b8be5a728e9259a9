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

from pyspark.sql import DataFrame, SparkSession, Window
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


# ---------------------------------------------------------------------------
# Time-correct experiment assignment under RE-RANDOMIZATION (r8 verdict
# #7): the reference dedups CohortMembership keyed
# (platform, membership_id) with 1 d retention in the raw job
# (LP/job/raw/RawOutputJob.java:238-313, RawKeys.java:40-45) and a
# user's arm can change over time — so an outcome must attribute to
# the arm VALID AT EVENT TIME, not the latest arm.
#
# Fixture: every 6th event emits a membership record for cohort
# ((event_id // 6) % 3) at the event's time with arm (user_id +
# event_id//6 + cohort) % 2 — re-randomization by construction, all
# three cohorts populated; every 12th event
# ALSO re-sends the same membership_id 10 ms later with the arm
# FLIPPED, so the keep-first dedup is load-bearing (keeping the wrong
# duplicate flips the interval's arm and the checksum). The pipeline:
# keep-first per (platform, membership_id) → SCD2 compaction (keep
# arm CHANGES per (platform, user, cohort), the users_q.py:224 shape)
# → valid intervals via lead() → purchases join the interval
# containing their timestamp (valid_from <= ts < valid_to; intervals
# are disjoint per key, so the range join is exact).
#
# 100 TB: dedup is one (platform, membership_id) aggregate; compaction
# + intervals are one window over (user, cohort); the temporal join is
# an equi join on user with the disjoint-interval range as residual —
# one shuffle each, all on keys that shrink.
# ---------------------------------------------------------------------------

_MEMBERSHIP_ORACLE = """
WITH raw AS (
  SELECT user_id % 4 AS platform_id, user_id AS uid,
         'mb' || CAST(event_id AS VARCHAR) AS membership_id,
         'exp' || CAST((event_id // 6) % 3 AS VARCHAR) AS cohort_id,
         CAST((user_id + event_id // 6 + (event_id // 6) % 3) % 2 AS INT) AS arm,
         epoch_ms(ts) AS ms
  FROM events WHERE event_id % 6 = 0
  UNION ALL
  SELECT user_id % 4, user_id,
         'mb' || CAST(event_id AS VARCHAR),
         'exp' || CAST((event_id // 6) % 3 AS VARCHAR),
         CAST(1 - (user_id + event_id // 6 + (event_id // 6) % 3) % 2 AS INT),
         epoch_ms(ts) + 10
  FROM events WHERE event_id % 12 = 0
),
ded AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY platform_id, membership_id ORDER BY ms, arm
    ) AS rn FROM raw
  ) WHERE rn = 1
),
chg AS (
  SELECT * FROM (
    SELECT platform_id, uid, cohort_id, arm, ms,
           lag(arm) OVER w AS prev_arm
    FROM ded
    WINDOW w AS (PARTITION BY platform_id, uid, cohort_id
                 ORDER BY ms, membership_id)
  ) WHERE prev_arm IS NULL OR arm <> prev_arm
),
iv AS (
  SELECT platform_id, uid, cohort_id, arm, ms AS valid_from,
         lead(ms) OVER (PARTITION BY platform_id, uid, cohort_id
                        ORDER BY ms) AS valid_to
  FROM chg
),
p AS (
  SELECT user_id AS uid, epoch_ms(ts) AS pms,
         CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
attr AS (
  SELECT iv.cohort_id, iv.arm, p.uid, p.cents
  FROM p JOIN iv ON p.uid = iv.uid
   AND p.pms >= iv.valid_from
   AND (iv.valid_to IS NULL OR p.pms < iv.valid_to)
),
ivagg AS (
  SELECT cohort_id, arm,
         CAST(count(*) AS BIGINT) AS n_intervals,
         CAST(count(DISTINCT uid) AS BIGINT) AS n_users
  FROM iv GROUP BY 1, 2
),
pagg AS (
  SELECT cohort_id, arm,
         CAST(count(*) AS BIGINT) AS n_attr_purchases,
         CAST(sum(cents) AS BIGINT) AS gmv_cents
  FROM attr GROUP BY 1, 2
)
SELECT cohort_id, arm, n_intervals, n_users,
       CAST(coalesce(n_attr_purchases, 0) AS BIGINT) AS n_attr_purchases,
       CAST(coalesce(gmv_cents, 0) AS BIGINT) AS gmv_cents
FROM ivagg LEFT JOIN pagg USING (cohort_id, arm)
"""


@register(
    "cohort_membership_intervals",
    oracle=_MEMBERSHIP_ORACLE,
    tags=("experiment", "scd2"),
)
def cohort_membership_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first-deduped cohort memberships compacted into SCD2 arm
    intervals, with purchases attributed to the arm valid AT PURCHASE
    TIME (see block comment) — time-correct experiment assignment
    under re-randomization."""
    from openmetrics_spark.operators.dedup import keep_first

    ev = table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_id") % 6 == 0).select(
        (F.col("user_id") % 4).alias("platform_id"),
        F.col("user_id").alias("uid"),
        F.concat(F.lit("mb"), F.col("event_id")).alias("membership_id"),
        F.concat(F.lit("exp"), F.floor(F.col("event_id") / 6) % 3).alias("cohort_id"),
        ((F.col("user_id") + F.floor(F.col("event_id") / 6) + F.floor(F.col("event_id") / 6) % 3) % 2)
        .cast("int")
        .alias("arm"),
        F.unix_millis("ts").alias("ms"),
    )
    dup = ev.filter(F.col("event_id") % 12 == 0).select(
        (F.col("user_id") % 4).alias("platform_id"),
        F.col("user_id").alias("uid"),
        F.concat(F.lit("mb"), F.col("event_id")).alias("membership_id"),
        F.concat(F.lit("exp"), F.floor(F.col("event_id") / 6) % 3).alias("cohort_id"),
        (1 - (F.col("user_id") + F.floor(F.col("event_id") / 6) + F.floor(F.col("event_id") / 6) % 3) % 2)
        .cast("int")
        .alias("arm"),
        (F.unix_millis("ts") + 10).alias("ms"),
    )
    ded = keep_first(
        base.unionByName(dup),
        ["platform_id", "membership_id"],
        ["ms", "arm"],
    )
    w = Window.partitionBy("platform_id", "uid", "cohort_id").orderBy(
        "ms", "membership_id"
    )
    chg = ded.withColumn("prev_arm", F.lag("arm").over(w)).filter(
        F.col("prev_arm").isNull() | (F.col("arm") != F.col("prev_arm"))
    )
    w2 = Window.partitionBy("platform_id", "uid", "cohort_id").orderBy("ms")
    iv = chg.select(
        "platform_id",
        "uid",
        "cohort_id",
        "arm",
        F.col("ms").alias("valid_from"),
        F.lead("ms").over(w2).alias("valid_to"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("uid"),
        F.unix_millis("ts").alias("pms"),
        F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    attr = p.join(
        iv,
        (p["uid"] == iv["uid"])
        & (p["pms"] >= iv["valid_from"])
        & (iv["valid_to"].isNull() | (p["pms"] < iv["valid_to"])),
        "inner",
    ).select("cohort_id", "arm", p["uid"].alias("puid"), "cents")
    ivagg = iv.groupBy("cohort_id", "arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.countDistinct("uid").cast("long").alias("n_users"),
    )
    pagg = attr.groupBy("cohort_id", "arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_attr_purchases"),
        F.sum("cents").cast("long").alias("gmv_cents"),
    )
    return ivagg.join(pagg, ["cohort_id", "arm"], "left").select(
        "cohort_id",
        "arm",
        "n_intervals",
        "n_users",
        F.coalesce(F.col("n_attr_purchases"), F.lit(0))
        .cast("long")
        .alias("n_attr_purchases"),
        F.coalesce(F.col("gmv_cents"), F.lit(0)).cast("long").alias("gmv_cents"),
    )
