"""UserJoin query: version-merged user state attached to events as-of
their timestamps (reference: common/functions/userjoin/UserJoin.java:
36-358 + UserUpdateMerger.java:19-110).

Update stream derivation (identical in Spark and the oracle): signup
events become PARTIAL user updates — alternating rows carry only some
fields — so the driver row only matches if the field-wise merge rules
fire: last non-empty user id, sticky is_internal_user, latest
ignore_usage, latest non-null properties. Clicks then as-of join the
folded versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmetrics_spark.operators.joins import user_join
from openmetrics_spark.queries import register
from openmetrics_spark.tables import table

_USER_JOIN_ORACLE = """
WITH upd AS (
  SELECT user_id % 4 AS platform_id,
         'lu' || CAST(user_id AS VARCHAR) AS log_user_id,
         epoch_ms(ts) AS ms, event_id,
         CASE WHEN event_id % 2 = 0
              THEN 'u' || CAST(user_id AS VARCHAR) || '.' || CAST(event_id AS VARCHAR)
         END AS uid_val,
         (event_id % 5 = 0) AS is_int,
         (event_id % 7 = 0) AS ign,
         CASE WHEN event_id % 3 = 0
              THEN '{"v":' || CAST(event_id AS VARCHAR) || '}'
         END AS props
  FROM events WHERE event_type = 'signup'
),
eff AS (
  SELECT platform_id, log_user_id, ms, event_id,
         last_value(CASE WHEN uid_val IS NOT NULL AND uid_val != ''
                         THEN uid_val END IGNORE NULLS) OVER w AS user_id,
         (MAX(CASE WHEN is_int THEN 1 ELSE 0 END) OVER w = 1) AS is_internal_user,
         ign AS ignore_usage,
         last_value(props IGNORE NULLS) OVER w AS properties_json
  FROM upd
  WINDOW w AS (PARTITION BY platform_id, log_user_id
               ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING)
),
vers AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY platform_id, log_user_id, ms ORDER BY event_id DESC
    ) AS rn FROM eff
  ) WHERE rn = 1
),
clicks AS (
  SELECT event_id AS click_id, user_id % 4 AS platform_id,
         'lu' || CAST(user_id AS VARCHAR) AS log_user_id, epoch_ms(ts) AS ms
  FROM events WHERE event_type = 'click'
)
SELECT c.click_id, v.user_id,
       CAST(v.is_internal_user AS VARCHAR) AS is_internal_user,
       CAST(v.ignore_usage AS VARCHAR) AS ignore_usage,
       v.properties_json
FROM clicks c ASOF LEFT JOIN vers v
  ON c.platform_id = v.platform_id
 AND c.log_user_id = v.log_user_id
 AND c.ms >= v.ms
"""


def derive_user_updates(ev: DataFrame) -> DataFrame:
    """The synthetic PARTIAL user-update stream (alternating fields
    set), shared by the batch query and its streaming twin so both
    feed the same oracle. ``uid`` carries the raw user id — in this
    derivation the (platform_id, log_user_id) key is a bijection of
    it, which is what lets the streaming state machine key on one
    long column."""
    base_key = [
        (F.col("user_id") % 4).alias("platform_id"),
        F.concat(F.lit("lu"), F.col("user_id").cast("string")).alias("log_user_id"),
    ]
    return ev.filter(F.col("event_type") == "signup").select(
        *base_key,
        F.col("user_id").alias("uid"),
        F.unix_millis("ts").alias("log_timestamp"),
        "event_id",
        F.when(
            F.col("event_id") % 2 == 0,
            F.concat(
                F.lit("u"),
                F.col("user_id").cast("string"),
                F.lit("."),
                F.col("event_id").cast("string"),
            ),
        ).alias("user_id"),
        (F.col("event_id") % 5 == 0).alias("is_internal_user"),
        (F.col("event_id") % 7 == 0).alias("ignore_usage"),
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(F.lit('{"v":'), F.col("event_id").cast("string"), F.lit("}")),
        ).alias("properties_json"),
    )


def derive_clicks(ev: DataFrame) -> DataFrame:
    base_key = [
        (F.col("user_id") % 4).alias("platform_id"),
        F.concat(F.lit("lu"), F.col("user_id").cast("string")).alias("log_user_id"),
    ]
    return ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("uid"),
        *base_key,
        "ts",
    )


@register("user_versioned_join", oracle=_USER_JOIN_ORACLE, tags=("join", "user"))
def user_versioned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks enriched with the effective user at click time, built
    from partial updates via the UserUpdateMerger field rules."""
    ev = table(spark, sf_dir, "events")
    upd = derive_user_updates(ev).drop("uid")
    clicks = derive_clicks(ev).drop("uid")
    joined = user_join(
        clicks,
        upd,
        on=("platform_id", "log_user_id"),
        event_ts="ts",
        user_ts_ms="log_timestamp",
        order_col="event_id",
    )
    # booleans leave as strings: nullable bools round-trip as NaN in
    # pandas and break order-insensitive row alignment in comparators
    return joined.select(
        "click_id",
        "user_id",
        F.col("is_internal_user").cast("string").alias("is_internal_user"),
        F.col("ignore_usage").cast("string").alias("ignore_usage"),
        "properties_json",
    )
