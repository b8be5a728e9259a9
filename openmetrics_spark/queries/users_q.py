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


# ---------------------------------------------------------------------------
# user_scd2_intervals — the warehouse-facing shape of the versioned
# user state: a slowly-changing-dimension type-2 table. Consecutive
# folded versions with identical merged attributes COLLAPSE into one
# row carrying [valid_from_ms, valid_to_ms) — the dimension a batch
# join at any point in time probes with BETWEEN instead of re-running
# the as-of machinery.
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
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
flagged AS (
  SELECT *,
         CASE WHEN struct_pack(u := user_id, i := is_internal_user,
                               g := ignore_usage, p := properties_json)
              IS DISTINCT FROM lag(struct_pack(u := user_id,
                               i := is_internal_user, g := ignore_usage,
                               p := properties_json)) OVER wk
              THEN 1 ELSE 0 END AS chg
  FROM vers
  WINDOW wk AS (PARTITION BY platform_id, log_user_id ORDER BY ms, event_id)
),
grp AS (
  SELECT *, SUM(chg) OVER (PARTITION BY platform_id, log_user_id
                           ORDER BY ms, event_id
                           ROWS UNBOUNDED PRECEDING) AS g
  FROM flagged
),
iv AS (
  SELECT platform_id, log_user_id, g,
         MIN(ms) AS valid_from_ms,
         CAST(count(*) AS BIGINT) AS n_versions,
         user_id,
         CAST(is_internal_user AS VARCHAR) AS is_internal_user,
         CAST(ignore_usage AS VARCHAR) AS ignore_usage,
         properties_json
  FROM grp
  GROUP BY platform_id, log_user_id, g, user_id, is_internal_user,
           ignore_usage, properties_json
)
SELECT platform_id, log_user_id, valid_from_ms,
       lead(valid_from_ms) OVER (PARTITION BY platform_id, log_user_id
                                 ORDER BY valid_from_ms) AS valid_to_ms,
       n_versions, user_id, is_internal_user, ignore_usage, properties_json
FROM iv
"""


@register(
    "user_scd2_intervals", oracle=_SCD2_ORACLE, headline=True, tags=("join", "user")
)
def user_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 build over the folded user versions: consecutive
    versions whose merged attributes are null-safe-identical collapse
    into one half-open validity interval [valid_from_ms, valid_to_ms)
    (valid_to_ms NULL = current row), with n_versions counting the
    collapsed updates. This is the materialized-dimension alternative
    to the as-of UserJoin: build once, probe with BETWEEN.

    Scale shape: one shuffle on the user key serves the fold window,
    the per-ms dedup, the change-flag lag, the running-group sum, the
    interval aggregate AND the valid_to lead — every step is
    partitioned by the same key, so Catalyst reuses the exchange; no
    raw-event shuffle, state bounded per key by its update count."""
    from pyspark.sql import Window

    from openmetrics_spark.operators.joins import effective_users

    ev = table(spark, sf_dir, "events")
    upd = derive_user_updates(ev)
    eff = effective_users(
        upd,
        ("platform_id", "log_user_id"),
        ts_col="log_timestamp",
        order_col="event_id",
    )
    attrs = ["user_id", "is_internal_user", "ignore_usage", "properties_json"]
    wv = Window.partitionBy(
        "platform_id", "log_user_id", "log_timestamp"
    ).orderBy(F.col("event_id").desc())
    vers = (
        eff.withColumn("__rn", F.row_number().over(wv))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    wk = Window.partitionBy("platform_id", "log_user_id").orderBy(
        "log_timestamp", "event_id"
    )
    cur = F.struct(*[F.col(c) for c in attrs])
    changed = ~F.lag(cur).over(wk).eqNullSafe(cur)
    grp = vers.withColumn("__chg", changed.cast("int")).withColumn(
        "__g",
        F.sum("__chg").over(wk.rowsBetween(Window.unboundedPreceding, 0)),
    )
    iv = grp.groupBy("platform_id", "log_user_id", "__g", *attrs).agg(
        F.min("log_timestamp").alias("valid_from_ms"),
        F.count(F.lit(1)).alias("n_versions"),
    )
    wl = Window.partitionBy("platform_id", "log_user_id").orderBy(
        "valid_from_ms"
    )
    return iv.select(
        "platform_id",
        "log_user_id",
        "valid_from_ms",
        F.lead("valid_from_ms").over(wl).alias("valid_to_ms"),
        "n_versions",
        "user_id",
        F.col("is_internal_user").cast("string").alias("is_internal_user"),
        F.col("ignore_usage").cast("string").alias("ignore_usage"),
        "properties_json",
    )


# ---------------------------------------------------------------------------
# events_scd2_enrich — the PROBE half of the SCD2 pattern the interval
# build promises ("build once, probe with BETWEEN"): point-in-time
# dimension enrichment of facts against the validity intervals.
# ---------------------------------------------------------------------------

_SCD2_ENRICH_ORACLE = f"""
WITH scd AS ({_SCD2_ORACLE}),
facts AS (
  SELECT user_id % 4 AS platform_id,
         'lu' || CAST(user_id AS VARCHAR) AS log_user_id,
         event_id AS fact_id, epoch_ms(ts) AS ms
  FROM events WHERE event_type = 'purchase'
)
SELECT f.platform_id, f.log_user_id, f.fact_id, f.ms,
       s.user_id, s.is_internal_user,
       CAST(s.n_versions AS BIGINT) AS n_versions
FROM facts f
LEFT JOIN scd s
  ON f.platform_id = s.platform_id AND f.log_user_id = s.log_user_id
 AND f.ms >= s.valid_from_ms
 AND (s.valid_to_ms IS NULL OR f.ms < s.valid_to_ms)
"""


@register(
    "events_scd2_enrich",
    oracle=_SCD2_ENRICH_ORACLE,
    tags=("join", "user"),
)
def events_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment of purchase facts against the SCD2
    dimension: the oracle probes intervals with BETWEEN (a range
    join); the Spark side exploits that SCD2 intervals are CONTIGUOUS
    per key, so "the interval containing ms" == "the last interval
    starting at or before ms" — the as-of join (union + one key
    shuffle + last-value carry, operators/joins.py:42), NEVER a range
    join. |facts|+|intervals| rows through one shuffle; at 100 TB the
    dimension build amortizes across every probing pipeline, exactly
    the reference's UserJoin deployment shape (FlatOutputJob's user
    enrichment), with facts before a key's first interval left null."""
    from openmetrics_spark.operators.joins import asof_join
    from openmetrics_spark.queries.users_q import user_scd2_intervals

    iv = user_scd2_intervals(spark, sf_dir).select(
        "platform_id",
        "log_user_id",
        F.timestamp_millis(F.col("valid_from_ms")).alias("vts"),
        "user_id",
        "is_internal_user",
        "n_versions",
    )
    ev = table(spark, sf_dir, "events")
    facts = ev.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 4).alias("platform_id"),
        F.concat(F.lit("lu"), F.col("user_id").cast("string")).alias(
            "log_user_id"
        ),
        F.col("event_id").alias("fact_id"),
        F.unix_millis("ts").alias("ms"),
        F.col("ts").alias("fts"),
    )
    out = asof_join(
        facts,
        iv,
        on=["platform_id", "log_user_id"],
        left_ts="fts",
        right_ts="vts",
        right_cols=["user_id", "is_internal_user", "n_versions"],
    )
    return out.select(
        "platform_id",
        "log_user_id",
        "fact_id",
        "ms",
        "user_id",
        "is_internal_user",
        F.col("n_versions").cast("long").alias("n_versions"),
    )
