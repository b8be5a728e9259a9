"""Validation-split side outputs in the oracle gate (reference:
common/functions/validate/BaseValidate.java + ValidateImpression.java:
13-43; error side-output parquet at job/join/FlatOutputJob.java:
1389-1410). The operators were previously pytest-only; this query puts
the split semantics — FIRST failing rule wins, in rule order — under
the driver's exact hash compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmetrics_spark.queries import register
from openmetrics_spark.tables import table

_VALIDATE_ORACLE = """
WITH e AS (
  SELECT event_id AS id, user_id % 4 AS platform_id
  FROM events WHERE event_type = 'click'
),
imp AS (
  SELECT 'impression' AS kind, id,
         CASE WHEN id % 7 = 0 THEN '' ELSE 'u' || CAST(id AS VARCHAR) END AS log_user_id,
         CASE WHEN id % 5 = 0 THEN NULL ELSE 'i' || CAST(id AS VARCHAR) END AS joinable_a,
         CASE WHEN id % 3 = 0 THEN '' ELSE 'c' || CAST(id % 40 AS VARCHAR) END AS joinable_b,
         FALSE AS has_cart
  FROM e
),
act AS (
  SELECT 'action' AS kind, id,
         CASE WHEN id % 11 = 0 THEN NULL ELSE 'u' || CAST(id AS VARCHAR) END AS log_user_id,
         CASE WHEN id % 2 = 0 THEN 'm' || CAST(id AS VARCHAR) END AS joinable_a,
         CAST(NULL AS VARCHAR) AS joinable_b,
         id % 4 = 0 AS has_cart
  FROM e
),
u AS (SELECT * FROM imp UNION ALL SELECT * FROM act),
tagged AS (
  SELECT kind, id,
         CASE
           WHEN log_user_id IS NULL OR log_user_id = '' THEN 'missing_log_user_id'
           WHEN NOT ((joinable_a IS NOT NULL AND joinable_a <> '')
                     OR (joinable_b IS NOT NULL AND joinable_b <> '')
                     OR has_cart) THEN 'missing_joinable_id'
         END AS error_reason
  FROM u
)
SELECT kind, id, error_reason FROM tagged WHERE error_reason IS NOT NULL
"""


@register("validation_error_split", oracle=_VALIDATE_ORACLE, tags=("validate",))
def validation_error_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impression + action fixtures with modular missing-field
    patterns run through validate_impression / validate_action; the
    returned table is the error SIDE OUTPUT (kind, id, first failing
    rule). Pins the rule ORDER (log_user_id outranks joinable-id) and
    the action's cart escape hatch (a non-empty cart satisfies the
    joinable requirement, ValidateAction semantics). Narrow
    projections + filters only — no shuffle until the driver's own
    collect."""
    from openmetrics_spark.operators.validate import (
        validate_action,
        validate_impression,
    )

    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("id"))
    )
    imp = e.select(
        "id",
        F.when(F.col("id") % 7 == 0, "").otherwise(
            F.concat(F.lit("u"), F.col("id"))
        ).alias("log_user_id"),
        F.when(F.col("id") % 5 != 0, F.concat(F.lit("i"), F.col("id"))).alias(
            "insertion_id"
        ),
        F.when(F.col("id") % 3 == 0, "").otherwise(
            F.concat(F.lit("c"), F.col("id") % 40)
        ).alias("content_id"),
    )
    act = e.select(
        "id",
        F.when(F.col("id") % 11 != 0, F.concat(F.lit("u"), F.col("id"))).alias(
            "log_user_id"
        ),
        F.when(F.col("id") % 2 == 0, F.concat(F.lit("m"), F.col("id"))).alias(
            "impression_id"
        ),
        F.lit(None).cast("string").alias("insertion_id"),
        F.lit(None).cast("string").alias("content_id"),
        F.when(F.col("id") % 4 == 0, F.array(F.lit("cart_item"))).alias("cart"),
    )
    _, imp_errs = validate_impression(imp)
    _, act_errs = validate_action(act)
    return (
        imp_errs.select(F.lit("impression").alias("kind"), "id", "error_reason")
        .unionByName(
            act_errs.select(F.lit("action").alias("kind"), "id", "error_reason")
        )
    )
