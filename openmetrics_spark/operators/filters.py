"""Stateless filters.

- bot filter (reference: pipeline/.../common/util/BotUtil.java:235-246
  — UA regex from the public isbot list; the full list lives in
  functions.isbot)
- traffic filter (reference: DeliveryLogUtil.java:26-53 — only
  PRODUCTION traffic joins; shadow/replay dropped)
- split_filter (reference: common/functions/FilterOperator.java:11-30
  — predicate split with the failing side kept as a "dropped" table)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openmetrics_spark.schemas import TRAFFIC_PRODUCTION

def is_bot(ua: Column) -> Column:
    """BotUtil.isBot: lowercase the UA, then `find` any pattern of the
    full public isbot list (functions.isbot) — one rlike, one compiled
    automaton per task, JVM-side."""
    from openmetrics_spark.functions.isbot import ISBOT_REGEX

    return F.coalesce(F.lower(ua).rlike(ISBOT_REGEX), F.lit(False))


def split_filter(df: DataFrame, keep: Column, reason: str) -> tuple[DataFrame, DataFrame]:
    """(kept, dropped-with-reason) — FilterOperator semantics."""
    kept = df.filter(keep)
    dropped = df.filter(~F.coalesce(keep, F.lit(False))).withColumn(
        "dropped_reason", F.lit(reason)
    )
    return kept, dropped


def filter_bots(df: DataFrame, ua_col: str = "user_agent"):
    return split_filter(df, ~is_bot(F.col(ua_col)), "bot_user_agent")


def filter_non_production(df: DataFrame, traffic_col: str = "traffic_type"):
    keep = F.coalesce(F.col(traffic_col) == TRAFFIC_PRODUCTION, F.lit(True))
    return split_filter(df, keep, "non_production_traffic")


def filter_non_buyers(
    df: DataFrame,
    non_buyer_hashes: list[int],
    features_col: str = "user_sparse_feature_hashes",
):
    """Drop rows whose user carries any configured "non-buyer" sparse
    feature hash (reference: common/functions/filter/BuyerPredicate.
    java, wired at FlatOutputJob.java:279-284,1150-1170 — marketplaces
    tag internal/test buyers with sparse features and exclude them
    from joined output). ``arrays_overlap`` against a literal array
    stays in codegen; null feature lists pass (unknown users are
    buyers, like the reference's empty-config fast path)."""
    if not non_buyer_hashes:
        return df, df.limit(0).withColumn("dropped_reason", F.lit("non_buyer"))
    lit = F.array(*[F.lit(int(h)) for h in non_buyer_hashes])
    keep = ~F.coalesce(
        F.arrays_overlap(F.col(features_col), lit), F.lit(False)
    )
    return split_filter(df, keep, "non_buyer")
