"""Stateless filters.

- bot filter (reference: pipeline/.../common/util/BotUtil.java:235-246
  — UA regex from the public isbot list; we carry a compact pattern of
  the same families)
- traffic filter (reference: DeliveryLogUtil.java:26-53 — only
  PRODUCTION traffic joins; shadow/replay dropped)
- split_filter (reference: common/functions/FilterOperator.java:11-30
  — predicate split with the failing side kept as a "dropped" table)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openmetrics_spark.schemas import TRAFFIC_PRODUCTION

# compact, case-insensitive bot-UA pattern (public isbot families)
BOT_UA_PATTERN = r"(?i)(bot|crawler|spider|crawling|headless|scrapy|wget|curl|slurp)"


def is_bot(ua: Column) -> Column:
    return F.coalesce(ua.rlike(BOT_UA_PATTERN), F.lit(False))


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
