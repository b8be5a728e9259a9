"""Enrichment operators.

``add_latest_impressions`` re-expresses the reference's
AddLatestImpressions (reference: common/functions/AddLatestImpressions.
java:33-386, wired at job/join/FlatOutputJob.java:980-989): per user,
keep the most recent ``max_state`` impressions; on each action emit the
action plus up to ``max_output`` of those impressions, excluding
contents the user has actioned — AWS-Personalize-style negative
samples.

The Flink version is keyed list state; the Spark batch form is a
bounded per-user interval join + two row_number windows over the SAME
(action) partitioning, so the candidate set shuffles once. Fan-out is
bounded by ``lookback_ms`` (the stand-in for the reference's state
TTL): at 100 TB the join is a plain user-keyed hash join whose per-key
width is capped by the lookback window, and both windows reuse the
action-id exchange. The actioned-content exclusion is a tiny
(user, content) → first-action-time aggregate, broadcast-joined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DAY_MS = 86_400_000


def add_latest_impressions(
    impressions: DataFrame,
    actions: DataFrame,
    user_col: str = "user_id",
    content_col: str = "content_id",
    max_state: int = 30,
    max_output: int = 25,
    lookback_ms: int = 7 * DAY_MS,
) -> DataFrame:
    """``impressions``: (user_col, impression_id, imp_ms, content_col);
    ``actions``: (user_col, action_id, act_ms, content_col) — epoch-ms
    longs. Returns one row per (action, kept impression) with a dense
    recency ``rank`` (1 = most recent) after exclusions.

    Order of operations mirrors the reference: the state cap
    (``max_state`` most recent) applies BEFORE the actioned-content
    exclusion, the output cap after it
    (AddLatestImpressions.java:80-98 maxStateImpressions=30 /
    maxOutputImpressions=25).
    """
    imp = impressions.select(
        F.col(user_col).alias("u"),
        F.col("impression_id"),
        F.col("imp_ms"),
        F.col(content_col).alias("imp_content"),
    )
    act = actions.select(
        F.col(user_col).alias("u"),
        F.col("action_id"),
        F.col("act_ms"),
        F.col(content_col).alias("act_content"),
    )
    # first time each user actioned each content — the exclusion set
    first_act = act.groupBy("u", F.col("act_content").alias("imp_content")).agg(
        F.min("act_ms").alias("first_act_ms")
    )
    cand = act.join(imp, "u").filter(
        (F.col("imp_ms") < F.col("act_ms"))
        & (F.col("imp_ms") >= F.col("act_ms") - F.lit(lookback_ms))
    )
    recency = Window.partitionBy("action_id").orderBy(
        F.col("imp_ms").desc(), F.col("impression_id").desc()
    )
    state = cand.withColumn("r1", F.row_number().over(recency)).filter(
        F.col("r1") <= max_state
    )
    kept = (
        state.join(F.broadcast(first_act), ["u", "imp_content"], "left")
        .filter(
            F.col("first_act_ms").isNull() | (F.col("first_act_ms") > F.col("act_ms"))
        )
        .withColumn("rank", F.row_number().over(recency))
        .filter(F.col("rank") <= max_output)
    )
    return kept.select(
        "action_id",
        F.col("rank").cast("long").alias("rank"),
        "impression_id",
        F.col("imp_content").alias("content"),
        (F.col("act_ms") - F.col("imp_ms")).alias("gap_ms"),
    )
