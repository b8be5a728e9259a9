"""Enrichment operators.

``add_latest_impressions`` re-expresses the reference's
AddLatestImpressions (reference: common/functions/AddLatestImpressions.
java:33-386, wired at job/join/FlatOutputJob.java:980-989): per user,
keep the most recent ``max_state`` impressions; on each action emit the
action plus up to ``max_output`` of those impressions, excluding
contents the user has actioned — AWS-Personalize-style negative
samples.

The Flink version is keyed list state. The Spark batch form used to be
a per-user interval join + row_number, but ``act ⋈ imp ON user`` pairs
every action with every impression of the user before the rank cap —
quadratic CPU on a hot user regardless of AQE skew-splitting. This
version is pair-free:

1. ONE per-user window pass over the unioned (impression, action)
   stream ordered by (ms, kind): a running sum of the impression flag
   gives each impression its recency sequence number ``seq`` and each
   action the count ``c`` of impressions strictly before it.
2. The state cap is then closed-form: the ``max_state`` most recent
   impressions before an action are EXACTLY seqs ``c-max_state+1..c``.
   Explode each action into those ≤ ``max_state`` keys and equi-join
   on ``(user, seq)`` — a plain hash join whose key includes ``seq``,
   so a hot user's candidates hash across ALL partitions instead of
   one; total join work is O(actions × max_state), never quadratic.
3. The lookback filter commutes with the state cap (the within-lookback
   set is a recency prefix: "top-30 of within-lookback" == "within-
   lookback of top-30"), so it applies post-join on the ≤30 rows.

The only remaining per-user serialization is the window sort — the
same property as the reference's keyed stream. The actioned-content
exclusion joins a (user, content) → first-action-time aggregate with
NO broadcast hint: it scales with action volume (far past the 8 GB
ceiling at reference throughput, pipeline/README.md:18), and AQE still
chooses broadcast at any SF where it genuinely fits.
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

    # -- 1. one per-user pass: impression seq numbers + per-action
    # running impression count. At equal ms the action sorts FIRST
    # (is_imp 0 < 1), so same-ms impressions are NOT counted — the
    # strict `imp_ms < act_ms` of the reference.
    imp_ev = imp.select(
        "u",
        F.col("imp_ms").alias("ms"),
        F.lit(1).cast("long").alias("is_imp"),
        "impression_id",
        "imp_content",
        "imp_ms",
    )
    act_ev = act.select(
        "u",
        F.col("act_ms").alias("ms"),
        F.lit(0).cast("long").alias("is_imp"),
        "action_id",
        "act_ms",
        "act_content",
    )
    ev = imp_ev.unionByName(act_ev, allowMissingColumns=True)
    cum_w = (
        Window.partitionBy("u")
        .orderBy("ms", "is_imp", "impression_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = ev.withColumn("cum", F.sum("is_imp").over(cum_w))
    # seq ascends in (imp_ms, impression_id) order, so recency rank
    # r1 = c - seq + 1 reproduces the old (imp_ms DESC, id DESC) window
    imp_seq = ev.filter(F.col("is_imp") == 1).select(
        "u",
        "impression_id",
        "imp_content",
        "imp_ms",
        F.col("cum").alias("seq"),
    )
    acts_c = ev.filter(F.col("is_imp") == 0).select(
        "u",
        "action_id",
        "act_ms",
        F.col("cum").alias("c"),
    )

    # -- 2. bounded explode (≤ max_state keys/action) + equi-join
    cand = (
        acts_c.filter(F.col("c") >= 1)
        .withColumn(
            "seq",
            F.explode(
                F.sequence(
                    F.greatest(
                        F.lit(1).cast("long"),
                        F.col("c") - F.lit(max_state - 1).cast("long"),
                    ),
                    F.col("c"),
                )
            ),
        )
        .withColumn("r1", F.col("c") - F.col("seq") + F.lit(1))
        .join(imp_seq, ["u", "seq"])
    )

    # -- 3. lookback (commutes with the cap — recency-prefix argument
    # above), then exclusion, then the output cap
    cand = cand.filter(F.col("imp_ms") >= F.col("act_ms") - F.lit(lookback_ms))
    recency = Window.partitionBy("action_id").orderBy(F.col("r1").asc())
    kept = (
        cand.join(first_act, ["u", "imp_content"], "left")
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
