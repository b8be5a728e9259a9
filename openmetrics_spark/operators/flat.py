"""Flat-event operators: delivery-log combining, tiny projections with
cart fan-out, redundant-impression reduction, and the flat-response-
insertion session rollup.

These are the batch twins of the reference's FlatOutputJob stages
(reference: pipeline/.../job/join/FlatOutputJob.java:394-1044).
"""

from __future__ import annotations

from typing import NamedTuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openmetrics_spark.operators.dedup import pick_best
from openmetrics_spark.schemas import CHECKOUT, PURCHASE


def combine_delivery_logs(dl: DataFrame) -> DataFrame:
    """Merge API + SDK delivery logs sharing a client_request_id,
    keeping the API row (reference: CombineDeliveryLog.java:22-210 —
    2 s event-time window, API preferred via getTrafficPriority).

    Batch form: group the whole key; the reference's 2 s window exists
    only to bound streaming state. Rows without a client_request_id
    pass through untouched.
    """
    no_cri = dl.filter(
        F.col("client_request_id").isNull() | (F.col("client_request_id") == "")
    )
    with_cri = dl.filter(
        F.col("client_request_id").isNotNull() & (F.col("client_request_id") != "")
    )
    best = pick_best(
        with_cri,
        ["platform_id", "log_user_id", "client_request_id"],
        [
            (~F.coalesce(F.col("api_execution"), F.lit(False))).cast("int").alias("sdk_first"),
            F.col("log_timestamp"),
            F.col("request_id"),
        ],
    )
    return best.select(*dl.columns).unionByName(no_cri)


def to_tiny_view(view: DataFrame) -> DataFrame:
    """Project a view to its join skeleton (reference:
    FlatOutputJob.java:756-806 "Tiny events")."""
    return view.select(
        "platform_id",
        "log_user_id",
        "view_id",
        F.col("log_timestamp").alias("view_ts"),
    )


def to_tiny_insertions(dl: DataFrame) -> DataFrame:
    """Explode a (combined) delivery log into one tiny row per
    response insertion (reference: TinyFlatUtil
    createTinyFlatResponseInsertions)."""
    return dl.select(
        "platform_id",
        "log_user_id",
        "view_id",
        "request_id",
        F.col("log_timestamp").alias("insertion_ts"),
        F.explode("response_insertions").alias("ins"),
    ).select(
        "platform_id",
        "log_user_id",
        "view_id",
        "request_id",
        F.col("ins.insertion_id").alias("insertion_id"),
        F.col("ins.content_id").alias("content_id"),
        F.col("ins.position").alias("position"),
        "insertion_ts",
    )


def to_tiny_impressions(imp: DataFrame) -> DataFrame:
    return imp.select(
        "platform_id",
        "log_user_id",
        "impression_id",
        "insertion_id",
        "request_id",
        "view_id",
        "content_id",
        F.col("log_timestamp").alias("impression_ts"),
    )


def to_tiny_actions(act: DataFrame) -> DataFrame:
    """Tiny actions with cart fan-out: CHECKOUT/PURCHASE actions with a
    cart emit one row per distinct content id ({action.content_id} ∪
    cart content ids) with the FK hints CLEARED — the cart content is
    probably not the impressed content (reference:
    job/join/ToTinyAction.java:37-72). The action 'primary key'
    becomes (action_id, content_id). Cart quantity/price ride along
    for counter/gmv math (reference: CounterUtil.java:6-18)."""
    has_cart = (
        F.col("action_type").isin(CHECKOUT, PURCHASE)
        & (F.size(F.coalesce(F.col("cart"), F.array())) > 0)
    )
    plain = act.filter(~has_cart).select(
        "platform_id",
        "log_user_id",
        "action_id",
        "impression_id",
        "insertion_id",
        "request_id",
        "view_id",
        "content_id",
        "action_type",
        F.col("log_timestamp").alias("action_ts"),
        F.lit(1).cast("long").alias("quantity"),
        F.lit(None).cast("long").alias("price_usd_micros_per_unit"),
    )
    # distinct content ids = base ∪ cart; dedupe via explode+distinct
    carted = act.filter(has_cart)
    base_ids = carted.select(
        "platform_id",
        "log_user_id",
        "action_id",
        "action_type",
        F.col("log_timestamp").alias("action_ts"),
        F.explode(
            F.array_distinct(
                F.concat(
                    F.when(
                        F.col("content_id").isNotNull() & (F.col("content_id") != ""),
                        F.array(F.col("content_id")),
                    ).otherwise(F.array().cast("array<string>")),
                    F.transform(F.col("cart"), lambda c: c["content_id"]),
                )
            )
        ).alias("fan_content_id"),
        F.col("cart"),
    )
    fanned = base_ids.select(
        "platform_id",
        "log_user_id",
        "action_id",
        F.lit(None).cast("string").alias("impression_id"),
        F.lit(None).cast("string").alias("insertion_id"),
        F.lit(None).cast("string").alias("request_id"),
        F.lit(None).cast("string").alias("view_id"),
        F.col("fan_content_id").alias("content_id"),
        "action_type",
        "action_ts",
        # quantity/price from the matching cart entry (1 if only base);
        # try_element_at: a base content absent from the cart filters to
        # an empty array, where plain element_at raises under ANSI mode
        F.coalesce(
            F.try_element_at(
                F.filter(F.col("cart"), lambda c: c["content_id"] == F.col("fan_content_id")),
                F.lit(1),
            )["quantity"],
            F.lit(1).cast("long"),
        ).alias("quantity"),
        F.try_element_at(
            F.filter(F.col("cart"), lambda c: c["content_id"] == F.col("fan_content_id")),
            F.lit(1),
        )["price_usd_micros_per_unit"].alias("price_usd_micros_per_unit"),
    )
    return plain.unionByName(fanned)


class RedundantResult(NamedTuple):
    kept: DataFrame  # canonical impressions
    redundant: DataFrame  # suppressed impressions (side output)
    remap: DataFrame  # redundant impression_id -> canonical impression_id


_REMAP_SCHEMA = T.StructType(
    [
        T.StructField("impression_id", T.StringType()),
        T.StructField("canonical_impression_id", T.StringType()),
        T.StructField("is_redundant", T.BooleanType()),
    ]
)


def reduce_redundant_impressions(tiny_imp: DataFrame, ttl_ms: int) -> RedundantResult:
    """First impression per redundancy key is canonical until
    first_ts + ttl; impressions inside that window are redundant; the
    next impression after the window starts a new canonical epoch
    (reference: ReduceRedundantTinyImpressions.java:24-249, key per
    RedundantImpressionKey.java:32-47: (platform, logUser,
    insertion_id, '') if insertion_id else (platform, logUser,
    view_id, content_id)).

    The epoch chain ("first, then next after first+ttl") is not
    expressible with plain window functions; per-key groups are tiny
    (a user's duplicates of one insertion), so an applyInPandas walk
    per key is the honest Spark shape — same pattern the streaming
    twin uses with state.

    Singleton bypass: ~all keys have exactly one impression, which is
    canonical by definition — only keys with >1 row go through the
    Python walk. The multi-key set is a small aggregate (AQE turns the
    tagging join into a broadcast at runtime), so at 100 TB the Python
    path sees a few percent of the stream, not all of it.
    """
    keyed = tiny_imp.withColumn(
        "__rkey",
        F.when(
            F.col("insertion_id").isNotNull() & (F.col("insertion_id") != ""),
            F.concat_ws("\x1f", "platform_id", "log_user_id", "insertion_id", F.lit("")),
        ).otherwise(
            F.concat_ws(
                "\x1f",
                "platform_id",
                "log_user_id",
                F.coalesce("view_id", F.lit("")),
                F.coalesce("content_id", F.lit("")),
            )
        ),
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["impression_ts", "impression_id"])
        out = []
        canonical_id = None
        replace_after = None
        for _, row in pdf.iterrows():
            ts = row["impression_ts"]
            if canonical_id is None or ts > replace_after:
                canonical_id = row["impression_id"]
                replace_after = ts + ttl_ms
                out.append((row["impression_id"], canonical_id, False))
            else:
                out.append((row["impression_id"], canonical_id, True))
        return pd.DataFrame(
            out, columns=["impression_id", "canonical_impression_id", "is_redundant"]
        )

    multi_keys = (
        keyed.groupBy("__rkey")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .select("__rkey", F.lit(True).alias("__multi"))
    )
    tagged = keyed.join(multi_keys, "__rkey", "left")
    single_remap = tagged.filter(F.col("__multi").isNull()).select(
        "impression_id",
        F.col("impression_id").alias("canonical_impression_id"),
        F.lit(False).alias("is_redundant"),
    )
    multi_remap = (
        tagged.filter(F.col("__multi").isNotNull())
        .groupBy("__rkey")
        .applyInPandas(walk, _REMAP_SCHEMA)
    )
    remap = single_remap.unionByName(multi_remap)
    joined = tiny_imp.join(remap, "impression_id")
    kept = joined.filter(~F.col("is_redundant")).drop(
        "is_redundant", "canonical_impression_id"
    )
    redundant = joined.filter(F.col("is_redundant")).drop("is_redundant")
    return RedundantResult(kept, redundant, remap)


def repoint_actions(joined_actions: DataFrame, remap: DataFrame) -> DataFrame:
    """Rewrite actions that reference a redundant impression to the
    canonical impression id (reference:
    ReduceRedundantTinyImpressions action re-pointing)."""
    m = remap.filter(F.col("is_redundant")).select(
        F.col("impression_id").alias("__old_id"),
        F.col("canonical_impression_id").alias("__new_id"),
    )
    return (
        joined_actions.join(
            m, joined_actions["impression_id"] == m["__old_id"], "left"
        )
        .withColumn("impression_id", F.coalesce("__new_id", "impression_id"))
        .drop("__old_id", "__new_id")
    )


def flat_response_insertions(
    joined_impressions: DataFrame, joined_actions: DataFrame, gap_ms: int
) -> DataFrame:
    """Cogroup impressions + actions per (platform, logUser,
    insertion_id) into one flat record with impression[]/action[]
    arrays, per event-time session with ``gap_ms`` (reference:
    FlatOutputJob.java:998-1044, 1 d gap; record build
    FlatUtil.java:561-607).

    Batch shape: union the two sides with a type tag, sessionize per
    key, aggregate arrays with collect_list sorted by time.
    """
    from openmetrics_spark.operators.sessions import sessionize

    key = ["platform_id", "log_user_id", "insertion_id"]
    imps = joined_impressions.select(
        *key,
        F.col("impression_ts").alias("ms"),
        F.struct(
            F.col("impression_id"), F.col("content_id"), F.col("impression_ts")
        ).alias("imp"),
        F.lit(None)
        .cast(
            "struct<action_id:string,action_type:int,quantity:bigint,action_ts:bigint>"
        )
        .alias("act"),
    )
    acts = joined_actions.select(
        *key,
        F.col("action_ts").alias("ms"),
        F.lit(None)
        .cast("struct<impression_id:string,content_id:string,impression_ts:bigint>")
        .alias("imp"),
        F.struct(
            F.col("action_id"), F.col("action_type"), F.col("quantity"), F.col("action_ts")
        ).alias("act"),
    )
    unioned = imps.unionByName(acts).withColumn("ts", F.timestamp_millis("ms"))
    sess = sessionize(unioned, key, "ts", gap_ms)
    return (
        sess.groupBy(*key, "session_start_ms")
        .agg(
            F.sort_array(F.collect_list("imp")).alias("impressions"),
            F.sort_array(F.collect_list("act")).alias("actions"),
        )
    )


def clear_user_id(df: DataFrame) -> DataFrame:
    """PII strip: null the authenticated user id at EVERY nesting
    depth — top-level columns, struct fields, and structs inside
    arrays — before any sink. The reference recurses through each
    nested message the same way (UserInfoUtil.clearUserId walks
    ids/user/session/view/request/impression/action builders,
    common/functions/UserInfoUtil.java:24-218; applied
    FlatOutputJob.java:1181-1188)."""
    from pyspark.sql import types as T

    def strip(col: F.Column, dt) -> F.Column:
        if isinstance(dt, T.StructType):
            return F.struct(
                *[
                    (
                        F.lit(None).cast(f.dataType)
                        if f.name == "user_id"
                        else strip(col[f.name], f.dataType)
                    ).alias(f.name)
                    for f in dt.fields
                ]
            )
        if isinstance(dt, T.ArrayType):
            return F.transform(col, lambda x: strip(x, dt.elementType))
        return col

    cols = []
    for f in df.schema.fields:
        if f.name == "user_id":
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif isinstance(f.dataType, (T.StructType, T.ArrayType)):
            cols.append(strip(F.col(f.name), f.dataType).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def restructure_delivery_log(dl: DataFrame) -> DataFrame:
    """Normalize legacy DeliveryLog layouts (reference:
    common/functions/RestructureDeliveryLog.java — older SDKs put the
    response insertions under the execution record; move them to the
    response where the join expects them). A legacy
    ``execution_insertions`` column, when present, backfills an empty
    ``response_insertions``; pure column remapping, no shuffle."""
    if "execution_insertions" not in dl.columns:
        return dl
    resp = F.when(
        F.col("response_insertions").isNull()
        | (F.size("response_insertions") == 0),
        F.col("execution_insertions"),
    ).otherwise(F.col("response_insertions"))
    return dl.withColumn("response_insertions", resp).drop("execution_insertions")


def fix_delivery_log(dl: DataFrame) -> DataFrame:
    """Field-level repairs on DeliveryLog (reference:
    common/functions/FixDeliveryLog.java — scrub malformed ids and
    default missing metadata before anything keys on them):
    empty-string FKs become real nulls (so they take the inferred path
    instead of equi-joining on ''), and a missing traffic_type defaults
    to PRODUCTION, matching DeliveryLogUtil.getTrafficPriority's
    treatment of unset client info."""
    out = dl
    for c in ("view_id", "client_request_id", "session_id"):
        if c in out.columns:
            out = out.withColumn(
                c, F.when(F.col(c) == "", None).otherwise(F.col(c))
            )
    if "traffic_type" in out.columns:
        out = out.withColumn(
            "traffic_type",
            F.coalesce(F.col("traffic_type"), F.lit(1)),  # PRODUCTION
        )
    return out


def merge_details(
    tiny_result: DataFrame,
    details: DataFrame,
    pk_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """Re-attach full payload columns onto tiny join results by primary
    key (reference: common/functions/inferred/AbstractMergeDetails.java
    :34-400 + MergeImpressionDetails/MergeActionDetails — a stateful
    cache re-uniting TinyEvents with their full entities). In Spark the
    tiny/full split exists only to shrink streaming state, so the merge
    is a plain key join: Catalyst broadcasts ``details`` when small,
    else sort-merge on the pk — no custom state needed (SURVEY §2.4)."""
    return tiny_result.join(details, pk_cols, how)


def merge_details_with_drops(
    tiny_result: DataFrame,
    details: DataFrame,
    pk_cols: list[str],
) -> tuple[DataFrame, DataFrame]:
    """:func:`merge_details` plus the DroppedMergeDetailsEvent side
    output (reference: AbstractMergeDetails.java:180-220
    tryProcessIncompleteEvents — a tiny event whose full entity never
    arrives within the cleanup delay emits to the dropped side output
    instead of silently joining null).

    Batch twin: ``(merged, dropped)`` where ``merged`` is the INNER
    join (complete events only) and ``dropped`` the left-anti remainder
    — same key shuffle either way, the split costs nothing extra."""
    merged = tiny_result.join(details, pk_cols, "inner")
    dropped = tiny_result.join(details, pk_cols, "left_anti")
    return merged, dropped


def other_content_ids(props_json_col, property_keys: list[str]):
    """OtherContentIdsConverter (reference: job/join/
    OtherContentIdsConverter.java:19-60): extract the configured
    property keys (e.g. storeId) from an event's JSON properties into
    a {java_string_hash(key) -> id} map — the FK map hierarchical
    content joins walk. Key hashes are config-time constants computed
    driver-side; value extraction is get_json_object per key,
    JVM-side. Missing keys are absent from the map; non-string values
    stringify (Double.toString / Boolean.toString per the reference).
    """
    from openmetrics_spark.functions.hashing import java_string_hash

    if not property_keys:
        return F.lit(None).cast("map<int,string>")
    entries = []
    for key in property_keys:
        v = F.get_json_object(props_json_col, f"$.{key}")
        entries.append(
            F.when(v.isNotNull(), F.struct(
                F.lit(java_string_hash(key)).alias("k"), v.alias("v")
            ))
        )
    arr = F.filter(F.array(*entries), lambda e: e.isNotNull())
    return F.map_from_entries(arr)
