"""StructType registry for the event-graph data model.

Fixed, compiled schemas — the Spark counterpart of the reference's
protobuf-derived tables (SURVEY §1.3; FIXTURES.md). One flat table per
event type; nested arrays only where the reference nests
(response insertions in a delivery log, cart contents in an action).

Entity hierarchy (reference: getLeftJoinIds orderings,
pipeline/.../inferred/ImpressionActionProcessFunction.java:38-56):

    user → session → view → delivery_log(request) → response insertion
         → impression → action (cart fans out per content)
"""

from __future__ import annotations

from pyspark.sql import types as T

_TS_FIELDS = [
    T.StructField("log_timestamp", T.LongType(), False),
    T.StructField("event_api_timestamp", T.LongType(), False),
]

USER = T.StructType(
    [
        T.StructField("platform_id", T.LongType(), False),
        T.StructField("log_user_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), True),
        *_TS_FIELDS,
    ]
)

VIEW = T.StructType(
    [
        T.StructField("platform_id", T.LongType(), False),
        T.StructField("view_id", T.StringType(), False),
        T.StructField("session_id", T.StringType(), True),
        T.StructField("log_user_id", T.StringType(), True),
        T.StructField("user_agent", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("content_id", T.StringType(), True),
        *_TS_FIELDS,
    ]
)

RESPONSE_INSERTION = T.StructType(
    [
        T.StructField("insertion_id", T.StringType(), False),
        T.StructField("content_id", T.StringType(), True),
        T.StructField("position", T.LongType(), True),
        T.StructField("retrieval_rank", T.LongType(), True),
    ]
)

DELIVERY_LOG = T.StructType(
    [
        T.StructField("platform_id", T.LongType(), False),
        T.StructField("request_id", T.StringType(), False),
        T.StructField("client_request_id", T.StringType(), True),
        T.StructField("view_id", T.StringType(), True),
        T.StructField("session_id", T.StringType(), True),
        T.StructField("log_user_id", T.StringType(), True),
        T.StructField("search_query", T.StringType(), True),
        T.StructField("user_agent", T.StringType(), True),
        T.StructField("traffic_type", T.IntegerType(), True),
        T.StructField("api_execution", T.BooleanType(), True),
        T.StructField(
            "response_insertions", T.ArrayType(RESPONSE_INSERTION), True
        ),
        *_TS_FIELDS,
    ]
)

IMPRESSION = T.StructType(
    [
        T.StructField("platform_id", T.LongType(), False),
        T.StructField("impression_id", T.StringType(), False),
        T.StructField("insertion_id", T.StringType(), True),
        T.StructField("request_id", T.StringType(), True),
        T.StructField("view_id", T.StringType(), True),
        T.StructField("session_id", T.StringType(), True),
        T.StructField("log_user_id", T.StringType(), True),
        T.StructField("content_id", T.StringType(), True),
        *_TS_FIELDS,
    ]
)

CART_CONTENT = T.StructType(
    [
        T.StructField("content_id", T.StringType(), False),
        T.StructField("quantity", T.LongType(), True),
        T.StructField("price_usd_micros_per_unit", T.LongType(), True),
    ]
)

ACTION = T.StructType(
    [
        T.StructField("platform_id", T.LongType(), False),
        T.StructField("action_id", T.StringType(), False),
        T.StructField("impression_id", T.StringType(), True),
        T.StructField("insertion_id", T.StringType(), True),
        T.StructField("request_id", T.StringType(), True),
        T.StructField("view_id", T.StringType(), True),
        T.StructField("session_id", T.StringType(), True),
        T.StructField("log_user_id", T.StringType(), True),
        T.StructField("content_id", T.StringType(), True),
        T.StructField("action_type", T.IntegerType(), True),
        T.StructField("custom_action_type", T.StringType(), True),
        T.StructField("cart", T.ArrayType(CART_CONTENT), True),
        T.StructField("properties_json", T.StringType(), True),
        *_TS_FIELDS,
    ]
)

# AutoView: client-auto-logged views (scroll-into-viewport), same
# join skeleton as View (reference: LogRequestFilter.java:80-86,
# PushDownAndFlatMapAutoView.java; TinyFlatUtil.java:96,150 carries
# auto_view_id through the joins)
AUTO_VIEW = T.StructType(
    [
        T.StructField("platform_id", T.LongType(), False),
        T.StructField("auto_view_id", T.StringType(), False),
        T.StructField("view_id", T.StringType(), True),
        T.StructField("session_id", T.StringType(), True),
        T.StructField("log_user_id", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("content_id", T.StringType(), True),
        *_TS_FIELDS,
    ]
)

# CohortMembership: experiment arm assignment (reference:
# LogRequestFilter.java:73-79; keyed (platform, membership_id),
# RawKeys.java:40-45)
COHORT_MEMBERSHIP = T.StructType(
    [
        T.StructField("platform_id", T.LongType(), False),
        T.StructField("membership_id", T.StringType(), False),
        T.StructField("cohort_id", T.StringType(), True),
        T.StructField("arm", T.IntegerType(), True),
        T.StructField("log_user_id", T.StringType(), True),
        *_TS_FIELDS,
    ]
)

# Diagnostics: client-side health payloads; no entity pk — archived
# per (platform, log_user, timestamp) (reference:
# LogRequestFilter.java:113-119, PushDownAndFlatMapDiagnostics.java)
DIAGNOSTICS = T.StructType(
    [
        T.StructField("platform_id", T.LongType(), False),
        T.StructField("log_user_id", T.StringType(), True),
        T.StructField("device", T.StringType(), True),
        T.StructField("diagnostics_json", T.StringType(), True),
        *_TS_FIELDS,
    ]
)

CONTENT = T.StructType(
    [
        T.StructField("content_id", T.StringType(), False),
        T.StructField("store_id", T.StringType(), True),
        T.StructField("promotion_ids", T.ArrayType(T.StringType()), True),
    ]
)

LOG_USER_USER = T.StructType(
    [
        T.StructField("platform_id", T.LongType(), False),
        T.StructField("log_user_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("event_time_millis", T.LongType(), False),
    ]
)

# action_type numbers (reference:
# job/contentmetrics/resources/1_create_unified_event_stream.sql:58-61)
NAVIGATE = 2
PURCHASE = 3
ADD_TO_CART = 4
CHECKOUT = 8

# traffic types (reference: DeliveryLogUtil.java:26-53)
TRAFFIC_PRODUCTION = 1
TRAFFIC_SHADOW = 4

EVENT_SCHEMAS: dict[str, T.StructType] = {
    "user": USER,
    "view": VIEW,
    "auto_view": AUTO_VIEW,
    "cohort_membership": COHORT_MEMBERSHIP,
    "diagnostics": DIAGNOSTICS,
    "delivery_log": DELIVERY_LOG,
    "impression": IMPRESSION,
    "action": ACTION,
    "content": CONTENT,
    "log_user_user": LOG_USER_USER,
}
