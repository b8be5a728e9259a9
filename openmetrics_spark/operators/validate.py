"""Validation splits.

Batch twin of the reference's Validate{View,DeliveryLog,Impression,
Action,User} operators (reference: pipeline/.../common/functions/
validate/BaseValidate.java, ValidateImpression.java:13-43): required-
field checks; invalid rows go to an error side table (with a reason)
instead of being silently dropped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_valid(df: DataFrame, rules: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """``rules`` maps error-reason → predicate that must hold.

    Returns (valid, errors); errors carry an ``error_reason`` column
    (first failing rule, in dict order).
    """
    reason = F.lit(None).cast("string")
    for name, pred in reversed(list(rules.items())):
        reason = F.when(~pred, F.lit(name)).otherwise(reason)
    tagged = df.withColumn("error_reason", reason)
    valid = tagged.filter(F.col("error_reason").isNull()).drop("error_reason")
    errors = tagged.filter(F.col("error_reason").isNotNull())
    return valid, errors


def _nn(c: str) -> Column:
    return F.col(c).isNotNull() & (F.col(c) != "")


def validate_user(df: DataFrame):
    return split_valid(df, {"missing_log_user_id": _nn("log_user_id")})


def validate_view(df: DataFrame):
    return split_valid(
        df,
        {
            "missing_log_user_id": _nn("log_user_id"),
            "missing_view_id": _nn("view_id"),
        },
    )


def validate_delivery_log(df: DataFrame):
    return split_valid(
        df,
        {
            "missing_log_user_id": _nn("log_user_id"),
            "missing_request_id": _nn("request_id"),
        },
    )


def validate_impression(df: DataFrame):
    # reference ValidateImpression.java:20-27 — log_user_id AND
    # (insertion_id OR content_id)
    return split_valid(
        df,
        {
            "missing_log_user_id": _nn("log_user_id"),
            "missing_joinable_id": _nn("insertion_id") | _nn("content_id"),
        },
    )


def validate_action(df: DataFrame):
    return split_valid(
        df,
        {
            "missing_log_user_id": _nn("log_user_id"),
            "missing_joinable_id": _nn("impression_id")
            | _nn("insertion_id")
            | _nn("content_id")
            | (F.size(F.coalesce(F.col("cart"), F.array())) > 0),
        },
    )


def set_log_timestamp(df, arrival_ts_col: str = "__kafka_timestamp"):
    """Stamp every event's log_timestamp with its ingestion time
    (reference: common/functions/SetLogTimestamp.java — overwrites
    timing.logTimestamp with the element's stream timestamp,
    unconditionally, one instance per event type at the raw-output
    ingest). ``arrival_ts_col`` is the transport's record time — the
    Kafka source's `timestamp` column in production; pass an epoch-ms
    LongType or TimestampType column name."""
    from pyspark.sql import types as T

    src = F.col(arrival_ts_col)
    if isinstance(df.schema[arrival_ts_col].dataType, T.TimestampType):
        src = F.unix_millis(src)
    return df.withColumn("log_timestamp", src.cast("long"))
