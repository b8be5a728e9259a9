"""The raw-output job: archive every typed event stream, validated and
deduplicated, to dt/hour-partitioned files (reference:
pipeline/.../job/raw/RawOutputJob.java — split LogRequests, KeepFirstRow
per event pk with 1 d retention :238-313, LogUserUser extraction
:342-364, S3 Avro/Parquet sinks).

Batch DAG (the streaming twin swaps sources for readStream and the
writer for ``sources.sinks.stream_write_partitioned``):

    envelopes → split (push-down) → validate (errors → side table)
    → keep-first dedup per pk → dt/hour-partitioned parquet
    plus: user stream → LogUserUser (log_user_id ↔ user_id mapping)

Scale notes: the split is narrow (no shuffle); dedup is the only
shuffle per type and it keys on the event pk — near-uniform ids, no
skew; writes inherit upstream parallelism. Validation errors and
duplicate drops land in side tables like the reference's
etl_side/dropped_* dirs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openmetrics_spark.operators.dedup import keep_first
from openmetrics_spark.operators.validate import (
    validate_action,
    validate_delivery_log,
    validate_impression,
    validate_user,
    validate_view,
)
from openmetrics_spark.sources.sinks import write_partitioned

# KeepFirstRow key per type (reference wires one KeepFirstRow per
# stream keyed platform+pk, RawOutputJob.java:238-313)
RAW_PK = {
    "user": ["platform_id", "log_user_id"],
    "view": ["platform_id", "view_id"],
    "auto_view": ["platform_id", "auto_view_id"],
    "cohort_membership": ["platform_id", "membership_id"],
    # Diagnostics has no entity pk; archive-dedupe per
    # (platform, log_user, timestamp) — exact-duplicate collapse only
    "diagnostics": ["platform_id", "log_user_id", "log_timestamp"],
    "delivery_log": ["platform_id", "request_id"],
    "impression": ["platform_id", "impression_id"],
    "action": ["platform_id", "action_id"],
}

_VALIDATORS = {
    "user": validate_user,
    "view": validate_view,
    "delivery_log": validate_delivery_log,
    "impression": validate_impression,
    "action": validate_action,
}


@dataclass
class RawOutputResult:
    valid: dict[str, DataFrame] = field(default_factory=dict)
    errors: dict[str, DataFrame] = field(default_factory=dict)
    log_user_user: DataFrame | None = None


def extract_log_user_user(user: DataFrame) -> DataFrame:
    """LogUserUser events: the (log_user_id → user_id) mapping stream
    used by the counter job's temporal join (reference:
    RawOutputJob.java:342-364; 2 h KeepFirstRow retention). First
    mapping per (platform, log_user, user) wins."""
    mapped = user.filter(
        F.col("user_id").isNotNull() & (F.col("user_id") != "")
    ).select(
        "platform_id",
        "log_user_id",
        "user_id",
        F.col("log_timestamp").alias("event_time_millis"),
    )
    return keep_first(
        mapped,
        ["platform_id", "log_user_id", "user_id"],
        ["event_time_millis"],
    )


def raw_output_job(
    streams: dict[str, DataFrame],
    out_dir: str | None = None,
) -> RawOutputResult:
    """Validate, dedupe and (optionally) archive every typed stream.
    ``streams`` maps event type → DataFrame (e.g. the output of
    ``sources.split_log_requests``). With ``out_dir`` set, valid rows
    land in ``{out_dir}/raw/{type}/dt=…/hour=…`` and validation errors
    in ``{out_dir}/etl_side/validation_error/{type}``."""
    res = RawOutputResult()
    for name, df in streams.items():
        validator = _VALIDATORS.get(name)
        if validator is not None:
            ok, bad = validator(df)
        else:
            ok, bad = df, None
        deduped = keep_first(ok, RAW_PK[name], ["log_timestamp"])
        res.valid[name] = deduped
        res.errors[name] = bad
        if out_dir is not None:
            write_partitioned(deduped, f"{out_dir}/raw/{name}", mode="overwrite")
            if bad is not None:
                bad.write.mode("overwrite").parquet(
                    f"{out_dir}/etl_side/validation_error/{name}"
                )
    if "user" in res.valid:
        res.log_user_user = extract_log_user_user(res.valid["user"])
        if out_dir is not None:
            res.log_user_user.write.mode("overwrite").parquet(
                f"{out_dir}/raw/log_user_user"
            )
    return res
