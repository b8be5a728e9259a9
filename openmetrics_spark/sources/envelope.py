"""LogRequest envelope split with field push-down.

The reference ingests ONE Kafka stream of LogRequest envelopes, each
carrying repeated child events, and splits it into 8 typed streams via
side outputs (pipeline/.../common/functions/filter/LogRequestFilter.
java:35-120); envelope-level fields (platform_id, user info, timing)
are pushed down into children that omitted them (common/functions/
pushdown/PushDownAndFlatMap*.java, PushDownBatchFields.java:29-381).

Spark shape: ``explode`` each repeated column, then
``coalesce(child.field, envelope.field)`` in the projection — one
narrow stage per type, no shuffle, and Catalyst prunes the other
arrays out of each type's scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openmetrics_spark.schemas import EVENT_SCHEMAS

# envelope child structs: every field nullable (children may rely on
# envelope push-down for platform/log_user/timing)
def _nullable(st: T.StructType) -> T.StructType:
    def fix(dt):
        if isinstance(dt, T.StructType):
            return T.StructType(
                [T.StructField(f.name, fix(f.dataType), True) for f in dt.fields]
            )
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(fix(dt.elementType), True)
        return dt

    return fix(st)


# the repeated child fields of a LogRequest — the full 8-way split
# (reference: LogRequestFilter.java:35-120 side-outputs user,
# cohort_membership, auto_view, view, delivery_log, impression,
# action, diagnostics)
CHILD_TYPES = (
    "user",
    "cohort_membership",
    "auto_view",
    "view",
    "delivery_log",
    "impression",
    "action",
    "diagnostics",
)


def _plural(name: str) -> str:
    # proto repeated-field naming: getDiagnosticsList, not *ses
    return name if name == "diagnostics" else f"{name}s"

LOG_REQUEST = T.StructType(
    [
        T.StructField("platform_id", T.LongType(), True),
        T.StructField("log_user_id", T.StringType(), True),
        T.StructField("log_timestamp", T.LongType(), True),
        T.StructField("event_api_timestamp", T.LongType(), True),
        *[
            T.StructField(
                _plural(name), T.ArrayType(_nullable(EVENT_SCHEMAS[name])), True
            )
            for name in CHILD_TYPES
        ],
    ]
)

# envelope fields pushed down into children when the child is missing
# them (PushDownAndFlatMap semantics)
_PUSHDOWN = ("platform_id", "log_user_id", "log_timestamp", "event_api_timestamp")


def split_log_requests(envelopes: DataFrame) -> dict[str, DataFrame]:
    """Envelope stream → {event_type: typed DataFrame} with push-down.

    Each output column set matches ``EVENT_SCHEMAS[type]``; the
    envelope's platform/log_user/timing fill child nulls (for string
    ids, empty string also counts as missing — proto3 unset)."""
    out: dict[str, DataFrame] = {}
    for name in CHILD_TYPES:
        schema = EVENT_SCHEMAS[name]
        child = envelopes.select(
            *[F.col(c).alias(f"__env_{c}") for c in _PUSHDOWN],
            F.explode(_plural(name)).alias("__c"),
        )
        cols = []
        for fld in schema.fields:
            c = F.col(f"__c.{fld.name}")
            if fld.name in _PUSHDOWN:
                if isinstance(fld.dataType, T.StringType):
                    c = F.when(c.isNull() | (c == ""), F.col(f"__env_{fld.name}")).otherwise(c)
                else:
                    c = F.coalesce(c, F.col(f"__env_{fld.name}"))
            cols.append(c.alias(fld.name))
        out[name] = child.select(*cols)
    return out


def assemble_log_requests(streams: dict[str, DataFrame]) -> DataFrame:
    """Inverse of :func:`split_log_requests` for tests/backfills: bundle
    typed streams into one envelope per (platform_id, log_user_id,
    event_api_timestamp-second) — a simplified batcher standing in for
    the client SDK's request batching."""
    bundles = []
    for name in CHILD_TYPES:
        df = streams.get(name)
        if df is None:
            continue
        b = df.groupBy(
            "platform_id",
            "log_user_id",
            (F.col("event_api_timestamp") / 1000).cast("long").alias("__sec"),
        ).agg(F.collect_list(F.struct(*df.columns)).alias(_plural(name)))
        bundles.append(b)
    env = bundles[0]
    for b in bundles[1:]:
        env = env.join(b, ["platform_id", "log_user_id", "__sec"], "full_outer")
    env = env.withColumn("event_api_timestamp", F.col("__sec") * 1000).withColumn(
        "log_timestamp", F.col("__sec") * 1000
    )
    for name in CHILD_TYPES:
        col = _plural(name)
        if col not in env.columns:
            env = env.withColumn(
                col, F.lit(None).cast(T.ArrayType(_nullable(EVENT_SCHEMAS[name])))
            )
    return env.drop("__sec")


def encode_log_requests(envelopes: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """LogRequest envelopes → Kafka wire records: ``key`` =
    platform_id \\x1f log_user_id (the reference partitions the
    tracking.event.log-request topic by logUserId so one consumer sees
    a user's events in order), ``value`` = the envelope as one JSON
    document. JVM-side ``to_json`` — no Python in the hot path.
    Writable via ``spark.writeStream.format("kafka")`` with the option
    builders in ``streaming.core``. ``keep`` carries transport-side
    columns (e.g. a derived broker timestamp) through UNSERIALIZED —
    they ride beside the record, not inside the JSON payload."""
    payload = [c for c in envelopes.columns if c not in keep]
    return envelopes.select(
        F.concat_ws(
            "\x1f", F.col("platform_id").cast("string"), F.col("log_user_id")
        ).alias("key"),
        F.to_json(F.struct(*payload)).alias("value"),
        *[F.col(c) for c in keep],
    )


def decode_log_requests(records: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Kafka wire records → LogRequest envelopes: ``from_json`` against
    the LOG_REQUEST schema (the shape ``kafka_source_options`` readers
    assume). Malformed payloads decode to all-null rows (PERMISSIVE),
    which validation downstream drops. ``keep`` carries transport
    columns through (e.g. the record ``timestamp`` that
    SetLogTimestamp stamps into log_timestamp)."""
    return records.select(
        F.from_json(F.col("value").cast("string"), LOG_REQUEST).alias("__r"),
        *[F.col(c) for c in keep],
    ).select("__r.*", *keep)
