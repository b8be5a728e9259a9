"""The counter job: flat events → sliding-window counts per key family
→ Redis feature-store commands (reference: pipeline/.../job/counter/
CounterJob.java:350-586 — fan out to key families × {SlidingHourly,
SlidingDaily, LastTimeAndCount}, encode to RedisSink commands,
metadata rows in prepareSink :588-636).

Key families (CounterKeys.java:40-545; tuple classes
common/counter/*.java): each declares the redis HASH KEY tuple, the
HASH FIELD tuple (ending in the packed feature id), and a row_format
string published as metadata.

Encoding (RedisSink.java:26-105): tuple fields joined by 0x1f; the
"type separators" inside composite keys are 0x1d + "u"/"q"
(counter/Constants.java). count==0 → HDEL instead of HSET
(hsetOrDel) so replays reconcile — commands are idempotent,
at-least-once delivery is safe.

Scale notes: each family×window is one sliding_counter — a
pre-tumbled partial aggregate (map-side combined) before the key
shuffle; the final command stream is a UNION of small aggregated
frames, written by foreachBatch through a pipelined redis client.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openmetrics_spark.functions.feature_ids import (
    CountType,
    CountWindow,
    STANDARD_METRICS,
    expand_feature_ids,
    feature_id_col,
)
from openmetrics_spark.operators.counters import sliding_counter

JOIN_CHAR = "\x1f"  # RedisSink.JOIN_CHAR (ASCII unit separator)
TYPE_SEPARATOR = "\x1d"  # counter/Constants.java (ASCII group separator)
USER_TYPE = TYPE_SEPARATOR + "u"
QUERY_TYPE = TYPE_SEPARATOR + "q"
ROW_FORMAT_KEY = TYPE_SEPARATOR + JOIN_CHAR + "row_format"
FEATURE_IDS_KEY = TYPE_SEPARATOR + JOIN_CHAR + "feature_ids"

HOUR_MS = 3_600_000
DAY_MS = 24 * HOUR_MS

# (window, slide/emit, CountWindow, redis ttl seconds) — hourly emits
# each 15 m, daily buckets each 4 h; the 30 d bucket gets a 60 d TTL
# (SlidingHourlyCounter.java:20-41, SlidingDailyCounter.java:10-58)
WINDOW_CONFIGS = (
    (HOUR_MS, HOUR_MS // 4, CountWindow.HOUR, 4 * 3600),
    (DAY_MS, 4 * HOUR_MS, CountWindow.DAY, 2 * 86400),
    (7 * DAY_MS, 4 * HOUR_MS, CountWindow.DAY_7, 14 * 86400),
    (30 * DAY_MS, 4 * HOUR_MS, CountWindow.DAY_30, 60 * 86400),
)


@dataclass(frozen=True)
class KeyFamily:
    """One counter key family = one redis hash layout.

    ``key_cols``/``field_cols`` are column names in the flat-event
    frame; ``key_extras``/``field_extras`` are literal separator
    tokens spliced into the tuples (the reference's USER_TYPE /
    QUERY_TYPE markers)."""

    name: str
    count_type: CountType
    key_cols: tuple[str, ...]
    field_cols: tuple[str, ...]
    row_format: str
    key_extras: tuple[tuple[int, str], ...] = ()  # (position, literal)


# the 8 sliding-count families (CounterKeys.java; the two LastTime*
# families are served by operators.counters.last_time_and_count)
FAMILIES = (
    KeyFamily(
        "platform-device",
        CountType.ITEM_DEVICE_COUNT,
        ("platform_id",),
        ("os", "user_agent_family"),
        "os,user_agent,fid:value",
    ),
    KeyFamily(
        "content-device",
        CountType.ITEM_DEVICE_COUNT,
        ("platform_id", "content_id"),
        ("os", "user_agent_family"),
        "os,user_agent,fid:value",
    ),
    KeyFamily(
        "user",
        CountType.USER_COUNT,
        ("platform_id", "user_id"),
        (),
        "fid:value",
        key_extras=((1, USER_TYPE),),
    ),
    KeyFamily(
        "log-user",
        CountType.LOG_USER_COUNT,
        ("platform_id", "log_user_id"),
        (),
        "fid:value",
        key_extras=((1, USER_TYPE),),
    ),
    KeyFamily(
        "query",
        CountType.QUERY_COUNT,
        ("platform_id", "query_hex"),
        (),
        "fid:value",
        key_extras=((1, QUERY_TYPE),),
    ),
    KeyFamily(
        "content-query",
        CountType.ITEM_QUERY_COUNT,
        ("platform_id", "content_id", "query_hex"),
        (),
        "fid:value",
        key_extras=((2, QUERY_TYPE),),
    ),
)


def _join_tuple(cols: list, sep: str = JOIN_CHAR) -> F.Column:
    return F.concat_ws(sep, *[c.cast("string") for c in cols])


def _key_col(fam: KeyFamily) -> F.Column:
    parts: list = [F.col(c) for c in fam.key_cols]
    for pos, lit in sorted(fam.key_extras, reverse=True):
        # the marker is a full tuple element — e.g. LogUserEvent.
        # getHashKey() = (platformId, USER_TYPE, userId) with
        # USER_TYPE = "\x1d"+"u" (Constants.java:4-6) — so RedisSink's
        # \x1f join yields "…\x1f\x1du\x1f…"; the \x1d prefix is kept.
        parts.insert(pos, F.lit(lit))
    return _join_tuple(parts)


def family_counts(
    flat: DataFrame,
    fam: KeyFamily,
    window_ms: int,
    slide_ms: int,
    window_enum: CountWindow,
    ttl_s: int,
    ts_col: str = "ts",
    metric_col: str = "agg_metric",
) -> DataFrame:
    """Sliding counts for one family × window, encoded as redis
    commands: (command, key, field, value, ttl_s, emit_ms)."""
    counted = sliding_counter(
        flat, [*fam.key_cols, *fam.field_cols, metric_col], ts_col, window_ms, slide_ms
    )
    fid = feature_id_col(int(fam.count_type), F.col(metric_col), int(window_enum))
    field = _join_tuple([*[F.col(c) for c in fam.field_cols], fid])
    return counted.select(
        F.when(F.col("n") != 0, F.lit("HSET")).otherwise(F.lit("HDEL")).alias("command"),
        _key_col(fam).alias("key"),
        field.alias("field"),
        F.col("n").cast("string").alias("value"),
        F.lit(ttl_s).cast("long").alias("ttl_s"),
        F.col("emit_ms"),
    )


def counter_commands(
    flat: DataFrame,
    families: tuple[KeyFamily, ...] = FAMILIES,
    ts_col: str = "ts",
    metric_col: str = "agg_metric",
) -> DataFrame:
    """The full counter-job fan-out: every family × window config,
    unioned into one command stream (CounterJob.defineJob's shape).
    ``flat`` must carry the family key/field columns + ``metric_col``
    (see functions.feature_ids.agg_metric_for_action)."""
    out: DataFrame | None = None
    for fam in families:
        for window_ms, slide_ms, window_enum, ttl_s in WINDOW_CONFIGS:
            cmds = family_counts(
                flat, fam, window_ms, slide_ms, window_enum, ttl_s, ts_col, metric_col
            )
            out = cmds if out is None else out.unionByName(cmds)
    return out


def metadata_commands(
    spark, families: tuple[KeyFamily, ...] = FAMILIES
) -> DataFrame:
    """The prepareSink metadata rows: row_format and feature_ids CSV
    per family (CounterJob.createMetadataCommands)."""
    windows = [CountWindow.HOUR, CountWindow.DAY, CountWindow.DAY_7, CountWindow.DAY_30]
    rows = []
    for fam in families:
        fids = sorted(
            expand_feature_ids(
                [int(fam.count_type)], [int(m) for m in STANDARD_METRICS], [int(w) for w in windows]
            )
        )
        rows.append(("HSET", ROW_FORMAT_KEY, fam.name, fam.row_format, -1, 0))
        rows.append(
            ("HSET", FEATURE_IDS_KEY, fam.name, ",".join(map(str, fids)), -1, 0)
        )
    return spark.createDataFrame(
        rows, "command STRING, key STRING, field STRING, value STRING, ttl_s LONG, emit_ms LONG"
    )


def redis_writer(batch_df: DataFrame, batch_id: int) -> None:  # pragma: no cover
    """foreachBatch writer: pipeline HSET/HDEL/EXPIRE to redis —
    idempotent (last-write-wins) so at-least-once replays are safe
    (RedisSink.java:26-245). Gated: the redis client is optional."""
    try:
        import redis  # type: ignore[import-not-found]
    except ImportError as e:
        raise NotImplementedError(
            "redis client not installed; commands are available as a "
            "DataFrame via counter_commands()"
        ) from e
    host = batch_df.sparkSession.conf.get("spark.openmetrics.redis.host", "localhost")
    port = int(batch_df.sparkSession.conf.get("spark.openmetrics.redis.port", "6379"))

    def write_partition(rows):
        r = redis.Redis(host=host, port=port)
        pipe = r.pipeline(transaction=False)
        n = 0
        for row in rows:
            if row.command == "HSET":
                pipe.hset(row.key, row.field, row.value)
                if row.ttl_s and row.ttl_s > 0:
                    pipe.expire(row.key, row.ttl_s)
            else:
                pipe.hdel(row.key, row.field)
            n += 1
            if n % 1000 == 0:
                pipe.execute()
        pipe.execute()

    batch_df.foreachPartition(write_partition)
