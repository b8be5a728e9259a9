"""The counter job as a streaming pipeline — the Structured Streaming
twin of ``jobs.counter.full_counter_commands`` (reference:
pipeline/.../job/counter/CounterJob.java:388-500):

    flat events ──┐
                  ├─ temporal LogUserUser enrichment (as-of, inner)
    LogUserUser ──┘
        → per-family redis key/field fan-out (stateless row multiply)
        → ONE sliding-window aggregation per window config
        → HSET/HDEL command stream

Assembly notes (same staged-drain transport as
``jobs.streaming_flat_output`` — ordered files on a shared time grid
with a flowing sentinel):

- the temporal enrichment reuses ``stream_inferred_join`` with a
  single bare scope: nearest-PRIOR within the retention window IS the
  as-of pick (window_after = 0 excludes future mappings; |Δt| minimal
  = latest earlier version). Retention bounds left state like the
  reference's -30 d user retention (UserJoin.java), instead of the
  unbounded RocksDB map TemporalJoinFunction keeps.
- the family fan-out runs BEFORE the aggregation: every event row
  multiplies into its (redis key, redis field) pairs per family, then
  ONE ``stream_sliding_counter`` keyed (key, field) per window config
  aggregates them all — 2 stateful queries for 6 families × 2 windows
  rather than 12, and at scale a single shuffle per window config.
  This is bit-identical to the per-family batch fan-out because
  (key, field) determines (family, dims, metric).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmetrics_spark.functions.feature_ids import CountWindow
from openmetrics_spark.jobs.counter import (
    FAMILIES,
    KeyFamily,
    _join_tuple,
    _key_col,
    feature_id_col,
)
from openmetrics_spark.jobs.streaming_flat_output import (
    _drain,
    _restage,
    _stream,
)
from openmetrics_spark.streaming.ops import stream_sliding_counter
from openmetrics_spark.streaming.stateful import stream_inferred_join

DAY_MS = 86_400_000


def keyed_rows(
    flat: DataFrame,
    families: tuple[KeyFamily, ...],
    window_enum: CountWindow,
    metric_col: str = "agg_metric",
) -> DataFrame:
    """Stateless fan-out: one (redis key, redis field, ts) row per
    event × family, with the feature id for ``window_enum`` packed
    into the field."""
    out: DataFrame | None = None
    for fam in families:
        fid = feature_id_col(
            int(fam.count_type), F.col(metric_col), int(window_enum)
        )
        field = _join_tuple(
            [*[F.col(c) for c in fam.field_cols], fid]
        )
        r = flat.select(
            _key_col(fam).alias("key"), field.alias("field"), "ts"
        )
        out = r if out is None else out.unionByName(r)
    return out


def run_streaming_counter(
    spark: SparkSession,
    flat_dir: str,
    luu_dir: str,
    work_dir: str,
    families: tuple[KeyFamily, ...] = FAMILIES,
    # TTL 0 on both: redis EXPIRE is key-level, shared with the 30 d
    # bucket — only DAY_30 sets one (SlidingCounter.java:124-132; see
    # jobs/counter.py WINDOW_CONFIGS)
    window_configs: tuple = (
        (3_600_000, 900_000, CountWindow.HOUR, 0),
        (DAY_MS, 4 * 3_600_000, CountWindow.DAY, 0),
    ),
    retention_ms: int = 30 * DAY_MS,
    delay_ms: int = 2000,
) -> DataFrame:
    """Drain the staged pipeline and return the command stream as a
    batch DataFrame. ``flat_dir`` rows carry the family key/field
    columns + agg_metric + a ``ts`` TimestampType column (NO user_id —
    enrichment attaches it); ``luu_dir`` rows carry (platform_id,
    log_user_id, user_id, ts)."""

    def p(name: str) -> str:
        return os.path.join(work_dir, name)

    def chk(name: str) -> str:
        return os.path.join(work_dir, "_chk", name)

    flat_b = spark.read.parquet(flat_dir)
    luu_b = spark.read.parquet(luu_dir)
    lo = flat_b.agg(F.min(F.unix_millis("ts"))).first()[0]
    hi = flat_b.agg(F.max(F.unix_millis("ts"))).first()[0]
    grid = [lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3]

    # stage the two inputs on the shared grid; events (the join's
    # right side) carry the flushing sentinel
    sep = "\x1f"
    u = F.concat_ws(
        sep, F.col("platform_id").cast("string"), F.col("log_user_id")
    )
    luu_in = luu_b.select(
        u.alias("u"),
        F.xxhash64("user_id").alias("luu_h"),
        F.unix_millis("ts").alias("ms"),
        "ts",
        F.col("user_id"),
    )
    # content-derived event id: the staging writes re-evaluate the
    # plan per time slice, so a nondeterministic id (monotonically_
    # increasing_id) would collide across slices
    flat_in = flat_b.select(
        u.alias("u"),
        F.xxhash64(*flat_b.columns).alias("ev_id"),
        F.unix_millis("ts").alias("ms"),
        "ts",
        *[c for c in flat_b.columns if c not in ("ts",)],
    )
    _restage(spark, luu_in, p("luu"), "ms", grid)
    _restage(spark, flat_in, p("flat"), "ms", grid, sentinel=True)

    # stage 1: temporal enrichment — nearest prior mapping per user
    joined = stream_inferred_join(
        _stream(spark, p("luu")),
        _stream(spark, p("flat")),
        user_col="u",
        left_id_col="luu_h",
        right_id_col="ev_id",
        left_ts_col="ts",
        right_ts_col="ts",
        scopes=((),),
        window_before_ms=retention_ms,
        window_after_ms=0,
        delay_ms=delay_ms,
        right_outer=False,
    )
    _drain(joined, p("raw_enriched"), chk("enriched"))

    # re-attach payloads (stateless): event row + matched user_id
    ev_pay = spark.read.parquet(p("flat")).drop("u", "ms", "ts")
    luu_pay = (
        spark.read.parquet(p("luu"))
        .select(F.col("luu_h").alias("__lh"), F.col("user_id"))
        .distinct()
    )
    enriched = (
        spark.read.parquet(p("raw_enriched"))
        .filter(~F.col("late"))
        .join(ev_pay, F.col("right_id") == ev_pay.ev_id)
        .join(luu_pay, F.col("left_id") == F.col("__lh"))
        .withColumn("ts", F.timestamp_millis("right_ms"))
        .withColumn("ms", F.col("right_ms"))
        .drop("__lh", "ev_id", "right_id", "left_id", "right_ms", "left_ms", "late")
    )
    _restage(spark, enriched, p("enriched"), "ms", grid, sentinel=True)

    # stage 2: one sliding aggregation per window config over the
    # family fan-out; encode commands in the same query
    outs = []
    for window_ms, slide_ms, window_enum, ttl_s in window_configs:
        keyed = keyed_rows(
            _stream(spark, p("enriched")), families, window_enum
        )
        counted = stream_sliding_counter(
            keyed, ["key", "field"], "ts", window_ms, slide_ms, delay_ms
        )
        cmds = counted.select(
            F.when(F.col("n") != 0, F.lit("HSET"))
            .otherwise(F.lit("HDEL"))
            .alias("command"),
            "key",
            "field",
            F.col("n").cast("string").alias("value"),
            F.lit(ttl_s).cast("long").alias("ttl_s"),
            F.col("emit_ms"),
        )
        name = f"cmds_{int(window_enum)}"
        _drain(cmds, p(name), chk(name))
        outs.append(spark.read.parquet(p(name)))
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    # sentinel fan-out rows never aggregate with real keys (sentinel
    # platform_id is -1 and its string dims are 'zz') — drop them
    return result.filter(
        ~F.col("key").contains("zz")
        & ~F.col("field").contains("zz")
        & ~F.col("key").startswith("-1")
    )
