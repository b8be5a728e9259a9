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

Scale notes: the job plans ONE pre-tumbled bucket shuffle per
distinct slide for ALL sliding families (events expand to one
family-key struct per family before the shuffle — the grouping-sets
shape) and one window+aggregate pass for all Last* families; shuffle
bytes match the per-family plans (family_counts / last_commands,
kept as the readable spec twins and parity-pinned in
tests/test_counter_job.py), but the exchange-chain count drops
~28 → ~6, and at 100 TB it concentrates AQE's skew/coalesce
decisions into a few large stages. Measured at sf0.1 under the
median-of-3 protocol (scripts/bench_counter_breakdown.py, r7):
the full job is ~3.7 s, split ~1.1 s enrichment+localCheckpoint
materialization, ~1.2 s sliding fan-out, ~0.6 s Last* pass — the
fan-out itself runs ~2x faster than the per-family chains it
replaced, while the headline stopwatch also carries the as-of
enrichment, which the rewrite never touched (r5/r6 single-shot
totals of 7-8 s were dominated by one-time JIT/scheduling noise
the median protocol now excludes). The final command stream is
written by foreachBatch through a pipelined redis client.
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
from openmetrics_spark.operators.counters import (
    last_time_and_count,
    multi_window_counter,
    sliding_counter,
)
from openmetrics_spark.tables import literal_df

JOIN_CHAR = "\x1f"  # RedisSink.JOIN_CHAR (ASCII unit separator)
TYPE_SEPARATOR = "\x1d"  # counter/Constants.java (ASCII group separator)
USER_TYPE = TYPE_SEPARATOR + "u"
QUERY_TYPE = TYPE_SEPARATOR + "q"
ROW_FORMAT_KEY = TYPE_SEPARATOR + JOIN_CHAR + "row_format"
FEATURE_IDS_KEY = TYPE_SEPARATOR + JOIN_CHAR + "feature_ids"

HOUR_MS = 3_600_000
DAY_MS = 24 * HOUR_MS

# (window, slide/emit, CountWindow, redis ttl seconds) — hourly emits
# each 15 m, daily buckets each 4 h. Redis EXPIRE is key-level and all
# windows of a family share one key, so ONLY the longest-lived bucket
# may set a TTL: the reference's SlidingCounter.expiry() returns 0
# (no TTL modification) for every bucket except the 30 d one, which
# gets 60 d (SlidingCounter.java:124-132, SlidingDailyCounter.java:
# 52-56; SlidingHourlyCounter has no override). A shorter TTL on the
# HOUR/DAY/DAY_7 commands would clamp the shared key below the 30 d
# counts' lifetime — the sink skips EXPIRE when ttl_s <= 0.
WINDOW_CONFIGS = (
    (HOUR_MS, HOUR_MS // 4, CountWindow.HOUR, 0),
    (DAY_MS, 4 * HOUR_MS, CountWindow.DAY, 0),
    (7 * DAY_MS, 4 * HOUR_MS, CountWindow.DAY_7, 0),
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


@dataclass(frozen=True)
class LastFamily:
    """One LastTimeAndCount key family = one redis hash with TWO
    fields per (key, metric): the last-event timestamp (fid =
    ``ts_fid_type`` | metric | NONE) and the trailing-90d count (fid =
    ``count_fid_type`` | metric | DAY_90) — reference:
    CounterKeys.java:478-545 (LastUserContentKey / LastUserQueryKey
    mapTimestamp + mapCount90d), FeatureId.java:36-58.

    ``ts_ttl_s``: content families expire the timestamp field with the
    state TTL; query families write it with ttl 0 (no EXPIRE) —
    CounterKeys.java:497 vs :525."""

    name: str
    count_fid_type: CountType
    ts_fid_type: CountType
    key_cols: tuple[str, ...]
    key_extras: tuple[tuple[int, str], ...]
    ts_ttl_s: int
    count_ttl_s: int


_90D_S = 90 * 86400

# the 4 Last* families (CounterKeys.java:260-372). NB the reference's
# LastLogUserQuery key is built from the USER id, not the log-user id
# (CounterKeys.java:355-361 passes FlatUtil.getUserId) — mirrored here.
LAST_FAMILIES = (
    LastFamily(
        "last-time-user-event",
        CountType.USER_ITEM_COUNT,
        CountType.USER_ITEM_HOURS_AGO,
        ("platform_id", "user_id", "content_id"),
        ((1, USER_TYPE),),
        _90D_S,
        _90D_S,
    ),
    LastFamily(
        "last-time-log-user-event",
        CountType.LOG_USER_ITEM_COUNT,
        CountType.LOG_USER_ITEM_HOURS_AGO,
        ("platform_id", "log_user_id", "content_id"),
        ((1, USER_TYPE),),
        _90D_S,
        _90D_S,
    ),
    LastFamily(
        "last-time-user-query",
        CountType.USER_QUERY_COUNT,
        CountType.USER_QUERY_HOURS_AGO,
        ("platform_id", "user_id", "query_hex"),
        ((1, USER_TYPE), (3, QUERY_TYPE)),
        0,
        _90D_S,
    ),
    LastFamily(
        "last-time-log-user-query",
        CountType.LOG_USER_QUERY_COUNT,
        CountType.LOG_USER_QUERY_HOURS_AGO,
        ("platform_id", "user_id", "query_hex"),
        ((1, USER_TYPE), (3, QUERY_TYPE)),
        0,
        _90D_S,
    ),
)


def _join_tuple(cols: list, sep: str = JOIN_CHAR) -> F.Column:
    return F.concat_ws(sep, *[c.cast("string") for c in cols])


def _key_parts(fam) -> list:
    parts: list = [F.col(c).cast("string") for c in fam.key_cols]
    # positions are FINAL tuple indices; ascending insertion keeps each
    # later index valid once earlier markers are in place (needed for
    # the two-marker Last*Query keys: (pid, \x1du, user, \x1dq, hex)).
    for pos, lit in sorted(fam.key_extras):
        # the marker is a full tuple element — e.g. LogUserEvent.
        # getHashKey() = (platformId, USER_TYPE, userId) with
        # USER_TYPE = "\x1d"+"u" (Constants.java:4-6) — so RedisSink's
        # \x1f join yields "…\x1f\x1du\x1f…"; the \x1d prefix is kept.
        parts.insert(pos, F.lit(lit))
    return parts


def _key_col(fam) -> F.Column:
    return F.concat_ws(JOIN_CHAR, *_key_parts(fam))


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


def unified_sliding_commands(
    flat: DataFrame,
    families: tuple[KeyFamily, ...] = FAMILIES,
    window_configs: tuple = WINDOW_CONFIGS,
    ts_col: str = "ts",
    metric_col: str = "agg_metric",
) -> DataFrame:
    """EVERY sliding family × window config in one two-stage plan per
    distinct slide — the full-job analog of the reference keying one
    operator per family and serving all windows from its state
    (CounterJob.java:388-500 + SlidingCounter.java:215-283).

    Each event explodes into one (fidx, key-parts, field-parts)
    struct per family BEFORE the bucket shuffle (an Expand, exactly
    what GROUPING SETS plans), so all families ride ONE raw shuffle
    per slide instead of one per family×config. Shuffled bytes are
    the same as the per-family plans — the win is stage count:
    6 families × 4 configs collapses from 24 exchange chains to 2,
    which at sf0.1 is almost pure scheduling overhead and at 100 TB
    is one AQE skew/coalesce domain instead of 24 small ones.

    The family markers (``USER_TYPE``/``QUERY_TYPE``), key layout and
    field encoding are byte-identical to ``family_counts``: the struct
    carries the RAW key/field parts as string ARRAYS — arrays preserve
    NULL elements, so distinct raw tuples stay distinct through the
    aggregate exactly as family_counts' raw-column grouping does
    (encoding the ``concat_ws`` strings before the groupBy collapsed
    (os=NULL, ua='X') with (os='X', ua=NULL), and a NULL content_id
    made the content-device struct identical to platform-device's) —
    plus the family index, which both disambiguates families whose
    raw parts could coincide and decodes to the count_type (and, with
    window_tag, the TTL) after the aggregate. The packed feature id
    appends post-agg: fid = count_type | metric | window_tag."""
    base = flat.select(
        F.explode(F.array(*fam_explode_structs(families))).alias("__f"),
        F.col(metric_col).alias("__metric"),
        F.col(ts_col).alias("__ts"),
    )
    # one bucket shuffle per distinct slide + one flat-index expansion
    # aggregate — the shared operator (see its docstring for the A/Bs
    # against the transform()-struct and gcd-fine-bucket shapes)
    counted = multi_window_counter(
        base,
        ["__f", "__metric"],
        "__ts",
        [
            (int(enum), window_ms, slide_ms)
            for window_ms, slide_ms, enum, _ in window_configs
        ],
    )
    return encode_sliding_commands(counted, families, window_configs)


def fam_explode_structs(families: tuple[KeyFamily, ...]) -> list:
    """One (fidx, key-parts, field-parts) struct per family — the
    pre-shuffle explode payload of the fused fan-out; also the group
    key its STREAMING twin's tumbling-window aggregate maintains."""
    return [
        F.struct(
            F.lit(i).alias("fidx"),
            F.array(*_key_parts(fam)).alias("karr"),
            F.array(
                *[F.col(c).cast("string") for c in fam.field_cols]
            ).alias("farr"),
        )
        for i, fam in enumerate(families)
    ]


def encode_sliding_commands(
    counted: DataFrame,
    families: tuple[KeyFamily, ...],
    window_configs: tuple,
) -> DataFrame:
    """Encode a counted fan-out frame (``__f`` struct + ``__metric`` +
    ``window_tag`` + ``emit_ms`` + ``n``) into redis commands. Family
    constants + per-config TTL decode from (fidx, window_tag) AFTER
    the aggregate — decoding before it would only widen the shuffled
    rows."""
    ctype = None
    for i, fam in enumerate(families):
        c = F.lit(int(fam.count_type)).cast("long")
        cond = F.col("__f.fidx") == i
        ctype = F.when(cond, c) if ctype is None else ctype.when(cond, c)
    ttl_expr = None
    for _, _, enum, ttl_s in window_configs:
        cond = F.col("window_tag") == int(enum)
        t = F.lit(ttl_s).cast("long")
        ttl_expr = F.when(cond, t) if ttl_expr is None else ttl_expr.when(cond, t)
    fid = ctype.bitwiseOR(F.col("__metric").cast("long")).bitwiseOR(
        F.col("window_tag")
    )
    # concat_ws over an array skips NULL elements — the same rule the
    # spec twin's concat_ws over raw columns applies, just deferred to
    # after the aggregate
    field = F.concat_ws(
        JOIN_CHAR, F.concat(F.col("__f.farr"), F.array(fid.cast("string")))
    )
    return counted.select(
        F.when(F.col("n") != 0, F.lit("HSET")).otherwise(F.lit("HDEL")).alias("command"),
        F.concat_ws(JOIN_CHAR, F.col("__f.karr")).alias("key"),
        field.alias("field"),
        F.col("n").cast("string").alias("value"),
        ttl_expr.alias("ttl_s"),
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
    return unified_sliding_commands(flat, families, WINDOW_CONFIGS, ts_col, metric_col)


def last_commands(
    flat: DataFrame,
    fam: LastFamily,
    horizon_ms: int = _90D_S * 1000,
    ts_col: str = "ts",
    metric_col: str = "agg_metric",
) -> DataFrame:
    """LastTimeAndCount commands for one Last* family: per (key,
    metric), an HSET of the last-event timestamp and an HSET of the
    trailing-90d count (CounterJob.java:832-834,882-884 union the two
    map streams; LastTimeAndCount.java:36-299 is the state machine).
    Batch twin: one ``last_time_and_count`` per family — a single
    shuffle on the family key."""
    ltc = last_time_and_count(
        flat, [*fam.key_cols, metric_col], ts_col, horizon_ms
    )
    ts_fid = feature_id_col(
        int(fam.ts_fid_type), F.col(metric_col), int(CountWindow.NONE)
    )
    count_fid = feature_id_col(
        int(fam.count_fid_type), F.col(metric_col), int(CountWindow.DAY_90)
    )
    hset_or_del = (
        F.when(F.col("n_horizon") != 0, F.lit("HSET")).otherwise(F.lit("HDEL"))
    )
    ts_cmds = ltc.select(
        hset_or_del.alias("command"),
        _key_col(fam).alias("key"),
        ts_fid.cast("string").alias("field"),
        F.col("last_ms").cast("string").alias("value"),
        F.lit(fam.ts_ttl_s).cast("long").alias("ttl_s"),
        F.col("last_ms").alias("emit_ms"),
    )
    count_cmds = ltc.select(
        hset_or_del.alias("command"),
        _key_col(fam).alias("key"),
        count_fid.cast("string").alias("field"),
        F.col("n_horizon").cast("string").alias("value"),
        F.lit(fam.count_ttl_s).cast("long").alias("ttl_s"),
        F.col("last_ms").alias("emit_ms"),
    )
    return ts_cmds.unionByName(count_cmds)


def unified_last_commands(
    flat: DataFrame,
    last_families: tuple[LastFamily, ...] = LAST_FAMILIES,
    horizon_ms: int = _90D_S * 1000,
    ts_col: str = "ts",
    metric_col: str = "agg_metric",
    hot_keys: DataFrame | None = None,
    route_cols: tuple[str, ...] = (),
) -> DataFrame:
    """All 4 Last* families in ONE window+aggregate pass: each event
    explodes into one (fidx, key-parts) struct per family before the
    key shuffle, the per-key anchor/last/count aggregate runs once
    over (family-struct, metric), and each result row inlines into its
    TWO commands (timestamp + trailing-count hash fields,
    CounterJob.java:832-834,882-884) via a codegen'd 2-struct array —
    no union branch per family, no double-computed aggregate.

    The struct carries the RAW key parts as a string ARRAY (NULL
    elements preserved, so (pid, uid, NULL) and (pid, NULL, uid) stay
    distinct groups — encoding the concat_ws key before the groupBy
    collapsed them) plus the family index; the per-family fid types
    and TTLs are constants, decoded from fidx after the aggregate,
    which also narrows the shuffled rows.

    HOT-KEY MITIGATION (``hot_keys`` + ``route_cols``): the window
    function is the one stage of the counter job that does NOT
    pre-aggregate — every row of a (family-key, metric) group ships to
    ONE reducer and sorts there, so a single key holding 50% of the
    stream serializes half the job. Given a flagged key frame (the
    ``detect_hot_keys`` output over ``route_cols``; <= top_n rows,
    broadcast), rows whose ``route_cols`` values are flagged AND whose
    family key contains all ``route_cols`` are routed to a TWO-PHASE
    form: anchors = groupBy.max (map-side partial — a monster group
    ships O(partitions) rows), broadcast the anchors back (bounded by
    flagged-keys x their distinct subkeys x metrics), then the
    horizon count as a second map-side-combining aggregate. No full
    row of a hot key is ever shuffled or sorted. Families whose key
    lacks a ``route_col`` never route (splitting their groups across
    paths would corrupt the anchor). Cold keys keep the single-pass
    window plan. Output is bit-identical either way (exact integer
    aggregates) — gated by counter_commands_skewed_mitigated
    hash-matching counter_commands_skewed's oracle.

    Measured regimes (scripts/probe_hot_last.py, sf0.1, 55% skew,
    docs/SCALE.md): with the monster group at ~27k rows the WINDOW
    form wins 2.33x (its serial sort is sub-second; routing pays two
    extra fully-parallel scans of the hot subset) — at ~3.3M rows the
    ROUTED form wins 0.67x and the gap widens linearly with group
    size, because the window's single-task sort grows while every
    routed stage stays parallel. This is why the mitigation is
    detector-GATED (high share threshold) rather than always-on."""
    from pyspark.sql import Window

    routable: set[int] = set()
    if hot_keys is not None:
        if not route_cols:
            raise ValueError("hot_keys requires route_cols")
        routable = {
            i
            for i, f in enumerate(last_families)
            if set(route_cols) <= set(f.key_cols)
        }
        flat = flat.join(
            F.broadcast(
                hot_keys.select(*route_cols).distinct().withColumn(
                    "__hot", F.lit(True)
                )
            ),
            list(route_cols),
            "left",
        ).withColumn("__hot", F.coalesce(F.col("__hot"), F.lit(False)))

    structs = [
        F.struct(
            F.lit(i).alias("fidx"),
            F.array(*_key_parts(f)).alias("karr"),
        )
        for i, f in enumerate(last_families)
    ]

    def _by_fidx(vals: list[int]) -> F.Column:
        expr = None
        for i, v in enumerate(vals):
            cond = F.col("__f.fidx") == i
            c = F.lit(v).cast("long")
            expr = F.when(cond, c) if expr is None else expr.when(cond, c)
        return expr

    base_cols = [
        F.explode(F.array(*structs)).alias("__f"),
        F.col(metric_col).alias("__metric"),
        F.unix_millis(F.col(ts_col)).alias("__ms"),
    ]
    if hot_keys is not None:
        base_cols.append(F.col("__hot"))
    base = flat.select(*base_cols)

    def _window_ltc(rows: DataFrame) -> DataFrame:
        w = Window.partitionBy(F.col("__f"), F.col("__metric"))
        anchored = rows.withColumn("__anchor", F.max("__ms").over(w))
        in_h = (F.col("__ms") > F.col("__anchor") - F.lit(horizon_ms)) & (
            F.col("__ms") <= F.col("__anchor")
        )
        return anchored.groupBy("__f", "__metric").agg(
            F.max("__ms").alias("last_ms"),
            F.sum(F.when(in_h, 1).otherwise(0)).alias("n_horizon"),
        )

    def _two_phase_ltc(rows: DataFrame) -> DataFrame:
        anchors = rows.groupBy("__f", "__metric").agg(
            F.max("__ms").alias("__anchor")
        )
        in_h = (F.col("__ms") > F.col("__anchor") - F.lit(horizon_ms)) & (
            F.col("__ms") <= F.col("__anchor")
        )
        return (
            rows.join(F.broadcast(anchors), ["__f", "__metric"])
            .groupBy("__f", "__metric")
            .agg(
                F.max("__ms").alias("last_ms"),
                F.sum(F.when(in_h, 1).otherwise(0)).alias("n_horizon"),
            )
        )

    if hot_keys is None:
        ltc = _window_ltc(base)
    else:
        is_routed = F.col("__hot") & F.col("__f.fidx").isin(
            *sorted(routable)
        ) if routable else F.lit(False)
        hot_rows = base.filter(is_routed).drop("__hot")
        cold_rows = base.filter(~is_routed).drop("__hot")
        ltc = _window_ltc(cold_rows).unionByName(_two_phase_ltc(hot_rows))
    cmd = F.when(F.col("n_horizon") != 0, F.lit("HSET")).otherwise(F.lit("HDEL"))
    key = F.concat_ws(JOIN_CHAR, F.col("__f.karr"))
    ts_fid = _by_fidx([int(f.ts_fid_type) for f in last_families]).bitwiseOR(
        F.col("__metric").cast("long")
    ).bitwiseOR(F.lit(int(CountWindow.NONE)).cast("long"))
    count_fid = _by_fidx([int(f.count_fid_type) for f in last_families]).bitwiseOR(
        F.col("__metric").cast("long")
    ).bitwiseOR(F.lit(int(CountWindow.DAY_90)).cast("long"))
    pairs = F.array(
        F.struct(
            cmd.alias("command"),
            key.alias("key"),
            ts_fid.cast("string").alias("field"),
            F.col("last_ms").cast("string").alias("value"),
            _by_fidx([f.ts_ttl_s for f in last_families]).alias("ttl_s"),
            F.col("last_ms").alias("emit_ms"),
        ),
        F.struct(
            cmd.alias("command"),
            key.alias("key"),
            count_fid.cast("string").alias("field"),
            F.col("n_horizon").cast("string").alias("value"),
            _by_fidx([f.count_ttl_s for f in last_families]).alias("ttl_s"),
            F.col("last_ms").alias("emit_ms"),
        ),
    )
    return ltc.select(F.inline(pairs))


def query_hex_col(query_col: F.Column) -> F.Column:
    """``Long.toHexString(xxhash64(lower(query)))`` — the query key
    the counter families hash on (FlatUtil.java:850-884: lowercase
    then cespare-compatible xxhash64 seed 0; hex is lowercase with no
    leading zeros). The hash runs in the vectorized Arrow UDF; hex
    formatting stays JVM-side (``hex`` of the signed long is the
    two's-complement 64-bit pattern = unsigned hex)."""
    from openmetrics_spark.functions.hashing import xxhash64_udf

    return F.lower(F.hex(xxhash64_udf(F.lower(query_col))))


def enrich_with_log_user_user(
    flat: DataFrame,
    log_user_user: DataFrame,
    ts_col: str = "ts",
    luu_ts_col: str = "ts",
) -> DataFrame:
    """Temporal LogUserUser enrichment (CounterJob.java:887-929):
    attach the latest (platform_id, log_user_id) → user_id mapping
    with mapping-ts <= event-ts, and DROP events with no mapping yet —
    the reference passes a null leftOuterJoinFunction to
    TemporalJoinFunction (:927), so unmatched facts are not emitted.

    One as-of shuffle of |events| + |mappings| rows (asof_join's
    union+last_value plan); no range explosion."""
    from openmetrics_spark.operators.joins import asof_join

    luu = log_user_user.select(
        "platform_id",
        "log_user_id",
        F.col("user_id").alias("__luu_user_id"),
        F.col(luu_ts_col).alias("__luu_ts"),
    )
    joined = asof_join(
        flat,
        luu,
        on=["platform_id", "log_user_id"],
        left_ts=ts_col,
        right_ts="__luu_ts",
        right_cols=["__luu_user_id"],
    )
    return (
        joined.filter(F.col("__luu_user_id").isNotNull())
        .withColumn("user_id", F.col("__luu_user_id"))
        .drop("__luu_user_id")
    )


def full_counter_commands(
    flat: DataFrame,
    log_user_user: DataFrame | None = None,
    families: tuple[KeyFamily, ...] = FAMILIES,
    last_families: tuple[LastFamily, ...] = LAST_FAMILIES,
    window_configs: tuple = WINDOW_CONFIGS,
    last_horizon_ms: int = _90D_S * 1000,
    ts_col: str = "ts",
    metric_col: str = "agg_metric",
    with_metadata: bool = True,
    hot_keys: DataFrame | None = None,
    route_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The counter job end-to-end (CounterJob.defineJob:388-500):
    temporal LogUserUser enrichment, then the sliding-count fan-out
    (families × windows), the 4 Last* families, and the prepareSink
    metadata rows, unioned into one redis command stream.

    ``flat`` must carry platform_id, log_user_id, content_id,
    query_hex, os, user_agent_family, ``metric_col`` and ``ts_col``
    (user_id too unless ``log_user_user`` supplies it).

    ``hot_keys``/``route_cols`` wire the detect_hot_keys output into
    the Last* pass (see unified_last_commands). The sliding families
    need no routing: they are hash aggregates, which ALWAYS partial-
    aggregate map-side, so a hot key ships O(partitions) pre-combined
    rows per (window, slide) regardless of skew."""
    if log_user_user is not None:
        flat = enrich_with_log_user_user(flat, log_user_user, ts_col=ts_col)
        # cut the lineage once the as-of shuffle (and any Python-UDF
        # column like query_hex) is in the plan: every family × window
        # branch re-executes the upstream otherwise — A/B at sf0.1
        # measured 7.8-9.0 s recompute vs 6.1-6.8 s checkpointed,
        # while plain persist() was NO faster than recompute (wide
        # InMemoryRelation reads cost as much as the narrow re-scans)
        # and a repartition(32) before the checkpoint was slower still
        # (16 branches × 32 map tasks of pure scheduling overhead).
        # localCheckpoint trades executor-loss recomputability for
        # speed; on a real cluster the enriched frame is small
        # (|events| rows × 9 narrow columns) and a lost block only
        # fails-and-retries the job, which the driver retries anyway.
        flat = flat.localCheckpoint(eager=False)
    out = unified_sliding_commands(flat, families, window_configs, ts_col, metric_col)
    if last_families:
        out = out.unionByName(
            unified_last_commands(
                flat,
                last_families,
                last_horizon_ms,
                ts_col,
                metric_col,
                hot_keys=hot_keys,
                route_cols=route_cols,
            )
        )
    if with_metadata:
        windows = [w for _, _, w, _ in window_configs]
        out = out.unionByName(
            metadata_commands(
                flat.sparkSession, families, last_families, windows
            )
        )
    return out


def metadata_commands(
    spark,
    families: tuple[KeyFamily, ...] = FAMILIES,
    last_families: tuple[LastFamily, ...] = (),
    windows: list | None = None,
) -> DataFrame:
    """The prepareSink metadata rows: row_format and feature_ids CSV
    per family (CounterJob.createMetadataCommands; Last* feature-id
    sets per CounterKeys.getLastUserEventFeatureIds:376-383 — the
    count fid pinned to DAY_90, the hours-ago fid to NONE, crossed
    with every metric)."""
    if windows is None:
        windows = [
            CountWindow.HOUR, CountWindow.DAY, CountWindow.DAY_7, CountWindow.DAY_30
        ]
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
    for lfam in last_families:
        fids = sorted(
            {
                int(lfam.count_fid_type) | int(m) | int(CountWindow.DAY_90)
                for m in STANDARD_METRICS
            }
            | {
                int(lfam.ts_fid_type) | int(m) | int(CountWindow.NONE)
                for m in STANDARD_METRICS
            }
        )
        rows.append(("HSET", ROW_FORMAT_KEY, lfam.name, "fid:value", -1, 0))
        rows.append(
            ("HSET", FEATURE_IDS_KEY, lfam.name, ",".join(map(str, fids)), -1, 0)
        )
    return literal_df(
        spark, rows, "command STRING, key STRING, field STRING, value STRING, ttl_s LONG, emit_ms LONG"
    )


def backfill_gate(
    cmds: DataFrame,
    output_start_ms: int,
    output_stop_ms: int = -1,
    buffer_ms: int = 0,
    buffer_until_ms: int | None = None,
    emit_col: str = "emit_ms",
) -> DataFrame:
    """Backfill output gating (CounterJob.java:501-583):

    - with ``buffer_ms > 0`` (backfill spreading), commands emitted
      before ``buffer_until_ms`` — the reference compares against the
      job-launch wall clock (:501 ``startTimeMillis``), defaulted here
      the same way — collapse per (key, field) to the LATEST one,
      re-stamped to the next ``buffer_ms`` boundary: the batch closed
      form of the cached-command KeyedProcessFunction (a later live
      command drops the cache, so only keys with no live write flush a
      buffered value);
    - then the start/stop window filter on ``output_start_ms`` /
      ``output_stop_ms`` (CounterJob.java:569-583; stop < 0 means
      unbounded). For backfills the reference sets start to 0 so the
      buffered state evolution still lands; steady-state jobs set
      start to the checkpoint timestamp and buffer to 0.
    """
    import time as _time

    stop = output_stop_ms if output_stop_ms >= 0 else (1 << 62)
    if buffer_ms > 0:
        until = (
            int(_time.time() * 1000) if buffer_until_ms is None else buffer_until_ms
        )
        pre = cmds.filter(F.col(emit_col) < until)
        post = cmds.filter(F.col(emit_col) >= until)
        latest = pre.groupBy("key", "field").agg(
            F.max_by(
                F.struct(*[c for c in cmds.columns if c not in ("key", "field")]),
                F.struct(F.col(emit_col), F.col("value")),
            ).alias("__c")
        )
        flushed = latest.join(
            post.select("key", "field").distinct(), ["key", "field"], "left_anti"
        ).select(
            "key",
            "field",
            *[F.col(f"__c.{c}").alias(c) for c in cmds.columns if c not in ("key", "field")],
        ).withColumn(
            emit_col,
            (F.floor(F.col(emit_col) / buffer_ms) + 1) * buffer_ms,
        )
        cmds = post.unionByName(flushed.select(*cmds.columns))
    return cmds.filter(
        (F.col(emit_col) >= output_start_ms) & (F.col(emit_col) <= stop)
    )


def wipe_command(spark) -> DataFrame:
    """The --wipe backfill preamble: flush the feature store before
    writing (CounterJob.java:238-243, prepareSink :589-593 — ONLY for
    backfills). Union this ahead of the command stream; the writer
    executes FLUSHALL before any HSET."""
    return literal_df(
        spark,
        [("FLUSHALL", "", "", "", -1, 0)],
        "command STRING, key STRING, field STRING, value STRING, ttl_s LONG, emit_ms LONG",
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
            if row.command == "FLUSHALL":
                pipe.flushall()
            elif row.command == "HSET":
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
