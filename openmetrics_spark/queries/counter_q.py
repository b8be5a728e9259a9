"""Counter-job end-to-end query: the full redis command stream over
the events table, driver-checked against a DuckDB reconstruction.

Composition mirrors CounterJob.defineJob (reference: pipeline/.../job/
counter/CounterJob.java:388-500): temporal LogUserUser enrichment
(:887-929) in front of the family fan-out, the 4 Last* families
(:832-834,882-884), query hashing (common/util/FlatUtil.java:845-882
— lowercase + cespare-compatible xxhash64 seed 0), and the
prepareSink metadata rows (:588-636).

Flat-frame derivation (identical in Spark and the oracle SQL):

- facts = view/click/purchase events; signups are the LogUserUser
  mapping stream. Each signup's mapped user id embeds its event id
  ('u<uid>.<eid>'), so the as-of join MUST pick the latest mapping at
  or before the fact's timestamp — a wrong-version match changes the
  bytes of every user-keyed redis key. Facts before the first mapping
  are dropped (the reference's TemporalJoinFunction gets a null
  leftOuterJoinFunction, CounterJob.java:927).
- query = 'Q' || props.k, lowered before hashing — proving the
  lowercase step; hex via Long.toHexString semantics.
- the driver entry runs the HOUR and DAY window configs (the 7d/30d
  configs multiply oracle row counts ~30x without exercising any new
  code path; the full set stays the library default and is covered by
  unit tests).

Scale: one as-of shuffle for enrichment; then ONE pre-tumbled
bucket shuffle per distinct slide carrying every family (each event
expands to 6 family-key structs before the shuffle — grouping-sets
shape), one fused window expansion/aggregate per slide, and one
window+aggregate pass serving all 4 Last* families; the union is
written by foreachBatch — no collect. Same shuffled bytes as the
per-family plans, ~6 exchange chains instead of ~28 (measured 2x
end-to-end at sf0.1, where stage scheduling dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmetrics_spark.functions.feature_ids import CountType, CountWindow
from openmetrics_spark.functions.hashing_sql import query_hex_sql
from openmetrics_spark.jobs.counter import (
    DAY_MS,
    FAMILIES,
    HOUR_MS,
    LAST_FAMILIES,
    full_counter_commands,
    query_hex_col,
)
from openmetrics_spark.queries import register
from openmetrics_spark.tables import table

# HOUR emitted each 15 m, DAY each 4 h (SlidingHourlyCounter.java:20-41,
# SlidingDailyCounter.java:10-58). TTL 0 on both: redis expiry is
# key-level and shared with the 30 d bucket — only DAY_30 sets one
# (SlidingCounter.java:124-132; see jobs/counter.py WINDOW_CONFIGS).
DRIVER_WINDOWS = (
    (HOUR_MS, HOUR_MS // 4, CountWindow.HOUR, 0),
    (DAY_MS, 4 * HOUR_MS, CountWindow.DAY, 0),
)
_90D_MS = 90 * 86400 * 1000

_STANDARD_METRIC_VALUES = (32, 64, 128, 256, 96, 8160)

# Real user-agent strings, assigned per user by uid % 6; the Spark side
# runs functions/ua.py's rlike extraction over the STRING (the operator
# under test, CounterKeys.java:43), while the oracle pins the expected
# (os, family) per string — tests/test_ua.py asserts ua.py extracts
# exactly these pairs, closing the loop.
_UA_FIXTURE: tuple[tuple[str, str, str], ...] = (
    (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36"
        " (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
        "Windows",
        "Chrome",
    ),
    (
        "Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X)"
        " AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1"
        " Mobile/15E148 Safari/604.1",
        "iOS",
        "Mobile Safari",
    ),
    (
        "Mozilla/5.0 (X11; Linux x86_64; rv:121.0) Gecko/20100101"
        " Firefox/121.0",
        "Linux",
        "Firefox",
    ),
    (
        "Mozilla/5.0 (Linux; Android 14; Pixel 8) AppleWebKit/537.36"
        " (KHTML, like Gecko) Chrome/120.0.0.0 Mobile Safari/537.36",
        "Android",
        "Chrome Mobile",
    ),
    (
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7)"
        " AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1"
        " Safari/605.1.15",
        "Mac OS X",
        "Safari",
    ),
    (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36"
        " (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.0.0",
        "Windows",
        "Edge",
    ),
)


def _flat_and_luu(
    spark: SparkSession, sf_dir: str, skew: bool = False
) -> tuple[DataFrame, DataFrame]:
    """``skew=True`` plants a heavy-hitter content id: every odd user's
    events carry ONE content ('chot', ~50% of the stream vs ~5% per
    regular content) — the shape a viral item or a crawler loop puts
    through the counter job's per-content key families. The user key
    stays unskewed here (the BFJ skew pair owns that axis; skewing the
    LUU as-of key would collapse distinct uid mappings onto tied
    timestamps and make the pick engine-dependent)."""
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        (F.col("user_id") % 4).alias("platform_id"),
        F.concat(F.lit("lu"), F.col("user_id").cast("string")).alias("log_user_id"),
        F.col("user_id").alias("__uid"),
        "event_id",
        "ts",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("__k"),
    )
    from openmetrics_spark.functions.ua import agent_family, os_family

    ua = F.element_at(
        F.array(*[F.lit(s) for s, _, _ in _UA_FIXTURE]),
        (F.col("__uid") % len(_UA_FIXTURE) + 1).cast("int"),
    )
    flat = (
        base.filter(F.col("event_type").isin("view", "click", "purchase"))
        .select(
            "platform_id",
            "log_user_id",
            "ts",
            os_family(ua).alias("os"),
            agent_family(ua).alias("user_agent_family"),
            (
                F.when(F.col("__uid") % 2 == 1, F.lit("chot")).otherwise(
                    F.concat(F.lit("c"), (F.col("__k") % 10).cast("string"))
                )
                if skew
                else F.concat(
                    F.lit("c"), (F.col("__k") % 10).cast("string")
                )
            ).alias("content_id"),
            F.concat(F.lit("Q"), F.col("__k").cast("string")).alias("query_raw"),
            F.when(F.col("event_type") == "view", 32)
            .when(F.col("event_type") == "click", 64)
            .otherwise(96)
            .cast("long")
            .alias("agg_metric"),
        )
        .withColumn("query_hex", query_hex_col(F.col("query_raw")))
        .drop("query_raw")
    )
    # collapse same-millisecond mappings deterministically (max event
    # id) so as-of tie-breaks are engine-independent
    luu = (
        base.filter(F.col("event_type") == "signup")
        .groupBy(
            "platform_id",
            "log_user_id",
            "__uid",
            F.unix_millis("ts").alias("__ms"),
        )
        .agg(F.max("event_id").alias("__eid"))
        .select(
            "platform_id",
            "log_user_id",
            F.concat(
                F.lit("u"),
                F.col("__uid").cast("string"),
                F.lit("."),
                F.col("__eid").cast("string"),
            ).alias("user_id"),
            F.timestamp_millis(F.col("__ms")).alias("ts"),
        )
    )
    return flat, luu


# ---------------------------------------------------------------------------
# oracle SQL generation
# ---------------------------------------------------------------------------

_J = "chr(31)"  # RedisSink.JOIN_CHAR \x1f
_USER_T = "chr(29) || 'u'"  # Constants.java USER_TYPE
_QUERY_T = "chr(29) || 'q'"


def _sql_tuple(elems: list[str]) -> str:
    return f" || {_J} || ".join(elems)


def _sql_key(fam) -> str:
    elems = [f"CAST({c} AS VARCHAR)" for c in fam.key_cols]
    for pos, lit in sorted(fam.key_extras):
        elems.insert(pos, _USER_T if lit.endswith("u") else _QUERY_T)
    return _sql_tuple(elems)


def _sliding_sql(fam, window_ms: int, slide_ms: int, window_enum, ttl_s: int) -> str:
    k = window_ms // slide_ms
    base_fid = int(fam.count_type) | int(window_enum)
    fid = f"CAST({base_fid} + agg_metric AS VARCHAR)"
    field = _sql_tuple([f"CAST({c} AS VARCHAR)" for c in fam.field_cols] + [fid])
    cols = ", ".join([*fam.key_cols, *fam.field_cols, "agg_metric"])
    return f"""
SELECT CASE WHEN n != 0 THEN 'HSET' ELSE 'HDEL' END AS command,
       {_sql_key(fam)} AS key,
       {field} AS field,
       CAST(CAST(n AS BIGINT) AS VARCHAR) AS value,
       CAST({ttl_s} AS BIGINT) AS ttl_s,
       emit_ms
FROM (
  SELECT {cols}, bucket_ms + i * {slide_ms} AS emit_ms, SUM(bn) AS n
  FROM (
    SELECT {cols}, (ms // {slide_ms}) * {slide_ms} AS bucket_ms, COUNT(*) AS bn
    FROM flat GROUP BY ALL
  ), generate_series(1, {k}) AS g(i)
  GROUP BY ALL
)"""


def _last_sql(fam) -> str:
    cols = ", ".join([*fam.key_cols, "agg_metric"])
    ts_fid = int(fam.ts_fid_type) | int(CountWindow.NONE)
    count_fid = int(fam.count_fid_type) | int(CountWindow.DAY_90)
    agg = f"""
  SELECT {cols}, MAX(ms) AS last_ms,
         SUM(CASE WHEN ms > anchor - {_90D_MS} AND ms <= anchor THEN 1 ELSE 0 END) AS n
  FROM (
    SELECT {cols}, ms, MAX(ms) OVER (PARTITION BY {cols}) AS anchor FROM flat
  ) GROUP BY {cols}"""
    return f"""
SELECT CASE WHEN n != 0 THEN 'HSET' ELSE 'HDEL' END AS command,
       {_sql_key(fam)} AS key,
       CAST({ts_fid} + agg_metric AS VARCHAR) AS field,
       CAST(last_ms AS VARCHAR) AS value,
       CAST({fam.ts_ttl_s} AS BIGINT) AS ttl_s,
       last_ms AS emit_ms
FROM ({agg})
UNION ALL
SELECT CASE WHEN n != 0 THEN 'HSET' ELSE 'HDEL' END AS command,
       {_sql_key(fam)} AS key,
       CAST({count_fid} + agg_metric AS VARCHAR) AS field,
       CAST(CAST(n AS BIGINT) AS VARCHAR) AS value,
       CAST({fam.count_ttl_s} AS BIGINT) AS ttl_s,
       last_ms AS emit_ms
FROM ({agg})"""


def _metadata_sql() -> str:
    metrics = "(VALUES " + ", ".join(f"({m})" for m in _STANDARD_METRIC_VALUES) + ") m(m)"
    parts = []
    for fam in FAMILIES:
        windows = f"(VALUES ({int(CountWindow.HOUR)}), ({int(CountWindow.DAY)})) w(w)"
        fid = f"{int(fam.count_type)} + m.m + w.w"
        csv = (
            f"(SELECT string_agg(CAST({fid} AS VARCHAR), ',' ORDER BY {fid}) "
            f"FROM {metrics}, {windows})"
        )
        parts.append(
            f"SELECT 'HSET' AS command, chr(29) || {_J} || 'row_format' AS key, "
            f"'{fam.name}' AS field, '{fam.row_format}' AS value, "
            f"CAST(-1 AS BIGINT) AS ttl_s, CAST(0 AS BIGINT) AS emit_ms"
        )
        parts.append(
            f"SELECT 'HSET', chr(29) || {_J} || 'feature_ids', '{fam.name}', "
            f"{csv}, CAST(-1 AS BIGINT), CAST(0 AS BIGINT)"
        )
    for fam in LAST_FAMILIES:
        c_fid = f"{int(fam.count_fid_type) | int(CountWindow.DAY_90)} + m.m"
        t_fid = f"{int(fam.ts_fid_type) | int(CountWindow.NONE)} + m.m"
        csv = (
            f"(SELECT string_agg(CAST(f AS VARCHAR), ',' ORDER BY f) FROM ("
            f"SELECT {c_fid} AS f FROM {metrics} "
            f"UNION SELECT {t_fid} AS f FROM {metrics}))"
        )
        parts.append(
            f"SELECT 'HSET', chr(29) || {_J} || 'row_format', "
            f"'{fam.name}', 'fid:value', CAST(-1 AS BIGINT), CAST(0 AS BIGINT)"
        )
        parts.append(
            f"SELECT 'HSET', chr(29) || {_J} || 'feature_ids', '{fam.name}', "
            f"{csv}, CAST(-1 AS BIGINT), CAST(0 AS BIGINT)"
        )
    return "\nUNION ALL\n".join(parts)


def _counter_oracle(skew: bool = False) -> str:
    fl1 = """
SELECT f.*, l.user_id
FROM fl0 f ASOF JOIN luu l
  ON f.platform_id = l.platform_id
 AND f.log_user_id = l.log_user_id
 AND f.ms >= l.ms"""
    flat = query_hex_sql(fl1, s="__q", out="query_hex")
    streams = []
    for fam in FAMILIES:
        for window_ms, slide_ms, window_enum, ttl_s in DRIVER_WINDOWS:
            streams.append(_sliding_sql(fam, window_ms, slide_ms, window_enum, ttl_s))
    for lfam in LAST_FAMILIES:
        streams.append(_last_sql(lfam))
    streams.append(_metadata_sql())
    body = "\nUNION ALL\n".join(streams)
    n_ua = len(_UA_FIXTURE)
    os_cases = " ".join(
        f"WHEN {i} THEN '{os}'" for i, (_, os, _) in enumerate(_UA_FIXTURE)
    )
    fam_cases = " ".join(
        f"WHEN {i} THEN '{fam}'" for i, (_, _, fam) in enumerate(_UA_FIXTURE)
    )
    return f"""
WITH base AS (
  SELECT user_id % 4 AS platform_id,
         'lu' || CAST(user_id AS VARCHAR) AS log_user_id,
         user_id AS uid, event_id, epoch_ms(ts) AS ms, event_type,
         CAST(json_extract(props, '$.k') AS INT) AS k
  FROM events
),
luu AS (
  SELECT platform_id, log_user_id,
         'u' || CAST(uid AS VARCHAR) || '.' || CAST(MAX(event_id) AS VARCHAR) AS user_id,
         ms
  FROM base WHERE event_type = 'signup'
  GROUP BY platform_id, log_user_id, uid, ms
),
fl0 AS (
  SELECT platform_id, log_user_id, ms,
         CASE uid % {n_ua} {os_cases} END AS os,
         CASE uid % {n_ua} {fam_cases} END AS user_agent_family,
         {"CASE WHEN uid % 2 = 1 THEN 'chot' ELSE 'c' || CAST(k % 10 AS VARCHAR) END" if skew else "'c' || CAST(k % 10 AS VARCHAR)"} AS content_id,
         lower('Q' || CAST(k AS VARCHAR)) AS __q,
         CAST(CASE event_type WHEN 'view' THEN 32 WHEN 'click' THEN 64 ELSE 96 END AS BIGINT) AS agg_metric
  FROM base WHERE event_type IN ('view', 'click', 'purchase')
),
flat AS (
  SELECT * FROM {flat}
)
{body}
"""


@register(
    "counter_commands_full",
    oracle=_counter_oracle(),
    headline=True,
    tags=("counter",),
)
def counter_commands_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counter job end-to-end: LogUserUser temporal enrichment →
    6 sliding families × (HOUR, DAY) + 4 Last* families + metadata,
    as one (command, key, field, value, ttl_s, emit_ms) stream."""
    flat, luu = _flat_and_luu(spark, sf_dir)
    return full_counter_commands(
        flat,
        log_user_user=luu,
        window_configs=DRIVER_WINDOWS,
        last_horizon_ms=_90D_MS,
    )


@register(
    "counter_commands_skewed",
    oracle=_counter_oracle(skew=True),
    tags=("counter", "skew"),
)
def counter_commands_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """counter_commands_full with a PLANTED heavy-hitter content id
    (~50% of the stream on one content — see _flat_and_luu). Gates
    that the fused per-family fan-out stays correct when one content
    key dominates its families. 100 TB posture (docs/SCALE.md plan
    audit): every sliding family is a partial-aggregating hash
    aggregate — the hot (content, window, slide) key pre-combines
    map-side, so the shuffle carries O(partitions) rows per hot key,
    not O(events); no AQE skew-split is needed because no join keys
    on content."""
    flat, luu = _flat_and_luu(spark, sf_dir, skew=True)
    return full_counter_commands(
        flat,
        log_user_user=luu,
        window_configs=DRIVER_WINDOWS,
        last_horizon_ms=_90D_MS,
    )


@register(
    "counter_commands_skewed_mitigated",
    oracle=_counter_oracle(skew=True),
    tags=("counter", "skew", "mitigation"),
)
def counter_commands_skewed_mitigated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """counter_commands_skewed with the DETECTOR WIRED TO A MITIGATION:
    ``detect_hot_keys`` flags content ids holding >10% of the stream
    (exactly the planted 'chot' here; the TopNFilter broadcast shape),
    and the Last* pass routes flagged keys' content-bearing families to
    the two-phase anchor aggregate — no full row of the hot key is
    shuffled or sorted (see unified_last_commands). The output must
    hash-match the SAME oracle as the unmitigated skewed row: routing
    is a pure physical-plan decision. The sliding families stay
    unrouted by design (hash aggregates partial-aggregate map-side at
    any skew). The harsher-skew wall probe (55% of the stream on one
    (platform, user, content) identity, where the window form's
    single-task sort actually bites: routed 0.67x at a ~3.3M-row
    monster group, window 2.33x faster at ~27k — the two regimes that
    justify detector gating) is in docs/SCALE.md;
    tests/test_counter_mitigation.py pins equality and the plan
    shape."""
    from openmetrics_spark.operators.scale import detect_hot_keys

    flat, luu = _flat_and_luu(spark, sf_dir, skew=True)
    flagged = detect_hot_keys(
        flat, ["content_id"], threshold_bp=1000, top_n=20
    )
    return full_counter_commands(
        flat,
        log_user_user=luu,
        window_configs=DRIVER_WINDOWS,
        last_horizon_ms=_90D_MS,
        hot_keys=flagged,
        route_cols=("content_id",),
    )


# the reference's 7 d and 30 d daily-counter configs at full fidelity
# (4 h emit slide; TTL only on the 30 d bucket — expiry() returns 0
# for the 7 d one, SlidingDailyCounter.java:52-56: redis EXPIRE is
# key-level and a 7 d-driven TTL would clamp the shared key below the
# 30 d counts' 60 d lifetime)
WEEKLY_WINDOWS = (
    (7 * DAY_MS, 4 * HOUR_MS, CountWindow.DAY_7, 0),
    (30 * DAY_MS, 4 * HOUR_MS, CountWindow.DAY_30, 60 * 86400),
)


def _weekly_oracle() -> str:
    streams = [
        _sliding_sql(FAMILIES[0], w, s, e, t) for w, s, e, t in WEEKLY_WINDOWS
    ]
    body = "\nUNION ALL\n".join(streams)
    n_ua = len(_UA_FIXTURE)
    os_cases = " ".join(
        f"WHEN {i} THEN '{os}'" for i, (_, os, _) in enumerate(_UA_FIXTURE)
    )
    fam_cases = " ".join(
        f"WHEN {i} THEN '{fam}'" for i, (_, _, fam) in enumerate(_UA_FIXTURE)
    )
    return f"""
WITH flat AS (
  SELECT user_id % 4 AS platform_id, epoch_ms(ts) AS ms,
         CASE user_id % {n_ua} {os_cases} END AS os,
         CASE user_id % {n_ua} {fam_cases} END AS user_agent_family,
         CAST(CASE event_type WHEN 'view' THEN 32 WHEN 'click' THEN 64 ELSE 96 END AS BIGINT) AS agg_metric
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
)
{body}
"""


@register(
    "counter_commands_weekly",
    oracle=_weekly_oracle(),
    headline=True,
    tags=("counter",),
)
def counter_commands_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 7 d / 30 d daily-counter configs end-to-end — CountWindow
    DAY_7/DAY_30 feature-id packing, the 42- and 180-fold emit
    expansion, and the 14 d / 60 d TTLs (SlidingDailyCounter.java:
    10-58, FeatureId.java:36-58). Scoped to the platform-device
    family so the k=180 expansion keeps oracle rows bounded (~40k at
    sf0.01): the key space is 4 platforms × 6 (os, ua-family) pairs ×
    3 metrics; wider families only multiply rows, the window/packing
    code path is identical."""
    flat, _ = _flat_and_luu(spark, sf_dir)
    from openmetrics_spark.jobs.counter import unified_sliding_commands

    return unified_sliding_commands(flat, (FAMILIES[0],), WEEKLY_WINDOWS)


# ---------------------------------------------------------------------------
# counter_backfill_gate — the backfill output gate as a driver row
# (it held only pytest coverage before): buffer-collapse of
# pre-cutoff commands + the start/stop window filter.
# ---------------------------------------------------------------------------

# fixed mid-span cutoff (events span 2024-01-01..01-30) so both gate
# branches are non-trivial: series keep emitting after the cutoff
# (buffered values suppressed by the live write) AND the flush path
# exercises re-stamping for any series that goes quiet
_GATE_UNTIL_MS = 1_705_363_200_000  # 2024-01-16T00:00:00Z
_GATE_BUFFER_MS = 4 * HOUR_MS


def _backfill_gate_oracle() -> str:
    hour_cfg = DRIVER_WINDOWS[0]
    cmds = _sliding_sql(FAMILIES[0], *hour_cfg)
    n_ua = len(_UA_FIXTURE)
    os_cases = " ".join(
        f"WHEN {i} THEN '{os}'" for i, (_, os, _) in enumerate(_UA_FIXTURE)
    )
    fam_cases = " ".join(
        f"WHEN {i} THEN '{fam}'" for i, (_, _, fam) in enumerate(_UA_FIXTURE)
    )
    return f"""
WITH flat AS (
  SELECT user_id % 4 AS platform_id, epoch_ms(ts) AS ms,
         CASE user_id % {n_ua} {os_cases} END AS os,
         CASE user_id % {n_ua} {fam_cases} END AS user_agent_family,
         CAST(CASE event_type WHEN 'view' THEN 32 WHEN 'click' THEN 64 ELSE 96 END AS BIGINT) AS agg_metric
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
), cmds AS ({cmds}
), pre AS (
  SELECT * FROM cmds WHERE emit_ms < {_GATE_UNTIL_MS}
), post AS (
  SELECT * FROM cmds WHERE emit_ms >= {_GATE_UNTIL_MS}
), latest AS (
  -- emit_ms is unique per (key, field) series, so arg_max on emit_ms
  -- equals the Spark side's max_by(struct(emit_ms, value))
  SELECT key, field,
         arg_max(command, emit_ms) AS command,
         arg_max(value, emit_ms) AS value,
         arg_max(ttl_s, emit_ms) AS ttl_s,
         max(emit_ms) AS emit_ms
  FROM pre GROUP BY key, field
), flushed AS (
  SELECT l.command, l.key, l.field, l.value, l.ttl_s,
         (l.emit_ms // {_GATE_BUFFER_MS} + 1) * {_GATE_BUFFER_MS} AS emit_ms
  FROM latest l
  ANTI JOIN (SELECT DISTINCT key, field FROM post) p USING (key, field)
)
SELECT command, key, field, value, ttl_s, emit_ms FROM post
UNION ALL
SELECT command, key, field, value, ttl_s, emit_ms FROM flushed
"""


@register(
    "counter_backfill_gate", oracle=_backfill_gate_oracle(), tags=("counter",)
)
def counter_backfill_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill spreading + output window over a real command stream
    (CounterJob.java:501-583): commands emitted before the cutoff
    collapse per (key, field) to the latest value, re-stamped to the
    next 4 h boundary, and flush ONLY where no live command follows —
    the batch closed form of the cached-command KeyedProcessFunction.
    Scoped to the platform-device HOUR family; the gate logic is
    family-independent."""
    from openmetrics_spark.jobs.counter import (
        backfill_gate,
        unified_sliding_commands,
    )

    flat, _ = _flat_and_luu(spark, sf_dir)
    cmds = unified_sliding_commands(flat, (FAMILIES[0],), (DRIVER_WINDOWS[0],))
    return backfill_gate(
        cmds,
        output_start_ms=0,
        output_stop_ms=-1,
        buffer_ms=_GATE_BUFFER_MS,
        buffer_until_ms=_GATE_UNTIL_MS,
    )
