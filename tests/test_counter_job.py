"""Counter-job surface: feature-id bit packing pinned to the
reference's own golden values (LPT/job/counter/FeatureIdTest.java),
redis command encoding, key-family fan-out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openmetrics_spark.functions.feature_ids import (
    AggMetric,
    CountType,
    CountWindow,
    agg_metric,
    count_type,
    count_window,
    expand_feature_ids,
    feature_id,
    get_count_window,
)
from openmetrics_spark.jobs.counter import (
    FAMILIES,
    JOIN_CHAR,
    counter_commands,
    metadata_commands,
)


# golden values from FeatureIdTest.java:18-113 (reference's own tests)
@pytest.mark.parametrize(
    "expected,ct,metric,size,unit",
    [
        (1056802, CountType.ITEM_DEVICE_COUNT, AggMetric.COUNT_IMPRESSION, 1, "HOURS"),
        (1056870, CountType.ITEM_DEVICE_COUNT, AggMetric.COUNT_PURCHASE, 7, "DAYS"),
        (1064938, CountType.ITEM_DEVICE_COUNT, AggMetric.SUM_PURCHASE_GMV, 90, "DAYS"),
        (1237060, CountType.LOG_USER_COUNT, AggMetric.COUNT_NAVIGATE, 1, "DAYS"),
        (1237126, CountType.LOG_USER_COUNT, AggMetric.COUNT_ADD_TO_CART, 7, "DAYS"),
        (1147144, CountType.USER_COUNT, AggMetric.COUNT_CHECKOUT, 30, "DAYS"),
        (1147242, CountType.USER_COUNT, AggMetric.COUNT_MAKE_OFFER, 90, "DAYS"),
    ],
)
def test_feature_id_goldens(expected, ct, metric, size, unit):
    fid = feature_id(ct, metric, get_count_window(size, unit))
    assert fid == expected
    assert count_type(fid) == ct
    assert agg_metric(fid) == metric
    assert count_window(fid) == get_count_window(size, unit)


@pytest.mark.parametrize(
    "expected,ct,metric",
    [
        (1351840, CountType.LOG_USER_ITEM_HOURS_AGO, AggMetric.COUNT_SHARE),
        (1351968, CountType.LOG_USER_ITEM_HOURS_AGO, AggMetric.COUNT_UNLIKE),
        (1335520, CountType.USER_ITEM_HOURS_AGO, AggMetric.COUNT_COMMENT),
        (1335744, CountType.USER_ITEM_HOURS_AGO, AggMetric.COUNT_COMPLETE_SIGN_IN),
        (1343690, CountType.LOG_USER_ITEM_COUNT, AggMetric.COUNT_LIKE),
        (1343914, CountType.LOG_USER_ITEM_COUNT, AggMetric.COUNT_ANSWER_QUESTION),
        (1327434, CountType.USER_ITEM_COUNT, AggMetric.COUNT_REMOVE_FROM_CART),
        (1327594, CountType.USER_ITEM_COUNT, AggMetric.COUNT_COMPLETE_SIGN_UP),
        (1564832, CountType.LOG_USER_QUERY_HOURS_AGO, AggMetric.COUNT_SHARE),
        (1548512, CountType.USER_QUERY_HOURS_AGO, AggMetric.COUNT_COMMENT),
        (1556682, CountType.LOG_USER_QUERY_COUNT, AggMetric.COUNT_LIKE),
        (1540426, CountType.USER_QUERY_COUNT, AggMetric.COUNT_REMOVE_FROM_CART),
    ],
)
def test_last_time_feature_id_goldens(expected, ct, metric):
    window = (
        CountWindow.NONE if "HOURS_AGO" in ct.name else CountWindow.DAY_90
    )
    assert feature_id(ct, metric, window) == expected


def test_expand_feature_ids_cross_product():
    got = expand_feature_ids(
        [CountType.LOG_USER_COUNT],
        [AggMetric.COUNT_IMPRESSION, AggMetric.COUNT_NAVIGATE],
        [CountWindow.HOUR, CountWindow.DAY],
    )
    assert len(got) == 4
    assert feature_id(
        CountType.LOG_USER_COUNT, AggMetric.COUNT_IMPRESSION, CountWindow.HOUR
    ) in got


@pytest.fixture(scope="module")
def flat_events(spark):
    base = 1_700_000_000_000
    rows = []
    for i in range(200):
        rows.append(
            (
                1,  # platform_id
                f"c{i % 5}",  # content_id
                f"u{i % 3}",  # user_id
                f"lu{i % 3}",  # log_user_id
                f"{(i % 4):x}",  # query_hex
                "Linux",
                "Chrome",
                int(AggMetric.COUNT_IMPRESSION if i % 2 else AggMetric.COUNT_NAVIGATE),
                base + i * 60_000,
            )
        )
    # NULL-bearing rows: a flat feed with missing UA/content/query
    # fields must flow through the fused fan-out with the SAME group
    # identity as the per-family spec twins — concat_ws skips NULLs,
    # so encoding keys/fields BEFORE the groupBy collapsed (os=NULL,
    # ua=X) with (os=X, ua=NULL) and made a NULL-content content-device
    # struct identical to platform-device's (double count). These rows
    # pin that regression (test_unified_builders_match_per_family_spec).
    imp = int(AggMetric.COUNT_IMPRESSION)
    rows += [
        (1, None, "u0", "lu0", "0", "Linux", "Chrome", imp, base + 1_000),
        (1, "c0", "u0", "lu0", "0", None, "Chrome", imp, base + 2_000),
        (1, "c0", "u0", "lu0", "0", "Chrome", None, imp, base + 2_000),
        (1, "c1", None, "lu1", None, None, None, imp, base + 3_000),
        (1, None, "u1", None, "1", "Linux", None, imp, base + 4_000),
    ]
    df = spark.createDataFrame(
        rows,
        "platform_id LONG, content_id STRING, user_id STRING, log_user_id STRING,"
        " query_hex STRING, os STRING, user_agent_family STRING, agg_metric LONG,"
        " ts_ms LONG",
    )
    return df.withColumn("ts", F.timestamp_millis("ts_ms"))


def test_counter_commands_encoding(spark, flat_events):
    cmds = counter_commands(flat_events)
    sample = cmds.filter(F.col("command") == "HSET").limit(50).collect()
    assert sample
    for row in sample:
        assert JOIN_CHAR in row.key or row.key == "1"  # tuple-joined key
        fid = int(row.field.split(JOIN_CHAR)[-1])
        assert count_type(fid) in {int(f.count_type) for f in FAMILIES}
        assert count_window(fid) in (
            CountWindow.HOUR,
            CountWindow.DAY,
            CountWindow.DAY_7,
            CountWindow.DAY_30,
        )
        assert int(row.value) > 0


def test_counter_commands_match_oracle_counts(spark, flat_events):
    """platform-device hourly counts must equal a direct trailing-1h
    aggregation (the sliding_counter operator is itself oracle-checked;
    this pins the command encoding on top of it)."""
    cmds = counter_commands(flat_events)
    got = (
        cmds.filter(
            (F.col("command") == "HSET")
            & (F.col("key") == "1")
            & F.col("field").startswith("Linux")
        )
        .select("field", "value", "emit_ms")
        .collect()
    )
    # every Linux-field fid must be ITEM_DEVICE_COUNT
    assert got
    for r in got:
        fid = int(r.field.split(JOIN_CHAR)[-1])
        assert count_type(fid) == CountType.ITEM_DEVICE_COUNT


def test_key_encoding_goldens(spark, flat_events):
    """Pin full Redis key byte sequences against the reference layout:
    tuple elements joined by \\x1f, with USER_TYPE/QUERY_TYPE markers
    as FULL elements keeping their \\x1d prefix — e.g. LogUserEvent.
    getHashKey() = (platformId, USER_TYPE, userId) → "1\\x1f\\x1du\\x1flu0"
    (Constants.java:4-6, RedisSink join)."""
    cmds = counter_commands(flat_events).filter(F.col("command") == "HSET")
    keys = {r.key for r in cmds.select("key").distinct().collect()}
    # user family: (platformId, \x1du, userId)
    assert "1\x1f\x1du\x1fu0" in keys
    # log-user family: (platformId, \x1du, logUserId)
    assert "1\x1f\x1du\x1flu0" in keys
    # query family: (platformId, \x1dq, queryHex)
    assert "1\x1f\x1dq\x1f0" in keys
    # content-query family: (platformId, contentId, \x1dq, queryHex)
    assert "1\x1fc0\x1f\x1dq\x1f0" in keys
    # content-device family: (platformId, contentId) — no marker
    assert "1\x1fc0" in keys


def test_unified_builders_match_per_family_spec(spark, flat_events):
    """The fused one-shuffle-per-slide plans (unified_sliding_commands /
    unified_last_commands) must emit the EXACT row multiset of the
    readable per-family builders (family_counts / last_commands) —
    the per-family forms are the spec twins the fused plans are
    allowed to optimize, never to change."""
    from openmetrics_spark.jobs.counter import (
        LAST_FAMILIES,
        WINDOW_CONFIGS,
        family_counts,
        last_commands,
        unified_last_commands,
        unified_sliding_commands,
    )

    unified = unified_sliding_commands(flat_events, FAMILIES, WINDOW_CONFIGS)
    spec = None
    for fam in FAMILIES:
        for w, s, e, t in WINDOW_CONFIGS:
            c = family_counts(flat_events, fam, w, s, e, t)
            spec = c if spec is None else spec.unionByName(c)
    assert unified.exceptAll(spec).count() == 0
    assert spec.exceptAll(unified).count() == 0

    u_last = unified_last_commands(flat_events, LAST_FAMILIES)
    s_last = None
    for lfam in LAST_FAMILIES:
        c = last_commands(flat_events, lfam)
        s_last = c if s_last is None else s_last.unionByName(c)
    assert u_last.exceptAll(s_last).count() == 0
    assert s_last.exceptAll(u_last).count() == 0


def test_metadata_commands(spark):
    md = metadata_commands(spark)
    rows = {(r.key, r.field): r.value for r in md.collect()}
    assert rows[("\x1d\x1frow_format", "platform-device")] == "os,user_agent,fid:value"
    fids = rows[("\x1d\x1ffeature_ids", "log-user")].split(",")
    assert str(
        feature_id(CountType.LOG_USER_COUNT, AggMetric.COUNT_IMPRESSION, CountWindow.HOUR)
    ) in fids


def test_ua_families(spark):
    from openmetrics_spark.functions.ua import agent_family, os_family

    df = spark.createDataFrame(
        [
            ("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 Chrome/120.0 Safari/537.36",),
            ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) Version/17.0 Mobile/15E148 Safari/604.1",),
            ("Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",),
        ],
        "ua STRING",
    )
    got = df.select(
        os_family("ua").alias("os"), agent_family("ua").alias("fam")
    ).collect()
    assert (got[0].os, got[0].fam) == ("Linux", "Chrome")
    assert (got[1].os, got[1].fam) == ("iOS", "Mobile Safari")
    assert got[2].fam == "Googlebot"


def test_last_family_key_encodings(spark, flat_events):
    """Pin the Last* redis key layouts (CounterKeys.java:260-372):
    content families (pid, \\x1du, user, content); query families
    (pid, \\x1du, user, \\x1dq, query_hex) — the reference builds BOTH
    query keys from the USER id (CounterKeys.java:355-361)."""
    from openmetrics_spark.jobs.counter import LAST_FAMILIES, last_commands

    by_name = {f.name: f for f in LAST_FAMILIES}
    keys = {
        name: {
            r.key
            for r in last_commands(flat_events, fam).select("key").distinct().collect()
        }
        for name, fam in by_name.items()
    }
    assert "1\x1f\x1du\x1fu0\x1fc0" in keys["last-time-user-event"]
    assert "1\x1f\x1du\x1flu0\x1fc0" in keys["last-time-log-user-event"]
    assert "1\x1f\x1du\x1fu0\x1f\x1dq\x1f0" in keys["last-time-user-query"]
    assert "1\x1f\x1du\x1fu0\x1f\x1dq\x1f0" in keys["last-time-log-user-query"]


def test_last_family_fields_and_values(spark, flat_events):
    """Each Last* key carries a timestamp field (fid *_HOURS_AGO |
    metric | NONE, value = last event ms) and a count field (fid
    *_COUNT | metric | DAY_90, value = trailing-90d count)."""
    from openmetrics_spark.jobs.counter import LAST_FAMILIES, last_commands

    fam = LAST_FAMILIES[0]  # last-time-user-event
    rows = last_commands(flat_events, fam).filter(
        F.col("key") == "1\x1f\x1du\x1fu0\x1fc0"
    ).collect()
    fields = {int(r.field): r for r in rows}
    ts_fid = feature_id(
        CountType.USER_ITEM_HOURS_AGO, AggMetric.COUNT_IMPRESSION, CountWindow.NONE
    )
    cnt_fid = feature_id(
        CountType.USER_ITEM_COUNT, AggMetric.COUNT_IMPRESSION, CountWindow.DAY_90
    )
    assert ts_fid in fields and cnt_fid in fields
    # timestamp value is the key's own last event ms; count ≥ 1
    assert int(fields[ts_fid].value) == fields[ts_fid].emit_ms
    assert int(fields[cnt_fid].value) >= 1
    assert fields[cnt_fid].ttl_s == 90 * 86400


def test_enrich_with_log_user_user_drops_unmapped(spark):
    """Temporal enrichment is an inner as-of join: facts before the
    first mapping are dropped (CounterJob.java:927 passes a null
    leftOuterJoinFunction), and each fact takes the LATEST mapping at
    or before its timestamp."""
    from openmetrics_spark.jobs.counter import enrich_with_log_user_user

    facts = spark.createDataFrame(
        [(1, "lu1", 1000), (1, "lu1", 5000), (1, "lu1", 9000), (1, "lu2", 5000)],
        "platform_id LONG, log_user_id STRING, ms LONG",
    ).withColumn("ts", F.timestamp_millis("ms"))
    luu = spark.createDataFrame(
        [(1, "lu1", "uA", 2000), (1, "lu1", "uB", 6000)],
        "platform_id LONG, log_user_id STRING, user_id STRING, ms LONG",
    ).withColumn("ts", F.timestamp_millis("ms"))
    got = {
        (r.log_user_id, r.ms): r.user_id
        for r in enrich_with_log_user_user(facts, luu).collect()
    }
    assert got == {("lu1", 5000): "uA", ("lu1", 9000): "uB"}


def test_query_hex_col_lowercases_and_hexes(spark):
    from openmetrics_spark.functions.hashing import xxhash64_str
    from openmetrics_spark.jobs.counter import query_hex_col

    df = spark.createDataFrame([("Q7",), ("HeLLo",)], "q STRING")
    got = dict(
        df.select("q", query_hex_col(F.col("q")).alias("hx")).collect()
    )
    assert got["Q7"] == format(xxhash64_str("q7"), "x")
    assert got["HeLLo"] == format(xxhash64_str("hello"), "x")


def test_metadata_includes_last_families(spark):
    from openmetrics_spark.jobs.counter import LAST_FAMILIES, metadata_commands

    md = metadata_commands(spark, last_families=LAST_FAMILIES)
    rows = {(r.key, r.field): r.value for r in md.collect()}
    assert rows[("\x1d\x1frow_format", "last-time-user-query")] == "fid:value"
    fids = rows[("\x1d\x1ffeature_ids", "last-time-user-event")].split(",")
    assert str(
        feature_id(
            CountType.USER_ITEM_COUNT, AggMetric.COUNT_IMPRESSION, CountWindow.DAY_90
        )
    ) in fids
    assert str(
        feature_id(
            CountType.USER_ITEM_HOURS_AGO, AggMetric.COUNT_IMPRESSION, CountWindow.NONE
        )
    ) in fids


def test_backfill_gate_start_stop_window(spark):
    from openmetrics_spark.jobs.counter import backfill_gate

    cmds = spark.createDataFrame(
        [("HSET", "k1", "f", "1", -1, 500), ("HSET", "k1", "f", "2", -1, 1500),
         ("HSET", "k1", "f", "3", -1, 2500)],
        "command STRING, key STRING, field STRING, value STRING, ttl_s LONG, emit_ms LONG",
    )
    got = backfill_gate(cmds, 1000, 2000).collect()
    assert [r.value for r in got] == ["2"]
    # stop < 0 = unbounded
    got = backfill_gate(cmds, 1000, -1).collect()
    assert sorted(r.value for r in got) == ["2", "3"]


def test_backfill_gate_buffer_collapses_prestart(spark):
    """With buffering on (backfill mode, start=0): pre-start commands
    collapse to the latest per (key, field), re-stamped to the next
    buffer boundary; a key with a post-start write drops its cache
    (CounterJob.java:501-567)."""
    from openmetrics_spark.jobs.counter import backfill_gate

    start = 10_000
    cmds = spark.createDataFrame(
        [
            ("HSET", "a", "f", "old1", -1, 1_000),
            ("HSET", "a", "f", "old2", -1, 2_000),  # latest pre-start for a
            ("HSET", "b", "f", "old", -1, 3_000),
            ("HSET", "b", "f", "new", -1, 11_000),  # post-start: drops b's cache
        ],
        "command STRING, key STRING, field STRING, value STRING, ttl_s LONG, emit_ms LONG",
    )
    got = {(r.key, r.value): r.emit_ms for r in backfill_gate(
        cmds, 0, -1, buffer_ms=4_000, buffer_until_ms=start
    ).collect()}
    assert got == {("a", "old2"): 4_000, ("b", "new"): 11_000}


def test_wipe_command(spark):
    from openmetrics_spark.jobs.counter import wipe_command

    row = wipe_command(spark).first()
    assert row.command == "FLUSHALL" and row.ttl_s == -1


def test_clear_user_id_recursive(spark):
    """user_id must be nulled at every depth: top level, nested
    struct, struct-in-array (UserInfoUtil.java:24-218)."""
    from openmetrics_spark.operators.flat import clear_user_id

    df = spark.createDataFrame(
        [
            (
                "u1",
                {"user_id": "u1", "view_id": "v1"},
                [{"user_id": "u1", "n": 1}, {"user_id": "u2", "n": 2}],
                "keep",
            )
        ],
        "user_id STRING, view STRUCT<user_id: STRING, view_id: STRING>, "
        "events ARRAY<STRUCT<user_id: STRING, n: INT>>, other STRING",
    )
    r = clear_user_id(df).first()
    assert r.user_id is None
    assert r.view.user_id is None and r.view.view_id == "v1"
    assert all(e.user_id is None for e in r.events)
    assert [e.n for e in r.events] == [1, 2]
    assert r.other == "keep"


def test_counter_ua_fixture_extractions_match_oracle_pins(spark):
    """counter_commands_full scores REAL user-agent strings through
    functions/ua.py on the Spark side while its DuckDB oracle pins the
    expected (os, family) per string — this asserts ua.py extracts
    exactly the pinned pairs, so the two sides stay provably in sync."""
    from openmetrics_spark.functions.ua import agent_family, os_family
    from openmetrics_spark.queries.counter_q import _UA_FIXTURE

    df = spark.createDataFrame([(s,) for s, _, _ in _UA_FIXTURE], "ua STRING")
    got = df.select(
        os_family("ua").alias("os"), agent_family("ua").alias("fam")
    ).collect()
    for row, (_, want_os, want_fam) in zip(got, _UA_FIXTURE):
        assert (row.os, row.fam) == (want_os, want_fam)


def test_sliding_ttls_expire_only_longest_bucket(spark, flat_events):
    """Redis EXPIRE is key-level and every window of a family shares
    one key, so only the longest-lived bucket may set a TTL — the
    reference's SlidingCounter.expiry() returns 0 for every bucket
    except the 30 d one (60 d) (SlidingCounter.java:124-132,
    SlidingDailyCounter.java:52-56; SlidingHourlyCounter has no
    override). A shorter-window TTL would clamp the shared key below
    the 30 d counts' lifetime. The sink skips EXPIRE when ttl_s <= 0."""
    from openmetrics_spark.functions.feature_ids import CountWindow
    from openmetrics_spark.jobs.counter import (
        WINDOW_CONFIGS,
        unified_sliding_commands,
    )

    assert [(e.name, t) for _, _, e, t in WINDOW_CONFIGS] == [
        ("HOUR", 0),
        ("DAY", 0),
        ("DAY_7", 0),
        ("DAY_30", 60 * 86400),
    ]
    cmds = unified_sliding_commands(flat_events, FAMILIES, WINDOW_CONFIGS)
    ttls = {r.ttl_s for r in cmds.select("ttl_s").distinct().collect()}
    assert ttls <= {0, 60 * 86400}
    # and DAY_30 commands do carry the 60 d TTL
    assert 60 * 86400 in ttls
