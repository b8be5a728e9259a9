"""Raw-output job: envelope split round-trip with push-down,
validation/dedup invariants, partitioned archive layout — the Spark
counterpart of RawOutputJobMiniclusterTest (LPT/job/raw/
RawOutputJobMiniclusterTest.java asserts per-type Avro files + side
outputs on fake data)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from openmetrics_spark.fixtures import FixtureOptions, generate, to_spark
from openmetrics_spark.jobs.raw_output import raw_output_job
from openmetrics_spark.sources import (
    assemble_log_requests,
    split_log_requests,
)


@pytest.fixture(scope="module")
def fx_tables(spark):
    fx = generate(FixtureOptions(users=6, duplicate_event_rate=0.2))
    return to_spark(spark, fx)


from openmetrics_spark.sources.envelope import CHILD_TYPES


@pytest.fixture(scope="module")
def event_streams(fx_tables):
    return {k: v for k, v in fx_tables.items() if k in CHILD_TYPES}


def test_split_covers_all_eight_types(fx_tables, event_streams):
    """The envelope split covers the reference's full 8-way fan-out
    (LogRequestFilter.java:35-120) and the fixture graph populates
    every one of them."""
    assert set(CHILD_TYPES) == {
        "user",
        "cohort_membership",
        "auto_view",
        "view",
        "delivery_log",
        "impression",
        "action",
        "diagnostics",
    }
    for name in CHILD_TYPES:
        assert event_streams[name].count() > 0, name


def test_envelope_split_roundtrip(spark, event_streams):
    """assemble → split returns the original rows, with envelope
    fields pushed down into children that lack them."""
    env = assemble_log_requests(event_streams)
    back = split_log_requests(env)
    for name, df in event_streams.items():
        got = back[name]
        assert sorted(got.columns) == sorted(df.columns)
        assert got.count() == df.count()
        # row-level equality on the pk + ids
        pk = [c for c in df.columns if c.endswith("_id")]
        a = {tuple(r) for r in df.select(*pk).collect()}
        b = {tuple(r) for r in got.select(*pk).collect()}
        assert a == b


def test_envelope_pushdown(spark):
    """A child missing platform_id/log_user_id/timing inherits them
    from the envelope (PushDownAndFlatMap semantics); set child fields
    win over envelope fields."""
    from openmetrics_spark.sources import LOG_REQUEST

    child_missing = {
        "platform_id": None,
        "view_id": "v1",
        "session_id": None,
        "log_user_id": "",  # proto3 unset string
        "user_agent": None,
        "name": None,
        "content_id": None,
        "log_timestamp": None,
        "event_api_timestamp": None,
    }
    child_set = dict(
        child_missing,
        view_id="v2",
        log_user_id="other_user",
        log_timestamp=123,
        event_api_timestamp=124,
    )
    env = spark.createDataFrame(
        [
            {
                "platform_id": 7,
                "log_user_id": "env_user",
                "log_timestamp": 1000,
                "event_api_timestamp": 2000,
                "views": [child_missing, child_set],
            }
        ],
        LOG_REQUEST,
    )
    got = {
        r["view_id"]: r for r in split_log_requests(env)["view"].collect()
    }
    v1 = got["v1"]
    assert v1["platform_id"] == 7
    assert v1["log_user_id"] == "env_user"
    assert v1["log_timestamp"] == 1000 and v1["event_api_timestamp"] == 2000
    v2 = got["v2"]
    assert v2["log_user_id"] == "other_user"
    assert v2["log_timestamp"] == 123 and v2["event_api_timestamp"] == 124


def test_raw_job_dedup_and_validation(spark, event_streams):
    res = raw_output_job(event_streams)
    for name, df in res.valid.items():
        from openmetrics_spark.jobs.raw_output import RAW_PK

        pk = RAW_PK[name]
        n = df.count()
        nk = df.select(*pk).distinct().count()
        assert n == nk, f"{name}: dedup left {n - nk} duplicate pks"
    # fixture generator injects duplicate events — dedup must shrink
    raw_actions = event_streams["action"].count()
    assert res.valid["action"].count() <= raw_actions
    # validation errors carry a reason
    for name, err in res.errors.items():
        if err is not None and err.count() > 0:
            assert "error_reason" in err.columns


def test_raw_job_writes_partitioned(spark, event_streams, tmp_path):
    out = str(tmp_path / "raw_out")
    res = raw_output_job(event_streams, out_dir=out)
    view_dir = os.path.join(out, "raw", "view")
    parts = [p for p in os.listdir(view_dir) if p.startswith("dt=")]
    assert parts, f"no dt= partitions under {view_dir}"
    hour_dirs = os.listdir(os.path.join(view_dir, parts[0]))
    assert any(h.startswith("hour=") for h in hour_dirs)
    # partition pruning: a dt filter must not scan other dt dirs
    back = spark.read.parquet(view_dir)
    one_dt = parts[0].split("=", 1)[1]
    plan = (
        back.filter(F.col("dt") == one_dt)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(dt" in plan or "dt#" in plan


def test_log_user_user_extraction(spark, event_streams):
    res = raw_output_job(event_streams)
    luu = res.log_user_user
    assert luu is not None
    # one mapping per (platform, log_user, user)
    assert (
        luu.groupBy("platform_id", "log_user_id", "user_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
        == 0
    )
    assert luu.filter(F.col("user_id").isNull() | (F.col("user_id") == "")).count() == 0


def test_kafka_envelope_codec_roundtrip(spark, event_streams):
    """Pin the Kafka wire shape the option builders assume
    (streaming/core.py kafka_source_options → from_json): envelopes →
    (key, value JSON) → envelopes → split must return the original
    typed rows, and the record key must be the topic partitioning key
    (platform \\x1f log_user_id, the reference's logUserId keying)."""
    from openmetrics_spark.sources import (
        assemble_log_requests,
        decode_log_requests,
        encode_log_requests,
        split_log_requests,
    )

    env = assemble_log_requests(event_streams)
    wire = encode_log_requests(env)
    assert set(wire.columns) == {"key", "value"}
    k = wire.select("key").first().key
    assert "\x1f" in k
    back = split_log_requests(decode_log_requests(wire))
    for name, df in event_streams.items():
        pk = [c for c in df.columns if c.endswith("_id")]
        a = {tuple(r) for r in df.select(*pk).collect()}
        b = {tuple(r) for r in back[name].select(*pk).collect()}
        assert a == b, name
    # malformed payloads decode to null rows, not errors
    bad = spark.createDataFrame([("k", b"not json")], "key STRING, value BINARY")
    assert decode_log_requests(bad).first().platform_id is None


def test_kinesis_record_codec_roundtrip(spark):
    """Kinesis wire shape: envelope → (partitionKey, json data) →
    from_json recovers every header/body field; partitionKey equals
    the top-level contentId (the connector's partitioning contract)."""
    from pyspark.sql import functions as F

    from openmetrics_spark.sources.sinks import (
        kinesis_metric_envelope,
        to_kinesis_records,
    )

    rows = spark.createDataFrame(
        [("c1", 1, "2024-03-01", 1709251200000, 7, 3, 2, 1234),
         ("c2", 1, "2024-03-01", 1709254800000, 1, 0, 0, 0)],
        "content_id string, platform_id long, dt string, event_ts_ms long, "
        "views long, navigates long, purchases long, gmv long",
    )
    env = kinesis_metric_envelope(
        rows, "content_id", "platform_id", "dt", "event_ts_ms",
        {"views": "views", "navigates": "navigates",
         "purchases": "purchases", "gmvUsdCents": "gmv"},
    )
    rec = to_kinesis_records(env)
    decoded = rec.select(
        "partitionKey",
        F.from_json(
            "data",
            env.schema,
            {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"},
        ).alias("e"),
    )
    got = {r["e"]["contentId"]: r for r in decoded.collect()}
    assert set(got) == {"c1", "c2"}
    r1 = got["c1"]
    assert r1["partitionKey"] == "c1"
    e = r1["e"]
    assert e["dt"] == "2024-03-01"
    assert e["header"]["id"] == "2024-03-01@1@c1"
    assert e["header"]["version"] == "1.0"
    assert e["header"]["sourceId"] == "Metric"
    assert int(e["header"]["eventDateTimestamp"].timestamp() * 1000) == 1709251200000
    assert e["body"]["contentId"] == "c1"
    assert e["body"]["metrics"]["views"] == 7
    assert e["body"]["metrics"]["gmvUsdCents"] == 1234
