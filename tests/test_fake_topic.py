"""Kafka-contract transport: the full LogRequest ingest path —
encode → topic records → streaming read → SetLogTimestamp from the
record timestamp → decode → 8-way split — driven end-to-end over the
broker-less fake topic (reference: MetricsApiKafkaSource.java:40-120 +
SetLogTimestamp; the only part not exercised is the network hop)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openmetrics_spark.fixtures import FixtureOptions, generate, to_spark
from openmetrics_spark.sources.envelope import (
    CHILD_TYPES,
    assemble_log_requests,
    decode_log_requests,
    encode_log_requests,
    split_log_requests,
)
from openmetrics_spark.streaming.core import (
    kafka_record_schema,
    read_fake_topic,
    run_to_memory,
    write_fake_topic,
)


@pytest.fixture(scope="module")
def envelopes(spark):
    fx = generate(FixtureOptions(users=6))
    tables = to_spark(spark, fx)
    return assemble_log_requests(
        {k: v for k, v in tables.items() if k in CHILD_TYPES}
    )


def test_fake_topic_schema_matches_kafka_source(spark, envelopes, tmp_path):
    path = str(tmp_path / "topic")
    write_fake_topic(
        encode_log_requests(envelopes), path, topic="tracking.event.log-request"
    )
    got = spark.read.parquet(path)
    assert got.schema == kafka_record_schema()
    assert got.count() == envelopes.count()
    # partitions within bounds, offsets per-partition dense from 0
    parts = got.select("partition").distinct().collect()
    assert all(0 <= r["partition"] < 4 for r in parts)
    for p in parts:
        offs = sorted(
            r["offset"]
            for r in got.filter(F.col("partition") == p["partition"])
            .select("offset")
            .collect()
        )
        assert offs == list(range(len(offs)))


def test_same_key_lands_on_same_partition(spark, envelopes, tmp_path):
    """The per-user ordering contract: every record of one key sits in
    exactly one partition (hash partitioning by key, the reason the
    reference keys the topic by logUserId)."""
    path = str(tmp_path / "topic_keys")
    write_fake_topic(encode_log_requests(envelopes), path, topic="t")
    per_key = (
        spark.read.parquet(path)
        .groupBy(F.col("key").cast("string").alias("k"))
        .agg(F.count_distinct("partition").alias("nparts"))
    )
    assert per_key.filter(F.col("nparts") > 1).count() == 0


def test_streaming_ingest_roundtrip_with_log_timestamp(
    spark, envelopes, tmp_path
):
    """End-to-end over the streaming reader: decode(value) == the
    original envelopes, and log_timestamp is stamped from the RECORD
    timestamp (Kafka ingest time), not any payload field — the exact
    SetLogTimestamp contract at the head of every reference job."""
    path = str(tmp_path / "topic_stream")
    ingest_ms = 1704067200123
    write_fake_topic(
        encode_log_requests(envelopes).withColumn(
            "__ingest", F.timestamp_millis(F.lit(ingest_ms))
        ),
        path,
        topic="tracking.event.log-request",
        ts_col="__ingest",
    )
    records = read_fake_topic(spark, path, max_files_per_trigger=1)
    decoded = (
        decode_log_requests(records, keep=("timestamp",))
        .withColumn("log_timestamp", F.unix_millis("timestamp"))
        .drop("timestamp")
    )
    out = run_to_memory(decoded, checkpoint_dir=str(tmp_path / "chk"))
    assert out.count() == envelopes.count()
    assert out.filter(F.col("log_timestamp") != ingest_ms).count() == 0
    # the split sees identical child rows as splitting the originals
    # (out keeps log_timestamp — SetLogTimestamp OVERWRITES the
    # payload's value with the record time, and the envelope schema
    # the split consumes includes it)
    got = split_log_requests(out)
    want = split_log_requests(envelopes)
    for name in CHILD_TYPES:
        g = got[name]
        w = want[name]
        assert g.count() == w.count(), name
        assert sorted(g.columns) == sorted(w.columns), name


def test_offsets_continue_across_publishes(spark, envelopes, tmp_path):
    """The broker contract: per-partition offsets are monotone across
    successive producer batches, dense from 0, never duplicated."""
    path = str(tmp_path / "topic_multi")
    enc = encode_log_requests(envelopes)
    write_fake_topic(enc, path, topic="t")
    write_fake_topic(enc, path, topic="t")
    rows = spark.read.parquet(path).select("partition", "offset").collect()
    per_part: dict = {}
    for r in rows:
        per_part.setdefault(r["partition"], []).append(r["offset"])
    for p, offs in per_part.items():
        assert 0 <= p, p
        assert sorted(offs) == list(range(len(offs))), (p, sorted(offs)[:5])
