"""transformWithStateInPandas twins vs their GroupState originals.

Every stateful op now has a TWS twin sharing the op's decision core
(_combine_sweep / _redundant_sweep / _cumulate_sweep /
_latest_imps_sweep / _decide_ready), so semantic divergence is
impossible by construction; these tests pin the remaining surface —
state plumbing and timer wiring — by asserting output equality on the
same staged multi-batch replay. The TWS state protocol needs the
protobuf package at runtime; where absent (this container) every test
records a skip and the GroupState paths remain the driver-gated
operators (same arrangement as the LastTimeAndCount twin since r8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openmetrics_spark.streaming import run_to_memory, stream_from_dir
from tests.test_streaming_skew import _staged_write

BASE = 1_700_000_000_000


def _require_protobuf():
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas state protocol needs protobuf",
    )


def _rows(df, cols):
    return sorted(
        (tuple((v is None, v) for v in r) for r in df.select(*cols).collect())
    )


def test_combine_tws_parity(spark, tmp_path):
    _require_protobuf()
    from openmetrics_spark.streaming.stateful import (
        stream_combine_delivery_logs,
        stream_combine_delivery_logs_tws,
    )

    rows = []
    for i in range(60):
        cri = f"c{i // 3}" if i % 5 else None  # 3 rows share a cri
        rows.append(
            (i % 2, f"u{i % 7}", cri, f"r{i}", i % 2 == 0, BASE + i * 700)
        )
    rows.append((0, "uz", None, "rz", True, BASE + 120_000))  # flush tail
    schema = (
        "platform_id LONG, log_user_id STRING, client_request_id STRING,"
        " request_id STRING, api_execution BOOLEAN, log_timestamp LONG"
    )
    df = spark.createDataFrame(rows, schema).withColumn(
        "ts", F.timestamp_millis("log_timestamp")
    )
    src = str(tmp_path / "dl")
    _staged_write(df, src, 4, "log_timestamp", BASE, BASE + 120_000)
    cols = [
        "platform_id",
        "log_user_id",
        "client_request_id",
        "request_id",
        "api_execution",
        "log_ms",
    ]
    outs = []
    for op in (stream_combine_delivery_logs, stream_combine_delivery_logs_tws):
        s = stream_from_dir(spark, src, df.schema, max_files_per_trigger=1)
        outs.append(_rows(run_to_memory(op(s), output_mode="append"), cols))
    assert outs[0] == outs[1]


def test_reduce_redundant_tws_parity(spark, tmp_path):
    _require_protobuf()
    from openmetrics_spark.streaming.stateful import (
        stream_reduce_redundant_impressions,
        stream_reduce_redundant_impressions_tws,
    )

    imps, acts = [], []
    for i in range(30):
        for k in range(3):  # dup impressions at +0/+1/+2 s, ttl 1.5 s
            imps.append(
                (i % 2, f"u{i % 5}", f"i{i}", None, None,
                 f"m{i}_{k}", BASE + i * 5_000 + k * 1_000)
            )
        acts.append(
            (i % 2, f"u{i % 5}", f"i{i}", None, None,
             f"a{i}", f"m{i}_1", BASE + i * 5_000 + 2_500)
        )
    ischema = (
        "platform_id LONG, log_user_id STRING, insertion_id STRING,"
        " view_id STRING, content_id STRING, impression_id STRING,"
        " impression_ts LONG"
    )
    aschema = (
        "platform_id LONG, log_user_id STRING, insertion_id STRING,"
        " view_id STRING, content_id STRING, action_id STRING,"
        " impression_id STRING, action_ts LONG"
    )
    idf = spark.createDataFrame(imps, ischema).withColumn(
        "ts", F.timestamp_millis("impression_ts")
    )
    adf = spark.createDataFrame(acts, aschema).withColumn(
        "ts", F.timestamp_millis("action_ts")
    )
    lo, hi = BASE, BASE + 200_000
    idir, adir = str(tmp_path / "i"), str(tmp_path / "a")
    sentinel = spark.createDataFrame(
        [(0, "uz", "iz", None, None, "mz", hi)], ischema
    ).withColumn("ts", F.timestamp_millis("impression_ts"))
    _staged_write(idf.unionByName(sentinel), idir, 4, "impression_ts", lo, hi)
    _staged_write(adf, adir, 4, "action_ts", lo, hi)
    cols = ["kind", "event_id", "canonical_impression_id", "is_redundant", "ms"]
    outs = []
    for op in (
        stream_reduce_redundant_impressions,
        stream_reduce_redundant_impressions_tws,
    ):
        si = stream_from_dir(spark, idir, idf.schema, max_files_per_trigger=1)
        sa = stream_from_dir(spark, adir, adf.schema, max_files_per_trigger=1)
        got = run_to_memory(op(si, sa, ttl_ms=1_500), output_mode="append")
        outs.append(_rows(got.filter(F.col("event_id") != "mz"), cols))
    assert outs[0] == outs[1]


def test_cumulate_tws_parity(spark, tmp_path):
    _require_protobuf()
    from openmetrics_spark.streaming.stateful import (
        stream_cumulate_counter,
        stream_cumulate_counter_tws,
    )

    rows = [
        (f"k{i % 3}", BASE + i * 1_700) for i in range(200)
    ]  # ~5.7 min span; step 30 s, period 2 min
    df = spark.createDataFrame(rows, "key STRING, ms LONG").withColumn(
        "ts", F.timestamp_millis("ms")
    )
    src = str(tmp_path / "ev")
    hi = BASE + 600_000
    sentinel = spark.createDataFrame([("zz", hi)], "key STRING, ms LONG")
    sentinel = sentinel.withColumn("ts", F.timestamp_millis("ms"))
    _staged_write(df.unionByName(sentinel), src, 5, "ms", BASE, hi)
    cols = ["period_ms", "window_ms", "key", "n"]
    outs = []
    for op in (stream_cumulate_counter, stream_cumulate_counter_tws):
        s = stream_from_dir(spark, src, df.schema, max_files_per_trigger=1)
        got = run_to_memory(
            op(s, "key", "ts", step_ms=30_000, period_ms=120_000),
            output_mode="append",
        )
        outs.append(_rows(got.filter(F.col("key") != "zz"), cols))
    assert outs[0] == outs[1]


def test_add_latest_impressions_tws_parity(spark, tmp_path):
    _require_protobuf()
    from openmetrics_spark.streaming.stateful import (
        stream_add_latest_impressions,
        stream_add_latest_impressions_tws,
    )

    imps = [
        (i % 4, 1000 + i, BASE + i * 2_000, (i * 7) % 10) for i in range(80)
    ]
    acts = [
        (i % 4, 5000 + i, BASE + i * 9_000 + 500, (i * 3) % 10)
        for i in range(15)
    ]
    ischema = "user_id LONG, impression_id LONG, imp_ms LONG, content_id LONG"
    aschema = "user_id LONG, action_id LONG, act_ms LONG, content_id LONG"
    idf = spark.createDataFrame(imps, ischema).withColumn(
        "ts", F.timestamp_millis("imp_ms")
    )
    adf = spark.createDataFrame(acts, aschema).withColumn(
        "ts", F.timestamp_millis("act_ms")
    )
    lo, hi = BASE, BASE + 300_000
    idir, adir = str(tmp_path / "i"), str(tmp_path / "a")
    sentinel = spark.createDataFrame([(-1, -1, hi, -1)], ischema).withColumn(
        "ts", F.timestamp_millis("imp_ms")
    )
    _staged_write(idf.unionByName(sentinel), idir, 4, "imp_ms", lo, hi)
    _staged_write(adf, adir, 4, "act_ms", lo, hi)
    cols = ["action_id", "u", "rank", "impression_id", "content", "gap_ms"]
    outs = []
    for op in (
        stream_add_latest_impressions,
        stream_add_latest_impressions_tws,
    ):
        si = stream_from_dir(spark, idir, idf.schema, max_files_per_trigger=1)
        sa = stream_from_dir(spark, adir, adf.schema, max_files_per_trigger=1)
        got = run_to_memory(
            op(si, sa, max_state=5, max_output=3), output_mode="append"
        )
        outs.append(_rows(got.filter(F.col("u") >= 0), cols))
    assert outs[0] == outs[1]
