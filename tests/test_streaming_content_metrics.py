"""End-to-end streaming content-metrics job: hourly/daily tumbles +
CUMULATE + Kinesis envelope records over a file source, compared
against the batch operators on the same events. All the stateful ops
here have exact batch semantics (tumbling windows, monotone cumulate),
and the ordered replay + sentinel flush decide every real row, so
streaming output must EQUAL batch output."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openmetrics_spark.jobs.streaming_content_metrics import (
    HOUR_MS,
    DAY_MS,
    _metric_aggs,
    run_streaming_content_metrics,
)
from openmetrics_spark.operators.metrics import cumulate_metrics, tumbling_metrics
from openmetrics_spark.tables import table


@pytest.fixture(scope="module")
def cm_outputs(spark, sf_dir, tmp_path_factory):
    ev = table(spark, sf_dir, "events").select(
        F.concat(
            F.lit("c"),
            (F.get_json_object("props", "$.k").cast("int") % 10).cast("string"),
        ).alias("content_id"),
        "ts",
        "event_type",
        "value",
    )
    work = str(tmp_path_factory.mktemp("scm_work"))
    outs = run_streaming_content_metrics(spark, ev, work)
    return ev, outs


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_tumbles_equal_batch(spark, cm_outputs):
    ev, outs = cm_outputs
    for name, window_ms in (("hourly", HOUR_MS), ("daily", DAY_MS)):
        batch = tumbling_metrics(ev, ["content_id"], "ts", window_ms, _metric_aggs())
        got = _rows(
            outs[name].withColumnRenamed("window_start_ms", "window_ms"),
            ["content_id", "window_ms", "views", "navigates", "purchases",
             "gmv_usd_cents"],
        )
        want = _rows(
            batch,
            ["content_id", "window_ms", "views", "navigates", "purchases",
             "gmv_usd_cents"],
        )
        assert got == want, name


def test_streaming_kinesis_records_equal_batch_cumulate(spark, cm_outputs):
    ev, outs = cm_outputs
    batch = cumulate_metrics(
        ev.filter(F.col("event_type") == "view"),
        ["content_id"],
        "ts",
        HOUR_MS,
        DAY_MS,
        {"n": F.count(F.lit(1))},
    )
    want = _rows(batch, ["content_id", "period_ms", "window_ms", "n"])

    schema = (
        "dt string, contentId string, "
        "header struct<version:string, sourceId:string, id:string, "
        "correlationId:string, platformId:long, messageType:string, "
        "eventDateTimestamp:timestamp>, "
        "body struct<contentId:string, metrics:struct<views:long>>"
    )
    dec = outs["kinesis"].select(
        "partitionKey",
        F.from_json(
            "data", schema, {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"}
        ).alias("e"),
    )
    got = _rows(
        dec.select(
            F.col("e.contentId").alias("content_id"),
            F.unix_millis(F.to_timestamp("e.dt")).alias("period_ms"),
            (F.unix_millis("e.header.eventDateTimestamp") - F.lit(HOUR_MS)).alias(
                "window_ms"
            ),
            F.col("e.body.metrics.views").alias("n"),
        ),
        ["content_id", "period_ms", "window_ms", "n"],
    )
    assert got == want

    # partitionKey is the top-level contentId, and header.id carries
    # the dt@platform@content replay-dedup key
    bad = dec.filter(
        (F.col("partitionKey") != F.col("e.contentId"))
        | (
            F.col("e.header.id")
            != F.concat_ws("@", "e.dt", "e.header.platformId", "e.contentId")
        )
    ).count()
    assert bad == 0
