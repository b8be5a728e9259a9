"""The content-metrics job as a streaming pipeline — the Structured
Streaming twin of the batch hourly/daily/CUMULATE queries (reference:
pipeline/.../job/contentmetrics/ContentMetricsJob.java:200-320 wiring
resources/1_create_unified_event_stream.sql →
2/5_hourly+daily views → 10_cumulated view →
15/16_..._kinesis.sql envelope sink):

    events file stream
        ├─ hourly per-content tumble  → parquet (dt/hour sink shape)
        ├─ daily  per-content tumble  → parquet
        └─ CUMULATE(1 h, 1 d) views   → Kinesis JSON envelope records

Assembly notes (same staged-drain transport as the other streaming
jobs — ordered time-sliced files plus a far-future sentinel that
flushes every watermark):

- the three aggregations read the SAME staged stream; at scale they
  are three independent streaming queries over one Kafka topic, each
  with its own checkpoint, exactly like the reference's statement set.
- the envelope rendering is stateless column work on the CUMULATE
  output, so it rides in the cumulate query's plan (no extra stage).
- watermark delay bounds state: tumbling windows close one delay after
  their end; CUMULATE state is O(open steps) per content id.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmetrics_spark.jobs.streaming_flat_output import (
    _drain,
    _restage,
    _stream,
)
from openmetrics_spark.functions.money import exact_units
from openmetrics_spark.sources.sinks import (
    kinesis_metric_envelope,
    to_kinesis_records,
)
from openmetrics_spark.streaming.ops import stream_tumbling_metrics
from openmetrics_spark.streaming.stateful import stream_cumulate_counter

HOUR_MS = 3_600_000
DAY_MS = 24 * HOUR_MS


def _metric_aggs() -> dict[str, F.Column]:
    t = F.col("event_type")
    return {
        "views": F.sum(F.when(t == "view", 1).otherwise(0)),
        "navigates": F.sum(F.when(t == "click", 1).otherwise(0)),
        "purchases": F.sum(F.when(t == "purchase", 1).otherwise(0)),
        "gmv_usd_cents": F.sum(
            exact_units(F.when(t == "purchase", F.col("value")).otherwise(0.0), 100)
        ).cast("long"),
    }


def run_streaming_content_metrics(
    spark: SparkSession,
    events: DataFrame,
    work_dir: str,
    delay_ms: int = 2000,
) -> dict[str, DataFrame]:
    """Drain the staged pipeline and return the three metric tables
    plus the Kinesis wire records as batch DataFrames. ``events``
    needs (content_id string, ts TimestampType, event_type string,
    value double)."""

    def p(name: str) -> str:
        return os.path.join(work_dir, name)

    def chk(name: str) -> str:
        return os.path.join(work_dir, "_chk", name)

    ev = events.select(
        "content_id", "ts", "event_type", "value", F.unix_millis("ts").alias("ms")
    )
    lo, hi = ev.agg(F.min("ms"), F.max("ms")).first()
    grid = [lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3]
    _restage(spark, ev, p("events"), "ms", grid, sentinel=True)

    # hourly + daily tumbles (reference 2_/5_create_view_*.sql)
    for name, window_ms in (("hourly", HOUR_MS), ("daily", DAY_MS)):
        agg = stream_tumbling_metrics(
            _stream(spark, p("events")),
            ["content_id"],
            "ts",
            window_ms,
            _metric_aggs(),
            delay_ms=delay_ms,
        )
        _drain(agg, p(name), chk(name))

    # CUMULATE(1 h step, 1 d period) view counts per content
    # (reference 10_create_view_cumulated_content_metrics.sql); the
    # envelope rendering is a stateless projection on its output
    # the far-future sentinel row (event_type 'zz') must survive this
    # filter — it is what flushes the final open buckets
    cum = stream_cumulate_counter(
        _stream(spark, p("events")).filter(
            F.col("event_type").isin("view", "zz")
        ),
        key_col="content_id",
        ts_col="ts",
        step_ms=HOUR_MS,
        period_ms=DAY_MS,
        delay_ms=delay_ms,
    )
    env_rows = (
        cum.withColumnRenamed("key", "content_id")
        .withColumn("platform_id", F.lit(1).cast("long"))
        .withColumn(
            "dt", F.date_format(F.timestamp_millis(F.col("period_ms")), "yyyy-MM-dd")
        )
        .withColumn("event_ts_ms", F.col("window_ms") + F.lit(HOUR_MS))
        .withColumnRenamed("n", "views")
    )
    records = to_kinesis_records(
        kinesis_metric_envelope(
            env_rows,
            content_col="content_id",
            platform_col="platform_id",
            dt_col="dt",
            event_ts_ms_col="event_ts_ms",
            metric_cols={"views": "views"},
        )
    )
    _drain(records, p("kinesis"), chk("kinesis"))

    def back(name: str, key: str) -> DataFrame:
        return spark.read.parquet(p(name)).filter(~F.col(key).contains("zz"))

    return {
        "hourly": back("hourly", "content_id"),
        "daily": back("daily", "content_id"),
        "kinesis": back("kinesis", "partitionKey"),
    }
