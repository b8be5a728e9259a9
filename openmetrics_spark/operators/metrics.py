"""Content-metrics style aggregations.

Spark twins of the reference's ContentMetricsJob Flink-SQL segment
(reference: pipeline/.../job/contentmetrics/ContentMetricsJob.java:39-45
and resources/1_create_unified_event_stream.sql ..
15_create_table_cumulated_content_metrics_kinesis.sql):

- ``unified_event_stream`` — UNION-ALL/CASE projection of typed event
  streams onto one wide metric-column schema
  (1_create_unified_event_stream.sql:1-84).
- ``tumbling_metrics`` — TUMBLE(1h / 1d) GROUP BY sums
  (2_create_view_hourly_content_metrics.sql, 5_..._daily_...sql).
- ``cumulate_metrics`` — the CUMULATE window: intra-period cumulative
  totals emitted every step (10_create_view_cumulated_...sql:1-58).
  Spark has no native CUMULATE; equivalent = tumble by step, then a
  running sum over the enclosing period via a window function. The
  window function runs over the (tiny) per-step aggregate, not raw
  events, so the extra pass is O(keys × steps/period).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def metric_case(predicate: Column, value: Column | None = None) -> Column:
    """One metric column of the unified stream: value (default 1) when
    the row is of the metric's type, else 0."""
    return F.when(predicate, value if value is not None else F.lit(1)).otherwise(
        F.lit(0) if value is None else F.lit(0.0)
    )


def tumbling_metrics(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tumble_ms: int,
    metric_aggs: dict[str, Column],
) -> DataFrame:
    """Tumbling-window GROUP BY: one row per (window_start, keys) with
    the given aggregate columns. Epoch-aligned integer bucketing so
    any SQL oracle reproduces boundaries exactly — ``floor``, not a
    truncating cast, so pre-1970 timestamps bucket like SQL ``//``
    and Spark's ``window()`` do (cast truncates toward zero, which
    diverges on negative millis)."""
    from openmetrics_spark.operators.counters import epoch_bucket_ms

    bucket = epoch_bucket_ms(ts_col, tumble_ms).alias("window_ms")
    return (
        df.select(bucket, *df.columns)
        .groupBy("window_ms", *key_cols)
        .agg(*[agg.alias(name) for name, agg in metric_aggs.items()])
    )


def cumulate_metrics(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    step_ms: int,
    period_ms: int,
    metric_aggs: dict[str, Column],
) -> DataFrame:
    """CUMULATE(step, period): per key and period, cumulative totals at
    every step boundary that has data. Output: period_ms, window_ms
    (step bucket), keys, cumulative metric columns."""
    assert period_ms % step_ms == 0
    stepped = tumbling_metrics(df, key_cols, ts_col, step_ms, metric_aggs)
    period = (
        F.floor(F.col("window_ms") / F.lit(period_ms)) * F.lit(period_ms)
    ).alias("period_ms")
    stepped = stepped.select(period, *stepped.columns)
    w = (
        Window.partitionBy("period_ms", *key_cols)
        .orderBy("window_ms")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = stepped
    for name in metric_aggs:
        out = out.withColumn(name, F.sum(name).over(w))
    return out
