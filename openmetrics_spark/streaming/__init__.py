"""Structured Streaming twins of the batch operators.

The reference is a streaming engine (Flink DataStream + Flink SQL);
every batch operator in ``openmetrics_spark.operators`` that has
streaming-stateful semantics in the reference gets a twin here, built
on ``readStream`` → ``withWatermark`` → built-in windowed aggregation /
stream-stream join / dropDuplicatesWithinWatermark, with
``transformWithStateInPandas`` reserved for the ops Spark's built-ins
can't express (SURVEY §2.7).

Batch-first discipline (SURVEY §7.0): the batch twin IS the
correctness oracle; streaming tests assert stream output == batch
output on the same input (run with ``Trigger.AvailableNow`` so the
stream drains deterministically).
"""

from openmetrics_spark.streaming.core import run_to_memory, stream_from_dir
from openmetrics_spark.streaming.ops import (
    stream_interval_join,
    stream_keep_first,
    stream_session_rollup,
    stream_sliding_counter,
    stream_tumbling_metrics,
)
from openmetrics_spark.streaming.stateful import (
    stream_add_latest_impressions,
    stream_add_latest_impressions_tws,
    stream_combine_delivery_logs,
    stream_combine_delivery_logs_tws,
    stream_cumulate_counter,
    stream_cumulate_counter_tws,
    stream_inferred_join,
    stream_inferred_join_tws,
    stream_last_time_and_count,
    stream_late_split,
    stream_reduce_redundant_impressions,
    stream_reduce_redundant_impressions_tws,
)

__all__ = [
    "run_to_memory",
    "stream_from_dir",
    "stream_add_latest_impressions",
    "stream_add_latest_impressions_tws",
    "stream_combine_delivery_logs",
    "stream_combine_delivery_logs_tws",
    "stream_cumulate_counter",
    "stream_cumulate_counter_tws",
    "stream_reduce_redundant_impressions",
    "stream_reduce_redundant_impressions_tws",
    "stream_inferred_join",
    "stream_inferred_join_tws",
    "stream_interval_join",
    "stream_keep_first",
    "stream_last_time_and_count",
    "stream_late_split",
    "stream_session_rollup",
    "stream_sliding_counter",
    "stream_tumbling_metrics",
]
