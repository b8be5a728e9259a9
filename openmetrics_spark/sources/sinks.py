"""File & Kafka sinks.

The reference's S3 sink writes Avro/Parquet bucketed into
``/dt=yyyy-MM-dd/hour=HH`` paths derived from event_api_timestamp
(pipeline/.../common/job/S3FileOutput.java:53-288,
common/functions/DateHourBucketAssigner.java:15-45); its CSV output is
a forked Flink csv format adding a header row (org/apache/flink/
formats/csv/README.md) — Spark has both natively.

Scale notes: dt/hour become REAL partition columns, so downstream
time-range scans prune at the directory level (partition pruning shows
as ``PartitionFilters`` in explain). Writers avoid coalesce(1): file
count per partition = upstream parallelism, which is what a
1000-executor writer wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_dt_hour(df: DataFrame, ts_ms_col: str = "event_api_timestamp") -> DataFrame:
    """Derive dt/hour partition columns from an epoch-millis column
    (UTC), mirroring DateHourBucketAssigner."""
    ts = F.timestamp_millis(F.col(ts_ms_col))
    return df.withColumn("dt", F.date_format(ts, "yyyy-MM-dd")).withColumn(
        "hour", F.date_format(ts, "HH")
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "append",
    ts_ms_col: str | None = "event_api_timestamp",
) -> None:
    """Write dt/hour-partitioned files (parquet or avro — the two
    formats S3FileOutput emits). If ``ts_ms_col`` is None the df must
    already carry dt/hour."""
    out = with_dt_hour(df, ts_ms_col) if ts_ms_col is not None else df
    out.write.format(fmt).partitionBy("dt", "hour").mode(mode).save(path)


def write_csv_with_header(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV with a header row — the reference forked Flink's csv format
    for this (its README: "adding headers"); in Spark it's an option."""
    df.write.option("header", True).mode(mode).csv(path)


def kafka_sink_options(bootstrap: str, topic: str) -> dict[str, str]:
    """Options for the flat-output Kafka sink (the reference's
    metrics.<label>.<dataset>.joined-event etc. topics,
    common/job/FlatOutputKafka.java; names Constants.java:20-23).
    Usage: serialize with ``to_json(struct(*))`` (or to_protobuf) into
    a ``value`` column, then ``df.write/writeStream.format("kafka")
    .options(**kafka_sink_options(...)).save()/start()``."""
    return {"kafka.bootstrap.servers": bootstrap, "topic": topic}


def stream_write_partitioned(
    sdf: DataFrame,
    path: str,
    checkpoint_dir: str,
    fmt: str = "parquet",
    ts_ms_col: str | None = "event_api_timestamp",
):
    """Streaming twin of :func:`write_partitioned` — append-mode file
    sink with checkpointing (the reference rolls files on checkpoint;
    Spark's file sink commits per micro-batch). Returns the started
    StreamingQuery."""
    out = with_dt_hour(sdf, ts_ms_col) if ts_ms_col is not None else sdf
    return (
        out.writeStream.format(fmt)
        .partitionBy("dt", "hour")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def kinesis_metric_envelope(
    df: DataFrame,
    content_col: str,
    platform_col: str,
    dt_col: str,
    event_ts_ms_col: str,
    metric_cols: dict[str, str],
    source_id: str = "Metric",
    message_type: str = "content-metrics",
    version: str = "1.0",
) -> DataFrame:
    """Wrap per-content metric rows in the reference's Kinesis JSON
    envelope (pipeline/.../job/contentmetrics/resources/
    15_create_table_cumulated_content_metrics_kinesis.sql:1-37 +
    16_insert_into_...:1-29): top-level ``dt``/``contentId`` (the
    partition key must be top-level for the connector), a ``header``
    whose ``id`` = dt@platformId@contentId deduplicates replays
    downstream, and a ``body`` carrying the metric struct.

    ``metric_cols`` maps envelope metric names to source columns.
    Pure column expressions — at scale this is a narrow projection on
    whatever aggregate feeds it."""
    content = F.col(content_col).cast("string")
    platform = F.col(platform_col).cast("long")
    header = F.struct(
        F.lit(version).alias("version"),
        F.lit(source_id).alias("sourceId"),
        F.concat_ws("@", F.col(dt_col), platform, content).alias("id"),
        F.lit("TODO").alias("correlationId"),
        platform.alias("platformId"),
        F.lit(message_type).alias("messageType"),
        F.timestamp_millis(F.col(event_ts_ms_col)).alias("eventDateTimestamp"),
    )
    body = F.struct(
        content.alias("contentId"),
        F.struct(
            *[F.col(src).cast("long").alias(name) for name, src in metric_cols.items()]
        ).alias("metrics"),
    )
    return df.select(
        F.col(dt_col).alias("dt"),
        content.alias("contentId"),
        header.alias("header"),
        body.alias("body"),
    )


def to_kinesis_records(enveloped: DataFrame) -> DataFrame:
    """Render envelope rows to the wire shape a Kinesis producer puts:
    (partitionKey, data) with ISO-8601 timestamps in the JSON payload —
    the actual putRecords call is connector territory (boto3/KPL, not
    bundled); everything up to the byte payload is real and tested."""
    return enveloped.select(
        F.col("contentId").alias("partitionKey"),
        F.to_json(
            F.struct("dt", "contentId", "header", "body"),
            {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"},
        ).alias("data"),
    )
