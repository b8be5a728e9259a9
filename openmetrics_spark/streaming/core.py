"""Streaming source/sink plumbing.

Sources mirror the reference's Kafka segment (pipeline/.../common/job/
MetricsApiKafkaSource.java:40-120, KafkaSegment.java:141-147): one
typed stream per event type with a bounded-out-of-orderness watermark.
Here the transport is a parquet/json directory for tests (the driver
has no Kafka); ``kafka_source_options`` documents the production wiring
so the same transformations run against ``format("kafka")`` unchanged.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def stream_from_dir(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of immutable files — the
    test/backfill transport. ``maxFilesPerTrigger`` forces multi-batch
    execution so tests exercise cross-batch state."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def kafka_source_options(
    bootstrap: str, topic: str, starting: str = "earliest"
) -> dict[str, str]:
    """Options for the production Kafka source (the reference's
    tracking.event.log-request topic, Constants.java:17-18). Usage:
    ``spark.readStream.format("kafka").options(**kafka_source_options(
    ...)).load()`` then ``from_protobuf(value, ...)`` / ``from_json``.
    """
    return {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
        "startingOffsets": starting,
        # At 100 TB/day scale: cap per-batch intake so micro-batches
        # stay bounded; AQE sizes the shuffles downstream.
        "maxOffsetsPerTrigger": str(10_000_000),
    }


def run_to_memory(
    sdf: DataFrame,
    output_mode: str = "append",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Drain a streaming DataFrame with Trigger.AvailableNow into an
    in-memory table and return it as a batch DataFrame. Deterministic:
    processes everything available, then stops (the test analog of the
    reference's bounded minicluster runs, LPT/common/job/testing/
    BaseJobMiniclusterTest.java)."""
    name = "s" + uuid.uuid4().hex[:12]
    writer = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return sdf.sparkSession.table(name)


def run_foreach_batch(
    sdf: DataFrame,
    fn,
    output_mode: str = "update",
    checkpoint_dir: str | None = None,
) -> None:
    """Drain a stream through a foreachBatch writer (the shape of the
    Redis sink and the Delta/Hudi upsert path: idempotent batch writes,
    reference common/functions/sink/RedisSink.java)."""
    writer = (
        sdf.writeStream.foreachBatch(fn)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
