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


# ---------------------------------------------------------------------------
# Broker-less Kafka-contract transport: files carrying the EXACT
# record schema Spark's kafka source produces, so every transformation
# downstream of `.load()` — SetLogTimestamp from the record timestamp,
# from_json decode, 8-way split, watermarks — runs unchanged whether
# the transport is `format("kafka")` or this directory. The sandbox
# has no broker (SURVEY §2.1 row 1); this closes everything but the
# network hop.
# ---------------------------------------------------------------------------

def kafka_record_schema() -> StructType:
    """The Spark kafka source's fixed output schema (key/value binary,
    topic, partition, offset, timestamp, timestampType)."""
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("key", T.BinaryType()),
            T.StructField("value", T.BinaryType()),
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("timestamp", T.TimestampType()),
            T.StructField("timestampType", T.IntegerType()),
        ]
    )


def write_fake_topic(
    records: DataFrame,
    path: str,
    topic: str,
    n_partitions: int = 4,
    ts_col: str | None = None,
) -> None:
    """Publish (key string, value string) rows as a fake topic.

    Mirrors the broker's contract: partition = hash(key) mod N (same
    key → same partition → per-key ordering, the property the
    reference's logUserId-keyed topic relies on,
    MetricsApiKafkaSource.java:40-120); offsets are per-partition
    monotone in timestamp order; ``timestamp`` is the record's ingest
    time (``ts_col`` if given, else now-ish constant) — the stream
    time SetLogTimestamp stamps into log_timestamp."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ts = (
        F.col(ts_col).cast("timestamp")
        if ts_col is not None
        else F.current_timestamp()
    )
    w = Window.partitionBy("partition").orderBy("timestamp", "key", "value")
    out = (
        records.select(
            F.col("key").cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
            F.lit(topic).alias("topic"),
            # pmod, NOT abs(hash) % n: abs(Integer.MIN_VALUE) is still
            # negative in two's complement, and a key hashing exactly
            # there would get a negative partition
            F.pmod(F.hash("key"), F.lit(n_partitions)).cast("int").alias("partition"),
            ts.alias("timestamp"),
            F.lit(0).alias("timestampType"),
        )
        .withColumn("offset", (F.row_number().over(w) - 1).cast("long"))
    )
    # successive producer batches continue each partition's offset
    # sequence from where the topic left off (the broker contract —
    # offsets are monotone per partition across publishes, not per
    # call)
    spark = records.sparkSession
    if os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        prev = (
            spark.read.parquet(path)
            .groupBy("partition")
            .agg(F.max("offset").alias("__base"))
        )
        out = (
            out.join(F.broadcast(prev), "partition", "left")
            .withColumn(
                "offset",
                F.col("offset") + F.coalesce(F.col("__base") + 1, F.lit(0)),
            )
            .drop("__base")
        )
    out = out.select(
        "key", "value", "topic", "partition", "offset",
        "timestamp", "timestampType",
    )
    out.write.mode("append").parquet(path)


def read_fake_topic(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """``spark.readStream.format("kafka")`` stand-in: a streaming
    DataFrame with the exact kafka record schema over the fake topic
    directory. Swap this one call for the real source + option
    builders (:func:`kafka_source_options`) in production."""
    return stream_from_dir(
        spark,
        path,
        kafka_record_schema(),
        max_files_per_trigger=max_files_per_trigger,
    )
