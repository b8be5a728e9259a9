"""Sources & sinks (SURVEY §2.1).

- ``sinks``: dt/hour-partitioned parquet/avro file sinks (the
  reference's S3FileOutput + DateHourBucketAssigner), CSV-with-header
  (its forked csv format — a built-in option here), Kafka sink
  options.
- ``envelope``: the LogRequest envelope splitter — one envelope stream
  → typed per-event streams with envelope-field push-down (the
  reference's LogRequestFilter side outputs + PushDownAndFlatMap).

The Kafka *source* builder lives in ``streaming.core`` next to the
watermark plumbing it feeds.
"""

from openmetrics_spark.sources.envelope import (
    LOG_REQUEST,
    assemble_log_requests,
    decode_log_requests,
    encode_log_requests,
    split_log_requests,
)
from openmetrics_spark.sources.sinks import (
    kafka_sink_options,
    with_dt_hour,
    write_csv_with_header,
    write_partitioned,
)

__all__ = [
    "LOG_REQUEST",
    "assemble_log_requests",
    "decode_log_requests",
    "encode_log_requests",
    "split_log_requests",
    "kafka_sink_options",
    "with_dt_hour",
    "write_csv_with_header",
    "write_partitioned",
]
