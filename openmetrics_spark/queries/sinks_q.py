"""CSV-with-header sink round-trip under the oracle gate (reference:
the forked Flink csv format with a header row,
org/apache/flink/formats/csv/README.md; engine side
sources/sinks.py:write_csv_with_header — VERDICT r7 row 7, previously
pytest-only).

The query computes the daily per-type metric frame the reference's
content-metrics job exports as CSV, WRITES it through the sink, reads
the files back with the declared schema, and returns the read-back
rows — so the driver's hash compare fails if the header/quoting/type
round-trip corrupts anything. All columns are exact (strings + BIGINT
day keys / counts / integer cents), per the registry conventions.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmetrics_spark.queries import register
from openmetrics_spark.sources.sinks import write_csv_with_header
from openmetrics_spark.tables import table

_SCRATCH_ROOT = os.path.join(
    tempfile.gettempdir(), f"omx_csv_sink_{os.getpid()}"
)
atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)

_DAY_MS = 86_400_000

_CSV_ORACLE = f"""
SELECT event_type,
       CAST(epoch_ms(ts) // {_DAY_MS} * {_DAY_MS} AS BIGINT) AS day_ms,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(floor(coalesce(value, 0) * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS value_cents
FROM events
GROUP BY 1, 2
"""


@register("csv_sink_roundtrip", oracle=_CSV_ORACLE, tags=("sink",))
def csv_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type metrics → CSV-with-header sink → read back (see
    module docstring). 100 TB: the sink is a plain partitioned
    ``df.write.csv`` — export-sized aggregates only, like the
    reference's daily CSV job; the round-trip read is the gate, not a
    production path."""
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            (
                F.floor(F.unix_millis("ts") / _DAY_MS).cast("long")
                * F.lit(_DAY_MS)
            ).alias("day_ms"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum(
                F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 100 + 0.5)
                .cast("long")
            )
            .cast("long")
            .alias("value_cents"),
        )
    )
    path = os.path.join(_SCRATCH_ROOT, "daily_metrics")
    shutil.rmtree(path, ignore_errors=True)
    write_csv_with_header(daily, path)
    return (
        spark.read.option("header", True)
        .schema(daily.schema)
        .csv(path)
    )
