"""Upsert-sink correctness query: apply two overlapping batches to a
PK-upsert table and read the table back — the driver's DuckDB oracle
reconstructs Hudi COW last-write-wins semantics in SQL (reference:
common/job/hudi/HudiOutput.java:63-485; sink at
openmetrics_spark/sources/upsert.py).

Semantics under test (exactly the sink's contract):
- last-write-wins per (pk, dt, hour) by the precombine column, with
  ties going to the LATER batch (idempotent replay);
- partition-scoped matching: the same pk in a different dt/hour
  partition inserts rather than migrates;
- batches dedupe internally to the max-precombine row first.

Input rows are pre-collapsed to one per (pk, ms) so every ordering the
sink relies on is total — the oracle reproduces each step closed-form.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmetrics_spark.queries import register
from openmetrics_spark.sources.upsert import UpsertTable
from openmetrics_spark.tables import table

# One scratch root per process, wiped at exit (same pattern as
# streaming_q): each query rebuilds its table under a STABLE subdir
# (wiped first), so repeated sweeps stay bounded and nothing leaks
# into /tmp across verify/test invocations.
_SCRATCH_ROOT = os.path.join(
    tempfile.gettempdir(), f"omx_upsert_work_{os.getpid()}"
)
atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)


def _workdir(name: str) -> str:
    path = os.path.join(_SCRATCH_ROOT, name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    return path

_UPSERT_CTES = """
WITH dedup AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms,
         MAX(event_id) AS event_id
  FROM events
  WHERE ts < TIMESTAMP '2024-01-04 00:00:00'
  GROUP BY user_id, event_type, epoch_ms(ts)
),
parts AS (
  SELECT *, CAST(epoch_ms(ts_ms) AS DATE) AS dt,
         CAST(EXTRACT(hour FROM epoch_ms(ts_ms)) AS INT) AS hour
  FROM dedup
),
w1 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY user_id, event_type, dt, hour ORDER BY ts_ms DESC
    ) AS rn
    FROM parts WHERE event_id % 3 != 0
  ) WHERE rn = 1
),
w2 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY user_id, event_type, dt, hour ORDER BY ts_ms DESC
    ) AS rn
    FROM parts WHERE event_id % 2 = 0
  ) WHERE rn = 1
)
"""

_UPSERT_ORACLE = _UPSERT_CTES + """
SELECT COALESCE(w2.user_id, w1.user_id) AS user_id,
       COALESCE(w2.event_type, w1.event_type) AS event_type,
       COALESCE(w2.dt, w1.dt) AS dt,
       COALESCE(w2.hour, w1.hour) AS hour,
       CASE WHEN w2.ts_ms IS NOT NULL
                 AND (w1.ts_ms IS NULL OR w2.ts_ms >= w1.ts_ms)
            THEN w2.ts_ms ELSE w1.ts_ms END AS ts_ms,
       CASE WHEN w2.ts_ms IS NOT NULL
                 AND (w1.ts_ms IS NULL OR w2.ts_ms >= w1.ts_ms)
            THEN w2.event_id ELSE w1.event_id END AS event_id
FROM w1 FULL OUTER JOIN w2
  ON w1.user_id = w2.user_id AND w1.event_type = w2.event_type
 AND w1.dt = w2.dt AND w1.hour = w2.hour
"""


@register("upsert_two_batches", oracle=_UPSERT_ORACLE, tags=("sink",))
def upsert_two_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two overlapping event batches through the COW upsert sink; the
    read-back table must equal the closed-form last-write-wins state."""
    ev = table(spark, sf_dir, "events").filter(
        # first 3 days only: bounds the upsert to ~72 dt/hour
        # partitions (the sink's unit of rewrite)
        F.col("ts") < F.lit("2024-01-04 00:00:00").cast("timestamp")
    )
    dedup = (
        ev.select(
            "user_id",
            "event_type",
            F.unix_millis("ts").alias("ts_ms"),
            "event_id",
        )
        .groupBy("user_id", "event_type", "ts_ms")
        .agg(F.max("event_id").alias("event_id"))
    )
    b1 = dedup.filter(F.col("event_id") % 3 != 0)
    b2 = dedup.filter(F.col("event_id") % 2 == 0)
    path = _workdir("cow") + "/t"
    t = UpsertTable(path, ["user_id", "event_type"], "ts_ms")
    t.upsert(b1)
    t.upsert(b2)
    return t.read(spark).select(
        "user_id", "event_type", "dt", F.col("hour").cast("int").alias("hour"),
        "ts_ms", "event_id",
    )


@register("upsert_mor_snapshot", oracle=_UPSERT_ORACLE, tags=("sink",))
def upsert_mor_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same two batches through the MERGE-ON-READ table — the type
    the reference deploys (HudiOutput.java:425): batch 1 is compacted
    into the base, batch 2 stays in the delta log, and the SNAPSHOT
    read (base + log window-merged) must equal the COW table's state —
    i.e. the exact oracle of ``upsert_two_batches``. Proves the MOR
    write path (O(batch) append, no table read), the compaction
    rewrite, and the read-path merge agree with copy-on-write."""
    from openmetrics_spark.sources.upsert import MorUpsertTable

    ev = table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-04 00:00:00").cast("timestamp")
    )
    dedup = (
        ev.select(
            "user_id",
            "event_type",
            F.unix_millis("ts").alias("ts_ms"),
            "event_id",
        )
        .groupBy("user_id", "event_type", "ts_ms")
        .agg(F.max("event_id").alias("event_id"))
    )
    b1 = dedup.filter(F.col("event_id") % 3 != 0)
    b2 = dedup.filter(F.col("event_id") % 2 == 0)
    path = _workdir("mor") + "/t"
    t = MorUpsertTable(path, ["user_id", "event_type"], "ts_ms")
    t.upsert(b1)
    t.compact(spark)  # b1 becomes the base file set
    t.upsert(b2)  # b2 rides the delta log
    return t.read_snapshot(spark).select(
        "user_id", "event_type", "dt", F.col("hour").cast("int").alias("hour"),
        "ts_ms", "event_id",
    )


_UPSERT_INC_ORACLE = _UPSERT_CTES + """
SELECT w2.user_id, w2.event_type, w2.dt, w2.hour, w2.ts_ms, w2.event_id
FROM w2 LEFT JOIN w1
  ON w1.user_id = w2.user_id AND w1.event_type = w2.event_type
 AND w1.dt = w2.dt AND w1.hour = w2.hour
WHERE w1.ts_ms IS NULL OR w2.ts_ms >= w1.ts_ms
"""


@register("upsert_incremental_pull", oracle=_UPSERT_INC_ORACLE, tags=("sink",))
def upsert_incremental_pull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (CDC-style) pull from the MOR table: after batch 1
    (commit 1, compacted into the base) and batch 2 (commit 2, in the
    delta log), ``read_incremental(1)`` must return exactly the live
    row versions batch 2 won — what a downstream sync would apply.
    The oracle is the closed form of "batch-2 rows that win the
    last-write-wins tie against batch 1"."""
    from openmetrics_spark.sources.upsert import MorUpsertTable

    ev = table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-04 00:00:00").cast("timestamp")
    )
    dedup = (
        ev.select(
            "user_id",
            "event_type",
            F.unix_millis("ts").alias("ts_ms"),
            "event_id",
        )
        .groupBy("user_id", "event_type", "ts_ms")
        .agg(F.max("event_id").alias("event_id"))
    )
    b1 = dedup.filter(F.col("event_id") % 3 != 0)
    b2 = dedup.filter(F.col("event_id") % 2 == 0)
    path = _workdir("inc") + "/t"
    t = MorUpsertTable(path, ["user_id", "event_type"], "ts_ms")
    t.upsert(b1)
    t.compact(spark)
    t.upsert(b2)
    return t.read_incremental(spark, 1).select(
        "user_id", "event_type", "dt", F.col("hour").cast("int").alias("hour"),
        "ts_ms", "event_id",
    )


@register("upsert_time_travel", oracle=_UPSERT_ORACLE, tags=("sink",))
def upsert_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) read of the MOR table: after batch
    1 (commit 1), batch 2 (commit 2), a COMPACTION, and batch 3
    (commit 3), ``read_as_of(2)`` must reproduce the exact b1+b2
    last-write-wins state — i.e. the SAME oracle as
    ``upsert_two_batches`` — even though the table has since absorbed
    another commit and the compaction rewrote the base (surviving
    rows keep per-row ``__commit`` provenance, so the as-of filter
    still cuts correctly). States OLDER than the compaction watermark
    are physically gone and ``read_as_of`` refuses them
    (tests/test_upsert.py pins the refusal)."""
    from openmetrics_spark.sources.upsert import MorUpsertTable

    ev = table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-04 00:00:00").cast("timestamp")
    )
    dedup = (
        ev.select(
            "user_id",
            "event_type",
            F.unix_millis("ts").alias("ts_ms"),
            "event_id",
        )
        .groupBy("user_id", "event_type", "ts_ms")
        .agg(F.max("event_id").alias("event_id"))
    )
    b1 = dedup.filter(F.col("event_id") % 3 != 0)
    b2 = dedup.filter(F.col("event_id") % 2 == 0)
    # b3 rewrites a fifth of the keys with a LATER precombine (+1 ms
    # keeps nearly all rows in their original dt/hour partition, so
    # they'd WIN a snapshot read) — rows read_as_of(2) must NOT see
    b3 = dedup.filter(F.col("event_id") % 5 == 0).withColumn(
        "ts_ms", F.col("ts_ms") + F.lit(1)
    )
    path = _workdir("tt") + "/t"
    t = MorUpsertTable(path, ["user_id", "event_type"], "ts_ms")
    t.upsert(b1)
    t.upsert(b2)
    t.compact(spark)  # watermark = 2: older states discarded
    t.upsert(b3)
    return t.read_as_of(spark, 2).select(
        "user_id", "event_type", "dt", F.col("hour").cast("int").alias("hour"),
        "ts_ms", "event_id",
    )
