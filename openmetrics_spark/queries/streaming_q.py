"""Streaming pipelines surfaced as driver-checkable queries.

The streaming twins are proven stream=batch by the pytest suite; these
entries put the same claim in the driver's DuckDB oracle gate: each
query runs a REAL Structured Streaming pipeline (file source staged
into ordered time slices + a far-future sentinel that flushes every
watermark, multi-batch via maxFilesPerTrigger, checkpointed) to
completion, reads the sink back, and returns it — and the oracle
recomputes the same result relationally. On bounded input with the
sentinel flush, event-time streaming semantics are exactly the batch
semantics, so the hash must match bit-for-bit.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmetrics_spark.jobs.streaming_flat_output import (
    _drain,
    _restage,
    _stream,
)
from openmetrics_spark.functions.money import exact_sum, exact_units
from openmetrics_spark.queries import register
from openmetrics_spark.tables import literal_df, pin, table

HOUR_MS = 3_600_000

# One scratch root per process, wiped at interpreter exit: each query
# re-stages the events table plus a checkpoint + sink under here, and
# the old one-mkdtemp-per-call pattern leaked all of it into /tmp on
# every verify/test invocation. Re-running a query in the same process
# first wipes its own subdir, so repeated sweeps stay bounded too; the
# PID suffix keeps concurrent verify processes from colliding.
_SCRATCH_ROOT = os.path.join(
    tempfile.gettempdir(), f"omx_stream_work_{os.getpid()}"
)
atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)


def _workdir(name: str) -> str:
    path = os.path.join(_SCRATCH_ROOT, name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    return path


@contextmanager
def _stream_shuffle_partitions(spark: SparkSession, n: int = 8):
    """Scope the state-partition count to the stream being run.

    Structured Streaming pins the stateful-operator partition count to
    spark.sql.shuffle.partitions at the checkpoint's FIRST batch — it
    is a per-pipeline sizing decision (state partitions ≈ keys ×
    throughput), not a cluster constant. These replay pipelines carry
    O(thousands) of keys, where 32 partitions are pure per-batch fixed
    overhead (state-store load/commit + a Python worker round-trip per
    partition per micro-batch): 8 measured ~30% faster end-to-end at
    sf0.1 with identical results. Batch queries in the same session
    are unaffected — the conf is restored on exit."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


# every streaming query slices the same events table on the same
# half-of-span grid; the (lo, hi) scan is one full-table aggregate
# per call, so memoize it per sf_dir for the life of the process.
# Two slices + the sentinel = three micro-batches: state still has to
# survive a batch boundary and finalize against a mid-stream watermark
# (the multi-batch claim), while each extra slice would only re-buy
# the same evidence for another round of fixed per-batch cost
# (state-store load/commit + a Python worker round-trip per
# partition).
_GRID_CACHE: dict[str, list[int]] = {}


def _events_grid(
    spark: SparkSession, sf_dir: str, ev: DataFrame | None = None
) -> list[int]:
    """Slice boundaries for staged replay, derived from the FULL
    events span (never a caller's filtered frame — the memo is keyed
    by sf_dir alone, so a filtered span would leak into every other
    query's staging and make the layout execution-order dependent;
    any subset is still partitioned correctly by the full-span
    boundaries). The ``ev`` parameter is accepted for call-site
    symmetry and ignored."""
    grid = _GRID_CACHE.get(sf_dir)
    if grid is None:
        lo, hi = _events_span(spark, sf_dir)
        grid = [lo + (hi - lo) // 2]
        _GRID_CACHE[sf_dir] = grid
    return grid


_SPAN_CACHE: dict[str, tuple[int, int]] = {}


def _events_span(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    """(min, max) epoch-millis of the full events table, memoized —
    the slice grid and any full-lookback window derive from it."""
    span = _SPAN_CACHE.get(sf_dir)
    if span is None:
        full = table(spark, sf_dir, "events")
        lo, hi = full.agg(
            F.min(F.unix_millis("ts")), F.max(F.unix_millis("ts"))
        ).first()
        span = (int(lo), int(hi))
        _SPAN_CACHE[sf_dir] = span
    return span


def _staged_events(spark: SparkSession, sf_dir: str, work: str) -> str:
    """Stage the events table as an ordered multi-slice file stream
    keyed by a string content id (user_id stands in for content)."""
    ev = table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("content_id"),
        "ts",
        "event_type",
        "value",
        F.unix_millis("ts").alias("ms"),
    )
    grid = _events_grid(spark, sf_dir, ev)
    path = os.path.join(work, "events")
    _restage(spark, ev, path, "ms", grid, sentinel=True)
    return path


_STREAM_HOURLY_ORACLE = f"""
SELECT CAST(user_id AS VARCHAR) AS content_id,
       (epoch_ms(ts) // {HOUR_MS}) * {HOUR_MS} AS window_start_ms,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
         AS views,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
         AS navigates,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         AS purchases,
       CAST(SUM(CAST(floor((CASE WHEN event_type = 'purchase' THEN value
                                  ELSE 0 END) * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS gmv_usd_cents
FROM events
GROUP BY 1, 2
"""


@register(
    "streaming_hourly_content_metrics",
    oracle=_STREAM_HOURLY_ORACLE,
    tags=("streaming", "metrics"),
)
def streaming_hourly_content_metrics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The content-metrics hourly tumble executed as an actual
    Structured Streaming query (watermark + tumbling window +
    checkpoint, multi-batch file source) — the oracle recomputes it
    relationally, so a watermark/flush bug that drops or double-counts
    any window fails the hash compare, not just a unit test."""
    from openmetrics_spark.jobs.streaming_content_metrics import _metric_aggs
    from openmetrics_spark.streaming.ops import stream_tumbling_metrics

    work = _workdir("hourly")
    staged = _staged_events(spark, sf_dir, work)
    agg = stream_tumbling_metrics(
        _stream(spark, staged),
        ["content_id"],
        "ts",
        HOUR_MS,
        _metric_aggs(),
        delay_ms=2000,
    )
    out = os.path.join(work, "hourly")
    with _stream_shuffle_partitions(spark):
        _drain(agg, out, os.path.join(work, "_chk", "hourly"))
    return (
        spark.read.parquet(out)
        .filter(~F.col("content_id").contains("zz"))
        .select(
            "content_id",
            "window_start_ms",
            "views",
            "navigates",
            "purchases",
            "gmv_usd_cents",
        )
    )


_STREAM_DEDUP_ORACLE = """
SELECT user_id, event_type,
       (epoch_ms(ts) // 86400000) * 86400000 AS day_ms,
       min(epoch_ms(ts)) AS first_ms,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY 1, 2, 3
"""


@register(
    "streaming_keep_first",
    oracle=_STREAM_DEDUP_ORACLE,
    tags=("streaming", "dedup"),
)
def streaming_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KeepFirstRow as a watermarked streaming aggregation: per
    (user, type, day window), the first event time plus the count of
    arrivals it suppressed — a real multi-batch checkpointed streaming
    query (append mode requires the event-time window in the grouping,
    which is also exactly how the reference scopes dedup state to a
    time range), verified against the relational min/count. State is
    one row per open (key, window), closed by the watermark one delay
    after each day ends — the sentinel flush stands in for the
    steady stream that closes windows in production."""
    work = _workdir("keep_first")
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "ts",
        F.unix_millis("ts").alias("ms"),
    )
    grid = _events_grid(spark, sf_dir, ev)
    staged = os.path.join(work, "events")
    _restage(spark, ev, staged, "ms", grid, sentinel=True)
    agg = (
        _stream(spark, staged)
        .withWatermark("ts", "2 seconds")
        .groupBy(F.window("ts", "1 day").alias("__w"), "user_id", "event_type")
        .agg(
            F.min("ms").alias("first_ms"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            "event_type",
            F.unix_millis("__w.start").alias("day_ms"),
            "first_ms",
            "n_events",
        )
    )
    out = os.path.join(work, "kept")
    with _stream_shuffle_partitions(spark):
        _drain(agg, out, os.path.join(work, "_chk", "kept"))
    kept = spark.read.parquet(out)
    # the sentinel row (far-future flush) carries a synthetic key
    return kept.filter(
        ~F.col("event_type").contains("zz") & (F.col("user_id") >= 0)
    ).select("user_id", "event_type", "day_ms", "first_ms", "n_events")


_STREAM_SLIDING_ORACLE = """
WITH b AS (
  SELECT user_id, (epoch_ms(ts) // 900000) * 900000 AS bucket_ms,
         count(*) AS bn
  FROM events
  GROUP BY 1, 2
)
SELECT user_id, bucket_ms + i * 900000 AS emit_ms,
       CAST(sum(bn) AS BIGINT) AS n
FROM b, range(1, 5) r(i)
GROUP BY 1, 2
"""


@register(
    "streaming_sliding_counter",
    oracle=_STREAM_SLIDING_ORACLE,
    tags=("streaming", "counter"),
)
def streaming_sliding_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SlidingHourlyCounter as a real streaming query: trailing 1 h
    count per user at every 15 m boundary via the built-in sliding
    window (each event expands into 4 overlapping windows map-side,
    partial-aggregated before the key shuffle), drained through the
    staged multi-batch file source and hash-compared against the same
    relational expansion the batch query oracles with. The streaming
    twin's windows only emit once the watermark closes them, so this
    row-for-row equality IS the watermark-correctness claim."""
    from openmetrics_spark.streaming.ops import stream_sliding_counter

    work = _workdir("sliding")
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", F.unix_millis("ts").alias("ms")
    )
    grid = _events_grid(spark, sf_dir, ev)
    staged = os.path.join(work, "events")
    _restage(spark, ev, staged, "ms", grid, sentinel=True)
    agg = stream_sliding_counter(
        _stream(spark, staged),
        ["user_id"],
        "ts",
        window_ms=3_600_000,
        slide_ms=900_000,
        delay_ms=2000,
    )
    out = os.path.join(work, "n")
    with _stream_shuffle_partitions(spark):
        _drain(agg, out, os.path.join(work, "_chk", "n"))
    return (
        spark.read.parquet(out)
        .filter(F.col("user_id") >= 0)
        .select("user_id", "emit_ms", "n")
    )


_STREAM_CUMULATE_ORACLE = """
WITH h AS (
  SELECT user_id, (epoch_ms(ts) // 3600000) * 3600000 AS window_ms,
         count(*) AS ne
  FROM events
  GROUP BY 1, 2
)
SELECT (window_ms // 86400000) * 86400000 AS period_ms, window_ms, user_id,
       CAST(sum(ne) OVER (
         PARTITION BY user_id, window_ms // 86400000 ORDER BY window_ms
       ) AS BIGINT) AS n
FROM h
"""


@register(
    "streaming_cumulate_hourly",
    oracle=_STREAM_CUMULATE_ORACLE,
    headline=True,
    tags=("streaming", "metrics"),
)
def streaming_cumulate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink's CUMULATE window — the shape Spark lacks natively — as
    the custom `applyInPandasWithState` state machine, run as a real
    streaming query and hash-compared against the relational running
    sum. This is the hardest operator in the streaming surface (timer
    emulation, step finalization at the watermark, O(open steps)
    state), so putting its sink in the oracle gate is the strongest
    single correctness claim the streaming side makes."""
    from openmetrics_spark.streaming.stateful import stream_cumulate_counter

    work = _workdir("cumulate")
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", F.unix_millis("ts").alias("ms")
    )
    grid = _events_grid(spark, sf_dir, ev)
    staged = os.path.join(work, "events")
    _restage(spark, ev, staged, "ms", grid, sentinel=True)
    cum = stream_cumulate_counter(
        _stream(spark, staged),
        key_col="user_id",
        ts_col="ts",
        step_ms=3_600_000,
        period_ms=86_400_000,
        delay_ms=2000,
    )
    out = os.path.join(work, "cum")
    with _stream_shuffle_partitions(spark):
        _drain(cum, out, os.path.join(work, "_chk", "cum"))
    return (
        spark.read.parquet(out)
        .filter(F.col("key") >= 0)
        .select(
            "period_ms", "window_ms", F.col("key").alias("user_id"), "n"
        )
    )


def _drain_updates(sdf: DataFrame, path: str, chk: str) -> None:
    """Drain an UPDATE-mode stateful stream by appending each
    micro-batch's emissions to parquet via foreachBatch — the same
    idempotent-append pattern the counter job's Redis writer uses
    (replays tolerated because downstream takes the latest per key)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(path)

    q = (
        sdf.writeStream.foreachBatch(write)
        .option("checkpointLocation", chk)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_WEEK_MS = 604_800_000
_MIN15_MS = 900_000

_STREAM_LTC_ORACLE = f"""
WITH b AS (
  SELECT user_id, epoch_ms(ts) AS ms,
         (epoch_ms(ts) // {_MIN15_MS}) * {_MIN15_MS} AS bucket
  FROM events
), a AS (
  SELECT user_id, max(ms) AS last_ms FROM b GROUP BY 1
)
SELECT b.user_id, a.last_ms,
       CAST(sum(CASE WHEN b.bucket > a.last_ms - {_WEEK_MS}
                      AND b.bucket <= a.last_ms THEN 1 ELSE 0 END)
            AS BIGINT) AS n_horizon
FROM b JOIN a USING (user_id)
GROUP BY 1, 2
"""


@register(
    "streaming_last_time_and_count",
    oracle=_STREAM_LTC_ORACLE,
    tags=("streaming", "counter"),
)
def streaming_last_time_and_count(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LastTimeAndCount — per key, last event time + trailing-window
    count in bucket-granular substate — run as the real
    applyInPandasWithState machine in update mode, drained through
    foreachBatch, with the LAST emission per key (max last_ms)
    hash-compared against the relational anchor-trailing count. The
    bucket-granular horizon (15 m buckets, 1 w window) mirrors the
    reference's day-granular 90 d substate exactly."""
    from openmetrics_spark.streaming.stateful import stream_last_time_and_count

    work = _workdir("ltc")
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", F.unix_millis("ts").alias("ms")
    )
    grid = _events_grid(spark, sf_dir, ev)
    staged = os.path.join(work, "events")
    _restage(spark, ev, staged, "ms", grid, sentinel=True)
    updates = stream_last_time_and_count(
        _stream(spark, staged),
        "user_id",
        "ts",
        bucket_ms=_MIN15_MS,
        horizon_ms=_WEEK_MS,
        delay_ms=2000,
    )
    out = os.path.join(work, "ltc")
    with _stream_shuffle_partitions(spark):
        _drain_updates(updates, out, os.path.join(work, "_chk", "ltc"))
    final = (
        spark.read.parquet(out)
        .filter(F.col("key") >= 0)
        .groupBy("key")
        .agg(F.max_by(F.struct("last_ms", "n_horizon"), "last_ms").alias("s"))
    )
    return final.select(
        F.col("key").alias("user_id"), F.col("s.last_ms").alias("last_ms"),
        F.col("s.n_horizon").alias("n_horizon"),
    )


def _inferred_oracle() -> str:
    from openmetrics_spark.queries.events_q import _INFERRED_ORACLE

    return _INFERRED_ORACLE


@register(
    "streaming_inferred_attribution",
    oracle=_inferred_oracle(),
    tags=("streaming", "join"),
)
def streaming_inferred_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The BaseInferred state machine — scope-fallback (user, k) →
    (user) nearest-prior-view attribution of clicks — run as the real
    transform-with-state streaming twin over the staged multi-batch
    source, sharing the BATCH query's DuckDB oracle: on in-order
    bounded replay the watermark-driven decisions equal the batch
    nearest-pick exactly (the suite's parity test pins the same
    claim), so the flagship custom streaming operator sits in the
    driver's hash-compare gate, not just pytest. A far-future sentinel
    VIEW advances the union watermark so every pending click decides."""
    from openmetrics_spark.jobs.streaming_flat_output import SENTINEL_MS
    from openmetrics_spark.streaming import stream_inferred_join

    work = _workdir("inferred")
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            "ts",
            F.get_json_object("props", "$.k").alias("k"),
            F.unix_millis("ts").alias("ms"),
        )
    )
    grid = _events_grid(spark, sf_dir, ev)
    staged = os.path.join(work, "events")
    _restage(spark, ev, staged, "ms", grid, sentinel=False)
    # sentinel VIEW (not the generic 'zz' row): it must survive the
    # event_type filter to advance the single union watermark
    literal_df(
        spark,
        [(999_999_999, -1, "view", SENTINEL_MS)],
        "event_id LONG, user_id LONG, event_type STRING, ms LONG",
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.timestamp_millis(F.col("ms")).alias("ts"),
        F.lit(None).cast("string").alias("k"),
        "ms",
    ).coalesce(1).write.mode("append").parquet(staged)

    s = _stream(spark, staged)
    joined = stream_inferred_join(
        s.filter(F.col("event_type") == "view"),
        s.filter(F.col("event_type") == "click"),
        user_col="user_id",
        left_id_col="event_id",
        right_id_col="event_id",
        left_ts_col="ts",
        right_ts_col="ts",
        scope_cols=("k",),
        window_before_ms=600_000,
        window_after_ms=0,
        delay_ms=2000,
    )
    out = os.path.join(work, "attributed")
    with _stream_shuffle_partitions(spark):
        _drain(joined, out, os.path.join(work, "_chk", "attributed"))
    return (
        spark.read.parquet(out)
        .filter(~F.col("late") & (F.col("u") >= 0))
        .select(
            F.col("right_id").alias("click_id"),
            F.col("u").alias("user_id"),
            F.col("right_ms").alias("click_ms"),
            F.col("left_id").alias("view_id"),
            F.col("left_ms").alias("view_ms"),
        )
    )


def _session_oracle() -> str:
    from openmetrics_spark.queries.events_q import _SESSION_ORACLE

    return _SESSION_ORACLE


@register(
    "streaming_session_rollup",
    oracle=_session_oracle(),
    tags=("streaming", "session"),
)
def streaming_session_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30 m-gap session windows as a real streaming aggregation
    (`session_window` + watermark, append mode — sessions emit when
    the watermark passes their close), sharing the batch query's
    oracle: gap-merge semantics are identical, and reporting the
    observed min/max event time (not the window bounds, which pad the
    gap) makes the rollup row bit-identical to the relational
    lag-based sessionization."""
    work = _workdir("sessions")
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "value", F.unix_millis("ts").alias("ms")
    )
    grid = _events_grid(spark, sf_dir, ev)
    staged = os.path.join(work, "events")
    _restage(spark, ev, staged, "ms", grid, sentinel=True)
    agg = (
        _stream(spark, staged)
        .withWatermark("ts", "2 seconds")
        .groupBy(
            F.session_window("ts", "30 minutes").alias("__w"), "user_id"
        )
        .agg(
            F.min("ms").alias("session_start_ms"),
            F.max("ms").alias("session_end_ms"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(exact_sum(F.col("value"), 100), 2).alias("total_value"),
        )
    )
    out = os.path.join(work, "sessions")
    with _stream_shuffle_partitions(spark):
        _drain(agg, out, os.path.join(work, "_chk", "sessions"))
    return (
        spark.read.parquet(out)
        .filter(F.col("user_id") >= 0)
        .select(
            "user_id",
            "session_start_ms",
            "session_end_ms",
            "n_events",
            "total_value",
        )
    )


_STREAM_INTERVAL_ORACLE = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, epoch_ms(ts) AS purchase_ms
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id AS click_id, user_id AS cuser, epoch_ms(ts) AS click_ms
  FROM events WHERE event_type = 'click'
)
SELECT purchase_id, user_id, purchase_ms, click_id, click_ms
FROM p JOIN c
  ON user_id = cuser
 AND click_ms >= purchase_ms - 3600000 AND click_ms < purchase_ms
"""


@register(
    "streaming_interval_join",
    oracle=_STREAM_INTERVAL_ORACLE,
    tags=("streaming", "join"),
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (§2.7): purchases × the same
    user's clicks in the trailing hour, as a REAL watermarked
    stream-stream inner join — both sides' state bounded by the
    watermark plus the hour range, the canonical Spark replacement
    for the reference's interval-joined event pairs. Inner interval
    joins emit exactly the matching pairs, so the hash compare against
    the relational join is exact."""
    work = _workdir("interval")
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts",
        F.unix_millis("ts").alias("ms"),
    )
    grid = _events_grid(spark, sf_dir, ev)
    staged = os.path.join(work, "events")
    _restage(spark, ev, staged, "ms", grid, sentinel=True)
    s = _stream(spark, staged)
    purchases = (
        s.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("pts"),
            F.col("ms").alias("purchase_ms"),
        )
        .withWatermark("pts", "2 seconds")
    )
    clicks = (
        s.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("cuser"),
            F.col("ts").alias("cts"),
            F.col("ms").alias("click_ms"),
        )
        .withWatermark("cts", "2 seconds")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("cuser"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("cts") < F.col("pts")),
        "inner",
    ).select("purchase_id", "user_id", "purchase_ms", "click_id", "click_ms")
    out = os.path.join(work, "pairs")
    with _stream_shuffle_partitions(spark):
        _drain(joined, out, os.path.join(work, "_chk", "pairs"))
    return spark.read.parquet(out).filter(F.col("user_id") >= 0)


def _lookup_oracle() -> str:
    from openmetrics_spark.queries.events_q import _CONTENT_LOOKUP_ORACLE

    return _CONTENT_LOOKUP_ORACLE


@register(
    "streaming_content_lookup",
    oracle=_lookup_oracle(),
    tags=("streaming", "enrich"),
)
def streaming_content_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Content-API lookup as the reference actually runs it — a
    STREAMING enrichment through a long-lived cached client
    (ContentApiSegment.java:81-180: AsyncDataStream + 50k-entry cache)
    — sharing the batch broadcast-join query's DuckDB oracle. The
    fact stream flows through Arrow-batched ``mapInPandas`` where each
    python worker holds one cache across micro-batches (the
    per-operator client analog), so the enrichment shuffles nothing;
    the catalog here is the same documents dimension the batch query
    broadcasts, loaded once per worker. Row-for-row equality with the
    relational join is the correctness claim for the cache path."""
    from pyspark.sql import types as T

    from openmetrics_spark.operators.content_lookup import (
        DictContentLoader,
        lookup_enrich,
    )

    # the catalog dimension: documents doc_id < 100 (same as the batch
    # query's broadcast side) — bounded, so driver-side collect is the
    # "service" a real deployment would answer over HTTP
    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    catalog = {
        int(r["doc_id"]): {"lang": r["lang"], "source": r["source"]}
        for r in docs.select("doc_id", "lang", "source").collect()
    }

    work = _workdir("content_lookup")
    ev = table(spark, sf_dir, "events").select(
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        "value",
        "ts",
        F.unix_millis("ts").alias("ms"),
    )
    grid = _events_grid(spark, sf_dir, ev)
    staged = os.path.join(work, "events")
    _restage(spark, ev, staged, "ms", grid, sentinel=False)
    enriched = lookup_enrich(
        _stream(spark, staged),
        "k",
        [("lang", T.StringType()), ("source", T.StringType())],
        DictContentLoader(catalog),
        # key by sf_dir too: the worker-singleton cache outlives a
        # query, and a later run against a different dataset must not
        # be served this catalog's cached rows
        cache_key=f"stream_lookup_{os.getpid()}_{sf_dir}",
    )
    out = os.path.join(work, "enriched")
    with _stream_shuffle_partitions(spark):
        _drain(enriched, out, os.path.join(work, "_chk", "enriched"))
    return (
        spark.read.parquet(out)
        .filter(F.col("lang").isNotNull())
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                exact_sum(F.col("value"), 100) / F.count(F.lit(1)), 6
            ).alias("avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# streaming_top_event_types — TopNEmitter's membership-update stream
# ---------------------------------------------------------------------------

# The prefixes MUST mirror _events_grid's slice boundaries: one
# half-of-span cut → two staged slices → two micro-batches, so the
# membership diff replays exactly two cumulative prefixes. (This
# oracle went red at sf0.01 when the grid moved from thirds to halves
# while the SQL still modeled three prefixes — the slice grid is part
# of this query's contract.)
_TOPN_PREFIXES_SQL = """
WITH b AS (
  SELECT min(epoch_ms(ts)) AS lo, max(epoch_ms(ts)) AS hi FROM events
), bounds AS (
  SELECT lo + (hi - lo) // 2 AS b1 FROM b
), e AS (
  SELECT event_type, epoch_ms(ts) AS ms FROM events
)"""


def _topn_prefix(k: int) -> str:
    where = {
        0: "WHERE ms < (SELECT b1 FROM bounds)",
        1: "",
    }[k]
    return f"""t{k} AS (
  SELECT event_type, count(*) AS c FROM e {where} GROUP BY 1
), top{k} AS (
  SELECT event_type FROM (
    SELECT event_type, row_number() OVER (ORDER BY c DESC, event_type) AS rn
    FROM t{k}
  ) WHERE rn <= 3
)"""


_STREAM_TOPN_ORACLE = (
    _TOPN_PREFIXES_SQL
    + ", "
    + ", ".join(_topn_prefix(k) for k in range(2))
    + """
SELECT CAST(0 AS BIGINT) AS batch_id, event_type, true AS keep FROM top0
UNION ALL
SELECT 1, event_type, true FROM top1
WHERE event_type NOT IN (SELECT event_type FROM top0)
UNION ALL
SELECT 1, event_type, false FROM top0
WHERE event_type NOT IN (SELECT event_type FROM top1)
"""
)


@register(
    "streaming_top_event_types",
    oracle=_STREAM_TOPN_ORACLE,
    tags=("streaming", "counter"),
)
def streaming_top_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TopNEmitter (counter/TopNEmitter.java:20-26) as a REAL streaming
    query: a complete-mode count aggregation feeds foreachBatch, which
    diffs the top-3 membership against the previous batch and appends
    only the (batch_id, element, keep) CHANGES — the reference's
    "update stream for broadcast state" shape, which is what keeps the
    data volume broadcastable. Driver state is the n-element previous
    membership set (the same bounded state the reference broadcasts);
    the per-batch collect is the aggregated counts frame — one row per
    distinct element, never raw events. The oracle replays the three
    deterministic slice prefixes relationally."""
    work = _workdir("topn")
    ev = table(spark, sf_dir, "events").select(
        "event_type", "ts", F.unix_millis("ts").alias("ms")
    )
    grid = _events_grid(spark, sf_dir)
    staged = os.path.join(work, "events")
    _restage(spark, ev, staged, "ms", grid, sentinel=False)
    counts = _stream(spark, staged).groupBy("event_type").count()
    out = os.path.join(work, "changes")
    state = {"prev": set()}

    def emit(batch_df: DataFrame, bid: int) -> None:
        ranked = sorted(
            ((r["count"], r["event_type"]) for r in batch_df.collect()),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        cur = {et for _, et in ranked}
        recs = [(bid, et, True) for _, et in ranked if et not in state["prev"]]
        recs += [(bid, et, False) for et in sorted(state["prev"] - cur)]
        if recs:
            literal_df(
                spark, recs, "batch_id long, event_type string, keep boolean"
            ).coalesce(1).write.mode("append").parquet(out)
        state["prev"] = cur

    with _stream_shuffle_partitions(spark):
        q = (
            counts.writeStream.foreachBatch(emit)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(work, "_chk", "topn"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(out)


# ---------------------------------------------------------------------------
# streaming_user_asof_join — TemporalJoinFunction's streaming as-of
# ---------------------------------------------------------------------------


def _user_asof_oracle() -> str:
    from openmetrics_spark.queries.users_q import _USER_JOIN_ORACLE

    return _USER_JOIN_ORACLE


@register(
    "streaming_user_asof_join",
    oracle=_user_asof_oracle(),
    tags=("streaming", "join", "user"),
)
def streaming_user_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TemporalJoinFunction (reference: common/functions/
    TemporalJoinFunction.java:77-87 — the RocksDB-backed event-time
    as-of the UserJoin runs on) as a REAL streaming query sharing the
    BATCH user_versioned_join's oracle: the folded user VERSIONS and
    the click stream replay through the nearest-prior state machine
    (with the lookback window spanning the whole stream, nearest-
    in-time ≡ latest-at-or-before, i.e. exactly ASOF), and the paired
    version ids re-attach their merged fields on read-back. The
    reference keeps only the latest version per key forever; the
    buffer here holds versions within the lookback — same answer on
    any lookback ≥ the key's update gap, and the bounded-state story
    (evict below watermark − lookback) is unchanged."""
    from openmetrics_spark.jobs.streaming_flat_output import SENTINEL_MS
    from openmetrics_spark.operators.joins import effective_users
    from openmetrics_spark.queries.users_q import (
        derive_clicks,
        derive_user_updates,
    )
    from openmetrics_spark.streaming import stream_inferred_join

    work = _workdir("userasof")
    ev = table(spark, sf_dir, "events")
    upd = derive_user_updates(ev)
    fields = ["user_id", "is_internal_user", "ignore_usage", "properties_json"]
    eff = effective_users(
        upd, ("platform_id", "log_user_id"),
        ts_col="log_timestamp", order_col="event_id",
    )
    from pyspark.sql import Window

    wv = Window.partitionBy("platform_id", "log_user_id", "log_timestamp").orderBy(
        F.col("event_id").desc()
    )
    vers = (
        eff.withColumn("__vn", F.row_number().over(wv))
        .filter(F.col("__vn") == 1)
        .drop("__vn")
    )
    # one staged source, two sides: version rows ('v') and clicks ('c')
    v_rows = vers.select(
        F.lit("v").alias("side"),
        F.col("event_id").alias("id"),
        "uid",
        F.timestamp_millis("log_timestamp").alias("ts"),
        F.col("log_timestamp").alias("ms"),
    )
    c_rows = derive_clicks(ev).select(
        F.lit("c").alias("side"),
        F.col("click_id").alias("id"),
        "uid",
        "ts",
        F.unix_millis("ts").alias("ms"),
    )
    staged = os.path.join(work, "events")
    grid = _events_grid(spark, sf_dir)
    _restage(spark, v_rows.unionByName(c_rows), staged, "ms", grid, sentinel=False)
    # far-future sentinel VERSION row flushes every pending click
    literal_df(
        spark,
        [("v", 999_999_999, -1, SENTINEL_MS)],
        "side STRING, id LONG, uid LONG, ms LONG",
    ).select(
        "side", "id", "uid", F.timestamp_millis("ms").alias("ts"), "ms"
    ).coalesce(1).write.mode("append").parquet(staged)

    s = _stream(spark, staged)
    paired = stream_inferred_join(
        s.filter(F.col("side") == "v"),
        s.filter(F.col("side") == "c"),
        user_col="uid",
        left_id_col="id",
        right_id_col="id",
        left_ts_col="ts",
        right_ts_col="ts",
        scope_cols=(),
        # the ASOF oracle has UNBOUNDED lookback; derive the buffer
        # window from the actual staged span (+1h slack) rather than a
        # constant that silently diverges if the data span grows
        window_before_ms=(
            _events_span(spark, sf_dir)[1]
            - _events_span(spark, sf_dir)[0]
            + 3_600_000
        ),
        window_after_ms=0,
        delay_ms=2000,
    )
    out = os.path.join(work, "paired")
    with _stream_shuffle_partitions(spark):
        _drain(paired, out, os.path.join(work, "_chk", "paired"))
    pairs = (
        spark.read.parquet(out)
        .filter(~F.col("late") & (F.col("u") >= 0))
        .select(
            F.col("right_id").alias("click_id"),
            F.col("left_id").alias("version_id"),
        )
    )
    enriched = pairs.join(
        vers.select(F.col("event_id").alias("version_id"), *fields),
        "version_id",
        "left",
    )
    return enriched.select(
        "click_id",
        "user_id",
        F.col("is_internal_user").cast("string").alias("is_internal_user"),
        F.col("ignore_usage").cast("string").alias("ignore_usage"),
        "properties_json",
    )


# ---------------------------------------------------------------------------
# streaming_latest_impressions — AddLatestImpressions' keyed list state
# ---------------------------------------------------------------------------

# span-covering lookback shared by the stream op and the oracle: with
# no candidate-window truncation and no first-action TTL eviction in
# play, the streaming state machine's answer is EXACTLY the global
# batch reconstruction, so the driver hash gate applies bit-for-bit.
# (The production 7 d lookback stays the default of both the operator
# and the batch query latest_impressions_negatives; its TTL-eviction
# divergence from a global oracle is documented on the operator.)
_LATEST_IMP_LOOKBACK_MS = 10_000_000_000_000


def _streaming_latest_imp_oracle() -> str:
    from openmetrics_spark.queries.events_q import _latest_imp_oracle

    return _latest_imp_oracle(_LATEST_IMP_LOOKBACK_MS)


@register(
    "streaming_latest_impressions",
    oracle=_streaming_latest_imp_oracle(),
    tags=("streaming", "enrich"),
)
def streaming_latest_impressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AddLatestImpressions as a REAL multi-batch checkpointed stream
    (reference: common/functions/AddLatestImpressions.java:33-386 —
    per user keep the latest ≤30 impressions; on each action emit ≤25
    after excluding already-actioned contents). Views play
    impressions, purchases play actions, props.k plays content. Both
    sides replay through one staged ordered source; each action
    resolves once the watermark passes it, against exactly the state
    the reference's keyed list state would hold. The far-future
    sentinel rides the impression side (a -1 user no action touches)
    to flush every pending action."""
    from openmetrics_spark.streaming.stateful import (
        stream_add_latest_impressions,
    )

    work = _workdir("latestimp")
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    rows = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        F.when(F.col("event_type") == "view", F.lit("i"))
        .otherwise(F.lit("a"))
        .alias("side"),
        "user_id",
        F.col("event_id").alias("rid"),
        F.unix_millis("ts").alias("ms"),
        k.alias("content"),
        "ts",
    )
    staged = os.path.join(work, "events")
    _restage(spark, rows, staged, "ms", _events_grid(spark, sf_dir), sentinel=True)
    s = _stream(spark, staged)
    # side != 'a' keeps the sentinel ("zz") on the impression branch
    imp = s.filter(F.col("side") != "a").select(
        "user_id",
        F.col("rid").alias("impression_id"),
        F.col("ms").alias("imp_ms"),
        F.col("content").alias("content_id"),
        "ts",
    )
    act = s.filter(F.col("side") == "a").select(
        "user_id",
        F.col("rid").alias("action_id"),
        F.col("ms").alias("act_ms"),
        F.col("content").alias("content_id"),
        "ts",
    )
    out_sdf = stream_add_latest_impressions(
        imp, act, user_col="user_id", lookback_ms=_LATEST_IMP_LOOKBACK_MS
    )
    out = os.path.join(work, "negatives")
    with _stream_shuffle_partitions(spark):
        _drain(out_sdf, out, os.path.join(work, "_chk", "negatives"))
    return (
        spark.read.parquet(out)
        .filter(F.col("u") >= 0)
        .select("action_id", "rank", "impression_id", "content", "gap_ms")
    )


def _streaming_hll_oracle() -> str:
    from openmetrics_spark.operators.sketches import (
        hll_estimate_from_registers_sql,
        hll_registers_sql,
    )

    reg = hll_registers_sql(
        "SELECT event_type,"
        " (epoch_ms(ts) // 86400000) * 86400000 AS window_start_ms,"
        " event_id FROM events",
        "event_type, window_start_ms",
        "event_id",
    )
    est = hll_estimate_from_registers_sql(
        reg, "event_type, window_start_ms", out="approx_ids"
    )
    return (
        "SELECT event_type, window_start_ms, approx_ids, registers_used "
        f"FROM {est}"
    )


@register(
    "streaming_approx_distinct",
    oracle=_streaming_hll_oracle(),
    tags=("streaming", "sketch"),
)
def streaming_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL sketch running INSIDE Structured Streaming: distinct
    event ids per (type, day) via a watermarked tumbling-window
    ``max(rho)`` register aggregate — because the register update is
    an associative max, the sketch needs no custom state machine at
    all; Spark's built-in streaming aggregation IS the sketch
    maintainer, and its state is bounded by groups × 2^p registers
    regardless of throughput. The staged multi-batch replay proves
    registers survive micro-batch boundaries; the estimate runs
    batch-side on the drained register sink, and the oracle recomputes
    sketch AND estimate relationally — hash-exact, like every other
    sketch row."""
    from openmetrics_spark.operators.sketches import (
        hll_estimate,
        hll_register_cols,
    )

    work = _workdir("hllstream")
    ev = table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", F.unix_millis("ts").alias("ms")
    )
    staged = os.path.join(work, "events")
    _restage(spark, ev, staged, "ms", _events_grid(spark, sf_dir), sentinel=True)
    bucket, rho = hll_register_cols("event_id")
    reg_stream = (
        _stream(spark, staged)
        .withWatermark("ts", "2 seconds")
        .select("event_type", "ts", bucket, rho)
        .groupBy(F.window("ts", "1 day"), "event_type", "bucket")
        .agg(F.max("rho").alias("rho"))
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start_ms"),
            "event_type",
            "bucket",
            "rho",
        )
    )
    out = os.path.join(work, "registers")
    with _stream_shuffle_partitions(spark):
        _drain(reg_stream, out, os.path.join(work, "_chk", "registers"))
    reg = spark.read.parquet(out).filter(F.col("event_type") != "zz")
    return hll_estimate(
        reg, ["event_type", "window_start_ms"], out="approx_ids"
    ).select("event_type", "window_start_ms", "approx_ids", "registers_used")


def _streaming_pctl_oracle() -> str:
    return """
WITH counts AS (
  SELECT event_type,
         (epoch_ms(ts) // 86400000) * 86400000 AS window_start_ms,
         CAST(floor(value / 1.0) AS BIGINT) AS bucket, count(*) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY ALL
), cum AS (
  SELECT event_type, window_start_ms, bucket,
         SUM(cnt) OVER (PARTITION BY event_type, window_start_ms
                        ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(cnt) OVER (PARTITION BY event_type, window_start_ms) AS n
  FROM counts
), probe AS (
  SELECT event_type, window_start_ms, q, bucket, n
  FROM cum, (SELECT unnest([0.5, 0.9, 0.99]) AS q) qs
  WHERE cum >= ceil(q * n)
)
SELECT event_type, window_start_ms, q, min(bucket) * 1.0 AS approx_value,
       CAST(max(n) AS BIGINT) AS n
FROM probe GROUP BY 1, 2, 3
"""


@register(
    "streaming_value_percentiles",
    oracle=_streaming_pctl_oracle(),
    tags=("streaming", "sketch"),
)
def streaming_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The histogram-percentile sketch running INSIDE Structured
    Streaming: per (type, day) bucket counts via a watermarked
    tumbling-window COUNT aggregate — count is associative, so like
    the streaming HLL the sketch needs no custom state machine;
    Spark's built-in streaming aggregation maintains the histogram
    with state bounded by groups × range/width buckets regardless of
    throughput. The staged multi-batch replay proves counts survive
    micro-batch boundaries; the cumulative scan + p50/p90/p99 probe
    run batch-side on the drained bucket sink
    (``hist_percentiles_from_counts``), and the oracle recomputes
    histogram AND probe relationally — hash-exact."""
    from openmetrics_spark.operators.sketches import (
        hist_percentiles_from_counts,
    )

    work = _workdir("pctlstream")
    ev = table(spark, sf_dir, "events").select(
        "event_type", "ts", "value", F.unix_millis("ts").alias("ms")
    )
    staged = os.path.join(work, "events")
    _restage(spark, ev, staged, "ms", _events_grid(spark, sf_dir), sentinel=True)
    hist_stream = (
        _stream(spark, staged)
        .withWatermark("ts", "2 seconds")
        # safe even though Catalyst pushes this below the watermark
        # node: the sentinel's value is 0.0 (non-null), so it still
        # reaches the watermark stats and flushes the final window —
        # a filter that DROPPED the sentinel pre-watermark would lose
        # the last window (see streaming_counter_commands)
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "ts",
            F.floor(F.col("value") / F.lit(1.0)).cast("long").alias("bucket"),
        )
        .groupBy(F.window("ts", "1 day"), "event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start_ms"),
            "event_type",
            "bucket",
            "cnt",
        )
    )
    out = os.path.join(work, "buckets")
    with _stream_shuffle_partitions(spark):
        _drain(hist_stream, out, os.path.join(work, "_chk", "buckets"))
    counts = spark.read.parquet(out).filter(F.col("event_type") != "zz")
    return hist_percentiles_from_counts(
        counts, ["event_type", "window_start_ms"], width=1.0, qs=(0.5, 0.9, 0.99)
    ).select("event_type", "window_start_ms", "q", "approx_value", "n")


def _streaming_counter_oracle() -> str:
    from openmetrics_spark.jobs.counter import DAY_MS, FAMILIES, HOUR_MS
    from openmetrics_spark.queries.counter_q import _UA_FIXTURE, _sliding_sql

    from openmetrics_spark.functions.feature_ids import CountWindow

    streams = [
        _sliding_sql(fam, DAY_MS, 4 * HOUR_MS, CountWindow.DAY, 0)
        for fam in (FAMILIES[0], FAMILIES[1], FAMILIES[3])
    ]
    body = "\nUNION ALL\n".join(streams)
    n_ua = len(_UA_FIXTURE)
    os_cases = " ".join(
        f"WHEN {i} THEN '{os}'" for i, (_, os, _) in enumerate(_UA_FIXTURE)
    )
    fam_cases = " ".join(
        f"WHEN {i} THEN '{fam}'" for i, (_, _, fam) in enumerate(_UA_FIXTURE)
    )
    return f"""
WITH flat AS (
  SELECT user_id % 4 AS platform_id,
         'lu' || CAST(user_id AS VARCHAR) AS log_user_id,
         'c' || CAST(CAST(json_extract(props, '$.k') AS INT) % 10 AS VARCHAR)
           AS content_id,
         epoch_ms(ts) AS ms,
         CASE user_id % {n_ua} {os_cases} END AS os,
         CASE user_id % {n_ua} {fam_cases} END AS user_agent_family,
         CAST(CASE event_type WHEN 'view' THEN 32 WHEN 'click' THEN 64
              ELSE 96 END AS BIGINT) AS agg_metric
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
)
{body}
"""


@register(
    "streaming_counter_commands",
    oracle=_streaming_counter_oracle(),
    headline=True,
    tags=("streaming", "counter"),
)
def streaming_counter_commands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fused multi-family counter fan-out running INSIDE
    Structured Streaming — the reference CounterJob's actual
    deployment shape (a Flink streaming job feeding Redis,
    CounterJob.java:388-500). Each event explodes into one
    (fidx, key-parts, field-parts) struct per family BEFORE the
    watermarked tumbling-window aggregate, so the stream maintains ONE
    keyed count state across all families (the same grouping-sets
    shape as the batch plan, state bounded by keys × open windows, no
    custom state machine); the stateless k-fold window expansion and
    the redis key/field/FeatureId encoding run batch-side on the
    drained bucket sink (``expand_bucket_counts`` +
    ``encode_sliding_commands`` — the exact halves the batch job
    uses). Three families (platform-device, content-device, log-user)
    × the DAY config (4 h slide, k=6, TTL 0 — key-level EXPIRE is
    reserved for the 30 d bucket); the staged multi-batch
    replay proves bucket counts survive micro-batch boundaries, and
    the oracle reconstructs the full command stream relationally."""
    from openmetrics_spark.functions.feature_ids import CountWindow
    from openmetrics_spark.jobs.counter import (
        DAY_MS,
        FAMILIES,
        HOUR_MS,
        encode_sliding_commands,
        fam_explode_structs,
    )
    from openmetrics_spark.operators.counters import expand_bucket_counts
    from openmetrics_spark.queries.counter_q import _flat_and_luu

    fams = (FAMILIES[0], FAMILIES[1], FAMILIES[3])
    # TTL 0: only the 30 d bucket may EXPIRE the shared key (see
    # jobs/counter.py WINDOW_CONFIGS)
    cfg = (DAY_MS, 4 * HOUR_MS, CountWindow.DAY, 0)
    work = _workdir("counterstream")
    # the SAME flat derivation the batch job stages from (no parallel
    # copy to drift) — the projection below drops query_hex, and
    # Catalyst's column pruning removes its Arrow-UDF computation from
    # the staged plan entirely
    flat, _ = _flat_and_luu(spark, sf_dir)
    flat = flat.select(
        "platform_id",
        "log_user_id",
        "content_id",
        "os",
        "user_agent_family",
        "agg_metric",
        "ts",
        F.unix_millis("ts").alias("ms"),
    )
    staged = os.path.join(work, "flat")
    _restage(spark, flat, staged, "ms", _events_grid(spark, sf_dir), sentinel=True)
    # the far-future sentinel row must flow INTO the aggregate: a
    # pre-agg filter on a non-event-time column gets pushed BELOW the
    # EventTimeWatermark node by Catalyst, so the sentinel would never
    # reach the watermark stats and the final window would never
    # finalize (observed: last 4 h bucket missing). Its groups are
    # dropped post-drain instead — platform_id is -1 only on the
    # sentinel (real platforms are user_id % 4 >= 0).
    bucket_stream = (
        _stream(spark, staged)
        .withWatermark("ts", "2 seconds")
        .select(
            F.explode(F.array(*fam_explode_structs(fams))).alias("__f"),
            F.col("agg_metric").alias("__metric"),
            "ts",
        )
        .groupBy(F.window("ts", "4 hours"), "__f", "__metric")
        .agg(F.count(F.lit(1)).alias("bn"))
        .select(
            F.unix_millis(F.col("window.start")).alias("bucket_ms"),
            "__f",
            "__metric",
            "bn",
        )
    )
    out = os.path.join(work, "buckets")
    with _stream_shuffle_partitions(spark):
        _drain(bucket_stream, out, os.path.join(work, "_chk", "buckets"))
    b = spark.read.parquet(out).filter(
        F.element_at(F.col("__f.karr"), 1) != F.lit("-1")
    )
    counted = expand_bucket_counts(
        b, ["__f", "__metric"], [(int(CountWindow.DAY), DAY_MS // (4 * HOUR_MS))],
        4 * HOUR_MS,
    )
    return encode_sliding_commands(counted, fams, (cfg,))


from openmetrics_spark.queries.docs_q import _MINHASH_INCR_ORACLE


@register(
    "streaming_minhash_ingest",
    oracle=_MINHASH_INCR_ORACLE,  # the batch twin's oracle, verbatim
    tags=("streaming", "llm", "dedup"),
)
def streaming_minhash_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus ingest as a NATIVE stream-static join — the
    one streaming join flavor the other pipelines don't exercise
    (stream-stream interval joins and stateful aggs are covered; this
    is `streamingDF.join(staticDF)`, Spark's canonical enrich-against-
    an-index pattern). The already-curated corpus (even doc_ids) is a
    PINNED banded MinHash index; incoming docs (odd ids) arrive as a
    multi-batch file stream, compute signatures as pure stateless
    projections (the spec-twin shingle/signature/band expressions —
    no aggregate, so no watermark or state store at all), probe the
    index by band key, and verify candidates with exact Jaccard
    in-stream. Band-collision duplicates dedupe batch-side on the
    drained sink (a stream-side dropDuplicates would grow unbounded
    state for no benefit). Same output — and the same ORACLE, verbatim
    — as the batch twin minhash_incremental_neardup: only the
    execution changes."""
    from openmetrics_spark.llm.dedup import (
        jaccard,
        lsh_band_keys,
        minhash_signature,
        shingles,
    )
    from openmetrics_spark.tables import pin

    n, num_hashes, bands, rows, threshold = 3, 16, 4, 4, 0.5
    work = _workdir("mhingest")
    docs = table(spark, sf_dir, "documents")

    def banded_cols(out: str):
        sh = shingles("text", n)
        sig = minhash_signature(sh, num_hashes, seed=7)
        return [
            F.col("doc_id").alias(out),
            sh.alias(f"sh_{out}"),
            sig.alias("sig"),
        ]

    ex = pin(
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(*banded_cols("existing_id"))
        .filter(F.size(f"sh_existing_id") > 0)
        .select(
            "existing_id",
            "sh_existing_id",
            F.explode(lsh_band_keys(F.col("sig"), bands, rows)).alias("bk"),
        )
    )
    staged = os.path.join(work, "incoming")
    inc_src = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "text", F.col("doc_id").alias("ms")
    )
    grid = [
        int(
            inc_src.agg(
                (F.min("doc_id") + F.max("doc_id")) / 2
            ).first()[0]
        )
    ]
    _restage(spark, inc_src, staged, "ms", grid, sentinel=True)
    inc_stream = (
        _stream(spark, staged)
        .filter(F.col("doc_id") >= 0)  # stateless: drops the sentinel;
        # no watermark exists to interact with (projection-only stream)
        .select(*banded_cols("incoming_id"))
        .filter(F.size("sh_incoming_id") > 0)
        .select(
            "incoming_id",
            "sh_incoming_id",
            F.explode(lsh_band_keys(F.col("sig"), bands, rows)).alias("bk"),
        )
    )
    matched = inc_stream.join(ex, "bk").select(
        "incoming_id",
        "existing_id",
        F.round(
            jaccard(F.col("sh_incoming_id"), F.col("sh_existing_id")), 6
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)
    out = os.path.join(work, "matches")
    with _stream_shuffle_partitions(spark):
        _drain(matched, out, os.path.join(work, "_chk", "matches"))
    return spark.read.parquet(out).distinct()



from openmetrics_spark.queries.events_q import _DECAYED_ORACLE


@register(
    "streaming_decayed_counts",
    oracle=_DECAYED_ORACLE,  # the batch twin's oracle, verbatim
    tags=("streaming", "counter"),
)
def streaming_decayed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed per-user counts maintained by a STREAM: the
    half-life bucket counts are a plain watermarked tumbling-window
    aggregate (associative, no custom state machine — the same split
    as the streaming HLL/percentile/counter twins), and the decay
    re-weights the drained bucket sink at read time
    (``decayed_from_buckets``). That read-time weighting is the whole
    point of the bucketed design: the stored state never needs
    rewriting as the clock advances, so a feature store keeps ONE
    bucket table current incrementally and derives fresh decayed
    values on demand. Shares the batch twin's oracle verbatim."""
    from openmetrics_spark.operators.counters import decayed_from_buckets

    work = _workdir("decaystream")
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", F.unix_millis("ts").alias("ms")
    )
    staged = os.path.join(work, "events")
    _restage(spark, ev, staged, "ms", _events_grid(spark, sf_dir), sentinel=True)
    bucket_stream = (
        _stream(spark, staged)
        .withWatermark("ts", "2 seconds")
        .groupBy(F.window("ts", "1 day"), "user_id")
        .agg(F.count(F.lit(1)).alias("bn"))
        .select(
            F.unix_millis(F.col("window.start")).alias("bucket_ms"),
            "user_id",
            "bn",
        )
    )
    out = os.path.join(work, "buckets")
    with _stream_shuffle_partitions(spark):
        _drain(bucket_stream, out, os.path.join(work, "_chk", "buckets"))
    # the sentinel (user_id = -1, far-future bucket) must not become
    # the decay anchor; it flowed through the aggregate to flush the
    # final window (see streaming_counter_commands) and drops here
    b = spark.read.parquet(out).filter(F.col("user_id") >= 0)
    return decayed_from_buckets(
        b, ["user_id"], halflife_ms=86_400_000, max_k=40
    )


def _streaming_cms_oracle() -> str:
    # per-day counters summed to global ones equal the batch counters
    # exactly (counts are additive), so the oracle reuses the batch
    # CMS pipeline verbatim
    from openmetrics_spark.queries.sketch_q import _cms_hh_oracle

    return _cms_hh_oracle()


@register(
    "streaming_heavy_hitters",
    oracle=_streaming_cms_oracle(),
    tags=("streaming", "sketch"),
)
def streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Count-Min sketch running INSIDE Structured Streaming: the
    counter table is maintained by a watermarked per-day windowed
    count over the (j, b) bucket projection — counts are ADDITIVE, so
    no custom state machine: Spark's windowed aggregation IS the
    sketch maintainer with state bounded by days × depth × width
    regardless of throughput, and finalized day windows flush to the
    sink incrementally. The drained per-day counters merge by SUM
    into the global table (bit-identical to batch counters), then
    estimates + the heavy-hitter gate run batch-side — the oracle is
    the batch CMS pipeline verbatim. Sentinel rows land in the
    far-future sentinel window and are dropped post-drain by window
    bound (never pre-aggregate: a pre-agg filter would be pushed
    below EventTimeWatermark and lose the final window)."""
    from openmetrics_spark.operators.sketches import (
        cms_bucket_rows,
        cms_point_estimate,
    )

    work = _workdir("cms_stream")
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", F.unix_millis("ts").alias("ms")
    )
    staged = os.path.join(work, "events")
    _restage(spark, ev, staged, "ms", _events_grid(spark, sf_dir), sentinel=True)
    counter_stream = (
        _stream(spark, staged)
        .withWatermark("ts", "2 seconds")
        .select("ts", cms_bucket_rows("user_id").alias("j", "b"))
        .groupBy(F.window("ts", "1 day"), "j", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start_ms"),
            "j",
            "b",
            "c",
        )
    )
    out = os.path.join(work, "counters")
    with _stream_shuffle_partitions(spark):
        _drain(counter_stream, out, os.path.join(work, "_chk", "counters"))
    # drop the sentinel's far-future day window post-drain, then merge
    # the per-day counters into the global table (additive)
    from openmetrics_spark.jobs.streaming_flat_output import SENTINEL_MS

    counters = (
        spark.read.parquet(out)
        .filter(F.col("window_start_ms") < SENTINEL_MS - 86_400_000)
        .groupBy("j", "b")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    evb = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    keys = evb.select("user_id").distinct()
    tot = evb.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("d"),
    )
    est = cms_point_estimate(counters, keys, "user_id")
    return (
        est.crossJoin(F.broadcast(tot))
        .filter(F.col("est_count") * 5 * F.col("d") >= 6 * F.col("n"))
        .select("user_id", "est_count")
    )


def _streaming_bloom_oracle() -> str:
    # the oracle IS the batch twin's: per-day bit_or bitmaps merged by
    # bit_or equal the one-shot build exactly
    from openmetrics_spark.queries.sketch_q import _bloom_oracle

    return _bloom_oracle()


@register(
    "streaming_bloom_ingest",
    oracle=_streaming_bloom_oracle(),
    tags=("streaming", "sketch"),
)
def streaming_bloom_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom bitmap maintained INSIDE Structured Streaming — the
    fourth sketch state proven streaming-native (HLL max, histogram
    count, CMS count, now bit_or): per-day windowed bit_or over the
    (word, mask) projection of ordering customers' events... here the
    orders table replayed as a micro-batch stream on o_orderdate. The
    drained per-day bitmaps merge by bit_or (associative) into the
    global filter — bit-identical to the batch build — and the probe +
    ground-truth join run batch-side, so the oracle is the batch
    pipeline verbatim. Sentinel rows land in the far-future window and
    drop post-drain (never pre-agg: watermark pushdown)."""
    from openmetrics_spark.jobs.streaming_flat_output import SENTINEL_MS
    from openmetrics_spark.operators.sketches import (
        _bloom_positions,
        _BLOOM_WORD_BITS,
        bloom_probe,
    )

    work = _workdir("bloom_stream")
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("timestamp").alias("ts"),
    )
    ev = orders.withColumn("ms", F.unix_millis("ts"))
    grid = [int(b) for b in ev.approxQuantile("ms", [0.25, 0.5, 0.75], 0.01)]
    staged = os.path.join(work, "orders")
    _restage(spark, ev, staged, "ms", grid, sentinel=True)
    pos = F.explode(
        F.array(*_bloom_positions("o_custkey", 13, 4))
    ).alias("p")
    bitmap_stream = (
        _stream(spark, staged)
        .withWatermark("ts", "2 seconds")
        .select("ts", pos)
        .select(
            "ts",
            F.expr(f"p DIV {_BLOOM_WORD_BITS}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" CAST(p % {_BLOOM_WORD_BITS} AS INT))"
            ).alias("mask"),
        )
        .groupBy(F.window("ts", "30 days"), "word")
        .agg(F.bit_or("mask").alias("mask"))
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start_ms"),
            "word",
            "mask",
        )
    )
    out = os.path.join(work, "bitmap")
    with _stream_shuffle_partitions(spark):
        _drain(bitmap_stream, out, os.path.join(work, "_chk", "bitmap"))
    bloom = (
        spark.read.parquet(out)
        .filter(F.col("window_start_ms") < SENTINEL_MS - 30 * 86_400_000)
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    probe = bloom_probe(bloom, cust, "o_custkey")
    truth = (
        table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .withColumn("has_orders", F.lit(True))
    )
    return probe.join(truth, "o_custkey", "left").select(
        F.col("o_custkey").alias("c_custkey"),
        "maybe_present",
        F.coalesce(F.col("has_orders"), F.lit(False)).alias("has_orders"),
    )



# ---------------------------------------------------------------------------
# Production-TTL inferred join — bounded state, eviction under the gate
# ---------------------------------------------------------------------------
#
# Every other streaming twin achieves exact batch parity by retaining
# left candidates for the whole bounded replay. Production cannot: the
# reference bounds the same state by SUMMED join-window cleanup delays
# (FlatOutputJob.java:808-882) and accepts the consequence — an
# explicit reference pointing at state older than the TTL joins
# NOTHING and the row leaves unmatched (the etl_side drop channels).
# This query gates exactly those semantics on the impression→action
# join shape (explicit FK with unbounded reach + content-scope
# fallback, window [-10 m, 0]):
#
# - event time is COMPRESSED to a ≲4 h window (ms2 = lo + (ms-lo) DIV
#   K, K derived from the span identically in both engines) and the
#   replay is cut into 8 30-min slices, so the watermark tracks event
#   time the way a live stream's does instead of jumping half the
#   span at one boundary;
# - the join runs with ttl_floor=True and TTL = 45 min: the TTL
#   exceeds the inference window (10 m) plus the worst decision
#   latency (one slice + delay ≈ 30 m), so windowed inference is
#   UNAFFECTED — exactly the reference's guarantee when it sizes
#   cleanup as the SUM of join windows — while FK references reaching
#   further than the TTL are genuinely dropped;
# - the DuckDB oracle MODELS the eviction: on the deterministic slice
#   grid the watermark sequence is computable (W_b = max staged input
#   ms2 in slices < b, minus delay, plus the end-of-stream flush), a
#   right row decides at the first W_b above its timestamp, and a
#   candidate is visible iff l.ms2 >= decision_wm - TTL — the pure-wm
#   floor ttl_floor guarantees. fk_dropped pins the drop population
#   row by row.

_TTL_MS = 2_700_000          # 45 min candidate TTL (summed budget)
_TTL_BEFORE_MS = 600_000     # content-scope inference window
_TTL_DELAY_MS = 2000
_TTL_FLUSH_MS = 10_000       # end-of-stream flush offset (not far-future)
_TTL_SLICE_MS = 1_800_000    # 30 min replay slices
_TTL_N_SLICES = 8
_TTL_TARGET_SPAN = _TTL_SLICE_MS * _TTL_N_SLICES  # compress span to <= this

# Shared CTE fragments of the two TTL-gate oracles — ONE copy of the
# eviction model (fix to either gate lands in both). The prefix builds
# the compressed-time fixture; the match chain is parameterized on the
# late-variant's on-time filters.
def _ttl_sql_prefix(skew: bool = False) -> str:
    # the skew knob collapses every user_id % 8 == 0 user onto user 0
    # (~12-13% of all events on ONE state key) — same CASE in the
    # Spark derivation, so the oracle models the same skewed world
    u = (
        "CASE WHEN e.user_id % 8 = 0 THEN 0 ELSE e.user_id END"
        if skew
        else "e.user_id"
    )
    return f"""span AS (
  SELECT min(epoch_ms(ts)) AS lo, max(epoch_ms(ts)) AS hi FROM events
),
kdiv AS (
  SELECT lo, (hi - lo) // {_TTL_TARGET_SPAN} + 1 AS k FROM span
),
base AS (
  SELECT e.event_id AS id, {u} AS user_id, e.event_type,
         kd.lo + (epoch_ms(e.ts) - kd.lo) // kd.k AS ms,
         last_value(CASE WHEN e.event_type = 'click'
                         THEN 'm' || CAST(e.event_id AS VARCHAR)
                    END IGNORE NULLS) OVER w AS prev_imp,
         last_value(CASE WHEN e.event_type = 'click'
                         THEN 'c' || CAST(e.event_id % 40 AS VARCHAR)
                    END IGNORE NULLS) OVER w AS prev_content
  FROM events e, kdiv kd
  WINDOW w AS (PARTITION BY {u}
               ORDER BY kd.lo + (epoch_ms(e.ts) - kd.lo) // kd.k, e.event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
lefts AS (
  SELECT user_id, id, ms, 'm' || CAST(id AS VARCHAR) AS impression_id,
         'c' || CAST(id % 40 AS VARCHAR) AS content_id
  FROM base WHERE event_type = 'click'
)"""


_TTL_SQL_PREFIX = _ttl_sql_prefix()

_TTL_SQL_WT = f"""wt AS (
  SELECT t.i, max(p.ms) - {_TTL_DELAY_MS} AS wv
  FROM range(1, {_TTL_N_SLICES + 1}) t(i) JOIN inp p ON p.sl < t.i
  GROUP BY t.i
  UNION ALL
  SELECT {_TTL_N_SLICES + 1},
         (SELECT max(ms) FROM inp) + {_TTL_FLUSH_MS} - {_TTL_DELAY_MS}
)"""


def _ttl_match_sql(fk_ontime: str = "", rem_ontime: str = "") -> str:
    """The FK-then-scope match chain with the TTL availability floor
    (candidate visible iff l.ms >= decision_wm - TTL)."""
    return f"""fkm AS (
  SELECT d.id, l.id AS lid, l.ms AS lms,
         row_number() OVER (PARTITION BY d.id
           ORDER BY l.ms, l.impression_id) AS rn
  FROM rdec d JOIN lefts l
    ON l.user_id = d.user_id AND l.impression_id = d.fk
   AND l.ms >= d.dec_wm - {_TTL_MS}
  WHERE d.fk IS NOT NULL{fk_ontime}
),
fk1 AS (SELECT id, lid, lms FROM fkm WHERE rn = 1),
rem AS (SELECT * FROM rdec
        WHERE {rem_ontime}id NOT IN (SELECT id FROM fk1)),
scm AS (
  SELECT d.id, l.id AS lid, l.ms AS lms,
         row_number() OVER (PARTITION BY d.id
           ORDER BY abs(l.ms - d.ms), l.ms, l.impression_id) AS rn
  FROM rem d JOIN lefts l
    ON l.user_id = d.user_id AND l.content_id = d.content_id
   AND l.ms BETWEEN d.ms - {_TTL_BEFORE_MS} AND d.ms
   AND l.ms >= d.dec_wm - {_TTL_MS}
),
sc1 AS (SELECT id, lid, lms FROM scm WHERE rn = 1),
m AS (SELECT * FROM fk1 UNION ALL SELECT * FROM sc1)"""


def _ttl_join_oracle(skew: bool = False) -> str:
    return f"""
WITH {_ttl_sql_prefix(skew)},
rights AS (
  SELECT user_id, id, ms,
         CASE WHEN id % 2 = 0 THEN prev_imp END AS fk,
         coalesce(prev_content, 'c' || CAST(id % 40 AS VARCHAR)) AS content_id
  FROM base WHERE event_type = 'purchase'
),
inp AS (
  SELECT i.ms,
         least({_TTL_N_SLICES - 1}, (i.ms - s.lo) // {_TTL_SLICE_MS}) AS sl
  FROM (SELECT ms FROM lefts UNION ALL SELECT ms FROM rights) i, span s
),
{_TTL_SQL_WT},
rdec AS (
  SELECT r.*, (SELECT min(wv) FROM wt WHERE wv > r.ms) AS dec_wm
  FROM rights r
),
{_ttl_match_sql()}
SELECT r.id AS action_id, r.user_id, r.ms AS act_ms,
       m.lid AS matched_click, m.lms AS click_ms,
       CAST((r.fk IS NOT NULL AND m.lid IS NULL) AS BIGINT) AS fk_dropped
FROM rights r LEFT JOIN m ON r.id = m.id
"""


_TTL_JOIN_ORACLE = _ttl_join_oracle()


def _ttl_frames(spark, sf_dir, skew: bool = False):
    """Shared fixture for the production-TTL join gates: compressed-
    time click candidates and purchase rights with the explicit
    prev-click FK (see streaming_ttl_inferred_join's block comment).
    Returns (lefts, rights, lo)."""
    from pyspark.sql import Window

    lo, hi = _events_span(spark, sf_dir)
    k = (hi - lo) // _TTL_TARGET_SPAN + 1
    uid = (
        F.when(F.col("user_id") % 8 == 0, F.lit(0))
        .otherwise(F.col("user_id"))
        .cast("long")
        if skew
        else F.col("user_id")
    )
    e = table(spark, sf_dir, "events").select(
        "event_id",
        uid.alias("user_id"),
        "event_type",
        F.expr(f"{lo} + (unix_millis(ts) - {lo}) DIV {k}").alias("ms"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = e.withColumn(
        "prev_imp",
        F.last(
            F.when(
                F.col("event_type") == "click",
                F.concat(F.lit("m"), F.col("event_id")),
            ),
            ignorenulls=True,
        ).over(w),
    ).withColumn(
        "prev_content",
        F.last(
            F.when(
                F.col("event_type") == "click",
                F.concat(F.lit("c"), F.col("event_id") % 40),
            ),
            ignorenulls=True,
        ).over(w),
    )
    lefts = base.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("lid"),
        "ms",
        F.concat(F.lit("m"), F.col("event_id")).alias("impression_id"),
        F.concat(F.lit("c"), F.col("event_id") % 40).alias("content_id"),
        F.timestamp_millis("ms").alias("ts"),
    )
    rights = base.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("rid"),
        "ms",
        F.when(F.col("event_id") % 2 == 0, F.col("prev_imp")).alias(
            "impression_id"
        ),
        F.coalesce(
            "prev_content", F.concat(F.lit("c"), F.col("event_id") % 40)
        ).alias("content_id"),
        F.timestamp_millis("ms").alias("ts"),
    )
    # pin: each frame is consumed 3-5x per query (restage, max-ms
    # probe, payload re-join) and the per-user window over the full
    # events table should run once, not per consumer
    return pin(lefts), pin(rights), lo



def _run_ttl_join(
    spark: SparkSession, sf_dir: str, skew: bool = False
) -> DataFrame:
    from openmetrics_spark.streaming.stateful import stream_inferred_join

    lefts, rights, lo = _ttl_frames(spark, sf_dir, skew)
    work = _workdir("ttl_join_skew" if skew else "ttl_join")
    boundaries = [lo + i * _TTL_SLICE_MS for i in range(1, _TTL_N_SLICES)]
    pl, pr = os.path.join(work, "l"), os.path.join(work, "r")
    _restage(spark, lefts, pl, "ms", boundaries)
    _restage(spark, rights, pr, "ms", boundaries)
    # end-of-stream flush rides the LEFT dir as a key=-1 candidate: a
    # NEAR-future sentinel (max staged input + 10 s, not the far-future
    # constant) so the final flush watermark — and the TTL floor the
    # tail decisions see — stays modellable and non-degenerate
    hi2 = int(lefts.select(F.max("ms")).first()[0] or 0)
    hi2 = max(hi2, int(rights.select(F.max("ms")).first()[0] or 0))
    literal_df(
        spark,
        [(-1, -1, hi2 + _TTL_FLUSH_MS, "zz", "zz")],
        "user_id LONG, lid LONG, ms LONG, impression_id STRING, content_id STRING",
    ).select(
        "user_id",
        "lid",
        "ms",
        "impression_id",
        "content_id",
        F.timestamp_millis("ms").alias("ts"),
    ).coalesce(1).write.mode("append").parquet(pl)

    j = stream_inferred_join(
        _stream(spark, pl),
        _stream(spark, pr),
        user_col="user_id",
        left_id_col="lid",
        right_id_col="rid",
        left_ts_col="ts",
        right_ts_col="ts",
        scopes=(("content_id",),),
        fk_col="impression_id",
        window_before_ms=_TTL_BEFORE_MS,
        window_after_ms=0,
        delay_ms=_TTL_DELAY_MS,
        right_outer=True,
        left_retention_ms=_TTL_MS,
        ttl_floor=True,
    )
    out = os.path.join(work, "out")
    with _stream_shuffle_partitions(spark):
        _drain(j, out, os.path.join(work, "_chk", "out"))
    res = spark.read.parquet(out).filter(
        ~F.col("late") & (F.col("u") >= 0)
    )
    return res.join(
        rights.select(
            F.col("rid").alias("right_id"),
            F.col("impression_id").alias("__fk"),
        ),
        "right_id",
        "left",
    ).select(
        F.col("right_id").alias("action_id"),
        F.col("u").alias("user_id"),
        F.col("right_ms").alias("act_ms"),
        F.col("left_id").alias("matched_click"),
        F.col("left_ms").alias("click_ms"),
        (F.col("__fk").isNotNull() & F.col("left_id").isNull())
        .cast("long")
        .alias("fk_dropped"),
    )


@register(
    "streaming_ttl_inferred_join",
    oracle=_TTL_JOIN_ORACLE,
    tags=("streaming", "join", "scale"),
)
def streaming_ttl_inferred_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inferred-reference join under PRODUCTION state budgeting:
    45 min candidate TTL with evict-before-decide semantics
    (``ttl_floor=True``) over a compressed-time 8-slice replay, so
    windowed inference survives (TTL > window + decision latency, the
    reference's summed-budget guarantee) while long-reach explicit FKs
    are genuinely dropped — and the oracle models every eviction (see
    block comment; reference FlatOutputJob.java:808-882). 100 TB:
    state per key is bounded by TTL x arrival rate — the steady-state
    budget the reference runs with — instead of the replay span the
    parity twins use."""
    return _run_ttl_join(spark, sf_dir)


@register(
    "streaming_ttl_inferred_join_skewed",
    oracle=_ttl_join_oracle(skew=True),
    tags=("streaming", "join", "scale", "skew"),
)
def streaming_ttl_inferred_join_skewed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The production-TTL join under a PLANTED HOT KEY: every
    user_id % 8 == 0 user collapses onto user 0 (~12-13% of all events
    on ONE state key — the logged-out/bot shape, KeyUtil.java:27-98),
    in both the Spark derivation and the oracle's eviction model. The
    eviction arithmetic must hold row-for-row on the hot key too:
    TTL-bounded candidate state, long-reach FKs dropped, windowed
    inference unaffected — the driver-gated complement of the
    state-probe pytest (tests/test_streaming_skew.py)."""
    return _run_ttl_join(spark, sf_dir, skew=True)


# ---------------------------------------------------------------------------
# Late-arrival side channel under the oracle gate
# ---------------------------------------------------------------------------
#
# The reference routes events that arrive behind the watermark to
# LATE side outputs (BaseInferred LATE_EVENTS_TAG → etl_side/late_*)
# instead of mis-joining them against evicted state. The twin
# implements the same split (pytest-pinned since r6); this query puts
# the CLASSIFICATION ITSELF under the cross-engine hash: every fifth
# purchase is DELIVERED two replay slices after its event time
# (arrival column ≠ event column in the staged transport), so when it
# arrives the watermark — which rides EVENT time of everything
# delivered so far — has usually passed it, and the twin must emit it
# on the late channel with no join attempt. The DuckDB oracle models
# the classification exactly: a row is late iff the watermark of its
# ARRIVAL batch (max event-ms delivered in earlier batches − delay)
# exceeds its event time; survivors decide/evict exactly as
# streaming_ttl_inferred_join's model (same TTL floor).

_TTL_LATE_SHIFT = 2 * _TTL_SLICE_MS

_TTL_LATE_ORACLE = f"""
WITH {_TTL_SQL_PREFIX},
rights AS (
  SELECT user_id, id, ms,
         ms + CASE WHEN id % 5 = 0 THEN {_TTL_LATE_SHIFT} ELSE 0 END AS arr,
         CASE WHEN id % 2 = 0 THEN prev_imp END AS fk,
         coalesce(prev_content, 'c' || CAST(id % 40 AS VARCHAR)) AS content_id
  FROM base WHERE event_type = 'purchase'
),
inp AS (
  SELECT l.ms, least({_TTL_N_SLICES - 1}, (l.ms - s.lo) // {_TTL_SLICE_MS}) AS sl
  FROM lefts l, span s
  UNION ALL
  SELECT r.ms, least({_TTL_N_SLICES - 1}, (r.arr - s.lo) // {_TTL_SLICE_MS})
  FROM rights r, span s
),
{_TTL_SQL_WT},
rdec AS (
  SELECT r.*,
         coalesce((SELECT wv FROM wt
                   WHERE wt.i = least({_TTL_N_SLICES - 1},
                                      (r.arr - s.lo) // {_TTL_SLICE_MS})),
                  0) > r.ms AS is_late,
         (SELECT min(wv) FROM wt WHERE wv > r.ms) AS dec_wm
  FROM rights r, span s
),
{_ttl_match_sql(fk_ontime=" AND NOT d.is_late", rem_ontime="NOT is_late AND ")}
SELECT r.id AS action_id, r.user_id, r.ms AS act_ms,
       m.lid AS matched_click, m.lms AS click_ms,
       CASE WHEN r.is_late THEN 'late' ELSE 'ok' END AS channel,
       CAST((NOT r.is_late AND r.fk IS NOT NULL AND m.lid IS NULL) AS BIGINT)
         AS fk_dropped
FROM rdec r LEFT JOIN m ON r.id = m.id
"""


@register(
    "streaming_ttl_late_channel",
    oracle=_TTL_LATE_ORACLE,
    tags=("streaming", "join", "scale"),
)
def streaming_ttl_late_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The late side channel itself under the cross-engine hash: every
    fifth purchase is DELIVERED two replay slices after its event time
    (the staged transport slices rights by an arrival column), so the
    watermark has passed it on arrival and the production-TTL twin
    must route it late — no join attempt, no state mutation — while
    on-time rows match/drop exactly as streaming_ttl_inferred_join
    (see block comment; reference BaseInferred.java:317-325
    LATE_EVENTS_TAG → etl_side/late_*). 100 TB: the late split is a
    per-row comparison against engine-managed watermark state — zero
    extra shuffle; the channel lands in its own partition of the sink."""
    from openmetrics_spark.streaming import stream_late_split
    from openmetrics_spark.streaming.stateful import stream_inferred_join

    lefts, rights, lo = _ttl_frames(spark, sf_dir)
    rights = rights.withColumn(
        "arr_ms",
        F.col("ms")
        + F.when(F.col("rid") % 5 == 0, F.lit(_TTL_LATE_SHIFT)).otherwise(
            F.lit(0)
        ),
    )
    work = _workdir("ttl_late")
    boundaries = [lo + i * _TTL_SLICE_MS for i in range(1, _TTL_N_SLICES)]

    # ---- Q1: the late split runs IN FRONT of the join over the union
    # of both sides (the reference's side-output placement). It is a
    # stateless NoTimeout pass-through, so the engine's stateful-input
    # filter — which would SILENTLY drop sub-watermark rows before an
    # event-time-timeout operator ever saw them — does not apply, and
    # every late row reaches the side channel. The join then consumes
    # only on-time survivors and never meets a late row.
    common = ["user_id", "id", "ms", "arr_ms", "impression_id",
              "content_id", "side", "ts"]
    l_u = lefts.select(
        "user_id", F.col("lid").alias("id"), "ms",
        F.col("ms").alias("arr_ms"), "impression_id", "content_id",
        F.lit(0).alias("side"), "ts",
    )
    r_u = rights.select(
        "user_id", F.col("rid").alias("id"), "ms", "arr_ms",
        "impression_id", "content_id", F.lit(1).alias("side"), "ts",
    )
    pl1, pr1 = os.path.join(work, "l1"), os.path.join(work, "r1")
    _restage(spark, l_u, pl1, "ms", boundaries)
    # rights are SLICED BY ARRIVAL, watermarked by event ts — the
    # transport reorders relative to event time, like a real topic
    _restage(spark, r_u, pr1, "arr_ms", boundaries)
    tagged_s = stream_late_split(
        _stream(spark, pl1).unionByName(_stream(spark, pr1)),
        "ts",
        delay_ms=_TTL_DELAY_MS,
        key_cols=["user_id"],
    )
    tagged_p = os.path.join(work, "tagged")
    with _stream_shuffle_partitions(spark):
        _drain(tagged_s, tagged_p, os.path.join(work, "_chk", "tagged"))
    tagged = spark.read.parquet(tagged_p)
    late_rights = tagged.filter((F.col("side") == 1) & F.col("late"))
    ok_rights = tagged.filter((F.col("side") == 1) & ~F.col("late"))
    lefts2 = tagged.filter(F.col("side") == 0)

    # ---- Q2: the production-TTL join over the on-time survivors;
    # per-slice event-time maxima are carried by on-time rows, so the
    # watermark sequence is the same one Q1 tagged against (and the
    # same one the oracle computes from ALL inputs)
    pl2, pr2 = os.path.join(work, "l2"), os.path.join(work, "r2")
    _restage(spark, lefts2.select(*common), pl2, "ms", boundaries)
    _restage(spark, ok_rights.select(*common), pr2, "arr_ms", boundaries)
    hi2 = int(l_u.select(F.max("ms")).first()[0] or 0)
    hi2 = max(hi2, int(r_u.select(F.max("ms")).first()[0] or 0))
    literal_df(
        spark,
        [(-1, -1, hi2 + _TTL_FLUSH_MS, hi2 + _TTL_FLUSH_MS, "zz", "zz", 0)],
        "user_id LONG, id LONG, ms LONG, arr_ms LONG,"
        " impression_id STRING, content_id STRING, side INT",
    ).select(
        *[c for c in common if c != "ts"],
        F.timestamp_millis("ms").alias("ts"),
    ).coalesce(1).write.mode("append").parquet(pl2)

    j = stream_inferred_join(
        _stream(spark, pl2),
        _stream(spark, pr2),
        user_col="user_id",
        left_id_col="id",
        right_id_col="id",
        left_ts_col="ts",
        right_ts_col="ts",
        scopes=(("content_id",),),
        fk_col="impression_id",
        window_before_ms=_TTL_BEFORE_MS,
        window_after_ms=0,
        delay_ms=_TTL_DELAY_MS,
        right_outer=True,
        left_retention_ms=_TTL_MS,
        ttl_floor=True,
    )
    out = os.path.join(work, "out")
    with _stream_shuffle_partitions(spark):
        _drain(j, out, os.path.join(work, "_chk", "out"))
    res = spark.read.parquet(out).filter(
        ~F.col("late") & (F.col("u") >= 0)
    )
    ok_rows = res.join(
        rights.select(
            F.col("rid").alias("right_id"),
            F.col("impression_id").alias("__fk"),
        ),
        "right_id",
        "left",
    ).select(
        F.col("right_id").alias("action_id"),
        F.col("u").alias("user_id"),
        F.col("right_ms").alias("act_ms"),
        F.col("left_id").alias("matched_click"),
        F.col("left_ms").alias("click_ms"),
        F.lit("ok").alias("channel"),
        (F.col("__fk").isNotNull() & F.col("left_id").isNull())
        .cast("long")
        .alias("fk_dropped"),
    )
    late_rows = late_rights.select(
        F.col("id").alias("action_id"),
        "user_id",
        F.col("ms").alias("act_ms"),
        F.lit(None).cast("long").alias("matched_click"),
        F.lit(None).cast("long").alias("click_ms"),
        F.lit("late").alias("channel"),
        F.lit(0).cast("long").alias("fk_dropped"),
    )
    return ok_rows.unionByName(late_rows)
