"""Skew + co-location machinery under the oracle gate.

``operators/scale.py`` carries the two explicit scale levers the
engine reaches for when AQE alone can't fix a join — hot-key salting
(``salted_join``) and write-time hash bucketing for Exchange-free
co-located joins (``write_bucketed``/``bucketed_table``). Both were
pytest-only through r8 (VERDICT r8 anti-pattern sweep confirms the
machinery; tests/test_scale.py proves the plans); this query drives
BOTH through the driver's hash gate: the same fact-to-fact join
aggregate is computed three ways — Catalyst's plain pick, the salted
rewrite, and the bucketed co-located read-back — and all three
manifests must hash-match one DuckDB oracle. A wrong salt fan-out
(lost or duplicated rows) or a bucketing round-trip corruption flips
the hash.

Reference analog: the Flink pipeline leans on Kafka's keyed-partition
transport for the same co-location (SURVEY §4; reference
pipeline/src/main/java/ai/promoted/metrics/logprocessor/common/job/
MetricsApiKafkaSource.java keys every topic by platform+logUserId so
downstream keyBy is shuffle-free); Spark's equivalent primitives are
storage-side bucketing and explicit salting.

100 TB posture: the bucketed leg is THE answer for a fact-to-fact
join that repeats across runs (lineitem⋈orders here): one shuffle at
write time, zero at every read — the plan guard in
tests/test_scale.py::test_scale_join_strategies_bucketed_leg_plan
asserts no Exchange above either scan. The salted leg bounds the
worst reducer at 1/n_salts of the hottest key. The aggregates are
exact-integer sums (functions/money.py) so all three legs hash
identically regardless of partial-agg order.
"""

from __future__ import annotations

import atexit
import itertools
import os
import shutil
import tempfile
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmetrics_spark.functions.money import exact_units
from openmetrics_spark.operators.scale import (
    bucketed_table,
    salted_join,
    write_bucketed,
)
from openmetrics_spark.queries import register
from openmetrics_spark.tables import table

_SCRATCH_ROOT = os.path.join(
    tempfile.gettempdir(), f"omx_scale_q_{os.getpid()}"
)
atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)

# Catalog hygiene: saveAsTable registers session-catalog entries; a
# pid-keyed name alone collides across concurrent SparkSessions in one
# process and nothing would unregister it (the atexit above removes
# only files). Every call gets a fresh nonce; create+analyze+swap runs
# under one lock so a concurrent call can only ever drop PREDECESSOR
# tables whose DataFrames are already analyzed (an analyzed
# spark.table() frame keeps its resolved relation, and DROP TABLE on
# an external table leaves the parquet files in place — safe even if
# a prior result frame is still being consumed). The final call's two
# entries live until process exit, bounded by construction.
_CALL_SEQ = itertools.count()
_LIVE_TABLES: list[str] = []
_CATALOG_LOCK = threading.Lock()


def _drop_registered(spark: SparkSession) -> None:
    while _LIVE_TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {_LIVE_TABLES.pop()}")

_CUTOFF = "1996-01-01 00:00:00"
_N_BUCKETS = 8

_STRATEGIES_ORACLE = f"""
WITH agg AS (
  SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n_items,
         CAST(SUM(CAST(floor((l_extendedprice * (1 - l_discount)) * 10000
                             + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate >= TIMESTAMP '{_CUTOFF}'
  GROUP BY 1
)
SELECT s.strategy, a.o_orderpriority, a.n_items, a.revenue_e4
FROM agg a
CROSS JOIN (VALUES ('plain'), ('salted'), ('bucketed')) AS s(strategy)
"""


def _fact_sides(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The two join sides, pruned to exactly the columns the join and
    aggregate need (ReadSchema stays 3+2 columns wide) with the date
    filter pushed to the lineitem scan."""
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit(_CUTOFF).cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return li, o


def _priority_agg(joined: DataFrame, strategy: str) -> DataFrame:
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(exact_units(rev, 10000)).cast("long").alias("revenue_e4"),
        )
        .select(
            F.lit(strategy).alias("strategy"),
            "o_orderpriority",
            "n_items",
            "revenue_e4",
        )
    )


def _bucketed_leg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write both fact sides hash-bucketed by the join key, read them
    back with the bucket spec intact, and return the co-located join —
    no Exchange above either scan (plan-guarded in tests/test_scale.py).
    The ``merge`` hint pins SortMergeJoin so the broadcast planner
    can't paper over a bucketing regression at test scale."""
    li, o = _fact_sides(spark, sf_dir)
    with _CATALOG_LOCK:
        tag = f"omx_scale_{os.getpid()}_{next(_CALL_SEQ)}"
        li_name, o_name = f"{tag}_li", f"{tag}_o"
        write_bucketed(
            li,
            li_name,
            os.path.join(_SCRATCH_ROOT, f"{tag}_li"),
            ["l_orderkey"],
            _N_BUCKETS,
            sort_cols=["l_orderkey"],
        )
        write_bucketed(
            o,
            o_name,
            os.path.join(_SCRATCH_ROOT, f"{tag}_o"),
            ["o_orderkey"],
            _N_BUCKETS,
            sort_cols=["o_orderkey"],
        )
        # analyze BEFORE dropping predecessors / registering ourselves:
        # once spark.table() has resolved the relation, a later drop of
        # the catalog entry cannot break this frame
        lb = bucketed_table(spark, li_name)
        ob = bucketed_table(spark, o_name)
        _drop_registered(spark)
        _LIVE_TABLES.extend([li_name, o_name])
    return lb.join(ob.hint("merge"), lb.l_orderkey == ob.o_orderkey)


@register(
    "scale_join_strategies", oracle=_STRATEGIES_ORACLE, tags=("scale",)
)
def scale_join_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority revenue from lineitem⋈orders computed three ways —
    Catalyst's plain plan, the hot-key ``salted_join`` rewrite, and the
    Exchange-free bucketed co-located read-back — unioned into one
    manifest that must hash-match a single DuckDB aggregate replicated
    per strategy (see module docstring)."""
    li, o = _fact_sides(spark, sf_dir)
    plain = _priority_agg(
        li.join(o, li.l_orderkey == o.o_orderkey), "plain"
    )
    salted = _priority_agg(
        salted_join(
            li.withColumnRenamed("l_orderkey", "okey"),
            o.withColumnRenamed("o_orderkey", "okey"),
            ["okey"],
            n_salts=8,
        ),
        "salted",
    )
    bucketed = _priority_agg(_bucketed_leg(spark, sf_dir), "bucketed")
    return plain.unionByName(salted).unionByName(bucketed)


# ---------------------------------------------------------------------------
# Hot-key detection — the monitoring complement of the r11 skew gates:
# find the power-law key BEFORE it concentrates a task. The reference
# meets this failure mode reactively (the logged-out/bot shared id,
# KeyUtil.java:27-98); a deployment wants the detector running over
# the same keyed stream the stateful ops consume.
# ---------------------------------------------------------------------------

_HOT_KEY_ORACLE = """
WITH k AS (
  SELECT user_id % 4 AS platform_id,
         CASE WHEN user_id % 8 = 0 THEN 'uhot'
              ELSE 'u' || CAST(user_id AS VARCHAR) END AS log_user_id,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
), t AS (SELECT CAST(sum(n_events) AS BIGINT) AS total FROM k)
SELECT platform_id, log_user_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_events * 10000 // total AS BIGINT) AS share_bp,
       CAST(n_events * 100 > total AS BIGINT) AS is_hot
FROM k, t
ORDER BY n_events DESC, platform_id, log_user_id
LIMIT 20
"""


@register(
    "events_hot_key_report",
    oracle=_HOT_KEY_ORACLE,
    tags=("scale", "monitor", "skew"),
)
def events_hot_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 (platform_id, log_user_id) keys by event share over the
    SKEWED derivation (the bfj_pipeline_manifest_skewed key space, so
    there is a genuine hot key to detect), share in exact integer basis
    points, ``is_hot`` = share > 1%. 100 TB: one map-combinable
    (platform, user) count, a one-row broadcast total, and a
    TakeOrderedAndProject over the aggregated key frame — the raw
    stream is scanned once and never re-shuffled; this is the report a
    deployment alerts on before the hot key reaches the stateful ops
    (reference failure shape: KeyUtil.java:27-98)."""
    from openmetrics_spark.tables import table

    k = (
        table(spark, sf_dir, "events")
        .select(
            (F.col("user_id") % 4).alias("platform_id"),
            F.when(F.col("user_id") % 8 == 0, F.lit("uhot"))
            .otherwise(F.concat(F.lit("u"), F.col("user_id")))
            .alias("log_user_id"),
        )
        .groupBy("platform_id", "log_user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    total = k.agg(F.sum("n_events").alias("total"))
    rep = (
        k.crossJoin(F.broadcast(total))
        .select(
            "platform_id",
            "log_user_id",
            F.col("n_events").cast("long").alias("n_events"),
            # integer division end-to-end: double-precision floor(a*1e4/b)
            # can round an exact-boundary quotient UP at 100 TB counts
            # (53-bit mantissa), flipping a basis point vs the oracle
            F.expr("n_events * 10000 DIV total").cast("long").alias("share_bp"),
            (F.col("n_events") * 100 > F.col("total"))
            .cast("long")
            .alias("is_hot"),
        )
        .orderBy(
            F.col("n_events").desc(), "platform_id", "log_user_id"
        )
        .limit(20)
    )
    return rep


_STREAM_HOT_KEY_ORACLE = """
WITH k AS (
  SELECT (epoch_ms(ts) // 21600000) * 21600000 AS window_start_ms,
         user_id % 4 AS platform_id,
         CASE WHEN user_id % 8 = 0 THEN 'uhot'
              ELSE 'u' || CAST(user_id AS VARCHAR) END AS log_user_id,
         count(*) AS n_events
  FROM events GROUP BY 1, 2, 3
), t AS (
  SELECT window_start_ms, CAST(sum(n_events) AS BIGINT) AS total
  FROM k GROUP BY 1
)
SELECT window_start_ms, platform_id, log_user_id,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_events * 10000 // total AS BIGINT) AS share_bp
FROM k JOIN t USING (window_start_ms)
WHERE n_events * 100 > total
ORDER BY window_start_ms, n_events DESC, platform_id, log_user_id
"""


@register(
    "streaming_hot_key_report",
    oracle=_STREAM_HOT_KEY_ORACLE,
    tags=("scale", "monitor", "skew", "streaming"),
)
def streaming_hot_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_hot_key_report as a WINDOWED STREAMING monitor: per
    6-hour tumbling window, every key above 1% of the window's events
    (exact integer-bp share). The streaming stage is the same one
    map-combinable (window, key) count behind a watermark as
    streaming_quality_drift; the per-window total + share gate runs as
    a batch post-pass over the tiny drained key frame. This is the
    alert cadence a deployment actually runs — a hot key detected one
    window after it appears, not at end-of-day."""
    import os as _os

    from openmetrics_spark.jobs.streaming_flat_output import (
        _drain,
        _restage,
        _stream,
    )
    from openmetrics_spark.queries.streaming_q import (
        _events_grid,
        _stream_shuffle_partitions,
        _workdir,
    )
    from openmetrics_spark.tables import pin, table

    win_ms = 21_600_000
    ev = table(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).alias("platform_id"),
        F.when(F.col("user_id") % 8 == 0, F.lit("uhot"))
        .otherwise(F.concat(F.lit("u"), F.col("user_id")))
        .alias("log_user_id"),
        "ts",
        F.unix_millis("ts").alias("ms"),
    )
    work = _workdir("hot_key_stream")
    staged = _os.path.join(work, "ev")
    _restage(spark, ev, staged, "ms", _events_grid(spark, sf_dir), sentinel=True)

    s = _stream(spark, staged).withWatermark("ts", "1 millisecond")
    counts = (
        s.groupBy(
            F.window("ts", f"{win_ms} milliseconds").alias("w"),
            "platform_id",
            "log_user_id",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "platform_id",
            "log_user_id",
            "n_events",
        )
    )
    out = _os.path.join(work, "k")
    with _stream_shuffle_partitions(spark):
        _drain(counts, out, _os.path.join(work, "_chk", "k"))

    k = pin(spark.read.parquet(out))
    t = k.groupBy("window_start_ms").agg(
        F.sum("n_events").cast("long").alias("total")
    )
    return (
        k.join(t, "window_start_ms")
        .filter(F.col("n_events") * 100 > F.col("total"))
        .select(
            "window_start_ms",
            "platform_id",
            "log_user_id",
            F.col("n_events").cast("long").alias("n_events"),
            # exact integer division (see events_hot_key_report)
            F.expr("n_events * 10000 DIV total").cast("long").alias("share_bp"),
        )
    )
