"""Checkpoint recovery: stop a streaming aggregation mid-stream and
restart it from its checkpoint over the remaining input. Exactly-once
means the final output EQUALS the batch aggregate over the full input:
windows straddling the stop point must aggregate rows from both runs
(state restored), and windows emitted before the stop must not be
re-emitted (offsets restored). Mirrors the reference's stance of 5 m
checkpoints + EXACTLY_ONCE restarts (SURVEY §2.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openmetrics_spark.jobs.streaming_flat_output import (
    SENTINEL_MS,
    _drain,
    _restage,
    _stream,
)
from openmetrics_spark.operators.metrics import tumbling_metrics
from openmetrics_spark.streaming.ops import stream_tumbling_metrics
from openmetrics_spark.tables import table

HOUR_MS = 3_600_000


def _read_out(spark, out):
    return (
        spark.read.parquet(out)
        .filter((F.col("event_type") != "zz") & (F.col("window_start_ms") < SENTINEL_MS))
    )


def test_checkpoint_restart_is_exactly_once(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events").select(
        "event_type", "ts", "value", F.unix_millis("ts").alias("ms")
    )
    lo, hi = ev.agg(F.min("ms"), F.max("ms")).first()
    # stop INSIDE the busiest hour, between two of its events, so the
    # window containing the stop point has rows on both sides of the
    # restart (a fixed midpoint can land in an hour with no trailing
    # events at sparse SFs)
    bucket = (F.floor(F.col("ms") / HOUR_MS) * HOUR_MS).cast("long")
    busy = (
        ev.groupBy(bucket.alias("b")).count().orderBy(F.desc("count"), "b").first()["b"]
    )
    in_hour = sorted(
        r["ms"]
        for r in ev.filter(bucket == busy).select("ms").collect()
    )
    assert len(in_hour) >= 2
    mid = in_hour[len(in_hour) // 2]
    assert in_hour[0] < mid <= in_hour[-1]
    stage = str(tmp_path / "events")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    aggs = lambda: {  # noqa: E731 — fresh Column objects per use
        "n": F.count(F.lit(1)),
        "value_cents": F.round(F.sum("value") * 100, 0).cast("long"),
    }

    def run_drain():
        agg = stream_tumbling_metrics(
            _stream(spark, stage), ["event_type"], "ts", HOUR_MS, aggs(), delay_ms=2000
        )
        _drain(agg, out, chk)

    # ---- run 1: first half only, then the query stops (no sentinel:
    # the trailing open windows stay in state, not in output) ----
    first = ev.filter(F.col("ms") < mid)
    _restage(spark, first, stage, "ms", [lo + (mid - lo) // 2], sentinel=False)
    run_drain()
    n_before = _read_out(spark, out).count()

    # ---- run 2: a NEW query object, SAME checkpoint, over the
    # remaining files + the flush sentinel ----
    rest = ev.filter(F.col("ms") >= mid)
    _restage(spark, rest, stage, "ms", [mid + (hi - mid) // 2], sentinel=True)
    run_drain()

    got = _read_out(spark, out)
    want = tumbling_metrics(ev, ["event_type"], "ts", HOUR_MS, aggs()).withColumnRenamed(
        "window_ms", "window_start_ms"
    )

    # the restart had to matter: run 1 emitted some but not all windows
    assert 0 < n_before < want.count()

    cols = ["event_type", "window_start_ms", "n", "value_cents"]
    g = sorted(tuple(r[c] for c in cols) for r in got.collect())
    w = sorted(tuple(r[c] for c in cols) for r in want.collect())
    assert g == w

    # belt and braces: append mode re-emitting a pre-stop window would
    # duplicate its (key, window) pair
    dups = (
        got.groupBy("event_type", "window_start_ms")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dups == 0

    # the straddling window really spans the stop point (state from
    # run 1 merged with rows from run 2)
    straddle_start = (mid // HOUR_MS) * HOUR_MS
    n_first = first.filter(
        (F.col("ms") >= straddle_start) & (F.col("ms") < straddle_start + HOUR_MS)
    ).count()
    n_rest = rest.filter(F.col("ms") < straddle_start + HOUR_MS).count()
    assert n_first > 0 and n_rest > 0
    emitted = (
        got.filter(F.col("window_start_ms") == straddle_start)
        .agg(F.sum("n"))
        .first()[0]
    )
    assert emitted == n_first + n_rest


def test_custom_state_machine_checkpoint_restart(spark, sf_dir, tmp_path):
    """Same exactly-once bar for the CUSTOM applyInPandasWithState
    operator (stream_cumulate_counter): stop mid-period, restart from
    the checkpoint, and the final cumulative series must equal the
    relational running sum — proving the state machine's running
    totals and open-step buffers round-trip through the state store,
    not just the built-in window aggregates."""
    from pyspark.sql import Window

    from openmetrics_spark.streaming.stateful import stream_cumulate_counter

    DAY_MS = 24 * HOUR_MS
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", F.unix_millis("ts").alias("ms")
    )
    lo, hi = ev.agg(F.min("ms"), F.max("ms")).first()
    bucket = (F.floor(F.col("ms") / HOUR_MS) * HOUR_MS).cast("long")
    busy = (
        ev.groupBy(bucket.alias("b")).count().orderBy(F.desc("count"), "b").first()["b"]
    )
    in_hour = sorted(r["ms"] for r in ev.filter(bucket == busy).select("ms").collect())
    assert len(in_hour) >= 2
    mid = in_hour[len(in_hour) // 2]

    stage = str(tmp_path / "events")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")

    def run_drain():
        cum = stream_cumulate_counter(
            _stream(spark, stage),
            key_col="user_id",
            ts_col="ts",
            step_ms=HOUR_MS,
            period_ms=DAY_MS,
            delay_ms=2000,
        )
        _drain(cum, out, chk)

    first = ev.filter(F.col("ms") < mid)
    _restage(spark, first, stage, "ms", [lo + (mid - lo) // 2], sentinel=False)
    run_drain()
    n_before = (
        spark.read.parquet(out).filter(F.col("key") >= 0).count()
    )

    rest = ev.filter(F.col("ms") >= mid)
    _restage(spark, rest, stage, "ms", [mid + (hi - mid) // 2], sentinel=True)
    run_drain()

    got = (
        spark.read.parquet(out)
        .filter((F.col("key") >= 0) & (F.col("window_ms") < SENTINEL_MS))
        .select("period_ms", "window_ms", F.col("key"), "n")
    )

    h = (
        ev.groupBy(
            "user_id",
            (F.floor(F.col("ms") / HOUR_MS) * HOUR_MS).cast("long").alias("window_ms"),
        )
        .agg(F.count(F.lit(1)).alias("ne"))
    )
    w = (
        Window.partitionBy(
            "user_id", F.floor(F.col("window_ms") / DAY_MS)
        )
        .orderBy("window_ms")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = h.select(
        (F.floor(F.col("window_ms") / DAY_MS) * DAY_MS).cast("long").alias("period_ms"),
        "window_ms",
        F.col("user_id").alias("key"),
        F.sum("ne").over(w).cast("long").alias("n"),
    )

    assert 0 < n_before < want.count()
    cols = ["period_ms", "window_ms", "key", "n"]
    g = sorted(tuple(r[c] for c in cols) for r in got.collect())
    x = sorted(tuple(r[c] for c in cols) for r in want.collect())
    assert g == x


def test_fused_counter_stream_checkpoint_restart(spark, sf_dir, tmp_path):
    """Exactly-once for the fused counter fan-out stream
    (streaming_counter_commands' shape): stop the watermarked
    multi-family bucket aggregate mid-stream, restart from the
    checkpoint over the rest + sentinel, then expand + encode the
    drained sink — the command multiset must EQUAL the batch
    unified_sliding_commands over the full input. This pins that the
    struct-of-arrays group keys (fidx, karr, farr) round-trip the
    state store across a restart, not just within one run."""
    from openmetrics_spark.functions.feature_ids import CountWindow
    from openmetrics_spark.jobs.counter import (
        DAY_MS,
        FAMILIES,
        HOUR_MS,
        encode_sliding_commands,
        fam_explode_structs,
        unified_sliding_commands,
    )
    from openmetrics_spark.operators.counters import expand_bucket_counts

    fams = (FAMILIES[0], FAMILIES[3])  # platform-device + log-user
    cfg = (DAY_MS, 4 * HOUR_MS, CountWindow.DAY, 2 * 86400)
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    flat = ev.select(
        (F.col("user_id") % 4).alias("platform_id"),
        F.concat(F.lit("lu"), F.col("user_id").cast("string")).alias(
            "log_user_id"
        ),
        F.lit("Linux").alias("os"),
        F.lit("Chrome").alias("user_agent_family"),
        F.when(F.col("event_type") == "view", 32)
        .otherwise(64)
        .cast("long")
        .alias("agg_metric"),
        "ts",
        F.unix_millis("ts").alias("ms"),
    )
    lo, hi = flat.agg(F.min("ms"), F.max("ms")).first()
    mid = (lo + hi) // 2
    stage = str(tmp_path / "flat")
    out = str(tmp_path / "buckets")
    chk = str(tmp_path / "chk")

    def run():
        bs = (
            _stream(spark, stage)
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
        _drain(bs, out, chk)

    _restage(
        spark,
        flat.filter(F.col("ms") < mid),
        stage,
        "ms",
        [lo + (mid - lo) // 2],
        sentinel=False,
    )
    run()
    n_before = spark.read.parquet(out).count()

    _restage(
        spark,
        flat.filter(F.col("ms") >= mid),
        stage,
        "ms",
        [mid + (hi - mid) // 2],
        sentinel=True,
    )
    run()

    b = spark.read.parquet(out).filter(
        F.element_at(F.col("__f.karr"), 1) != F.lit("-1")
    )
    got = encode_sliding_commands(
        expand_bucket_counts(
            b,
            ["__f", "__metric"],
            [(int(CountWindow.DAY), DAY_MS // (4 * HOUR_MS))],
            4 * HOUR_MS,
        ),
        fams,
        (cfg,),
    )
    want = unified_sliding_commands(flat, fams, (cfg,))
    assert 0 < n_before < spark.read.parquet(out).count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_cms_counter_stream_checkpoint_restart(spark, sf_dir, tmp_path):
    """The streaming CMS maintainer across a kill/restart: partial
    per-(window, j, b) counts in state must restore from the
    checkpoint, so the SUM-merged global counter table equals the
    batch cms_counters over the full input bit-for-bit."""
    from openmetrics_spark.operators.sketches import (
        cms_bucket_rows,
        cms_counters,
    )

    DAY_MS = 86_400_000
    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", F.unix_millis("ts").alias("ms")
    )
    lo, hi = ev.agg(F.min("ms"), F.max("ms")).first()
    all_ms = sorted(r["ms"] for r in ev.select("ms").collect())
    mid = all_ms[len(all_ms) // 2]
    stage = str(tmp_path / "events")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")

    def run_drain():
        cs = (
            _stream(spark, stage)
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
        _drain(cs, out, chk)

    first = ev.filter(F.col("ms") < mid)
    _restage(spark, first, stage, "ms", [lo + (mid - lo) // 2], sentinel=False)
    run_drain()
    n_before = spark.read.parquet(out).count()

    rest = ev.filter(F.col("ms") >= mid)
    _restage(spark, rest, stage, "ms", [mid + (hi - mid) // 2], sentinel=True)
    run_drain()

    got = {
        (r.j, r.b): r.c
        for r in spark.read.parquet(out)
        .filter(F.col("window_start_ms") < SENTINEL_MS - DAY_MS)
        .groupBy("j", "b")
        .agg(F.sum("c").cast("long").alias("c"))
        .collect()
    }
    want = {
        (r.j, r.b): r.c
        for r in cms_counters(
            ev.filter(F.col("user_id").isNotNull()), [], "user_id"
        ).collect()
    }
    # the restart had to matter: run 1 emitted some but not all rows
    n_after = spark.read.parquet(out).count()
    assert 0 < n_before < n_after, (n_before, n_after)
    assert got == want
