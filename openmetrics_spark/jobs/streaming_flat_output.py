"""The flat-output job assembled as ONE streaming pipeline — the
Structured Streaming twin of ``jobs.flat_output.run_flat_output``
(reference: pipeline/.../job/join/FlatOutputJob.java:394-1044):

    validate → keep-first dedup → traffic/bot filters
    → combine delivery logs → tiny projections
    → inferred join view → insertion   ([-10m, +1s])
    → inferred join insertion → impression ([-30m, +1s])
    → inferred join impression → action   ([-1d, +1s])
    → reduce redundant impressions (+ action re-point)
    → flat response insertions (session window, 1d gap)

with the late side tables (the reference's LATE_EVENTS_TAG →
etl_side/late_*) split out of every join stage.

Why stages, not one query: Spark allows ONE applyInPandasWithState
per streaming query, so the five custom stateful operators (combine,
3 joins, reduce) each anchor their own query, handed off through
ordered parquet directories — the same architecture the reference
deploys, where each Flink job consumes and produces Kafka topics; a
cluster deployment swaps ``_drain``'s file sink for a topic. All the
stateless work (validation, dedup, filters, tiny projections, payload
re-attachment) rides in the same query as the nearest stateful
operator or runs as plain batch projections between stages.

Event-time mechanics: every staged directory is rewritten as a few
time-ordered files (``_restage``) so the downstream file source
replays it in watermark-friendly order, and right-side inputs get a
far-future sentinel row — the end-of-input watermark of the
reference's bounded backfills — so pending state flushes. Join ids
travel as xxhash64 longs (the twins' id type); payloads re-attach by
hash via stream-static joins against the staged tiny tables.

Scale: state per stage is the twin's documented budget (window
buffers, TTL'd remaps); the handoff tables are append-only parquet
partitionable by event-time hour; nothing collects to the driver.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openmetrics_spark.jobs.flat_output import FlatOutputConfig
from openmetrics_spark.operators.dedup import keep_first  # noqa: F401 (doc xref)
from openmetrics_spark.operators.filters import filter_bots, filter_non_production
from openmetrics_spark.operators.flat import (
    fix_delivery_log,
    restructure_delivery_log,
    to_tiny_actions,
    to_tiny_impressions,
    to_tiny_insertions,
    to_tiny_view,
)
from openmetrics_spark.operators.validate import (
    validate_action,
    validate_delivery_log,
    validate_impression,
    validate_view,
)
from openmetrics_spark.streaming.core import stream_from_dir
from openmetrics_spark.tables import literal_df
from openmetrics_spark.streaming.ops import stream_keep_first
from openmetrics_spark.streaming.stateful import (
    stream_combine_delivery_logs,
    stream_inferred_join,
    stream_reduce_redundant_impressions,
)

SENTINEL_MS = 4_000_000_000_000  # far future: flushes every watermark
DAY_MS = 86_400_000
_SEP = "\x1f"


def _u():
    return F.concat_ws(_SEP, F.col("platform_id").cast("string"), F.col("log_user_id"))


def _drain(sdf: DataFrame, path: str, chk: str) -> None:
    q = (
        sdf.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _sentinel_row(schema: T.StructType) -> tuple:
    out = []
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, T.TimestampType):
            from datetime import datetime, timezone

            out.append(datetime.fromtimestamp(SENTINEL_MS / 1000, tz=timezone.utc))
        elif isinstance(dt, T.LongType):
            out.append(SENTINEL_MS if f.name.endswith(("_ms", "_ts")) else -1)
        elif isinstance(dt, (T.IntegerType,)):
            out.append(-1)
        elif isinstance(dt, T.StringType):
            out.append("zz")
        elif isinstance(dt, T.BooleanType):
            out.append(False)
        elif isinstance(dt, T.DoubleType):
            out.append(0.0)
        else:
            out.append(None)
    return tuple(out)


def _literal_df(spark: SparkSession, schema: T.StructType, row: tuple, n: int = 1) -> DataFrame:
    """A tiny constant DataFrame built JVM-side (see tables.literal_df
    for why createDataFrame is banned from staging paths)."""
    return literal_df(spark, [row] * n, schema)


def _restage(
    spark: SparkSession,
    src: str | DataFrame,
    dst: str,
    ms_col: str,
    boundaries: list[int],
    sentinel: bool = False,
) -> None:
    """Rewrite a staged table as time-sliced single files with
    ascending mtimes (FileStreamSource replays by mtime), optionally
    appending a far-future sentinel file — the ordered-topic transport
    between stages.

    ``boundaries`` is the GLOBAL time grid shared by every staged
    directory: with both inputs of a join cut at the same timestamps,
    micro-batch k of both sources covers the same event-time slice, so
    the union watermark after batch k never outruns batch k+1's rows —
    no false lates from per-source file skew. Empty slices still write
    a (0-row) file to keep the per-source batch count aligned."""
    import glob
    import shutil

    df = spark.read.parquet(src) if isinstance(src, str) else src
    t0 = int(time.time()) - 1000
    n_slices = len(boundaries) + 1
    # ONE job writes every slice: slice id = how many boundaries the
    # row has passed; repartition on it gives each slice exactly one
    # task → exactly one file (one file per slice is load-bearing:
    # maxFilesPerTrigger=1 makes each file a micro-batch, and a slice
    # split across files would let the watermark outrun the second
    # file's rows → false lates). The old per-slice loop ran
    # 1 + n_slices sequential jobs, each a full input re-scan plus a
    # single-threaded sorted write — ~2x the whole staging cost.
    slice_id = F.lit(0)
    for b in boundaries:
        slice_id = slice_id + (F.col(ms_col) >= F.lit(b)).cast("int")
    n_out = n_slices
    sliced = df.withColumn("__slice", slice_id)
    if sentinel:
        # the far-future sentinel rides the SAME write job as its own
        # final slice instead of a second append job per staged dir
        # (r12: one Spark job per _restage call saved — every staged
        # replay pays this). The sentinel row is tagged with an
        # EXPLICIT slice id, never derived from ms_col — on plain
        # "ms"-named columns the sentinel template carries -1 (only
        # *_ms/*_ts suffixed fields get SENTINEL_MS), which a derived
        # id would misroute into slice 0 and flush the watermark a
        # batch early. Its file still gets the LAST mtime below, so
        # it remains the final micro-batch.
        sent = _literal_df(spark, df.schema, _sentinel_row(df.schema))
        sliced = sliced.unionByName(
            sent.withColumn("__slice", F.lit(n_slices))
        )
        n_out = n_slices + 1
    tmp = f"{dst}__stage_tmp"
    (
        sliced
        .repartition(n_out, "__slice")
        .sortWithinPartitions(ms_col)
        .write.partitionBy("__slice")
        .mode("overwrite")
        .parquet(tmp)
    )
    os.makedirs(dst, exist_ok=True)
    for i in range(n_out):
        files = sorted(
            glob.glob(os.path.join(tmp, f"__slice={i}", "*.parquet"))
        )
        if not files:
            # empty slices still write a (0-row) file to keep the
            # per-source batch count aligned across staged dirs
            before = set(os.listdir(dst))
            _literal_df(
                spark, df.schema, _sentinel_row(df.schema), n=0
            ).coalesce(1).write.mode("append").parquet(dst)
            for name in set(os.listdir(dst)) - before:
                os.utime(os.path.join(dst, name), (t0 + i, t0 + i))
            continue
        for f in files:
            target = os.path.join(
                dst, f"slice_{t0}_{i}_{os.path.basename(f)}"
            )
            shutil.move(f, target)
            os.utime(target, (t0 + i, t0 + i))
    shutil.rmtree(tmp, ignore_errors=True)


def _stream(spark: SparkSession, path: str) -> DataFrame:
    schema = spark.read.parquet(path).schema
    return stream_from_dir(spark, path, schema, max_files_per_trigger=1)


def _hash(*cols: str):
    return F.xxhash64(*[F.col(c) for c in cols])


def run_streaming_flat_output(
    spark: SparkSession,
    raw_dirs: dict[str, str],
    work_dir: str,
    cfg: FlatOutputConfig | None = None,
    delay_ms: int = 2000,
) -> dict[str, DataFrame]:
    """Drain the staged pipeline over raw parquet directories
    (``raw_dirs`` keys: view, delivery_log, impression, action) and
    return the final outputs + late side tables as batch DataFrames.
    """
    cfg = cfg or FlatOutputConfig()
    W = work_dir

    def p(name: str) -> str:
        return os.path.join(W, name)

    def chk(name: str) -> str:
        return os.path.join(W, "_chk", name)

    # the global event-time grid every staged directory is sliced on
    # (see _restage): thirds of the raw inputs' log_timestamp span
    lo, hi = None, None
    for d in raw_dirs.values():
        r = (
            spark.read.parquet(d)
            .agg(F.min("log_timestamp"), F.max("log_timestamp"))
            .first()
        )
        if r[0] is not None:
            lo = r[0] if lo is None else min(lo, r[0])
            hi = r[1] if hi is None else max(hi, r[1])
    grid = [lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3]

    # ---- stage 1: validate → dedup → filters → tiny projections ----
    view_s = _stream(spark, raw_dirs["view"]).withColumn(
        "ts", F.timestamp_millis("log_timestamp")
    )
    view_s, _ = validate_view(view_s)
    view_s = stream_keep_first(view_s, ["platform_id", "view_id"], "ts", DAY_MS)
    view_s, _ = filter_bots(view_s)
    tiny_view = (
        to_tiny_view(view_s)
        .withColumn("u", _u())
        .withColumn("vid_h", _hash("view_id"))
        .withColumn("ts", F.timestamp_millis("view_ts"))
    )
    _drain(tiny_view, p("raw_tiny_view"), chk("tiny_view"))
    _restage(spark, p("raw_tiny_view"), p("tiny_view"), "view_ts", grid)

    dl_s = _stream(spark, raw_dirs["delivery_log"]).withColumn(
        "ts", F.timestamp_millis("log_timestamp")
    )
    dl_s, _ = validate_delivery_log(dl_s)
    dl_s = stream_keep_first(dl_s, ["platform_id", "request_id"], "ts", DAY_MS)
    dl_s = fix_delivery_log(restructure_delivery_log(dl_s))
    dl_s, _ = filter_non_production(dl_s)
    dl_s, _ = filter_bots(dl_s)
    _drain(dl_s, p("raw_dl_prepped"), chk("dl_prepped"))
    _restage(
        spark, p("raw_dl_prepped"), p("dl_prepped"), "log_timestamp", grid, sentinel=True
    )

    imp_s = _stream(spark, raw_dirs["impression"]).withColumn(
        "ts", F.timestamp_millis("log_timestamp")
    )
    imp_s, _ = validate_impression(imp_s)
    imp_s = stream_keep_first(imp_s, ["platform_id", "impression_id"], "ts", DAY_MS)
    tiny_imp = (
        to_tiny_impressions(imp_s)
        .withColumn("u", _u())
        .withColumn("imp_h", _hash("impression_id"))
        .withColumn("ts", F.timestamp_millis("impression_ts"))
    )
    _drain(tiny_imp, p("raw_tiny_imp"), chk("tiny_imp"))
    _restage(spark, p("raw_tiny_imp"), p("tiny_imp"), "impression_ts", grid, sentinel=True)

    act_s = _stream(spark, raw_dirs["action"]).withColumn(
        "ts", F.timestamp_millis("log_timestamp")
    )
    act_s, _ = validate_action(act_s)
    act_s = stream_keep_first(act_s, ["platform_id", "action_id"], "ts", DAY_MS)
    tiny_act = (
        to_tiny_actions(act_s)
        .withColumn("u", _u())
        .withColumn("act_h", _hash("action_id", "content_id"))
        .withColumn("ts", F.timestamp_millis("action_ts"))
    )
    _drain(tiny_act, p("raw_tiny_act"), chk("tiny_act"))
    _restage(spark, p("raw_tiny_act"), p("tiny_act"), "action_ts", grid, sentinel=True)

    # ---- stage 2: combine delivery logs (stateful), then the tiny
    # insertion fan-out as a batch projection over the winners ----
    combined = stream_combine_delivery_logs(
        _stream(spark, p("dl_prepped")).withColumn(
            "ts", F.timestamp_millis("log_timestamp")
        ),
        window_ms=2000,
        delay_ms=delay_ms,
    )
    _drain(combined, p("raw_combined"), chk("combined"))
    winners = spark.read.parquet(p("raw_combined")).select(
        "platform_id", "request_id"
    )
    dl_win = (
        spark.read.parquet(p("dl_prepped"))
        .join(winners, ["platform_id", "request_id"], "left_semi")
    )
    tiny_ins = (
        to_tiny_insertions(dl_win)
        .withColumn("u", _u())
        .withColumn("iid_h", _hash("insertion_id"))
        .withColumn("ts", F.timestamp_millis("insertion_ts"))
    )
    _restage(spark, tiny_ins, p("tiny_ins"), "insertion_ts", grid, sentinel=True)

    # ---- stage 3: view → insertion (right-outer) ----
    j1 = stream_inferred_join(
        _stream(spark, p("tiny_view")),
        _stream(spark, p("tiny_ins")),
        user_col="u",
        left_id_col="vid_h",
        right_id_col="iid_h",
        left_ts_col="ts",
        right_ts_col="ts",
        fk_col="view_id",
        scopes=((),),
        window_before_ms=cfg.view_insertion_before_ms,
        window_after_ms=cfg.max_out_of_order_ms,
        delay_ms=delay_ms,
        right_outer=True,
    )
    _drain(j1, p("raw_ins_joined"), chk("ins_joined"))
    _restage(spark, p("raw_ins_joined"), p("ins_joined"), "right_ms", grid)

    # static payload tables for re-attachment (complete once staged)
    tiny_ins_b = spark.read.parquet(p("tiny_ins"))
    tiny_view_b = spark.read.parquet(p("tiny_view"))
    tiny_imp_b = spark.read.parquet(p("tiny_imp"))
    tiny_act_b = spark.read.parquet(p("tiny_act"))

    # Every _*_resolved enrichment below is SENTINEL-PRESERVING: the
    # staged sentinel row (ids = -1, ms = SENTINEL_MS) must flow
    # through the payload joins into the next stateful stage, because
    # it is the only thing that advances that stage's watermark past
    # the real data. (A separate sentinel source does NOT work: its
    # single file is consumed in micro-batch 0, the watermark jumps to
    # the far future immediately, and Spark's late-input filter then
    # silently drops every later batch of real rows.) Event time is
    # taken from the join row's right_ms — identical to the payload's
    # own ts for real rows — so the sentinel keeps its timestamp even
    # though its payload joins miss.

    def _ins_resolved(ij: DataFrame) -> DataFrame:
        """ins_joined rows → full insertion rows with the picked view
        (MergeDetails as a pk join; view id falls back to the
        insertion's own FK when no view matched)."""
        return (
            ij.filter(~F.col("late"))
            .join(tiny_ins_b.drop("u", "ts"), ij.right_id == tiny_ins_b.iid_h, "left")
            .join(
                tiny_view_b.select(
                    F.col("vid_h").alias("__vh"),
                    F.col("view_id").alias("__picked_view"),
                ),
                ij.left_id == F.col("__vh"),
                "left",
            )
            .filter(F.col("iid_h").isNotNull() | (ij.right_id == -1))
            .select(
                "u",
                "platform_id",
                "log_user_id",
                "insertion_id",
                F.coalesce(F.col("iid_h"), F.lit(-1)).alias("iid_h"),
                "request_id",
                F.coalesce(F.col("__picked_view"), F.col("view_id")).alias("view_id"),
                "content_id",
                "position",
                F.col("right_ms").alias("insertion_ts"),
                F.timestamp_millis("right_ms").alias("ts"),
            )
        )

    # ---- stage 4: insertion → impression ----
    j2 = stream_inferred_join(
        _ins_resolved(_stream(spark, p("ins_joined"))),
        _stream(spark, p("tiny_imp")),
        user_col="u",
        left_id_col="iid_h",
        right_id_col="imp_h",
        left_ts_col="ts",
        right_ts_col="ts",
        fk_col="insertion_id",
        scopes=(("request_id",), ("view_id",), ("content_id",)),
        content_col="content_id",
        window_before_ms=cfg.insertion_impression_before_ms,
        window_after_ms=cfg.max_out_of_order_ms,
        delay_ms=delay_ms,
        right_outer=True,
    )
    _drain(j2, p("raw_imp_joined"), chk("imp_joined"))
    _restage(spark, p("raw_imp_joined"), p("imp_joined"), "right_ms", grid, sentinel=True)

    ins_resolved_b = _ins_resolved(spark.read.parquet(p("ins_joined")))

    def _imp_resolved(ij: DataFrame) -> DataFrame:
        """imp_joined rows (matched only) → full impression rows.
        Sentinel-preserving (see above)."""
        ins_pay = ins_resolved_b.filter(F.col("iid_h") != -1).select(
            F.col("iid_h").alias("__ih"),
            F.col("insertion_id").alias("__ins_id"),
            F.col("request_id").alias("__req_id"),
            F.col("view_id").alias("__view_id"),
            F.col("content_id").alias("__ins_content"),
            F.col("position").alias("__pos"),
        )
        return (
            ij.filter(~F.col("late") & F.col("left_id").isNotNull())
            .join(tiny_imp_b.drop("u", "ts"), ij.right_id == tiny_imp_b.imp_h, "left")
            .join(ins_pay, ij.left_id == F.col("__ih"), "left")
            .filter(
                (F.col("imp_h").isNotNull() & F.col("__ih").isNotNull())
                | (ij.right_id == -1)
            )
            .select(
                "u",
                "platform_id",
                "log_user_id",
                "impression_id",
                F.coalesce(F.col("imp_h"), F.lit(-1)).alias("imp_h"),
                F.col("__ins_id").alias("insertion_id"),
                F.col("__req_id").alias("request_id"),
                F.col("__view_id").alias("view_id"),
                F.coalesce(F.col("content_id"), F.col("__ins_content")).alias(
                    "content_id"
                ),
                F.col("__pos").alias("position"),
                F.col("right_ms").alias("impression_ts"),
                F.timestamp_millis("right_ms").alias("ts"),
            )
        )

    # ---- stage 5: impression → action ----
    j3 = stream_inferred_join(
        _imp_resolved(_stream(spark, p("imp_joined"))),
        _stream(spark, p("tiny_act")),
        user_col="u",
        left_id_col="imp_h",
        right_id_col="act_h",
        left_ts_col="ts",
        right_ts_col="ts",
        fk_col="impression_id",
        scopes=(
            ("insertion_id",),
            ("request_id",),
            ("view_id",),
            ("content_id",),
        ),
        content_col="content_id",
        window_before_ms=cfg.impression_action_before_ms,
        window_after_ms=cfg.max_out_of_order_ms,
        delay_ms=delay_ms,
        right_outer=True,
    )
    _drain(j3, p("raw_act_joined"), chk("act_joined"))
    _restage(spark, p("raw_act_joined"), p("act_joined"), "right_ms", grid, sentinel=True)

    imp_resolved_b = _imp_resolved(spark.read.parquet(p("imp_joined")))

    def _act_resolved(aj: DataFrame) -> DataFrame:
        """act_joined rows (matched only) → full action rows carrying
        the picked impression's resolved scope. The action 'id' for
        downstream state is the (action_id, content_id) fan-out hash
        rendered as a string — unique where raw action_id is not."""
        imp_pay = imp_resolved_b.filter(F.col("imp_h") != -1).select(
            F.col("imp_h").alias("__imh"),
            F.col("impression_id").alias("__imp_id"),
            F.col("insertion_id").alias("__ins_id"),
            F.col("request_id").alias("__req_id"),
            F.col("view_id").alias("__view_id"),
            F.col("content_id").alias("__imp_content"),
        )
        return (
            aj.filter(~F.col("late") & F.col("left_id").isNotNull())
            .join(tiny_act_b.drop("u", "ts"), aj.right_id == tiny_act_b.act_h, "left")
            .join(imp_pay, aj.left_id == F.col("__imh"), "left")
            .filter(
                (F.col("act_h").isNotNull() & F.col("__imh").isNotNull())
                | (aj.right_id == -1)
            )
            .select(
                "u",
                "platform_id",
                "log_user_id",
                F.coalesce(F.col("act_h"), F.lit(-1)).cast("string").alias(
                    "action_uid"
                ),
                F.col("action_id").alias("raw_action_id"),
                "action_type",
                "quantity",
                "price_usd_micros_per_unit",
                F.col("__imp_id").alias("impression_id"),
                F.col("__ins_id").alias("insertion_id"),
                F.col("__req_id").alias("request_id"),
                F.col("__view_id").alias("view_id"),
                F.coalesce(F.col("content_id"), F.col("__imp_content")).alias(
                    "content_id"
                ),
                F.col("right_ms").alias("action_ts"),
                F.timestamp_millis("right_ms").alias("ts"),
            )
        )

    # ---- stage 6: reduce redundant impressions + re-point actions ----
    imps_for_reduce = _imp_resolved(_stream(spark, p("imp_joined")))
    acts_for_reduce = _act_resolved(_stream(spark, p("act_joined"))).withColumn(
        "action_id", F.col("action_uid")
    )
    reduced = stream_reduce_redundant_impressions(
        imps_for_reduce,
        acts_for_reduce,
        ttl_ms=cfg.redundant_impression_ttl_ms,
        delay_ms=delay_ms,
    )
    _drain(reduced, p("raw_reduced"), chk("reduced"))
    _restage(spark, p("raw_reduced"), p("reduced"), "ms", grid, sentinel=True)

    reduced_b = spark.read.parquet(p("reduced"))
    kept_imp_b = (
        reduced_b.filter((F.col("kind") == 0) & ~F.col("is_redundant"))
        .select(F.col("event_id").alias("impression_id"))
        .join(imp_resolved_b, "impression_id")
    )
    act_resolved_all = _act_resolved(spark.read.parquet(p("act_joined")))
    repointed_act_b = (
        reduced_b.filter(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("action_uid"),
            F.col("canonical_impression_id").alias("__canon"),
        )
        .join(act_resolved_all, "action_uid")
        .withColumn("impression_id", F.coalesce(F.col("__canon"), F.col("impression_id")))
        .drop("__canon")
    )

    # ---- stage 7: flat response insertions (session window, 1d gap) ----
    gap_s = cfg.flat_response_insertion_gap_ms // 1000
    key = ["platform_id", "log_user_id", "insertion_id"]
    kept_marker = (
        reduced_b.filter((F.col("kind") == 0) & ~F.col("is_redundant"))
        .select(F.col("event_id").alias("impression_id"))
        .withColumn("__kept", F.lit(True))
    )
    imp_evt = (
        _imp_resolved(_stream(spark, p("imp_joined")))
        .join(kept_marker, "impression_id", "left")
        .filter(F.col("__kept").isNotNull() | (F.col("imp_h") == -1))
        .select(
            *key,
            "ts",
            F.struct("impression_id", "content_id", "impression_ts").alias("imp"),
            F.lit(None)
            .cast(
                "struct<action_id:string,action_type:int,quantity:bigint,action_ts:bigint>"
            )
            .alias("act"),
        )
    )
    act_evt = (
        _act_resolved(_stream(spark, p("act_joined")))
        .join(
            reduced_b.filter(F.col("kind") == 1).select(
                F.col("event_id").alias("action_uid"),
                F.col("canonical_impression_id").alias("__canon"),
            ),
            "action_uid",
            "left",
        )
        .filter(F.col("__canon").isNotNull() | (F.col("action_uid") == "-1"))
        .withColumn("impression_id", F.coalesce(F.col("__canon"), F.col("impression_id")))
        .select(
            *key,
            "ts",
            F.lit(None)
            .cast("struct<impression_id:string,content_id:string,impression_ts:bigint>")
            .alias("imp"),
            F.struct(
                F.col("raw_action_id").alias("action_id"),
                "action_type",
                "quantity",
                "action_ts",
            ).alias("act"),
        )
    )
    flat_in = imp_evt.unionByName(act_evt)
    flat = (
        flat_in.withWatermark("ts", f"{delay_ms} milliseconds")
        .groupBy(*key, F.session_window("ts", f"{gap_s} seconds").alias("__w"))
        .agg(
            F.sort_array(F.collect_list("imp")).alias("impressions"),
            F.sort_array(F.collect_list("act")).alias("actions"),
        )
        .select(
            *key,
            F.unix_millis("__w.start").alias("session_start_ms"),
            "impressions",
            "actions",
        )
    )
    _drain(flat, p("raw_flat"), chk("flat"))

    real = F.col("platform_id") >= 0
    late_of = lambda d: spark.read.parquet(p(d)).filter(F.col("late"))  # noqa: E731
    return {
        "joined_impression": kept_imp_b.filter(real).drop("u", "ts", "imp_h"),
        "joined_action": repointed_act_b.filter(real).drop("u", "ts", "action_uid"),
        "flat_response_insertion": spark.read.parquet(p("raw_flat")).filter(real),
        "side_late_insertion": late_of("ins_joined"),
        "side_late_impression": late_of("imp_joined"),
        "side_late_action": late_of("act_joined"),
        "side_redundant_impression": reduced_b.filter(
            (F.col("kind") == 0) & F.col("is_redundant")
        ),
    }
