"""The composed flat-output-join pipeline run as a STREAMING topology
and gated by the SAME manifest + DuckDB oracle as the batch
``bfj_pipeline_manifest`` — one oracle pins stream == batch == DuckDB
three-way, the ``streaming_raw_ingest`` recipe applied to the join
topology (reference: the FlatOutputJob streaming deployment,
pipeline/.../job/join/FlatOutputJob.java:394-1044).

Topology (9 checkpointed Structured Streaming queries, handed off
through time-sliced parquet stages exactly like the reference's Flink
jobs hand off through Kafka topics — ``jobs.streaming_flat_output``
pioneered the transport):

    Q1-Q3  envelope stream → 8-way split + push-down → validate
           → dropDuplicatesWithinWatermark keep-first   (view/imp/act)
    Q4     split → fix → validate → stream_combine_delivery_logs
    Q5     view → insertion   stream_inferred_join  ([-10m, +1s])
    Q6     insertion → impression stream_inferred_join (3 scopes,
           content filter, [-30m, +1s])
    Q7     stream_reduce_redundant_impressions (5 s epochs)
    Q8     impression → action stream_inferred_join ([-1d, +1s])
    Q9     flat sessions: session_window(1 d gap) cogroup
    + the FlatOutputJob TAIL (r10, stages 20-22 shared with the batch
      manifest): user temporal join, AddLatestImpressions, clearUserId

Stateless glue between stateful anchors (payload re-attachment by
xxhash64 id, tiny-action cart fan-out, action re-pointing through the
streamed remap, MergeDetails) runs as batch projections over the
drained stages, mirroring where ``_run_pipeline`` composes the same
batch operators. Stages 1-5 of the manifest (raw splits + validate
errors) aggregate the staged envelope directly — deterministic
projections of the same bytes the stream consumed; every stage from
the first stateful operator on (6-19) aggregates a DRAINED STREAMING
sink, so any watermark-boundary divergence from the batch semantics
flips that stage's checksum against the shared oracle.

Exactness: on bounded in-order replay (the ``_restage`` grid) with
far-future sentinels flushing each stateful operator, the streaming
twins' decisions equal the batch operators' bit-for-bit — the inferred
joins share the batch tie-break ((|Δt|, left_ts, left_pk), FK path
earliest-first), and ``left_retention_ms`` spans the replay so the
unwindowed FK path reaches every ancestor exactly like the batch
explicit-id join (production would set the reference's state TTL
instead; FlatOutputJob.java:808-882).

100 TB posture: state per operator is the twins' documented budget
(scoped candidate buffers, TTL'd remaps, session windows); handoff
stages are append-only parquet partitionable by event-time; nothing
collects to the driver. The staged-query split is one-applyInPandas-
WithState-per-query — the same boundary the reference draws between
Flink jobs at Kafka topics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openmetrics_spark.jobs.streaming_flat_output import (
    SENTINEL_MS,
    _drain,
    _restage,
    _stream,
)
from openmetrics_spark.operators.dedup import keep_first  # noqa: F401 (doc xref)
from openmetrics_spark.operators.flat import (
    fix_delivery_log,
    merge_details_with_drops,
    repoint_actions,
    to_tiny_actions,
)
from openmetrics_spark.operators.validate import (
    validate_action,
    validate_delivery_log,
    validate_impression,
    validate_view,
)
from openmetrics_spark.queries import register
from openmetrics_spark.queries.bfj_pipeline_q import (
    DAY,
    MIN10,
    MIN30,
    REDUNDANT_TTL_MS,
    _PIPELINE_ORACLE,
    _PIPELINE_ORACLE_SKEWED,
    _child,
    _envelopes,
    _j,
    _nz,
    _stage,
    _tail_stages,
    _yield_bp,
)
from openmetrics_spark.queries.streaming_q import (
    _events_span,
    _stream_shuffle_partitions,
    _workdir,
)
from openmetrics_spark.schemas import EVENT_SCHEMAS
from openmetrics_spark.sources.envelope import (
    CHILD_TYPES,
    _nullable,
    _plural,
    split_log_requests,
)
from openmetrics_spark.streaming.ops import stream_keep_first
from openmetrics_spark.streaming.stateful import (
    stream_combine_delivery_logs,
    stream_inferred_join,
    stream_reduce_redundant_impressions,
)
from openmetrics_spark.tables import pin


def _u() -> F.Column:
    return F.concat_ws(
        "\x1f", F.col("platform_id").cast("string"), F.col("log_user_id")
    )


def _h(c: str) -> F.Column:
    return F.xxhash64(F.col(c))


def _sentinel_envelope(env: DataFrame) -> DataFrame:
    """One far-future envelope carrying a single pass-through delivery
    log child — the end-of-input watermark for the combine stage (the
    generic flat-row sentinel cannot ride the envelope: only a child
    that SURVIVES the split + validation advances the union watermark
    downstream of them)."""
    dl = _child(
        EVENT_SCHEMAS["delivery_log"],
        request_id=F.lit("zz"),
        api_execution=F.lit(False),
        log_timestamp=F.lit(SENTINEL_MS),
    )
    cols = [
        F.lit(-1).cast("long").alias("platform_id"),
        F.lit("zz").alias("log_user_id"),
        F.lit(SENTINEL_MS).alias("log_timestamp"),
        F.lit(SENTINEL_MS).alias("event_api_timestamp"),
    ]
    for name in CHILD_TYPES:
        arr_t = T.ArrayType(_nullable(EVENT_SCHEMAS[name]))
        if name == "delivery_log":
            cols.append(F.array(dl).cast(arr_t).alias(_plural(name)))
        else:
            cols.append(F.lit(None).cast(arr_t).alias(_plural(name)))
    return env.limit(1).select(*cols)


def _drain_restarting(
    sdf: DataFrame, path: str, chk: str, srcs: list[str]
) -> None:
    """``_drain`` with one query LIFETIME per staged arrival slice:
    all but the first file of every source dir are held back, and each
    further slice is moved in only after the previous lifetime has
    fully stopped — the stream is killed and resumed mid-state against
    the SAME checkpoint (source offsets, watermark and operator state
    all resume), the ``streaming_admission_restart`` staging pattern
    applied to the stateful join chain. Multi-source queries move one
    slice of EVERY input per lifetime (the common staging grid keeps
    the union watermark honest across sources — see _restage). File
    mtimes survive the moves (same-filesystem rename), so replay order
    is unchanged."""
    import shutil

    holds: dict[str, list[str]] = {}
    for d in srcs:
        files = sorted(
            (f for f in os.listdir(d) if not f.startswith(("_", "."))),
            key=lambda f: os.path.getmtime(os.path.join(d, f)),
        )
        hold = d + "__hold"
        os.makedirs(hold, exist_ok=True)
        holds[d] = files[1:]
        for f in files[1:]:
            shutil.move(os.path.join(d, f), os.path.join(hold, f))
    n_lifetimes = 1 + max(len(v) for v in holds.values())
    for k in range(n_lifetimes):
        if k > 0:
            for d, fs in holds.items():
                if k - 1 < len(fs):
                    shutil.move(
                        os.path.join(d + "__hold", fs[k - 1]),
                        os.path.join(d, fs[k - 1]),
                    )
        _drain(sdf, path, chk)
    for d in srcs:
        shutil.rmtree(d + "__hold", ignore_errors=True)


def _run_streaming_pipeline(
    spark: SparkSession, sf_dir: str, skew: bool = False, restart: bool = False
) -> list[DataFrame]:
    work = _workdir(
        "bfj_stream_restart"
        if restart
        else ("bfj_stream_skew" if skew else "bfj_stream")
    )

    def p(name: str) -> str:
        return os.path.join(work, name)

    def chk(name: str) -> str:
        return os.path.join(work, "_chk", name)

    def dr(sdf: DataFrame, out: str, c: str, srcs: list[str]) -> None:
        if restart:
            _drain_restarting(sdf, out, c, srcs)
        else:
            _drain(sdf, out, c)

    lo, hi = _events_span(spark, sf_dir)
    # the house 2-slice grid (streaming_q._events_grid): state still
    # survives a batch boundary and finalizes against a mid-stream
    # watermark; each extra slice only re-buys the same evidence for
    # another round of per-batch fixed cost x 9 queries
    grid = [lo + (hi - lo) // 2]
    # left-candidate retention spanning the whole bounded replay: the
    # batch FK path has no window, so parity needs every ancestor live
    retention = (hi - lo) + 2 * DAY

    env = _envelopes(spark, sf_dir, skew)
    _restage(
        spark,
        env.unionByName(_sentinel_envelope(env)),
        p("env"),
        "log_timestamp",
        grid,
    )

    # ---- Q1-Q3: split → validate → keep-first (view / imp / act) ----
    def split_child(name: str) -> DataFrame:
        child = split_log_requests(_stream(spark, p("env")))[name]
        if name == "delivery_log":
            child = fix_delivery_log(child)
        return child.withColumn("ts", F.timestamp_millis("log_timestamp"))

    for name, pk, validate in (
        ("view", "view_id", validate_view),
        ("impression", "impression_id", validate_impression),
        ("action", "action_id", validate_action),
    ):
        ok, _err = validate(split_child(name))
        kept_s = stream_keep_first(ok, ["platform_id", pk], "ts", DAY)
        dr(kept_s.drop("ts"), p(f"kept_{name}"), chk(f"kept_{name}"), [p("env")])

    # ---- Q4: split → fix → validate → combine delivery logs ----
    dl_ok, _dl_err = validate_delivery_log(split_child("delivery_log"))
    combined_s = stream_combine_delivery_logs(
        dl_ok, window_ms=2000, delay_ms=2000
    )
    dr(combined_s, p("combined"), chk("combined"), [p("env")])

    views_kept = pin(spark.read.parquet(p("kept_view")))
    imps_kept = pin(spark.read.parquet(p("kept_impression")))
    acts_kept = pin(spark.read.parquet(p("kept_action")))
    winners = (
        spark.read.parquet(p("combined"))
        .filter(F.col("platform_id") >= 0)
        .select("platform_id", "request_id")
    )

    # combine winners → full rows → tiny insertions (batch projection
    # over the drained sink, like _run_pipeline's explode)
    env_b = spark.read.parquet(p("env")).filter(F.col("platform_id") >= 0)
    raw = split_log_requests(env_b)
    dls_raw = pin(fix_delivery_log(raw["delivery_log"]))
    dl_ok_b, _ = validate_delivery_log(dls_raw)
    combined_full = pin(
        dl_ok_b.join(winners, ["platform_id", "request_id"], "left_semi")
    )
    insertions = pin(
        combined_full.select(
            "platform_id",
            "log_user_id",
            "request_id",
            F.col("view_id").alias("view_fk"),
            F.col("log_timestamp").alias("insertion_ms"),
            F.explode("response_insertions").alias("__i"),
        ).select(
            "platform_id",
            "log_user_id",
            "request_id",
            "view_fk",
            "insertion_ms",
            F.col("__i.insertion_id").alias("insertion_id"),
            F.col("__i.content_id").alias("content_id"),
            F.col("__i.position").alias("position"),
        )
    )

    # ---- Q5: view → insertion ----
    lv1 = (
        views_kept.select(
            "platform_id",
            "log_user_id",
            "view_id",
            F.col("log_timestamp").alias("view_ms"),
        )
        .withColumn("u", _u())
        .withColumn("vid_h", _h("view_id"))
        .withColumn("ts", F.timestamp_millis("view_ms"))
    )
    # the right frame carries its FK under the LEFT's pk name — the
    # twin's scopes mode matches fk_col by shared column name
    rv1 = (
        insertions.select(
            "platform_id",
            "log_user_id",
            F.col("view_fk").alias("view_id"),
            "request_id",
            "insertion_id",
            "content_id",
            "position",
            "insertion_ms",
        )
        .withColumn("u", _u())
        .withColumn("iid_h", _h("insertion_id"))
        .withColumn("ts", F.timestamp_millis("insertion_ms"))
    )
    _restage(spark, lv1, p("j1_left"), "view_ms", grid)
    _restage(spark, rv1, p("j1_right"), "insertion_ms", grid, sentinel=True)
    j1 = stream_inferred_join(
        _stream(spark, p("j1_left")),
        _stream(spark, p("j1_right")),
        user_col="u",
        left_id_col="vid_h",
        right_id_col="iid_h",
        left_ts_col="ts",
        right_ts_col="ts",
        scopes=((),),
        fk_col="view_id",
        window_before_ms=MIN10,
        window_after_ms=1000,
        delay_ms=2000,
        right_outer=True,
        left_retention_ms=retention,
    )
    dr(j1, p("j1_out"), chk("j1"), [p("j1_left"), p("j1_right")])

    j1_b = spark.read.parquet(p("j1_out")).filter(
        ~F.col("late") & (F.col("right_id") != -1)
    )
    ins2 = pin(
        j1_b.join(
            rv1.select(
                F.col("iid_h").alias("__ih"),
                "platform_id",
                "log_user_id",
                "request_id",
                "insertion_id",
                "content_id",
                "position",
                "insertion_ms",
            ),
            F.col("right_id") == F.col("__ih"),
            "inner",
        )
        .join(
            lv1.select(
                F.col("vid_h").alias("__vh"),
                F.col("view_id").alias("__picked_view"),
            ),
            F.col("left_id") == F.col("__vh"),
            "left",
        )
        .select(
            "platform_id",
            "log_user_id",
            "request_id",
            "insertion_id",
            "content_id",
            "position",
            "insertion_ms",
            F.col("__picked_view").alias("view_id"),
        )
    )

    # ---- Q6: insertion → impression ----
    lv2 = (
        ins2.withColumn("u", _u())
        .withColumn("iid_h", _h("insertion_id"))
        .withColumn("ts", F.timestamp_millis("insertion_ms"))
    )
    rv2 = (
        imps_kept.select(
            "platform_id",
            "log_user_id",
            "impression_id",
            "insertion_id",  # the impression's own FK
            "request_id",
            "view_id",
            "content_id",
            F.col("log_timestamp").alias("impression_ms"),
        )
        .withColumn("u", _u())
        .withColumn("imp_h", _h("impression_id"))
        .withColumn("ts", F.timestamp_millis("impression_ms"))
    )
    _restage(spark, lv2, p("j2_left"), "insertion_ms", grid)
    _restage(spark, rv2, p("j2_right"), "impression_ms", grid, sentinel=True)
    j2 = stream_inferred_join(
        _stream(spark, p("j2_left")),
        _stream(spark, p("j2_right")),
        user_col="u",
        left_id_col="iid_h",
        right_id_col="imp_h",
        left_ts_col="ts",
        right_ts_col="ts",
        scopes=(("request_id",), ("view_id",), ("content_id",)),
        fk_col="insertion_id",
        content_col="content_id",
        window_before_ms=MIN30,
        window_after_ms=1000,
        delay_ms=2000,
        right_outer=True,
        left_retention_ms=retention,
    )
    dr(j2, p("j2_out"), chk("j2"), [p("j2_left"), p("j2_right")])

    j2_b = spark.read.parquet(p("j2_out")).filter(
        ~F.col("late") & (F.col("right_id") != -1)
    )
    imp_joined = pin(
        j2_b.join(
            rv2.select(
                F.col("imp_h").alias("__mh"),
                "platform_id",
                "log_user_id",
                "impression_id",
                "content_id",
                "impression_ms",
            ),
            F.col("right_id") == F.col("__mh"),
            "inner",
        )
        .join(
            lv2.select(
                F.col("iid_h").alias("__ih2"),
                F.col("insertion_id").alias("__picked_ins"),
            ),
            F.col("left_id") == F.col("__ih2"),
            "left",
        )
        .select(
            "platform_id",
            "log_user_id",
            "impression_id",
            "content_id",
            "impression_ms",
            F.col("__picked_ins").alias("insertion_id"),
        )
    )
    imp_matched = pin(imp_joined.filter(F.col("insertion_id").isNotNull()))

    # ---- Q7: reduce redundant impressions (streamed remap) ----
    red_in = imp_matched.select(
        "platform_id",
        "log_user_id",
        "insertion_id",
        F.lit(None).cast("string").alias("view_id"),
        "content_id",
        "impression_id",
        F.col("impression_ms").alias("impression_ts"),
    ).withColumn("ts", F.timestamp_millis("impression_ts"))
    _restage(spark, red_in, p("red_in"), "impression_ts", grid, sentinel=True)
    red_imp_s = _stream(spark, p("red_in"))
    # the remap consumer is the batch repoint below (exactly where
    # _run_pipeline joins the remap); the twin still wants an action
    # branch — give it an empty one of the right shape
    red_act_s = red_imp_s.select(
        "platform_id",
        "log_user_id",
        "insertion_id",
        "view_id",
        "content_id",
        F.col("impression_id").alias("action_id"),
        F.col("impression_ts").alias("action_ts"),
        "impression_id",
        "ts",
    ).filter(F.lit(False))
    red = stream_reduce_redundant_impressions(
        red_imp_s,
        red_act_s,
        ttl_ms=REDUNDANT_TTL_MS,
        delay_ms=2000,
        remap_retention_ms=retention,
    )
    dr(red, p("red_out"), chk("red"), [p("red_in")])
    remap = pin(
        spark.read.parquet(p("red_out"))
        .filter(F.col("kind") == 0)
        .select(
            F.col("event_id").alias("impression_id"),
            "canonical_impression_id",
            "is_redundant",
        )
    )
    kept = pin(
        imp_matched.join(
            remap.filter(~F.col("is_redundant")).select("impression_id"),
            "impression_id",
        )
    )

    # ---- tiny actions + re-point through the STREAMED remap ----
    tiny = to_tiny_actions(
        acts_kept.select(
            "platform_id",
            "log_user_id",
            "action_id",
            "impression_id",
            "insertion_id",
            "request_id",
            "view_id",
            "content_id",
            "action_type",
            "cart",
            "log_timestamp",
        )
    )
    tiny2 = pin(
        repoint_actions(tiny, remap).withColumn(
            "tiny_id",
            F.concat(F.col("action_id"), F.lit("~"), F.col("content_id")),
        )
    )

    # ---- Q8: impression → action ----
    lv3 = (
        kept.select(
            "platform_id",
            "log_user_id",
            "impression_id",
            "insertion_id",
            "content_id",
            "impression_ms",
        )
        .withColumn("u", _u())
        .withColumn("imp_h", _h("impression_id"))
        .withColumn("ts", F.timestamp_millis("impression_ms"))
    )
    rv3 = (
        tiny2.select(
            "platform_id",
            "log_user_id",
            "tiny_id",
            "action_id",
            "impression_id",
            "content_id",
            "action_type",
            "quantity",
            "price_usd_micros_per_unit",
            "action_ts",
        )
        .withColumn("u", _u())
        .withColumn("tid_h", _h("tiny_id"))
        .withColumn("ts", F.timestamp_millis("action_ts"))
    )
    _restage(spark, lv3, p("j3_left"), "impression_ms", grid)
    _restage(spark, rv3, p("j3_right"), "action_ts", grid, sentinel=True)
    j3 = stream_inferred_join(
        _stream(spark, p("j3_left")),
        _stream(spark, p("j3_right")),
        user_col="u",
        left_id_col="imp_h",
        right_id_col="tid_h",
        left_ts_col="ts",
        right_ts_col="ts",
        scopes=(("content_id",),),
        fk_col="impression_id",
        window_before_ms=DAY,
        window_after_ms=1000,
        delay_ms=2000,
        right_outer=True,
        left_retention_ms=retention,
    )
    dr(j3, p("j3_out"), chk("j3"), [p("j3_left"), p("j3_right")])

    j3_b = spark.read.parquet(p("j3_out")).filter(
        ~F.col("late") & (F.col("right_id") != -1)
    )
    act_joined = pin(
        j3_b.join(
            rv3.select(
                F.col("tid_h").alias("__th"),
                "platform_id",
                "log_user_id",
                "tiny_id",
                "action_id",
                "action_type",
                "quantity",
                "price_usd_micros_per_unit",
                "action_ts",
            ),
            F.col("right_id") == F.col("__th"),
            "inner",
        )
        .join(
            lv3.select(
                F.col("imp_h").alias("__kh"),
                F.col("impression_id").alias("matched_impression_id"),
                F.col("insertion_id").alias("matched_insertion_id"),
            ),
            F.col("left_id") == F.col("__kh"),
            "left",
        )
        .select(
            "platform_id",
            "log_user_id",
            "tiny_id",
            "action_id",
            "action_type",
            "quantity",
            "price_usd_micros_per_unit",
            "action_ts",
            "matched_impression_id",
            "matched_insertion_id",
        )
    )
    attributed = act_joined.filter(F.col("matched_impression_id").isNotNull())

    # ---- merge details (batch key join, as in _run_pipeline) ----
    details = (
        acts_kept.filter(F.col("action_id").cast("string").isNotNull())
        .select(
            "action_id",
            F.concat(
                F.lit("t"), F.substring("action_id", 2, 100).cast("long") % 6
            ).alias("custom_action_type"),
            (F.substring("action_id", 2, 100).cast("long") % 13).alias(
                "__mod13"
            ),
        )
        .filter(F.col("__mod13") != 0)
        .drop("__mod13")
    )
    merged, dropped = merge_details_with_drops(attributed, details, ["action_id"])
    merged = pin(merged)
    dropped = pin(dropped)

    # ---- Q9: flat sessions (session_window, 1 d gap) ----
    key3 = ["platform_id", "log_user_id", "insertion_id"]
    imp_evt = kept.select(
        *key3,
        F.col("impression_ms").alias("ms"),
        F.struct(
            F.col("impression_id"),
            F.col("content_id"),
            F.col("impression_ms").alias("impression_ts"),
        ).alias("imp"),
        F.lit(None)
        .cast(
            "struct<action_id:string,action_type:int,quantity:bigint,action_ts:bigint>"
        )
        .alias("act"),
    )
    act_evt = merged.select(
        "platform_id",
        "log_user_id",
        F.col("matched_insertion_id").alias("insertion_id"),
        F.col("action_ts").alias("ms"),
        F.lit(None)
        .cast(
            "struct<impression_id:string,content_id:string,impression_ts:bigint>"
        )
        .alias("imp"),
        F.struct(
            F.col("action_id"),
            F.col("action_type").cast("int").alias("action_type"),
            F.col("quantity"),
            F.col("action_ts"),
        ).alias("act"),
    )
    flat_in = imp_evt.unionByName(act_evt).withColumn(
        "ts", F.timestamp_millis("ms")
    )
    _restage(spark, flat_in, p("flat_in"), "ms", grid, sentinel=True)
    flat_s = (
        _stream(spark, p("flat_in"))
        .withWatermark("ts", "2000 milliseconds")
        .groupBy(
            *key3, F.session_window("ts", f"{DAY} milliseconds").alias("__w")
        )
        .agg(
            F.sort_array(F.collect_list("imp")).alias("impressions"),
            F.sort_array(F.collect_list("act")).alias("actions"),
        )
        .select(
            *key3,
            F.unix_millis("__w.start").alias("session_start_ms"),
            "impressions",
            "actions",
        )
    )
    dr(flat_s, p("flat_out"), chk("flat"), [p("flat_in")])
    flat_rows = pin(
        spark.read.parquet(p("flat_out"))
        .filter(F.col("platform_id") >= 0)
        .select(
            *key3,
            "session_start_ms",
            F.array_join(
                F.array_sort(
                    F.transform("impressions", lambda x: x["impression_id"])
                ),
                ",",
            ).alias("imp_ids"),
            F.array_join(
                F.array_sort(
                    F.transform(
                        "actions",
                        lambda x: F.concat(
                            x["action_id"], F.lit(":"), x["quantity"]
                        ),
                    )
                ),
                ",",
            ).alias("act_ids"),
            F.aggregate(
                "actions", F.lit(0).cast("long"), lambda s, x: s + x["quantity"]
            ).alias("total_quantity"),
        )
    )

    # ---- manifest: stages 1-5 over the staged envelope (deterministic
    # projections of the stream's input bytes), 6-19 over drained
    # streaming sinks ----
    views_raw = pin(raw["view"])
    imps_raw = pin(raw["impression"])
    acts_raw = pin(raw["action"])
    v_ok, v_err = validate_view(views_raw)
    _dl_ok2, dl_err = validate_delivery_log(dls_raw)
    i_ok, i_err = validate_impression(imps_raw)
    a_ok, a_err = validate_action(acts_raw)
    errs = pin(
        v_err.select(F.lit("view").alias("kind"), F.col("view_id").alias("pk"), "error_reason")
        .unionByName(dl_err.select(F.lit("delivery_log").alias("kind"), F.col("request_id").alias("pk"), "error_reason"))
        .unionByName(i_err.select(F.lit("impression").alias("kind"), F.col("impression_id").alias("pk"), "error_reason"))
        .unionByName(a_err.select(F.lit("action").alias("kind"), F.col("action_id").alias("pk"), "error_reason"))
    )

    def _dropped(ok: DataFrame, kept_df: DataFrame, kind: str, pk: str) -> DataFrame:
        proj = lambda d: d.select("platform_id", F.col(pk).alias("pk"), "log_timestamp")  # noqa: E731
        return (
            proj(ok)
            .exceptAll(proj(kept_df))
            .select(F.lit(kind).alias("kind"), "pk", "log_timestamp")
        )

    dup_dropped = pin(
        _dropped(v_ok, views_kept, "view", "view_id")
        .unionByName(_dropped(i_ok, imps_kept, "impression", "impression_id"))
        .unionByName(_dropped(a_ok, acts_kept, "action", "action_id"))
    )

    return [
        _stage(1, "raw_view", views_raw, _j(_nz("view_id"), _nz("log_user_id"), _nz("log_timestamp"))),
        _stage(2, "raw_delivery_log", dls_raw, _j(_nz("request_id"), _nz("client_request_id"), F.when(F.col("api_execution"), "1").otherwise("0"), _nz("log_timestamp"), F.size(F.coalesce(F.col("response_insertions"), F.array())).cast("string"))),
        _stage(3, "raw_impression", imps_raw, _j(_nz("impression_id"), _nz("insertion_id"), _nz("request_id"), _nz("view_id"), _nz("content_id"), _nz("log_timestamp"))),
        _stage(4, "raw_action", acts_raw, _j(_nz("action_id"), _nz("impression_id"), _nz("action_type"), F.size(F.coalesce(F.col("cart"), F.array())).cast("string"), _nz("log_timestamp"))),
        _stage(5, "validate_errors", errs, _j(_nz("kind"), _nz("pk"), _nz("error_reason"))),
        _stage(6, "dedup_dropped", dup_dropped, _j(_nz("kind"), _nz("pk"), _nz("log_timestamp"))),
        _stage(7, "combined_delivery_logs", combined_full, _j(_nz("request_id"), _nz("client_request_id"))),
        _stage(8, "tiny_insertions", insertions, _j(_nz("insertion_id"), _nz("view_fk"), _nz("content_id"), _nz("position"), _nz("insertion_ms"))),
        _stage(9, "view_insertion_matched", ins2.filter(F.col("view_id").isNotNull()), _j(_nz("insertion_id"), _nz("view_id"))),
        _stage(10, "impression_matched", imp_matched, _j(_nz("impression_id"), _nz("insertion_id"))),
        _stage(11, "redundant_remapped", remap.filter(F.col("is_redundant")), _j(_nz("impression_id"), _nz("canonical_impression_id"))),
        _stage(12, "tiny_actions", tiny2, _j(_nz("tiny_id"), _nz("impression_id"), _nz("action_type"), _nz("quantity"), _nz("price_usd_micros_per_unit"))),
        _stage(13, "action_attributed", attributed, _j(_nz("tiny_id"), _nz("matched_impression_id"), _nz("matched_insertion_id"))),
        _stage(14, "merged_details", merged, _j(_nz("tiny_id"), _nz("custom_action_type"))),
        _stage(15, "merge_dropped", dropped, _j(_nz("tiny_id"))),
        _stage(16, "flat_sessions", flat_rows, _j(_nz("platform_id"), _nz("log_user_id"), _nz("insertion_id"), _nz("session_start_ms"), _nz("imp_ids"), _nz("act_ids"), _nz("total_quantity"))),
        _yield_bp(17, "yield_view_ins_bp", ins2.filter(F.col("view_id").isNotNull()), ins2),
        _yield_bp(18, "yield_impression_bp", imp_matched, imp_joined),
        _yield_bp(
            19,
            "yield_action_bp",
            attributed.select("action_id").distinct(),
            act_joined.select("action_id").distinct(),
        ),
        # the FlatOutputJob tail (user temporal join, AddLatest-
        # Impressions, clearUserId) over the SAME drained frames —
        # shared with the batch manifest, gated by the shared oracle
        *_tail_stages(spark, sf_dir, kept, merged, flat_rows, skew),
    ]


@register(
    "streaming_bfj_pipeline",
    oracle=_PIPELINE_ORACLE,
    tags=("bfj", "pipeline", "streaming"),
)
def streaming_bfj_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FlatOutputJob topology as a real Structured Streaming staged
    chain, gated against the SAME DuckDB oracle as the batch
    ``bfj_pipeline_manifest`` (see module docstring). 100 TB: each
    stateful operator carries its twin's documented state budget and
    scales by key partitions; the parquet stage handoffs are the
    reference's Kafka topic boundaries."""
    with _stream_shuffle_partitions(spark):
        parts = _run_streaming_pipeline(spark, sf_dir)
        out = parts[0]
        for q in parts[1:]:
            out = out.unionByName(q)
        # materialize while the scoped shuffle conf is active: the
        # streaming sinks are already drained, but the batch manifest
        # aggregates still plan off this frame
        return out.localCheckpoint(eager=True)


@register(
    "streaming_bfj_pipeline_skewed",
    oracle=_PIPELINE_ORACLE_SKEWED,
    tags=("bfj", "pipeline", "streaming", "skew"),
)
def streaming_bfj_pipeline_skewed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 22-stage streaming FlatOutputJob chain under the PLANTED HOT
    KEY (~12-13% of events on one ``(platform_id=0, 'uhot')`` key — see
    ``bfj_pipeline_manifest_skewed``). This is the gate the r10 verdict
    named as the one untested 100x failure mode: every stateful twin
    (keep-first, combine, the three inferred joins, session cogroup)
    keys on ``(platform_id, log_user_id)`` exactly like the reference
    (KeyUtil.java:27-98), so a power-law user concentrates a whole key's
    state on one task. The skewed run must stay bit-identical to the
    same DuckDB oracle as the batch skewed manifest; the hot key's state
    stays TTL/window-bounded (pytest asserts via the state probe), and
    the sf0.1 skewed-vs-uniform wall probe is in docs/SCALE.md."""
    with _stream_shuffle_partitions(spark):
        parts = _run_streaming_pipeline(spark, sf_dir, skew=True)
        out = parts[0]
        for q in parts[1:]:
            out = out.unionByName(q)
        return out.localCheckpoint(eager=True)


@register(
    "streaming_bfj_pipeline_restart",
    oracle=_PIPELINE_ORACLE,
    tags=("bfj", "pipeline", "streaming", "recovery"),
)
def streaming_bfj_pipeline_restart(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 22-stage streaming FlatOutputJob chain KILLED AND RESUMED
    mid-stream: every one of the 9 checkpointed queries consumes its
    staged arrivals across one query lifetime per slice (files held
    back and moved in between lifetimes, same checkpoint — see
    ``_drain_restarting``), so keep-first dedup state, the combine
    window, all three inferred joins' candidate buffers, the redundant
    remap TTL state and the open session windows must all survive a
    stop/start boundary with data still pending. The manifest must
    hash-match the SAME uniform oracle as ``streaming_bfj_pipeline`` —
    any state lost or replayed across the boundary flips a stage
    checksum. Reference behavior: Flink checkpoint/restore is the
    entire fault-tolerance story (BaseFlinkJob.java:48-128); the r8
    counter and r11 admission restart proofs gate the same contract on
    their surfaces, this closes it over the heaviest composed one."""
    with _stream_shuffle_partitions(spark):
        parts = _run_streaming_pipeline(spark, sf_dir, restart=True)
        out = parts[0]
        for q in parts[1:]:
            out = out.unionByName(q)
        return out.localCheckpoint(eager=True)
