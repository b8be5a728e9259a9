"""Counter operators — sliding-window counts and last-time-and-count.

Batch twins of the reference's Redis-feature counters:

- ``sliding_counter`` — SlidingCounter/SlidingHourlyCounter/
  SlidingDailyCounter semantics: for every emit-window boundary, the
  trailing count over the preceding window per key (reference:
  pipeline/.../common/functions/SlidingCounter.java:38-292,
  SlidingHourlyCounter.java:11-69, SlidingDailyCounter.java:11-59 —
  1 h windows emitted every 15 m; 1/7/30 d windows every 4 h).
- ``last_time_and_count`` — LastTimeAndCount semantics: per key the
  last event time plus the trailing-N-days count (reference:
  pipeline/.../common/functions/LastTimeAndCount.java:36-299; 90 d TTL).
- ``top_n`` — TopNEmitter semantics (reference:
  pipeline/.../job/counter/TopNEmitter.java:20-170): a plain
  ORDER BY count DESC LIMIT n — Spark plans it as
  TakeOrderedAndProject (per-partition heap + driver merge), exactly
  the hand-built heap the reference maintains, minus the code.

Window alignment: the reference aligns emit windows to wall-clock
boundaries. We align to the epoch via integer-millis arithmetic
(``unix_millis(ts) div slide * slide``), which both Spark's
``window()`` and any SQL oracle reproduce bit-for-bit.

Scale notes: a sliding window of W emitted every S duplicates each
event W/S times before the shuffle. For the 1 h / 15 m hourly counter
that is 4×; for 30 d / 4 h it would be 180× — so ``sliding_counter``
first tumbles to S-sized buckets (map-side combinable, shuffle is
O(distinct key×bucket)), THEN expands buckets to the windows they feed.
The expansion happens on pre-aggregated rows, not raw events.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_bucket_ms(ts_col: str, width_ms: int) -> Column:
    """Epoch-aligned bucket start for a timestamp column — THE bucket
    expression, shared by every query that mirrors a SQL ``//`` oracle.
    floor, not a truncating cast: pre-1970 (negative) millis must
    bucket like SQL ``//`` and the streaming twins' window() do —
    cast-toward-zero diverges on negatives (and the trunc bug had to
    be chased through seven files when each site inlined its own
    copy)."""
    return F.floor(F.unix_millis(F.col(ts_col)) / F.lit(width_ms)) * F.lit(
        width_ms
    )




def sliding_counter(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    window_ms: int,
    slide_ms: int,
    value_col: str | None = None,
) -> DataFrame:
    """Trailing counts per key at every emit boundary.

    Output: key cols + ``emit_ms`` (epoch millis of the window END,
    i.e. the emission time) + ``n`` (count or sum(value_col) over
    ``(emit_ms - window_ms, emit_ms]``... precisely: events with
    ``bucket(ts) in [emit_ms - window_ms, emit_ms)``).

    Two-phase: (1) tumble to slide-sized buckets — this is the only
    shuffle over raw data and it partial-aggregates map-side;
    (2) explode each bucket into the window_ms/slide_ms emit windows it
    contributes to — runs on the (much smaller) bucketed aggregate —
    then a second, cheap aggregation.
    """
    assert window_ms % slide_ms == 0, "window must be a multiple of slide"
    k = window_ms // slide_ms
    agg = (
        F.count(F.lit(1)) if value_col is None else F.sum(value_col)
    ).alias("bn")
    bucketed = (
        df.select(*key_cols, epoch_bucket_ms(ts_col, slide_ms).alias("bucket_ms"))
        if value_col is None
        else df.select(
            *key_cols, epoch_bucket_ms(ts_col, slide_ms).alias("bucket_ms"), value_col
        )
    )
    bucketed = bucketed.groupBy(*key_cols, "bucket_ms").agg(agg)
    offsets = F.sequence(F.lit(1), F.lit(k))  # bucket feeds emits b+1*s .. b+k*s
    expanded = bucketed.select(
        *key_cols,
        "bucket_ms",
        "bn",
        F.explode(offsets).alias("__i"),
    ).select(
        *key_cols,
        "bn",
        # long math: __i * slide overflows int32 at k ≥ ~150 (the 30 d
        # / 4 h config has k = 180)
        (
            F.col("bucket_ms")
            + F.col("__i").cast("long") * F.lit(slide_ms).cast("long")
        ).alias("emit_ms"),
    )
    return expanded.groupBy(*key_cols, "emit_ms").agg(F.sum("bn").alias("n"))


def multi_window_counter(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    configs: Sequence[tuple[int, int, int]],
    value_col: str | None = None,
) -> DataFrame:
    """Trailing counts for SEVERAL window configs off one raw-event
    shuffle PER DISTINCT SLIDE — the batch analog of the reference
    emitting every bucket size from a single state pass
    (SlidingCounter.java:215-283: one keyed state map serves all
    windows of a counter).

    ``configs``: (tag, window_ms, slide_ms) triples; ``tag`` (any
    int — callers pass the CountWindow enum value) identifies the
    config in the output. Output: key cols + ``window_tag`` +
    ``emit_ms`` + ``n`` — exactly ``sliding_counter``'s rows per
    config, tagged.

    Plan shape: configs GROUP BY their slide. Each distinct slide
    tumbles raw events once (map-side combined — the reference's 4
    configs have two distinct slides, 15 m and 4 h, so two raw
    shuffles replace four), then explodes its buckets across ALL of
    the slide's configs in one pass — an array of (tag, emit)
    structs, k_c entries per config — and re-aggregates once. The
    DAY/7d/30d trio thus shares one 4 h bucket frame and one
    expansion aggregate instead of three of each.

    (An earlier variant derived coarse buckets from a gcd-fine bucket
    frame to reach a single raw shuffle; the fine aggregate fed two
    consumers, Spark planned it twice — ReuseExchange does not
    canonicalize across the union branches — and the A/B at sf0.1
    measured it strictly slower than bucketing each slide from raw.)"""
    assert configs, "need at least one window config"
    by_slide: dict[int, list[tuple[int, int]]] = {}
    for tag, window_ms, slide_ms in configs:
        assert window_ms % slide_ms == 0, "window must be a multiple of slide"
        by_slide.setdefault(slide_ms, []).append((tag, window_ms))
    agg = (F.count(F.lit(1)) if value_col is None else F.sum(value_col)).alias("bn")
    outs: list[DataFrame] = []
    for slide_ms, cfgs in sorted(by_slide.items()):
        base_cols = [*key_cols, epoch_bucket_ms(ts_col, slide_ms).alias("bucket_ms")]
        if value_col is not None:
            base_cols.append(F.col(value_col))
        b = df.select(*base_cols).groupBy(*key_cols, "bucket_ms").agg(agg)
        ks = [(tag, window_ms // slide_ms) for tag, window_ms in cfgs]
        outs.append(expand_bucket_counts(b, key_cols, ks, slide_ms))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def expand_bucket_counts(
    b: DataFrame,
    key_cols: Sequence[str],
    ks: Sequence[tuple[int, int]],
    slide_ms: int,
) -> DataFrame:
    """The expansion half of :func:`multi_window_counter`, over an
    ALREADY AGGREGATED slide-bucket frame (``key_cols + (bucket_ms,
    bn)``) — split out because the bucket count is what a persisted or
    STREAMING tumbling-window aggregate maintains; the k-fold window
    expansion is stateless and runs batch-side on the drained sink.
    ``ks``: (tag, k) pairs sharing this slide. Output: key cols +
    ``window_tag`` + ``emit_ms`` + ``n``.

    ONE explode of a flat index 1..Σk_c, decoded to (tag, offset) by
    chained CASEs — everything stays in whole-stage codegen. (A
    transform()-built array of (tag, emit) structs was tried first:
    higher-order-function lambda bodies evaluate interpreted per
    element, and the A/B at sf0.1 measured the struct-array build 33%
    slower than the old per-config path; this shape beat it.)"""
    total_k = sum(k for _, k in ks)
    j = F.col("__j")
    tag_expr: Column | None = None
    off_expr: Column | None = None
    cum = 0
    for tag, k in ks:
        cond = j <= F.lit(cum + k)
        t = F.lit(tag).cast("long")
        o = (j - F.lit(cum)).cast("long")
        if tag_expr is None:
            tag_expr, off_expr = F.when(cond, t), F.when(cond, o)
        else:
            tag_expr, off_expr = tag_expr.when(cond, t), off_expr.when(cond, o)
        cum += k
    exp = b.select(
        *key_cols,
        "bn",
        "bucket_ms",
        F.explode(F.sequence(F.lit(1), F.lit(total_k))).alias("__j"),
    ).select(
        *key_cols,
        "bn",
        tag_expr.alias("window_tag"),
        (
            F.col("bucket_ms")
            + off_expr * F.lit(slide_ms).cast("long")
        ).alias("emit_ms"),
    )
    return exp.groupBy(*key_cols, "window_tag", "emit_ms").agg(
        F.sum("bn").alias("n")
    )


def last_time_and_count(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    horizon_ms: int,
    anchor_ms: int | None = None,
) -> DataFrame:
    """Per key: epoch-millis of the latest event + count of events in
    the trailing ``horizon_ms``.

    By default the horizon is anchored at EACH KEY's own last event
    time — the reference semantics (LastTimeAndCount.java keeps the
    per-key last timestamp and the count of events the state TTL has
    not yet expired, both relative to the key's own clock), and what
    the streaming twin (``stream_last_time_and_count``) emits for keys
    idle near the end of the data. Pass ``anchor_ms`` for the distinct
    "as of a fixed time" variant.

    Per-key anchoring uses a partition-only window (one shuffle on
    key; WindowExec buffers one key-group at a time) followed by a
    map-side-combinable aggregate on the same partitioning — Catalyst
    reuses the exchange, so it stays a single-shuffle plan.
    """
    ms = F.unix_millis(F.col(ts_col))
    base = df.select(*key_cols, ms.alias("__ms"))
    if anchor_ms is None:
        from pyspark.sql import Window

        w = Window.partitionBy(*key_cols)
        base = base.withColumn("__anchor", F.max("__ms").over(w))
    else:
        base = base.withColumn("__anchor", F.lit(anchor_ms))
    in_horizon = (F.col("__ms") > F.col("__anchor") - F.lit(horizon_ms)) & (
        F.col("__ms") <= F.col("__anchor")
    )
    return base.groupBy(*key_cols).agg(
        F.max("__ms").alias("last_ms"),
        F.sum(F.when(in_horizon, 1).otherwise(0)).alias("n_horizon"),
    )


def top_n(
    df: DataFrame,
    group_cols: Sequence[str],
    metric: Column,
    n: int,
    tiebreak: Sequence[str] | None = None,
) -> DataFrame:
    """Global top-n groups by ``metric`` (desc), deterministic via
    ``tiebreak`` (asc). Aggregation shuffles O(groups); the limit is a
    TakeOrderedAndProject (no full sort)."""
    agg = df.groupBy(*group_cols).agg(metric.alias("n"))
    order = [F.col("n").desc()] + [F.col(c).asc() for c in (tiebreak or group_cols)]
    return agg.orderBy(*order).limit(n)


def time_decayed_counts(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    halflife_ms: int,
    max_k: int = 40,
) -> DataFrame:
    """Exponentially time-decayed counts per key — the feature-store
    upgrade of a plain trailing count (recent events count fully, an
    event one half-life old counts half, ...), anchored at the global
    latest bucket so every key shares one clock.

    ENGINE-EXACT by construction: events tumble to half-life buckets
    (the decay granularity), a bucket ``k`` half-lives old weighs
    exactly ``2^(max_k - k)`` in scaled-integer space (a BIGINT
    shift, never float ``pow``), buckets older than ``max_k``
    half-lives weigh 0 (decay below 2^-40 ≈ 1e-12 is noise), and the
    per-key sum of those integers is order-independent. The double
    ``decayed`` is one division of the exact integer by ``2^max_k`` —
    the same op on the same operand in any engine.

    One bucket shuffle of O(keys × active buckets) rows (map-side
    combined) + a broadcast scalar anchor; at 100 TB the decayed
    table re-derives incrementally from persisted bucket counts the
    same way the HLL register tables do.

    Output: key cols + ``n_events`` + ``decayed_scaled`` (BIGINT,
    2^max_k units) + ``decayed`` (DOUBLE, rounded 6dp)."""
    b = (
        df.select(
            *key_cols, epoch_bucket_ms(ts_col, halflife_ms).alias("bucket_ms")
        )
        .groupBy(*key_cols, "bucket_ms")
        .agg(F.count(F.lit(1)).alias("bn"))
    )
    return decayed_from_buckets(b, key_cols, halflife_ms, max_k)


def decayed_from_buckets(
    b: DataFrame,
    key_cols: Sequence[str],
    halflife_ms: int,
    max_k: int = 40,
) -> DataFrame:
    """The weighting half of :func:`time_decayed_counts`, over an
    ALREADY AGGREGATED bucket-count frame (``key_cols + (bucket_ms,
    bn)``) — split out because the bucket count is what a persisted or
    STREAMING tumbling-window aggregate maintains (decay re-weights at
    read time, so the stored state never needs rewriting as the clock
    advances — the property that makes decayed features incrementally
    maintainable at all)."""
    anchor = b.agg(F.max("bucket_ms").alias("anchor_ms"))
    k = ((F.col("anchor_ms") - F.col("bucket_ms")) / F.lit(halflife_ms)).cast(
        "long"
    )
    w = F.when(
        k <= max_k,
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({max_k} - "
            f"((anchor_ms - bucket_ms) div {halflife_ms}) AS INT))"
        ),
    ).otherwise(F.lit(0).cast("long"))
    return (
        b.crossJoin(F.broadcast(anchor))
        .select(*key_cols, F.col("bn"), w.alias("__w"))
        .groupBy(*key_cols)
        .agg(
            F.sum("bn").alias("n_events"),
            F.sum(F.col("bn") * F.col("__w")).alias("decayed_scaled"),
        )
        .select(
            *key_cols,
            "n_events",
            "decayed_scaled",
            F.round(
                F.col("decayed_scaled").cast("double")
                / F.lit(float(1 << max_k)),
                6,
            ).alias("decayed"),
        )
    )
