"""Streaming twins of the batch operators (SURVEY §2.3, §2.4, §2.5).

Each function takes a STREAMING DataFrame and returns a streaming
DataFrame; semantics match the same-named batch operator, with
lateness bounded by the watermark delay instead of being exact. The
watermark plays the role of the reference's bounded-out-of-orderness
generator + event-time timers (SURVEY §2.7: Spark chains watermarks
through stateful ops, so the reference's hand-built watermark-delay
operators are engine-managed here).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ms(duration_ms: int) -> str:
    return f"{duration_ms} milliseconds"


def stream_keep_first(
    sdf: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    retention_ms: int,
) -> DataFrame:
    """First event per key wins, state dropped after retention —
    KeepFirstRow (reference: common/functions/KeepFirstRow.java:13-49,
    1d default retention via RawOutputJob.java:238-313).

    ``dropDuplicatesWithinWatermark`` keeps first-ARRIVAL per key, like
    the reference's processElement; the batch twin (operators.dedup.
    keep_first) canonicalizes to first-by-event-time — identical when
    input arrives in event-time order, which is the parity test's
    setup."""
    return sdf.withWatermark(ts_col, _ms(retention_ms)).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def stream_sliding_counter(
    sdf: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    window_ms: int,
    slide_ms: int,
    delay_ms: int = 1000,
    value_col: str | None = None,
) -> DataFrame:
    """Trailing count per key at every slide boundary —
    SlidingHourlyCounter / SlidingDailyCounter (reference: common/
    functions/SlidingCounter.java:38-292; 1h/15m and 1-7-30d/4h
    instances). Built-in sliding window: each event lands in
    window_ms/slide_ms overlapping windows; the partial aggregation is
    map-side combined before the key shuffle.

    Output matches the batch ``sliding_counter``: key cols + ``emit_ms``
    (window end epoch millis) + ``n``."""
    w = F.window(F.col(ts_col), _ms(window_ms), _ms(slide_ms))
    agg = (F.count(F.lit(1)) if value_col is None else F.sum(value_col)).alias("n")
    return (
        sdf.withWatermark(ts_col, _ms(delay_ms))
        .groupBy(*key_cols, w.alias("__w"))
        .agg(agg)
        .select(*key_cols, F.unix_millis("__w.end").alias("emit_ms"), "n")
    )


def stream_tumbling_metrics(
    sdf: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    window_ms: int,
    metrics: dict[str, F.Column],
    delay_ms: int = 1000,
) -> DataFrame:
    """Tumbling-window metric sums — the content-metrics hourly/daily
    aggregates (reference: job/contentmetrics/resources/
    2_create_view_hourly_content_metrics.sql TUMBLE 1h; 5_... 1d).
    ``metrics`` maps output name → aggregate column over the window."""
    w = F.window(F.col(ts_col), _ms(window_ms))
    return (
        sdf.withWatermark(ts_col, _ms(delay_ms))
        .groupBy(*key_cols, w.alias("__w"))
        .agg(*[m.alias(name) for name, m in metrics.items()])
        .select(
            *key_cols,
            F.unix_millis("__w.start").alias("window_start_ms"),
            *metrics.keys(),
        )
    )


def stream_session_rollup(
    sdf: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_ms: int,
    delay_ms: int = 1000,
) -> DataFrame:
    """Event-time session windows with a gap — the
    FlatResponseInsertion cogroup shape (reference: FlatOutputJob.java:
    998-1044, EventTimeSessionWindows 1d gap). Emits one row per closed
    session: key + session start/end + event count."""
    sw = F.session_window(F.col(ts_col), _ms(gap_ms))
    return (
        sdf.withWatermark(ts_col, _ms(delay_ms))
        .groupBy(*key_cols, sw.alias("__s"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *key_cols,
            F.unix_millis("__s.start").alias("session_start_ms"),
            # session_window's end is last_event + gap (half-open);
            # report the last event time like the batch twin
            (F.unix_millis("__s.end") - F.lit(gap_ms)).alias("session_end_ms"),
            "n_events",
        )
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_ms: int,
    upper_ms: int,
    left_delay_ms: int = 1000,
    right_delay_ms: int = 1000,
) -> DataFrame:
    """Stream-stream inner interval join: right rows within
    ``[left_ts + lower_ms, left_ts + upper_ms]`` — the explicit-FK
    portion of the inferred-reference join (reference: common/functions/
    inferred/BaseInferred.java explicit-id path :304-481). The time
    bound lets Spark evict join state once the watermark passes, same
    as the reference's cleanup timers.

    Both inputs must carry distinct column names (alias before the
    call); ``on`` columns are taken from both sides by equality."""
    lw = left.withWatermark(left_ts, _ms(left_delay_ms))
    rw = right.withWatermark(right_ts, _ms(right_delay_ms))
    cond = None
    for c in on:
        e = lw[c] == rw[c]
        cond = e if cond is None else cond & e
    lcol, rcol = lw[left_ts], rw[right_ts]
    time_cond = (rcol >= lcol + F.expr(f"INTERVAL {lower_ms} MILLISECONDS")) & (
        rcol <= lcol + F.expr(f"INTERVAL {upper_ms} MILLISECONDS")
    )
    return lw.join(rw, cond & time_cond, "inner")
