"""Sessionization.

Batch twin of the reference's event-time session windows — the
FlatResponseInsertion cogroup uses EventTimeSessionWindows with a 1-day
gap (reference: pipeline/.../job/join/FlatOutputJob.java:998-1044), and
Structured Streaming has the same concept natively as
``session_window`` (used by streaming/jobs.py).

Batch implementation is the classic gaps-and-islands: lag() to detect
gap starts, running sum to number sessions, then aggregate. Two
shuffles on the same key partitioning (Spark reuses the exchange for
the window and the groupBy — one physical shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_ms: int,
) -> DataFrame:
    """Assign a ``session_start_ms`` to every row: rows of the same key
    closer than ``gap_ms`` share a session."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    ms = F.unix_millis(F.col(ts_col))
    # >= gap starts a new session — matching Flink
    # EventTimeSessionWindows and Spark session_window, whose window is
    # the half-open [first, last+gap): an event exactly gap later does
    # NOT overlap, so it opens a new session.
    is_new = (
        (ms - F.unix_millis(F.lag(ts_col).over(w)) >= F.lit(gap_ms))
        | F.lag(ts_col).over(w).isNull()
    ).cast("long")
    with_num = df.withColumn(
        "__session_num", F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    w2 = Window.partitionBy(*key_cols, "__session_num")
    return with_num.withColumn(
        "session_start_ms", F.min(F.unix_millis(F.col(ts_col))).over(w2)
    ).drop("__session_num")


def session_rollup(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_ms: int,
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """One row per session: key cols, session_start_ms, session_end_ms
    (= last event, not +gap), n_events, plus any extra ``aggs``."""
    s = sessionize(df, key_cols, ts_col, gap_ms)
    return s.groupBy(*key_cols, "session_start_ms").agg(
        F.max(F.unix_millis(F.col(ts_col))).alias("session_end_ms"),
        F.count(F.lit(1)).alias("n_events"),
        *aggs,
    )
