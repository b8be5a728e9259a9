"""Deduplication operators.

Batch twins of the reference's streaming dedupe machinery:

- ``keep_first`` — KeepFirstRow semantics ("first event per key wins";
  reference: pipeline/.../common/functions/KeepFirstRow.java:13-49).
  The streaming twin is ``dropDuplicatesWithinWatermark`` (see
  streaming/jobs.py).
- ``pick_best`` — CombineDeliveryLog semantics (merge rows sharing a
  key within a short window, keeping the highest-priority one;
  reference: pipeline/.../common/functions/CombineDeliveryLog.java:22-210).

Scale notes: both are implemented as ``groupBy().agg(min_by(...))``
rather than a ``row_number()`` window. An aggregate gets a map-side
partial (each input partition pre-reduces to one candidate row per key
before the shuffle), so shuffle volume is O(distinct keys), while a
window function must shuffle and sort EVERY row. At 100 TB with a
duplicate rate of a few percent that is the difference between
shuffling ~100 TB and shuffling ~the deduped output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def keep_first(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str | Column],
) -> DataFrame:
    """Keep one row per ``key_cols``: the row minimizing ``order_cols``
    (lexicographic). Pass a timestamp first and a unique id as the
    final element to make the result deterministic under ties.

    Output schema == input schema (column order preserved).
    """
    payload = F.struct(*[F.col(c) for c in df.columns]).alias("__row")
    order = F.struct(
        *[F.col(c) if isinstance(c, str) else c for c in order_cols]
    ).alias("__ord")
    picked = (
        df.select(*key_cols, payload, order)
        .groupBy(*key_cols)
        .agg(F.min_by("__row", "__ord").alias("__row"))
    )
    return picked.select("__row.*")


def pick_best(
    df: DataFrame,
    key_cols: Sequence[str],
    priority_cols: Sequence[Column],
) -> DataFrame:
    """Keep the single best row per key, where "best" = the row
    minimizing the ``priority_cols`` tuple (negate a column to prefer
    the max). Same map-side-combine shape as :func:`keep_first`.

    ``key_cols`` must name existing columns; output = keys + the
    non-key columns of the chosen row (original order)."""
    non_keys = [c for c in df.columns if c not in key_cols]
    payload = F.struct(*[F.col(c) for c in non_keys]).alias("__row")
    order = F.struct(*priority_cols).alias("__ord")
    picked = (
        df.select(*key_cols, payload, order)
        .groupBy(*key_cols)
        .agg(F.min_by("__row", "__ord").alias("__row"))
    )
    return picked.select(*key_cols, "__row.*")


def exact_dupes(
    df: DataFrame, key_cols: Sequence[str], id_col: str
) -> DataFrame:
    """Group identical keys; emit (key..., canonical_id, n_dups).
    Canonical = min id. One shuffle on the hash of the key."""
    return (
        df.groupBy(*key_cols)
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
