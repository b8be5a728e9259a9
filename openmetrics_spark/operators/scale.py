"""Scale machinery: explicit skew salting and bucketed co-location.

AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
default in `session.get_spark`) handles most skew at runtime by
splitting oversized shuffle partitions — but it only fires for
sort-merge joins and only on post-shuffle sizes. ``salted_join`` is
the explicit fallback for the pathological hot-key case (one key =
half the table, e.g. the null/anonymous user): the hot side spreads
each key over N salt shards, the other side replicates N ways, so no
reducer ever sees a whole hot key.

``write_bucketed``/``bucketed_table`` persist a table hash-bucketed
by its join key. Two tables bucketed by the same key with the same
bucket count join WITHOUT any Exchange — at 100 TB this is the
difference between re-shuffling the fact table on every join and
shuffling it once at write time (the reference leans on Kafka's
keyed-partition transport for the same co-location; SURVEY §4).

Plain aggregation needs no salting: Spark's hash aggregate always
partial-aggregates map-side, so a reducer receives at most one row
per (key, upstream-partition) — hot keys collapse before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the LEFT (big, skewed) side salted into
    ``n_salts`` shards per key and the RIGHT side replicated once per
    shard. Each left row carries exactly one salt, so every matched
    pair appears exactly once and unmatched left rows survive a left
    join exactly once — semantics identical to ``left.join(right, on,
    how)`` for inner/left joins. (Right/full outer would duplicate
    unmatched right rows across shards; refuse them.)

    The left salt must not depend on row content (hot keys are hot
    BECAUSE content repeats): a uniform random shard assignment is
    correct for any 1-row-in, 1-row-out join, and Spark re-draws it
    per task attempt without affecting results.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt = (F.rand(seed=7) * n_salts).cast("int")
    l_s = left.withColumn(_SALT, salt)
    r_s = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_s.join(r_s, [*on, _SALT], how).drop(_SALT)


def detect_hot_keys(
    df: DataFrame,
    key_cols: list[str],
    threshold_bp: int = 100,
    top_n: int = 20,
) -> DataFrame:
    """The hot-key detector as a ROUTING pre-stage: the top-``top_n``
    key tuples whose share of ``df`` is AT LEAST ``threshold_bp``
    basis points (``floor(share_bp) >= threshold``, exact integer
    arithmetic — same share formula as events_hot_key_report, whose
    ``is_hot`` alert uses the strict ``share > 1%`` form; routing is
    deliberately inclusive at the boundary because routing a
    borderline key is plan-only while missing one is a stall).
    Returns a DataFrame of just the flagged key columns — bounded by
    ``top_n`` rows by construction, so the caller broadcasts it and
    routes the flagged keys' work to a skew-safe path (the reference's
    TopNFilter shape: compute top keys, broadcast the set, gate the
    stream — TopNFilter.java:17-100).

    100 TB: one map-combinable key count + a one-row broadcast total +
    TakeOrderedAndProject; the input is scanned once, nothing wide is
    shuffled, and the output is a <= top_n-row frame."""
    k = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
    total = k.agg(F.sum("__n").alias("__total"))
    return (
        k.crossJoin(F.broadcast(total))
        .filter(
            F.expr("__n * 10000 DIV __total") >= F.lit(threshold_bp)
        )
        .orderBy(F.col("__n").desc(), *key_cols)
        .limit(top_n)
        .select(*key_cols)
    )


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as an external parquet table hash-bucketed (and
    optionally sorted) by the join/aggregation key. One shuffle now,
    zero shuffles for every later equi-join or groupBy on the bucket
    key between same-bucketed tables."""
    w = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def bucketed_table(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (a plain
    ``read.parquet`` of the same files would lose it)."""
    return spark.table(name)


def optimize_layout(
    df: DataFrame, sort_cols: list[str], n_files: int | None = None
) -> DataFrame:
    """Cluster data for min/max data skipping: range-partition on the
    sort key so each output file owns a disjoint key range, then sort
    within partitions so every parquet ROW GROUP's min/max stats are
    tight. A point or range predicate on the sort key then prunes
    whole files (and row groups within files) at scan time — the same
    layout optimization Delta's OPTIMIZE ZORDER / Hudi clustering
    perform, reduced to its single-column Spark-native core.

    The range partitioner samples the key distribution, so skew in the
    sort key yields balanced files without manual bounds. Write the
    result with a plain ``.write.parquet`` — no table format needed
    for the stats to be written and used."""
    parted = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files
        else df.repartitionByRange(*sort_cols)
    )
    return parted.sortWithinPartitions(*sort_cols)
