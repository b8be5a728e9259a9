"""Loaders for the driver-generated test tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an sf dir.

``load_tables`` registers every table as a temp view so queries can be
written in either the DataFrame API or Spark SQL; Catalyst produces the
same plan either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table. Plain parquet scan: column pruning and
    predicate pushdown happen automatically downstream.

    ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) (Spark reads a
    long under ``nanosAsLong``), as tz-naive ``timestamp[us]`` (Spark 4
    reads TIMESTAMP_NTZ), and could ship as tz-aware micros (plain
    TimestampType). Normalize all three shapes to TimestampType so every
    downstream ``unix_millis`` call works regardless of how the writer
    annotated the column. Under the UTC session timezone the NTZ→LTZ
    cast is an exact reinterpretation (epoch-millis match DuckDB's
    ``epoch_ms(ts)``). Integer division (``div``) keeps full precision
    — ``/`` would go through double and lose sub-second digits at
    epoch-nanos magnitude.
    """
    try:
        # the driver may hand us a session built without these confs;
        # all are session-level and safe to set idempotently. UTC
        # matters for timestamp→date casts matching UTC-naive oracles.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # the composed manifests' pinned subtrees REPRINT inside every
        # consumer, so their untruncated plan strings reach ~53 MB per
        # execution; the UI listener retains one per execution and a
        # default-memory driver JVM OOMs mid-window (measured on
        # local[8] defaults). 1 MB keeps every real plan readable while
        # capping listener retention at ~MBs across a 50-query window.
        spark.conf.set("spark.sql.maxPlanStringLength", "1000000")
    except Exception:
        pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for field in df.schema.fields:
        if field.name != "ts":
            continue
        if isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(field.dataType, T.TimestampNTZType):
            # explicit cast (not to_timestamp) so the result is
            # TimestampType even if spark.sql.timestampType=TIMESTAMP_NTZ
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Read the given tables (default: all) and register temp views."""
    out: dict[str, DataFrame] = {}
    for name in names or TABLE_NAMES:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


# ---------------------------------------------------------------------------
# Cache registry: queries that persist() an intermediate (dedup posting
# lists, span counts) return LAZY DataFrames, so they cannot unpersist
# before the caller consumes the result — but never unpersisting leaks
# executor memory across the dozens of queries a verify/bench run
# executes in one SparkSession. pin() records every persisted frame;
# the harnesses (oracle CLI, bench, test fixtures) call
# release_caches() after each query's action completes.
# ---------------------------------------------------------------------------
_LIVE_CACHES: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """persist() + register for deferred release via release_caches()."""
    df.persist()
    _LIVE_CACHES.append(df)
    return df


_STAGE_ROOT: str | None = None


def stage_parquet(df: DataFrame, tag: str) -> DataFrame:
    """Materialize ``df`` to a scratch parquet dir and read it back —
    a RELIABLE lineage cut (guide §3.3: "materialising an intermediate
    result (write + read back ...) truncates the plan").

    Versus ``localCheckpoint()``: checkpoint blocks live only on
    executors with no lineage fallback, so at cluster scale one lost
    executor kills the whole job; staged parquet survives executor
    loss (re-read is a plain file scan) and downstream plans start
    from a pruned columnar scan instead of a block fetch. Scratch is
    per-process and wiped at interpreter exit; re-staging the same tag
    in one process overwrites, so the result is always THIS run's
    computation — never a cross-run cache."""
    global _STAGE_ROOT
    import atexit
    import shutil
    import tempfile

    if _STAGE_ROOT is None:
        _STAGE_ROOT = os.path.join(
            tempfile.gettempdir(), f"omx_stage_{os.getpid()}"
        )
        atexit.register(shutil.rmtree, _STAGE_ROOT, ignore_errors=True)
    path = os.path.join(_STAGE_ROOT, tag)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def release_caches() -> int:
    """Unpersist every pin()ed frame; returns how many were released."""
    n = 0
    while _LIVE_CACHES:
        df = _LIVE_CACHES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to leak
            pass
    return n


def literal_df(
    spark: SparkSession,
    rows: list[tuple],
    schema: T.StructType | str,
) -> DataFrame:
    """A small constant DataFrame built as a pure Catalyst plan.

    ``spark.createDataFrame(rows, schema)`` plans a Python-RDD-backed
    scan; the first action on it spins up a Python worker round-trip,
    measured ~4.5 s per WRITE in a warm local session — which silently
    dominated every staging sentinel, stream side-output and metadata
    write that used it for a handful of rows. Building the same rows
    as ``range(1).select(explode(array(struct(lit(...)))))`` keeps the
    whole plan JVM-side (~0.25 s) and is cluster-identical semantics.

    Only for CONSTANT rows already on the driver and small enough to
    inline into a plan (sentinels, metadata rows, side-output deltas).
    Real data always comes from files/fixtures, never literals."""
    if isinstance(schema, str):
        schema = spark.createDataFrame([], schema).schema
    if not rows:
        return spark.range(0).select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in schema.fields]
        )
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for f, v in zip(schema.fields, row)
            ]
        )
        for row in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("__r"))
        .select("__r.*")
    )


def spread_for_compute(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Repartition a narrow scan up to cluster parallelism ahead of a
    CPU-heavy stage. Small parquet inputs arrive as one split, which
    serializes per-row compute (tokenize/hash/shingle) on one core of
    the whole cluster; a round-robin repartition of the (tiny) source
    rows buys back full parallelism for the expensive projection. At
    100 TB inputs carry thousands of splits and this is a no-op — the
    guard keeps the shuffle out of plans that don't need it (do NOT
    shrink files.maxPartitionBytes instead: that knob would explode
    task counts on real-scale inputs)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # Estimate the scan's split count without df.rdd (which forces a
    # deprecated DataFrame→RDD conversion per call): splits ≈
    # Σ file_size / maxPartitionBytes, floored at one per file. For
    # non-local or unstat-able files fall back to the file count — at
    # real scale inputs carry thousands of files and this is a no-op.
    files = df.inputFiles()
    if not files:
        return df  # not a file scan (in-memory fixture etc.)
    raw = (
        df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        .lower()
        .removesuffix("b")
    )
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    if raw and raw[-1] in units:
        max_bytes = int(raw[:-1]) * units[raw[-1]]
    else:
        max_bytes = int(raw)
    splits = 0
    for f in files:
        if f.startswith("file:"):
            from urllib.parse import unquote, urlparse

            try:
                size = os.path.getsize(unquote(urlparse(f).path))
                splits += max(1, -(-size // max_bytes))
                continue
            except OSError:
                pass
        splits += 1
    if splits >= max(2, int(target * min_fraction)):
        return df
    return df.repartition(target)
