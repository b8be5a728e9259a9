"""Primary-key upsert table sink — the reference's Hudi output
(reference: pipeline/.../common/job/hudi/HudiOutput.java:63-485 —
COPY_ON_WRITE tables with a record key, dt/hour partition expressions
and upsert semantics, wired for joined events at
job/join/FlatOutputJob.java:1205-1229).

Spark mapping (SURVEY §2.1): Delta Lake ``MERGE`` in ``foreachBatch``.
This sandbox has no delta-spark / hudi-spark package, so the default
engine is a hand-rolled copy-on-write merge over plain parquet that
keeps the exact semantics Hudi's COW path implements:

- **last-write-wins per primary key** (Hudi precombine field =
  ``ts_ms_col``): within a batch and against the stored table, the row
  with the larger precombine value survives; ties break to the
  incoming row (idempotent replay: re-writing the same batch is a
  no-op).
- **partition-scoped index** (Hudi's default Bloom index scope): a key
  is matched against existing rows of the same dt/hour partition
  only. A key arriving with a different partition value inserts there
  rather than migrating — same default as the reference's
  ``hoodie.index`` setup.
- **rewrite only affected partitions** (COW file-group rewrite):
  the merge reads just the dt/hour partitions the batch touches
  (partition pruning) and writes with dynamic partition overwrite, so
  a micro-batch touching 2 hours of data rewrites 2 directories, not
  the table. At 100 TB this is the property that matters — merge cost
  scales with batch spread, not table size.

When delta-spark IS importable, ``UpsertTable`` uses a real Delta
``MERGE`` instead (same last-write-wins condition); the parquet engine
remains the tested fallback.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openmetrics_spark.sources.sinks import with_dt_hour

try:  # pragma: no cover - delta-spark is not bundled in this sandbox
    from delta.tables import DeltaTable

    HAS_DELTA = True
except ImportError:
    DeltaTable = None
    HAS_DELTA = False


class UpsertTable:
    """A PK-upsert table at ``path``, partitioned by dt/hour derived
    from ``ts_ms_col`` (epoch millis — the reference partitions on
    event_api_timestamp via its partition-path expression).

    Use :meth:`upsert` directly on a batch DataFrame, or hand it to
    ``writeStream.foreachBatch`` (signature matches)."""

    def __init__(
        self,
        path: str,
        pk_cols: Sequence[str],
        ts_ms_col: str,
        use_delta: bool | None = None,
    ) -> None:
        self.path = path
        self.pk_cols = list(pk_cols)
        self.ts_ms_col = ts_ms_col
        self.use_delta = HAS_DELTA if use_delta is None else use_delta

    # -- helpers ---------------------------------------------------------

    def _dedupe_batch(self, batch: DataFrame) -> DataFrame:
        """Last-write-wins inside the batch: keep the max precombine
        row per (pk, dt, hour); ties break deterministically on the
        full pk tuple ordering via row_number."""
        w = Window.partitionBy(*self.pk_cols, "dt", "hour").orderBy(
            F.col(self.ts_ms_col).desc(), *[F.col(c) for c in self.pk_cols]
        )
        return (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def exists(self, spark: SparkSession) -> bool:
        """Table presence via Spark's Hadoop FileSystem API — resolves
        whatever scheme ``path`` carries (s3a://, hdfs://, file:/...),
        so the same check works against an object store. (A Delta/Hudi
        deployment would consult the table log instead.)"""
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(self.path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs.exists(hpath) and len(fs.listStatus(hpath)) > 0

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)

    # -- the sink --------------------------------------------------------

    def upsert(self, batch: DataFrame, batch_id: int | None = None) -> None:
        """Merge one (micro-)batch. foreachBatch-compatible."""
        spark = batch.sparkSession
        # dt as DATE / hour as INT: matches what partition-column type
        # inference yields on read-back, so merge joins compare
        # like-typed values round-trip
        prepared = self._dedupe_batch(
            with_dt_hour(batch, self.ts_ms_col)
            .withColumn("dt", F.to_date("dt"))
            .withColumn("hour", F.col("hour").cast("int"))
        )
        if self.use_delta and HAS_DELTA:  # pragma: no cover - no delta here
            self._upsert_delta(spark, prepared)
            return
        self._upsert_parquet(spark, prepared)

    def _upsert_parquet(self, spark: SparkSession, prepared: DataFrame) -> None:
        if not self.exists(spark):
            prepared.write.partitionBy("dt", "hour").mode("overwrite").save(
                self.path
            )
            return
        # Only the partitions this batch touches participate in the
        # merge; everything else is untouched on disk. The partition
        # list is tiny (hours touched per batch), so collecting it to
        # build a pruning filter is driver-cheap at any scale.
        parts = [
            (r["dt"], r["hour"])
            for r in prepared.select("dt", "hour").distinct().collect()
        ]
        # IN-list predicates, not an OR-chain: a wide backfill batch can
        # touch thousands of partitions and a thousand-deep boolean tree
        # overflows the analyzer stack. Pruning runs on the per-column
        # IN lists (plain partition-column predicates); the exact
        # (dt, hour) pair filter rides along as a residual to trim the
        # cross product the per-column lists admit.
        prune = F.col("dt").isin([d for d, _ in parts]) & F.col("hour").isin(
            [h for _, h in parts]
        )
        exact = F.concat_ws(
            "/", F.col("dt").cast("string"), F.col("hour").cast("string")
        ).isin([f"{d}/{h}" for d, h in parts])
        existing = self.read(spark).filter(prune & exact)
        # keep existing rows whose key is absent from the batch OR
        # whose precombine beats the batch row (ties -> incoming wins)
        incoming_keys = prepared.select(
            *[F.col(c).alias(f"__in_{c}") for c in self.pk_cols],
            F.col("dt").alias("__in_dt"),
            F.col("hour").alias("__in_hour"),
            F.col(self.ts_ms_col).alias("__in_ts"),
        )
        cond = (
            (F.col("dt") == F.col("__in_dt"))
            & (F.col("hour") == F.col("__in_hour"))
            & (F.col("__in_ts") >= F.col(self.ts_ms_col))
        )
        for c in self.pk_cols:
            cond = cond & (F.col(c) == F.col(f"__in_{c}"))
        survivors = existing.join(incoming_keys, cond, "left_anti")
        # symmetric rule for the incoming side: a batch row loses to a
        # strictly-newer stored row (stale replay / out-of-order batch)
        existing_keys = existing.select(
            *[F.col(c).alias(f"__ex_{c}") for c in self.pk_cols],
            F.col("dt").alias("__ex_dt"),
            F.col("hour").alias("__ex_hour"),
            F.col(self.ts_ms_col).alias("__ex_ts"),
        )
        ex_cond = (
            (F.col("dt") == F.col("__ex_dt"))
            & (F.col("hour") == F.col("__ex_hour"))
            & (F.col("__ex_ts") > F.col(self.ts_ms_col))
        )
        for c in self.pk_cols:
            ex_cond = ex_cond & (F.col(c) == F.col(f"__ex_{c}"))
        winners = prepared.join(existing_keys, ex_cond, "left_anti")
        merged = survivors.unionByName(winners.select(*survivors.columns))
        # Materialize before overwriting: the plan reads the same
        # directories the dynamic overwrite replaces.
        merged = merged.localCheckpoint(eager=True)
        # dynamic partition overwrite must be set at session level —
        # the writer-level option is not honored on the v1 path-based
        # write, which would silently leave the old files in place
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.partitionBy("dt", "hour").mode("overwrite").save(
                self.path
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    def _upsert_delta(self, spark: SparkSession, prepared: DataFrame) -> None:
        """Real Delta MERGE (only runs where delta-spark is
        installed)."""  # pragma: no cover
        if not DeltaTable.isDeltaTable(spark, self.path):
            prepared.write.format("delta").partitionBy("dt", "hour").mode(
                "overwrite"
            ).save(self.path)
            return
        target = DeltaTable.forPath(spark, self.path)
        on = " AND ".join(
            [f"t.{c} = s.{c}" for c in self.pk_cols] + ["t.dt = s.dt", "t.hour = s.hour"]
        )
        (
            target.alias("t")
            .merge(prepared.alias("s"), on)
            .whenMatchedUpdateAll(condition=f"s.{self.ts_ms_col} >= t.{self.ts_ms_col}")
            .whenNotMatchedInsertAll()
            .execute()
        )


def stream_upsert(
    sdf: DataFrame,
    table: UpsertTable,
    checkpoint_dir: str,
):
    """Streaming writer: PK upsert per micro-batch — the foreachBatch
    Delta-MERGE shape SURVEY §2.1 maps HudiOutput to. At-least-once
    replays are safe because the merge is idempotent (last-write-wins
    with ties to the incoming row). Returns the started query."""
    return (
        sdf.writeStream.foreachBatch(table.upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
