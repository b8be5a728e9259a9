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


def _payload_tiebreak(df: DataFrame, exclude: set[str]) -> list:
    """Total deterministic ordering over the non-key payload columns
    (as one JSON rendering, so any column type participates): rows
    that tie on (pk, partition, precombine) must pick the SAME winner
    on every run, or a foreachBatch replay of the identical batch can
    flip the stored row — last-write-wins only commutes with replay
    when every ordering it uses is total."""
    others = [c for c in sorted(df.columns) if c not in exclude]
    if not others:
        return []
    return [F.to_json(F.struct(*[F.col(c) for c in others])).desc()]

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
        row per (pk, dt, hour); full-tie rows (same pk, partition AND
        precombine) break on the payload-JSON ordering so replays pick
        the same winner."""
        w = Window.partitionBy(*self.pk_cols, "dt", "hour").orderBy(
            F.col(self.ts_ms_col).desc(),
            *_payload_tiebreak(
                batch, {*self.pk_cols, self.ts_ms_col, "dt", "hour"}
            ),
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
        # mergeSchema: partitions rewrite independently, so after a
        # widening batch the table legitimately holds files of both
        # schemas; the default single-footer schema pick would
        # silently drop the new column. Full-table reads list every
        # file anyway; the ingest path reads only touched partitions.
        return spark.read.option("mergeSchema", "true").parquet(self.path)

    def _dir_exists(self, spark: SparkSession, path: str) -> bool:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs.exists(hpath)

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
        # read ONLY the touched partition directories: mergeSchema's
        # footer sweep must stay O(touched files), not O(table) — the
        # property ("merge cost scales with batch spread, not table
        # size") the full-table self.read() would break at scale
        touched_dirs = [
            p
            for p in (f"{self.path}/dt={d}/hour={h}" for d, h in parts)
            if self._dir_exists(spark, p)
        ]
        if not touched_dirs:
            prepared.write.partitionBy("dt", "hour").mode("append").save(
                self.path
            )
            return
        existing = (
            spark.read.option("mergeSchema", "true")
            .option("basePath", self.path)
            .parquet(*touched_dirs)
            .filter(prune & exact)
        )
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
        # allowMissingColumns: a widening batch (new column) or a
        # narrowing one must merge loss-free — absent columns fill
        # with null on whichever side lacks them (Hudi's Avro schema
        # evolution; the old select(*survivors.columns) silently
        # DROPPED new columns from incoming rows)
        merged = survivors.unionByName(winners, allowMissingColumns=True)
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
        # schema autoMerge: a widening batch must evolve the target
        # schema, matching the parquet engines' loss-free behavior
        # (without it, UpdateAll/InsertAll throws on any new column)
        prev = spark.conf.get(
            "spark.databricks.delta.schema.autoMerge.enabled", "false"
        )
        spark.conf.set("spark.databricks.delta.schema.autoMerge.enabled", "true")
        try:
            (
                target.alias("t")
                .merge(prepared.alias("s"), on)
                .whenMatchedUpdateAll(
                    condition=f"s.{self.ts_ms_col} >= t.{self.ts_ms_col}"
                )
                .whenNotMatchedInsertAll()
                .execute()
            )
        finally:
            spark.conf.set(
                "spark.databricks.delta.schema.autoMerge.enabled", prev
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


class MorUpsertTable:
    """Merge-on-read PK-upsert table — the table type the reference
    actually deploys (reference: common/job/hudi/HudiOutput.java:425
    ``HoodieTableType.MERGE_ON_READ`` with
    ``COMPACTION_TRIGGER_STRATEGY=num_or_time`` /
    ``COMPACTION_DELTA_SECONDS=600`` at :437-439).

    Layout under ``path``:

    - ``base/`` — compacted columnar files, dt/hour partitioned (what
      Hudi calls the base file of each file group);
    - ``log/``  — append-only delta commits, dt/hour partitioned, each
      row stamped with its commit id (``__commit``).

    Semantics mirror Hudi MOR:

    - :meth:`upsert` only APPENDS the (batch-deduped) rows to ``log/``
      — an O(batch) write with NO table read. This is the property
      that separates MOR from COW at 100 TB: ingest cost is
      independent of table size; the read path pays the merge.
    - :meth:`read_snapshot` merges base + log per (pk, partition):
      highest precombine wins; ties break to the later commit (same
      "incoming wins ties" rule as :class:`UpsertTable`, so a snapshot
      read equals the COW table fed the same batches — parity-tested).
      The merge is one window rank over the pruned partitions.
    - :meth:`read_optimized` reads ``base/`` only — Hudi's ``_ro``
      view (stale until compaction; the reference's Hive sync exposes
      both, HIVE_SYNC_SKIP_RO_SUFFIX at HudiOutput.java:410).
    - :meth:`compact` rewrites only the partitions the log touches
      (snapshot-merge → dynamic partition overwrite of those
      partitions) and truncates the log — Hudi's async compaction.
      :meth:`maybe_compact` applies the num-delta-commits trigger
      (the deterministic half of the reference's num_or_time
      strategy).
    """

    def __init__(
        self,
        path: str,
        pk_cols: Sequence[str],
        ts_ms_col: str,
        compaction_delta_commits: int = 5,
    ) -> None:
        self.path = path.rstrip("/")
        self.base_path = f"{self.path}/base"
        self.log_path = f"{self.path}/log"
        self.pk_cols = list(pk_cols)
        self.ts_ms_col = ts_ms_col
        self.compaction_delta_commits = compaction_delta_commits

    # -- helpers ---------------------------------------------------------

    def _exists(self, spark: SparkSession, path: str) -> bool:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs.exists(hpath) and len(fs.listStatus(hpath)) > 0

    def _read(self, spark: SparkSession, path: str) -> DataFrame | None:
        # mergeSchema: delta commits may widen the schema over time;
        # the default single-footer pick would read whichever file it
        # sampled and silently drop newer columns
        return (
            spark.read.option("mergeSchema", "true").parquet(path)
            if self._exists(spark, path)
            else None
        )

    def _prepare(self, batch: DataFrame) -> DataFrame:
        prepared = (
            with_dt_hour(batch, self.ts_ms_col)
            .withColumn("dt", F.to_date("dt"))
            .withColumn("hour", F.col("hour").cast("int"))
        )
        # full-tie rows break on the payload-JSON ordering: a replayed
        # batch re-appends under a LATER commit, and the snapshot's
        # commit-desc tiebreak hands that copy the win — so the copy
        # must be the same row, or replay flips the visible payload
        w = Window.partitionBy(*self.pk_cols, "dt", "hour").orderBy(
            F.col(self.ts_ms_col).desc(),
            *_payload_tiebreak(
                prepared, {*self.pk_cols, self.ts_ms_col, "dt", "hour"}
            ),
        )
        return (
            prepared.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    # The commit counter is persisted as a tiny text "timeline" file
    # (Hudi keeps its .hoodie timeline the same way) rather than
    # derived from data: compaction can drop every row of the highest
    # commit (a late stale update that lost its precombine tie), and a
    # data-derived counter would then REUSE that commit id — breaking
    # both tie-ranking and any incremental consumer that already read
    # past it.

    @property
    def _hwm_path(self) -> str:
        return f"{self.path}/_commit_hwm"

    @property
    def _retain_path(self) -> str:
        return f"{self.path}/_earliest_retained"

    def _write_hwm(self, spark: SparkSession, value: int) -> None:
        from openmetrics_spark.tables import literal_df

        literal_df(spark, [(str(value),)], "v string").coalesce(
            1
        ).write.mode("overwrite").text(self._hwm_path)

    def last_commit(self, spark: SparkSession) -> int:
        if self._exists(spark, self._hwm_path):
            return int(spark.read.text(self._hwm_path).first()["value"])
        # pre-hwm tables: fall back to the data-derived high-water mark
        top = 0
        for path in (self.log_path, self.base_path):
            df = self._read(spark, path)
            if df is not None and "__commit" in df.columns:
                c = df.agg(F.max("__commit").alias("c")).first()["c"]
                top = max(top, int(c or 0))
        return top

    # -- write path ------------------------------------------------------

    def upsert(self, batch: DataFrame, batch_id: int | None = None) -> None:
        """Append one (micro-)batch as a delta commit. foreachBatch-
        compatible; NO read-modify-write of the table."""
        spark = batch.sparkSession
        commit = self.last_commit(spark) + 1
        prepared = self._prepare(batch).withColumn(
            "__commit", F.lit(commit).cast("long")
        )
        prepared.write.partitionBy("dt", "hour").mode("append").save(
            self.log_path
        )
        self._write_hwm(spark, commit)

    # -- read paths ------------------------------------------------------

    def read_optimized(self, spark: SparkSession) -> DataFrame | None:
        """Base files only (Hudi's _ro view) — no merge cost, stale by
        at most one compaction interval."""
        base = self._read(spark, self.base_path)
        return None if base is None else base.drop("__commit")

    def earliest_retained_commit(self, spark: SparkSession) -> int:
        """The oldest commit a point-in-time read can reconstruct:
        compaction keeps only the SURVIVING row version per key, so
        every state older than the last compaction's high-water mark
        is gone (Hudi's cleaner/retained-instant rule). 0 until the
        first compaction."""
        if self._exists(spark, self._retain_path):
            return int(spark.read.text(self._retain_path).first()["value"])
        return 0

    def _snapshot(
        self, spark: SparkSession, as_of_commit: int | None = None
    ) -> DataFrame:
        base = self._read(spark, self.base_path)
        log = self._read(spark, self.log_path)
        if log is None and base is None:
            raise FileNotFoundError(self.path)
        if base is None:
            unioned = log
        elif log is None:
            unioned = base
        else:
            unioned = base.unionByName(log, allowMissingColumns=True)
        if as_of_commit is not None:
            unioned = unioned.filter(F.col("__commit") <= int(as_of_commit))
        w = Window.partitionBy(*self.pk_cols, "dt", "hour").orderBy(
            F.col(self.ts_ms_col).desc(),
            F.col("__commit").desc(),
            *[F.col(c) for c in self.pk_cols],
        )
        return (
            unioned.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def read_snapshot(self, spark: SparkSession) -> DataFrame:
        """Base + log merged per key: max (precombine, commit) wins —
        one window rank over the unioned rows, partition-prunable on
        (dt, hour) like any parquet scan."""
        return self._snapshot(spark).drop("__commit")

    def read_as_of(self, spark: SparkSession, as_of_commit: int) -> DataFrame:
        """Hudi-style point-in-time (time-travel) query: the table
        exactly as it stood after ``as_of_commit`` — row versions with
        ``__commit <= as_of`` merged by the same rank as a snapshot.
        Valid across compactions for any ``as_of`` at or past the
        compaction watermark (surviving base rows keep their original
        per-row ``__commit``); older states were physically discarded
        by compaction, so asking for them raises instead of silently
        returning a hole-y table."""
        retained = self.earliest_retained_commit(spark)
        if as_of_commit < retained:
            raise ValueError(
                f"as_of_commit={as_of_commit} predates the earliest "
                f"retained commit {retained} (discarded by compaction)"
            )
        return self._snapshot(spark, as_of_commit).drop("__commit")

    def read_incremental(self, spark: SparkSession, since_commit: int) -> DataFrame:
        """Hudi-style incremental pull: every LIVE row version written
        after ``since_commit`` (compaction preserves per-row commit
        provenance, so consumers can resume from any commit they've
        seen). The downstream-sync shape: poll ``last_commit()``,
        read the delta, checkpoint the commit — at 100 TB the filter
        prunes to the log plus whatever base partitions hold newer
        rows, never a full-table diff."""
        return (
            self._snapshot(spark)
            .filter(F.col("__commit") > int(since_commit))
            .drop("__commit")
        )

    # -- compaction ------------------------------------------------------

    def compact(self, spark: SparkSession) -> int:
        """Merge the log into the base for every partition the log
        touches, then truncate the log. Returns partitions rewritten.
        Cost scales with log spread, not table size — only touched
        (dt, hour) directories are read and rewritten."""
        log = self._read(spark, self.log_path)
        if log is None:
            return 0
        parts = [
            (r["dt"], r["hour"])
            for r in log.select("dt", "hour").distinct().collect()
        ]
        # read ONLY the touched base directories, so the mergeSchema
        # footer sweep stays O(log spread), never O(base) — the cost
        # property this method's contract states
        jvm = spark._jvm
        fs = jvm.org.apache.hadoop.fs.Path(self.base_path).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        touched_dirs = [
            p
            for p in (f"{self.base_path}/dt={d}/hour={h}" for d, h in parts)
            if fs.exists(jvm.org.apache.hadoop.fs.Path(p))
        ]
        prune = F.col("dt").isin([d for d, _ in parts]) & F.col("hour").isin(
            [h for _, h in parts]
        )
        exact = F.concat_ws(
            "/", F.col("dt").cast("string"), F.col("hour").cast("string")
        ).isin([f"{d}/{h}" for d, h in parts])
        touched = (
            log
            if not touched_dirs
            else spark.read.option("mergeSchema", "true")
            .option("basePath", self.base_path)
            .parquet(*touched_dirs)
            .filter(prune & exact)
            .unionByName(log, allowMissingColumns=True)
        )
        w = Window.partitionBy(*self.pk_cols, "dt", "hour").orderBy(
            F.col(self.ts_ms_col).desc(),
            F.col("__commit").desc(),
            *[F.col(c) for c in self.pk_cols],
        )
        # each surviving row KEEPS its own __commit (incremental
        # consumers need per-row provenance across compactions; the
        # counter itself lives in the _commit_hwm timeline file)
        merged = (
            touched.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .localCheckpoint(eager=True)
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.partitionBy("dt", "hour").mode("overwrite").save(
                self.base_path
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        # truncate the log (its rows are now in base)
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(self.log_path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(hpath, True)
        # time-travel watermark: states OLDER than this compaction's
        # high-water mark just lost their superseded row versions
        from openmetrics_spark.tables import literal_df

        literal_df(
            spark, [(str(self.last_commit(spark)),)], "v string"
        ).coalesce(1).write.mode("overwrite").text(self._retain_path)
        return len(parts)

    def maybe_compact(self, spark: SparkSession) -> bool:
        """num-delta-commits compaction trigger (the deterministic half
        of the reference's NUM_OR_TIME strategy,
        HudiOutput.java:437-439)."""
        log = self._read(spark, self.log_path)
        if log is None:
            return False
        n = log.select("__commit").distinct().count()
        if n >= self.compaction_delta_commits:
            self.compact(spark)
            return True
        return False


def sync_to_catalog(
    spark: SparkSession,
    table: "UpsertTable | MorUpsertTable",
    name: str,
    database: str = "default",
    skip_ro_suffix: bool = True,
) -> list[str]:
    """Catalog sync — the reference's Hive/Glue sync mapped to Spark's
    built-in catalog (reference: common/job/hudi/HudiOutput.java:
    402-411 — HIVE_SYNC_ENABLED with mode 'glue', per-table database/
    name, HIVE_SYNC_SKIP_RO_SUFFIX). Registers the table as an
    external partitioned parquet table and recovers its dt/hour
    partitions, so ``spark.table(name)`` / plain SQL sees every
    upserted row with partition pruning intact.

    COW tables sync one entry. MOR tables mirror Hudi's two views:
    ``<name>`` (read-optimized — the base files; the reference skips
    the ``_ro`` suffix for it, hence the default) and ``<name>_log``
    for the delta log (the snapshot view is a window merge, not a
    scannable location, so it stays a read-path API —
    ``read_snapshot``).

    Returns the fully-qualified table names registered. Re-running is
    idempotent (CREATE TABLE IF NOT EXISTS + partition recovery), the
    analog of META_SYNC_CONDITIONAL_SYNC."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")

    def register(table_name: str, location: str) -> str:
        fq = f"{database}.{table_name}"
        # explicit column list derived from the data (CREATE TABLE
        # with LOCATION only cannot carry PARTITIONED BY); dt/hour go
        # last as the partition columns
        schema = spark.read.parquet(location).schema
        data_cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in schema.fields
            if f.name not in ("dt", "hour")
        )
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {fq} "
            f"({data_cols}, dt DATE, hour INT) USING parquet "
            f"PARTITIONED BY (dt, hour) LOCATION '{location}'"
        )
        # discover partition directories added since the last sync
        spark.sql(f"MSCK REPAIR TABLE {fq}")
        return fq

    if isinstance(table, MorUpsertTable):
        ro_name = name if skip_ro_suffix else f"{name}_ro"
        out = [register(ro_name, table.base_path)]
        if table._exists(spark, table.log_path):
            out.append(register(f"{name}_log", table.log_path))
        return out
    return [register(name, table.path)]
