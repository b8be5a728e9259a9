"""Upsert sink (HudiOutput → Delta-MERGE-shaped parquet merge):
last-write-wins per PK, partition-scoped, idempotent under replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openmetrics_spark.sources.upsert import UpsertTable, stream_upsert

HOUR = 3600 * 1000
T0 = 1704067200000  # 2024-01-01T00:00:00Z


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "pk string, payload string, event_api_timestamp long"
    )


@pytest.fixture()
def table(tmp_path):
    return UpsertTable(
        str(tmp_path / "tbl"), pk_cols=["pk"], ts_ms_col="event_api_timestamp"
    )


def _rows(spark, table):
    return {
        (r["pk"], r["payload"], r["event_api_timestamp"])
        for r in table.read(spark).collect()
    }


def test_insert_update_and_replay(spark, table):
    b1 = _batch(
        spark,
        [("a", "a1", T0), ("b", "b1", T0 + 1), ("c", "c1", T0 + HOUR)],
    )
    table.upsert(b1)
    assert _rows(spark, table) == {
        ("a", "a1", T0),
        ("b", "b1", T0 + 1),
        ("c", "c1", T0 + HOUR),
    }

    # update b (same hour, later ts), insert d; a/c untouched
    b2 = _batch(spark, [("b", "b2", T0 + 2), ("d", "d1", T0 + 3)])
    table.upsert(b2)
    expect = {
        ("a", "a1", T0),
        ("b", "b2", T0 + 2),
        ("c", "c1", T0 + HOUR),
        ("d", "d1", T0 + 3),
    }
    assert _rows(spark, table) == expect

    # replaying the same batch must leave the table unchanged
    # (at-least-once delivery: ties go to the incoming row)
    table.upsert(b2)
    assert _rows(spark, table) == expect


def test_stale_update_loses(spark, table):
    table.upsert(_batch(spark, [("a", "new", T0 + 10)]))
    table.upsert(_batch(spark, [("a", "old", T0 + 5)]))  # older precombine
    assert _rows(spark, table) == {("a", "new", T0 + 10)}


def test_intra_batch_dedupe(spark, table):
    b = _batch(spark, [("a", "v1", T0), ("a", "v2", T0 + 1)])
    table.upsert(b)
    assert _rows(spark, table) == {("a", "v2", T0 + 1)}


def test_partition_scoped_index(spark, table):
    """Hudi default-index semantics: the same key in a different
    dt/hour partition inserts rather than migrating."""
    table.upsert(_batch(spark, [("a", "h0", T0)]))
    table.upsert(_batch(spark, [("a", "h1", T0 + HOUR)]))
    assert _rows(spark, table) == {("a", "h0", T0), ("a", "h1", T0 + HOUR)}


def test_untouched_partitions_not_rewritten(spark, table, tmp_path):
    table.upsert(
        _batch(spark, [("a", "a1", T0), ("z", "z1", T0 + 5 * HOUR)])
    )
    import os

    part = str(tmp_path / "tbl" / "dt=2024-01-01" / "hour=5")
    before = sorted(os.listdir(part))
    table.upsert(_batch(spark, [("a", "a2", T0 + 1)]))  # touches hour=00 only
    assert sorted(os.listdir(part)) == before
    assert ("z", "z1", T0 + 5 * HOUR) in _rows(spark, table)


def test_streaming_upsert_replay_idempotent(spark, table, tmp_path):
    """End-to-end foreachBatch upsert; a second run from a FRESH
    checkpoint re-delivers every micro-batch (at-least-once) and must
    not change the table."""
    src = str(tmp_path / "src")
    _batch(
        spark, [("a", "a1", T0), ("b", "b1", T0 + 1), ("c", "c1", T0 + HOUR)]
    ).write.parquet(src)
    schema = "pk string, payload string, event_api_timestamp long"

    q = stream_upsert(
        spark.readStream.schema(schema).parquet(src),
        table,
        str(tmp_path / "ckpt1"),
    )
    q.awaitTermination(120)
    expect = _rows(spark, table)
    assert {r[0] for r in expect} == {"a", "b", "c"}

    # fresh checkpoint = full replay of the source
    q2 = stream_upsert(
        spark.readStream.schema(schema).parquet(src),
        table,
        str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    assert _rows(spark, table) == expect


# ---------------------------------------------------------------------------
# Merge-on-read (MorUpsertTable) — HudiOutput.java:425 MERGE_ON_READ
# ---------------------------------------------------------------------------


@pytest.fixture()
def mor(tmp_path):
    from openmetrics_spark.sources.upsert import MorUpsertTable

    return MorUpsertTable(
        str(tmp_path / "mor"), pk_cols=["pk"], ts_ms_col="event_api_timestamp"
    )


def _mor_rows(spark, t):
    return {
        (r["pk"], r["payload"], r["event_api_timestamp"])
        for r in t.read_snapshot(spark).collect()
    }


def test_mor_snapshot_equals_cow(spark, table, mor):
    """Same batches through COW and MOR: snapshot read == COW state,
    including last-write-wins and tie-to-later-commit."""
    batches = [
        [("a", "a1", T0), ("b", "b1", T0 + 1)],
        [("a", "a2", T0 + 2), ("c", "c1", T0 + HOUR)],
        [("a", "stale", T0 + 1), ("b", "b2", T0 + 1)],  # stale + tie
    ]
    for rows in batches:
        table.upsert(_batch(spark, rows))
        mor.upsert(_batch(spark, rows))
    assert _mor_rows(spark, mor) == _rows(spark, table)


def test_mor_write_appends_only_no_table_read(spark, mor, tmp_path):
    """The MOR ingest contract: an upsert only appends to log/ — the
    base directory is untouched and never read."""
    import os

    mor.upsert(_batch(spark, [("a", "a1", T0)]))
    mor.compact(spark)
    base = str(tmp_path / "mor" / "base")
    before = {
        (dp, f): os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(base)
        for f in fs
    }
    mor.upsert(_batch(spark, [("a", "a2", T0 + 1), ("b", "b1", T0 + 2)]))
    after = {
        (dp, f): os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(base)
        for f in fs
    }
    assert after == before  # base untouched by ingest
    assert _mor_rows(spark, mor) == {
        ("a", "a2", T0 + 1),
        ("b", "b1", T0 + 2),
    }


def test_mor_read_optimized_stale_until_compaction(spark, mor):
    mor.upsert(_batch(spark, [("a", "a1", T0)]))
    mor.compact(spark)
    mor.upsert(_batch(spark, [("a", "a2", T0 + 1)]))
    ro = {
        (r["pk"], r["payload"])
        for r in mor.read_optimized(spark).collect()
    }
    assert ro == {("a", "a1")}  # _ro view lags the log
    mor.compact(spark)
    ro2 = {
        (r["pk"], r["payload"])
        for r in mor.read_optimized(spark).collect()
    }
    assert ro2 == {("a", "a2")}
    # post-compaction: snapshot == read-optimized, log truncated, and
    # the commit counter does NOT reset (a reset would let stale base
    # rows win precombine ties against post-compaction ingests)
    assert _mor_rows(spark, mor) == {("a", "a2", T0 + 1)}
    assert mor._read(spark, mor.log_path) is None
    assert mor.last_commit(spark) >= 2


def test_mor_num_commits_compaction_trigger(spark, mor):
    from openmetrics_spark.sources.upsert import MorUpsertTable

    t = MorUpsertTable(
        mor.path, pk_cols=["pk"], ts_ms_col="event_api_timestamp",
        compaction_delta_commits=3,
    )
    t.upsert(_batch(spark, [("a", "a1", T0)]))
    assert not t.maybe_compact(spark)
    t.upsert(_batch(spark, [("a", "a2", T0 + 1)]))
    assert not t.maybe_compact(spark)
    t.upsert(_batch(spark, [("b", "b1", T0 + 2)]))
    assert t.maybe_compact(spark)  # 3rd delta commit triggers
    assert t.read_optimized(spark) is not None
    assert t._read(spark, t.log_path) is None  # log truncated
    assert t.last_commit(spark) >= 3  # high-water mark survives


def test_catalog_sync_cow_and_mor(spark, table, mor):
    """Hive/Glue-sync analog: after sync, plain SQL over the catalog
    table sees every upserted row with dt/hour partition pruning, and
    a re-sync after new writes is idempotent and picks up the new
    partitions (META_SYNC_CONDITIONAL_SYNC behavior)."""
    from openmetrics_spark.sources.upsert import sync_to_catalog

    table.upsert(_batch(spark, [("a", "a1", T0), ("b", "b1", T0 + HOUR)]))
    [cow_fq] = sync_to_catalog(spark, table, "sync_cow_t")
    got = {
        (r["pk"], r["payload"])
        for r in spark.sql(f"SELECT pk, payload FROM {cow_fq}").collect()
    }
    assert got == {("a", "a1"), ("b", "b1")}

    # new partition after a second upsert: re-sync must discover it
    table.upsert(_batch(spark, [("c", "c1", T0 + 5 * HOUR)]))
    sync_to_catalog(spark, table, "sync_cow_t")
    assert spark.sql(
        f"SELECT count(*) AS n FROM {cow_fq} WHERE hour = 5"
    ).first()["n"] == 1

    # partition pruning through the catalog table
    plan = (
        spark.sql(f"SELECT pk FROM {cow_fq} WHERE hour = 5")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "hour" in plan.split("PartitionFilters")[1].splitlines()[0]

    # MOR: read-optimized view (no _ro suffix) + log table
    mor.upsert(_batch(spark, [("x", "x1", T0)]))
    mor.compact(spark)
    mor.upsert(_batch(spark, [("x", "x2", T0 + 1)]))
    names = sync_to_catalog(spark, mor, "sync_mor_t")
    assert names == ["default.sync_mor_t", "default.sync_mor_t_log"]
    ro = {r["payload"] for r in spark.sql("SELECT payload FROM default.sync_mor_t").collect()}
    log = {r["payload"] for r in spark.sql("SELECT payload FROM default.sync_mor_t_log").collect()}
    assert ro == {"x1"} and log == {"x2"}
    for fq in names + [cow_fq]:
        spark.sql(f"DROP TABLE {fq}")


def test_mor_replay_semantically_idempotent(spark, mor):
    """foreachBatch replay after a failure re-appends the batch as a
    new delta commit; the snapshot merge (ts desc, commit desc) must
    still resolve to the same visible rows — replay costs storage
    until compaction, never correctness."""
    b = _batch(spark, [("a", "a1", T0), ("b", "b1", T0 + 1)])
    mor.upsert(b)
    before = _mor_rows(spark, mor)
    mor.upsert(b)
    assert _mor_rows(spark, mor) == before
    mor.compact(spark)
    assert _mor_rows(spark, mor) == before


def test_mor_incremental_read(spark, mor):
    """Hudi-style incremental pull: live row versions newer than a
    commit, with an empty delta once the consumer is caught up."""
    mor.upsert(_batch(spark, [("a", "a1", T0), ("b", "b1", T0 + 1)]))
    mor.upsert(_batch(spark, [("a", "a2", T0 + 2), ("c", "c1", T0 + HOUR)]))
    inc = {
        (r["pk"], r["payload"])
        for r in mor.read_incremental(spark, 1).collect()
    }
    assert inc == {("a", "a2"), ("c", "c1")}
    assert mor.read_incremental(spark, mor.last_commit(spark)).count() == 0


def test_mor_commit_ids_never_reused_after_compaction(spark, mor):
    """Compaction can drop EVERY row of the highest commit (a stale
    update that lost its tie); the persisted timeline must still
    advance past it, and per-row commit provenance must survive the
    base rewrite for incremental consumers."""
    mor.upsert(_batch(spark, [("a", "new", T0 + 10)]))   # commit 1, wins
    mor.upsert(_batch(spark, [("a", "stale", T0 + 5)]))  # commit 2, loses
    mor.compact(spark)                                   # commit-2 rows vanish
    assert mor.last_commit(spark) == 2                   # timeline, not data
    mor.upsert(_batch(spark, [("d", "d1", T0)]))         # commit 3, not 2 again
    assert {
        r["pk"] for r in mor.read_incremental(spark, 2).collect()
    } == {"d"}
    assert {
        r["pk"] for r in mor.read_incremental(spark, 0).collect()
    } == {"a", "d"}


def test_mor_incremental_consumer_reconstructs_snapshot(spark, mor):
    """The CDC loop a downstream sync runs: poll last_commit, pull the
    delta, overwrite-apply per key. After any interleaving of upserts
    and compactions the consumer's materialized view must equal the
    snapshot — deltas are exactly-sufficient, never lossy or stale."""
    batches = [
        [("a", "a1", T0), ("b", "b1", T0 + 1)],
        [("a", "a2", T0 + 2), ("c", "c1", T0 + HOUR)],
        [("b", "stale", T0), ("d", "d1", T0 + 3)],   # b's update loses
        [("a", "a3", T0 + 2), ("c", "c2", T0 + HOUR + 1)],  # tie + win
    ]
    view: dict = {}
    last = 0
    for i, rows in enumerate(batches):
        mor.upsert(_batch(spark, rows))
        if i == 1:
            mor.compact(spark)
        cur = mor.last_commit(spark)
        for r in mor.read_incremental(spark, last).collect():
            view[(r["pk"], str(r["dt"]), r["hour"])] = (
                r["payload"], r["event_api_timestamp"],
            )
        last = cur
    snap = {
        (r["pk"], str(r["dt"]), r["hour"]): (r["payload"], r["event_api_timestamp"])
        for r in mor.read_snapshot(spark).collect()
    }
    assert view == snap


def test_schema_evolution_widening_is_loss_free(spark, table, mor):
    """Hudi-style schema evolution: a widening batch (new column) must
    merge loss-free in BOTH engines and in EITHER order — old rows
    null-fill the new column, and the new column's values survive the
    merge (the pre-fix COW merge silently dropped new columns; the
    pre-fix MOR read picked one file's schema at random)."""
    wide = "pk string, payload string, event_api_timestamp long, extra string"
    table.upsert(_batch(spark, [("a", "a1", T0)]))
    table.upsert(
        spark.createDataFrame([("a", "a2", T0 + 1, "x"), ("b", "b1", T0 + 2, "y")], wide)
    )
    got = {
        (r["pk"], r["payload"], r["extra"])
        for r in table.read(spark).collect()
    }
    assert got == {("a", "a2", "x"), ("b", "b1", "y")}

    # MOR: widen first, then a narrow batch — the wide column survives
    mor.upsert(spark.createDataFrame([("a", "a1", T0, "x")], wide))
    mor.upsert(_batch(spark, [("b", "b1", T0 + 1)]))
    got_m = {
        (r["pk"], r["payload"], r["extra"])
        for r in mor.read_snapshot(spark).collect()
    }
    assert got_m == {("a", "a1", "x"), ("b", "b1", None)}
    mor.compact(spark)
    got_c = {
        (r["pk"], r["payload"], r["extra"])
        for r in mor.read_snapshot(spark).collect()
    }
    assert got_c == got_m


def test_mor_time_travel_reads_past_states(spark, mor):
    """read_as_of(k) reconstructs the exact post-commit-k state —
    including across a compaction — and refuses states the compaction
    physically discarded."""
    import pytest

    mor.upsert(_batch(spark, [("a", "a1", T0), ("b", "b1", T0 + 1)]))  # c1
    mor.upsert(_batch(spark, [("a", "a2", T0 + 2), ("c", "c1", T0 + 3)]))  # c2
    as_of_1 = {
        (r["pk"], r["payload"]) for r in mor.read_as_of(spark, 1).collect()
    }
    assert as_of_1 == {("a", "a1"), ("b", "b1")}
    mor.compact(spark)  # watermark -> 2: the a1 version is now gone
    mor.upsert(_batch(spark, [("a", "a3", T0 + 4)]))  # c3
    as_of_2 = {
        (r["pk"], r["payload"]) for r in mor.read_as_of(spark, 2).collect()
    }
    assert as_of_2 == {("a", "a2"), ("b", "b1"), ("c", "c1")}
    snap = {(r["pk"], r["payload"]) for r in mor.read_snapshot(spark).collect()}
    assert snap == {("a", "a3"), ("b", "b1"), ("c", "c1")}
    with pytest.raises(ValueError, match="predates the earliest"):
        mor.read_as_of(spark, 1)
