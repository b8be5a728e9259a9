"""End-to-end streaming flat-output job: the assembled twin chain
(dedup → combine → 3 inferred joins → reduce → flat sessions) over
fixture parquet, compared against the batch job on the same data —
the Spark analog of FlatOutputJobMiniclusterTest, with the
reference's ~97% yield expectation (pipeline/README.md:91) as the
acceptance bar: streaming decisions happen at the watermark, so a
small tail may differ from the batch pick, but the bulk must agree.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openmetrics_spark.fixtures import FixtureOptions, generate, to_spark
from openmetrics_spark.jobs.flat_output import run_flat_output
from openmetrics_spark.jobs.streaming_flat_output import run_streaming_flat_output

YIELD = 0.97


@pytest.fixture(scope="module")
def outputs(spark, tmp_path_factory):
    fx = generate(FixtureOptions(users=12))
    dfs = to_spark(spark, fx)
    raw = {}
    base = tmp_path_factory.mktemp("sfo_raw")
    for name in ("view", "delivery_log", "impression", "action"):
        d = str(base / name)
        dfs[name].coalesce(1).write.mode("overwrite").parquet(d)
        raw[name] = d
    work = str(tmp_path_factory.mktemp("sfo_work"))
    streaming = run_streaming_flat_output(spark, raw, work)
    batch = run_flat_output(
        dfs["view"], dfs["delivery_log"], dfs["impression"], dfs["action"]
    )
    return streaming, batch


def _ids(df, col):
    return {r[0] for r in df.select(col).collect()}


def test_impression_yield_vs_batch(outputs):
    streaming, batch = outputs
    s_ids = _ids(streaming["joined_impression"], "impression_id")
    b_ids = _ids(batch["joined_impression"], "impression_id")
    assert b_ids, "batch produced no joined impressions"
    overlap = len(s_ids & b_ids) / len(b_ids)
    assert overlap >= YIELD, f"impression yield {overlap:.3f} < {YIELD}"


def test_action_yield_vs_batch(outputs):
    streaming, batch = outputs
    s_ids = _ids(streaming["joined_action"], "raw_action_id")
    b_ids = _ids(batch["joined_action"], "action_id")
    assert b_ids, "batch produced no joined actions"
    overlap = len(s_ids & b_ids) / len(b_ids)
    assert overlap >= YIELD, f"action yield {overlap:.3f} < {YIELD}"


def test_impression_scope_resolution_agrees(outputs):
    """For impressions both pipelines joined, the resolved insertion
    must agree on the overwhelming majority (same inference inputs,
    same nearest-in-time rule)."""
    streaming, batch = outputs
    s = {
        r.impression_id: r.insertion_id
        for r in streaming["joined_impression"]
        .select("impression_id", "insertion_id")
        .collect()
    }
    b = {
        r.impression_id: r.insertion_id
        for r in batch["joined_impression"]
        .select("impression_id", "insertion_id")
        .collect()
    }
    common = set(s) & set(b)
    assert common
    agree = sum(1 for i in common if s[i] == b[i]) / len(common)
    assert agree >= YIELD, f"insertion agreement {agree:.3f} < {YIELD}"


def test_redundant_impressions_suppressed(outputs):
    """Streaming must suppress redundant impressions like the batch
    reducer: kept streaming impressions ∩ batch redundant set ≈ ∅."""
    streaming, batch = outputs
    s_kept = _ids(streaming["joined_impression"], "impression_id")
    b_redundant = _ids(batch["side_redundant_impression"], "impression_id")
    if not b_redundant:
        pytest.skip("fixtures produced no redundant impressions")
    leaked = len(s_kept & b_redundant) / len(b_redundant)
    assert leaked <= 1 - YIELD, f"{leaked:.3f} of redundant impressions leaked"


def test_flat_sessions_emitted(outputs):
    streaming, batch = outputs
    s_flat = streaming["flat_response_insertion"]
    b_flat = batch["flat_response_insertion"]
    s_keys = {
        (r.platform_id, r.log_user_id, r.insertion_id)
        for r in s_flat.select("platform_id", "log_user_id", "insertion_id").collect()
    }
    b_keys = {
        (r.platform_id, r.log_user_id, r.insertion_id)
        for r in b_flat.select("platform_id", "log_user_id", "insertion_id").collect()
    }
    assert b_keys
    overlap = len(s_keys & b_keys) / len(b_keys)
    assert overlap >= YIELD, f"flat session key yield {overlap:.3f} < {YIELD}"
    # sessions carry at least one impression or action
    row = s_flat.filter(
        (F.size("impressions") > 0) | (F.size("actions") > 0)
    ).count()
    assert row == s_flat.count()


def test_late_side_tables_exist(outputs):
    """The late side tables are present (may be empty on the ordered
    fixture replay, but the schema contract holds: late flag split
    out of every join stage)."""
    streaming, _ = outputs
    for name in ("side_late_insertion", "side_late_impression", "side_late_action"):
        df = streaming[name]
        assert "right_id" in df.columns and "late" in df.columns
        assert df.filter(~F.col("late")).count() == 0
