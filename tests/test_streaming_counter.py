"""End-to-end streaming counter job: temporal enrichment + family
fan-out + sliding aggregation over file sources, compared against the
batch ``full_counter_commands`` on the same inputs — the counter-side
analog of the streaming flat-output assembly test.

Exactness: the sliding aggregation and command encoding are
deterministic, and the ordered replay + sentinel flush decide every
real row, so the streaming command set must EQUAL the batch one (no
yield tolerance needed here — the only stateful ops are the as-of
enrichment and windowed aggs, which have exact batch semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openmetrics_spark.functions.feature_ids import CountWindow
from openmetrics_spark.jobs.counter import full_counter_commands
from openmetrics_spark.jobs.streaming_counter import run_streaming_counter
from openmetrics_spark.queries.counter_q import _flat_and_luu

HOUR_MS = 3_600_000
WINDOWS = ((HOUR_MS, HOUR_MS // 4, CountWindow.HOUR, 4 * 3600),)


@pytest.fixture(scope="module")
def commands(spark, sf_dir, tmp_path_factory):
    flat, luu = _flat_and_luu(spark, sf_dir)
    base = tmp_path_factory.mktemp("sc_raw")
    flat_dir, luu_dir = str(base / "flat"), str(base / "luu")
    flat.write.mode("overwrite").parquet(flat_dir)
    luu.write.mode("overwrite").parquet(luu_dir)
    work = str(tmp_path_factory.mktemp("sc_work"))
    streaming = run_streaming_counter(
        spark, flat_dir, luu_dir, work, window_configs=WINDOWS
    )
    batch = full_counter_commands(
        flat,
        log_user_user=luu,
        window_configs=WINDOWS,
        last_families=(),
        with_metadata=False,
    )
    return streaming, batch


def _rows(df):
    return {
        (r.command, r.key, r.field, r.value, r.ttl_s, r.emit_ms)
        for r in df.collect()
    }


def test_streaming_counter_matches_batch(commands):
    streaming, batch = commands
    s, b = _rows(streaming), _rows(batch)
    assert b, "batch produced no commands"
    missing = b - s
    extra = s - b
    assert not missing and not extra, (
        f"missing={len(missing)} extra={len(extra)}; "
        f"sample missing={list(missing)[:3]} extra={list(extra)[:3]}"
    )


def test_streaming_counter_covers_all_families(commands):
    streaming, _ = commands
    # every sliding family contributes commands: plain platform keys,
    # \x1du user keys, \x1dq query keys
    keys = {r.key for r in streaming.select("key").distinct().collect()}
    assert any("\x1du" in k for k in keys)
    assert any("\x1dq" in k for k in keys)
    assert any("\x1f" not in k for k in keys)  # platform-device family
