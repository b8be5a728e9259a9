"""Smoke tests for the `python -m openmetrics_spark` CLI surface."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args: str) -> subprocess.CompletedProcess:
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "openmetrics_spark", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=300,
    )


def test_list_inventory():
    r = _run("list")
    assert r.returncode == 0, r.stderr
    lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
    assert len(lines) >= 80
    assert any("ngram_jaccard_neardup" in ln for ln in lines)
    # headline markers and oracle kinds render
    assert any(ln.startswith("*") for ln in lines)
    assert all("[sql]" in ln or "[rows]" in ln for ln in lines)


def test_list_tag_filter():
    r = _run("list", "--tag", "streaming")
    assert r.returncode == 0, r.stderr
    assert "streaming_cumulate_hourly" in r.stdout
    assert "q1_pricing_summary" not in r.stdout


def test_run_unknown_query_fails_cleanly():
    r = _run("run", "no_such_query")
    assert r.returncode == 2
    assert "unknown query" in r.stderr


def test_run_csv_output():
    r = _run(
        "run", "value_histogram",
        "--sf-dir", "/root/testdata/sf0.001",
        "--format", "csv",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    header = r.stdout.splitlines()[0]
    assert header.strip() == "bucket,bucket_lo,n"


def test_sql_adhoc_statement():
    r = _run(
        "sql",
        "select event_type, count(*) n from events group by 1 order by 1",
        "--sf-dir", "/root/testdata/sf0.001",
        "--format", "csv",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = r.stdout.strip().splitlines()
    assert lines[0] == "event_type,n"
    assert len(lines) == 6  # 5 event types
