"""Invariants of the composed flat-output-join pipeline
(queries/bfj_pipeline_q.py) — the stage-boundary properties the
manifest's driver hash pins numerically, asserted here as relations so
a regression reads as a broken invariant, not just a changed hash.
Reference: the composed FlatOutputJob.java:394-1044 topology and the
~97% join-yield posture of its fake-data pipeline (pipeline/README.md:91).
"""

from __future__ import annotations

import pytest

from openmetrics_spark.queries import all_queries


@pytest.fixture(scope="module")
def manifest(spark, sf_dir):
    df = all_queries()["bfj_pipeline_manifest"].fn(spark, sf_dir)
    rows = {r["stage"]: r for r in df.collect()}
    return rows


def test_every_stage_present_and_nonempty(manifest):
    stages = {
        "raw_view",
        "raw_delivery_log",
        "raw_impression",
        "raw_action",
        "validate_errors",
        "dedup_dropped",
        "combined_delivery_logs",
        "tiny_insertions",
        "view_insertion_matched",
        "impression_matched",
        "redundant_remapped",
        "tiny_actions",
        "action_attributed",
        "merged_details",
        "merge_dropped",
        "flat_sessions",
        "yield_view_ins_bp",
        "yield_impression_bp",
        "yield_action_bp",
    }
    assert stages <= set(manifest)
    for name in stages - {"yield_view_ins_bp", "yield_impression_bp", "yield_action_bp"}:
        assert manifest[name]["n_rows"] > 0, name


def test_redundancy_epoch_walk_fires(manifest):
    # the id%9 triplets guarantee organic multi-epoch redundancy; a
    # zero here means the reduce stage silently fell out of the chain
    assert manifest["redundant_remapped"]["n_rows"] > 0


def test_combine_removes_sdk_twins(manifest):
    # every SDK twin with a client_request_id loses to its API row, so
    # the combined stream is strictly smaller than the valid DL stream
    # (raw minus the id%11 invalid children minus the SDK-cri losers)
    # but still dominated by the API rows
    raw_dl = manifest["raw_delivery_log"]["n_rows"]
    combined = manifest["combined_delivery_logs"]["n_rows"]
    assert combined < raw_dl
    assert combined > raw_dl // 2


def test_merge_details_conserves_attributed(manifest):
    assert (
        manifest["merged_details"]["n_rows"] + manifest["merge_dropped"]["n_rows"]
        == manifest["action_attributed"]["n_rows"]
    )


def test_join_yields_hold(manifest):
    # insertion->impression is exhaustive on this graph (every valid
    # impression carries a workable key within the 30m window)
    assert manifest["yield_impression_bp"]["n_rows"] == 10000
    # view matches: every non-id%4 insertion has an explicit FK, the
    # rest fall back to the 10m nearest window
    assert manifest["yield_view_ins_bp"]["n_rows"] >= 7000
    # actions: FK purchases attribute via the (re-pointed) impression;
    # content-scope purchases need a prior impression inside [-1d,+1s]
    assert manifest["yield_action_bp"]["n_rows"] >= 3000


def test_checksums_are_nontrivial(manifest):
    checked = [
        r["checksum"]
        for r in manifest.values()
        if not r["stage"].startswith("yield_") and r["n_rows"] > 0
    ]
    assert all(c != 0 for c in checked)
    # and they differ across stages (a constant checksum = broken hash)
    assert len(set(checked)) == len(checked)
