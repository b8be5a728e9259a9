from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# ---------------------------------------------------------------------------
# Suite tiering (r12 verdict #1). The driver's verify runs the default
# `pytest tests/ -x -q` under a wall-clock budget the full 473-test
# suite exceeds (1.4 h measured r13); pytest.ini deselects `slow` so
# the default tier finishes. Assignment below is from a full-suite
# `--durations=0` run (r13, per-test call times): whole files whose
# every test is a heavyweight replay/sweep, the streaming-replay rows
# of the oracle gate (each stages + drains a real stream), and an
# explicit list of >15 s individual tests. Nothing is deleted — the
# closing certification runs `-m "slow or not slow"`.
# ---------------------------------------------------------------------------

_SLOW_FILES = {
    # 300-case property sweeps vs python models (the r11 verdict names
    # these as the certification tier)
    "test_properties.py",
    # streaming admission/restart replay chains (multi-minute drains)
    "test_streaming_admission.py",
    "test_streaming_recovery.py",
    "test_streaming_skew.py",
    # the 22-stage BFJ manifest pipeline tests (84-388 s each)
    "test_flat_output.py",
}

# individual tests measured >15 s (full-suite r13 durations run);
# every file keeps faster siblings in the default tier, and
# test_unified_builders_match_per_family_spec is deliberately KEPT
# default (18 s) — it is the spec gate for the fused counter fan-out
# this round touched.
_SLOW_TESTS = {
    "test_similarity.py::test_pq_adc_recall_vs_exact",
    "test_similarity.py::test_pq_codes_compress_and_cover",
    "test_similarity.py::test_incremental_assign_freezes_standing_cells",
    "test_plans.py::test_bfj_pipeline_has_no_cartesian",
    "test_corpus_mix.py::test_nb_trainer_separates_its_label",
    "test_corpus_mix.py::test_connected_components_driver_and_distributed_parity",
    "test_corpus_mix.py::test_leakage_safe_split_no_cross_split_pairs",
    "test_corpus_mix.py::test_two_batch_ledger_evolution",
    "test_corpus_mix.py::test_capped_logprob_equals_full_when_cap_exceeds_vocab",
    "test_corpus_mix.py::test_incremental_admit_invariants",
    "test_streaming.py::test_streaming_ttl_late_channel_semantics",
    "test_cli.py::test_sql_adhoc_statement",
    "test_cli.py::test_run_csv_output",
    "test_raw_output.py::test_envelope_split_roundtrip",
    "test_raw_output.py::test_kafka_envelope_codec_roundtrip",
    "test_fake_topic.py::test_streaming_ingest_roundtrip_with_log_timestamp",
}

# composed-pipeline / sweep-style oracle rows >15 s at sf0.001; the
# driver's own sf0.01 oracle gate still covers every one of these
# through the rotation window, and each keeps cheaper family siblings
# in the default tier
_SLOW_ORACLE_QUERIES = {
    "ann_pq_adc_topk",
    "ann_ivf_kmeans_topk",
    "approx_distinct_buyers_hll",
    "bfj_pipeline_manifest",
    "bfj_pipeline_manifest_skewed",
    "corpus_curation_pipeline",
    "corpus_prep_manifest_v2",
    "corpus_prep_manifest_v3",
    "corpus_two_batch_ledger",
    "doc_quality_train_eval",
    "doc_repetition_stats",
    "embedding_cell_purity",
    "embedding_incremental_assign",
    "embedding_pq_codes",
    "supplier_pagerank",
    "upsert_incremental_pull",
}


def pytest_collection_modifyitems(config, items):
    slow = pytest.mark.slow
    for item in items:
        fname = os.path.basename(item.fspath)
        short = f"{fname}::{item.name.split('[')[0]}"
        if fname in _SLOW_FILES:
            item.add_marker(slow)
            continue
        if short in _SLOW_TESTS or f"{fname}::{item.name}" in _SLOW_TESTS:
            item.add_marker(slow)
            continue
        if fname == "test_queries_oracle.py" and "[" in item.name:
            q = item.name.split("[", 1)[1].rstrip("]")
            # every streaming replay row stages + drains a real stream
            # (20-141 s each); batch twins stay in the default tier
            if q.startswith("streaming_") or q in _SLOW_ORACLE_QUERIES:
                item.add_marker(slow)


@pytest.fixture(scope="session")
def spark():
    from openmetrics_spark.session import get_spark

    # fewer threads than CI default: tiny data, JVM startup dominates
    s = get_spark("tests", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(autouse=True)
def _release_pinned_caches():
    """Queries pin() persisted intermediates they cannot unpersist
    before their lazy result is consumed; drop them after each test so
    cached partitions don't pile up across the session-scoped Spark."""
    yield
    from openmetrics_spark.tables import release_caches

    release_caches()
