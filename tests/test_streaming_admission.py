"""streaming_corpus_admission must equal corpus_two_batch_ledger
row-for-row: the foreachBatch loop with persisted standing state is the
OPERATIONAL spelling of the same two-step replay, so any divergence is
a state-plumbing bug (a batch seeing stale/fresh state it shouldn't).
Both are driver-gated against the same DuckDB full-replay oracle; this
pins the equivalence locally without DuckDB in the loop."""

from __future__ import annotations


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_admission_equals_batch_replay(spark, sf_dir):
    from openmetrics_spark.queries.docs_q import (
        corpus_two_batch_ledger,
        streaming_corpus_admission,
    )

    got = _rows(streaming_corpus_admission(spark, sf_dir))
    want = _rows(corpus_two_batch_ledger(spark, sf_dir))
    assert got == want
    # non-vacuous: both admission steps admitted something, and the
    # planted-copy gate fired in both directions
    d = {r[0]: (r[1], r[2]) for r in got}
    assert d["b1_admitted"][0] > 0
    assert d["b2_admitted"][0] > 0
    assert 0 < d["plant_exact_rejected"][0] < d["plant_in"][0]


def test_streaming_admission_restart_equals_one_shot(spark, sf_dir):
    """Restarting the stream between arrivals (fresh query lifetime per
    batch, same checkpoint + standing state) must change nothing: the
    checkpoint resumes the file-source offsets and the persisted state
    carries the evolution across the process boundary."""
    from openmetrics_spark.queries.docs_q import (
        corpus_two_batch_ledger,
        streaming_admission_restart,
    )

    got = _rows(streaming_admission_restart(spark, sf_dir))
    want = _rows(corpus_two_batch_ledger(spark, sf_dir))
    assert got == want


def test_streaming_admission_replayed_batches_idempotent(spark, sf_dir):
    """Every micro-batch re-executed with the SAME checkpointed batch_id
    (the at-least-once shape a mid-batch failure produces) must leave
    the manifest and all standing state bit-identical: the step derives
    from batch_id and every state surface is a per-batch versioned
    overwrite, so the replay reads the same as-of-k-1 state and
    rewrites the same deltas."""
    from openmetrics_spark.queries.docs_q import (
        _run_streaming_admission,
        corpus_two_batch_ledger,
    )

    got = _rows(
        _run_streaming_admission(spark, sf_dir, n_batches=2, replay_batches=True)
    )
    want = _rows(corpus_two_batch_ledger(spark, sf_dir))
    assert got == want


def test_streaming_admission_survives_empty_batch(spark, sf_dir):
    """An EMPTY micro-batch consumes a batch_id but evolves no state
    and writes no ledger version — the next batch must walk past the
    gap (ledger_as_of) instead of crashing on a hard-coded
    ledger_v{k-1} read. Content must equal the gapless two-batch
    replay; only the step numbering shifts (the second real arrival
    runs as batch id 2, so its manifest rows are b3_*)."""
    from openmetrics_spark.queries.docs_q import (
        _run_streaming_admission,
        corpus_two_batch_ledger,
    )

    got = _rows(
        _run_streaming_admission(
            spark, sf_dir, n_batches=2, insert_empty_batch=True
        )
    )
    got = [(s.replace("b3_", "b2_"), n, t) for s, n, t in got]
    want = _rows(corpus_two_batch_ledger(spark, sf_dir))
    assert sorted(got) == sorted(want)
