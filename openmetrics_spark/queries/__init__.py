"""Query registry — the correctness + bench surface of the engine.

Every operator from SURVEY.md §2 that is implemented gets a named
query here: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus
(wherever SQL can express it) an equivalent ANSI-SQL oracle that
DuckDB runs on the same parquet tables. The driver executes both and
hash-compares values; tests/test_queries_oracle.py does the same
locally at sf0.001.

Conventions:
- every computed column is aliased identically in Spark and SQL;
- timestamps leave queries as epoch-millis longs (``unix_millis`` /
  ``epoch_ms``) or DATEs — never raw timestamps — so the two engines
  hash identical values;
- double aggregates are ``round(x, 2..6)`` in BOTH engines;
- counts that pass through a second SUM are cast back to BIGINT in
  SQL (DuckDB widens SUM(BIGINT) to HUGEINT);
- money/rate SUMS (and any ranking or gate built on one) go through
  exact scaled-integer summation in BOTH engines (``_exact_sum`` /
  ``_sum_cents``: floor(x*scale+0.5) per row, BIGINT sum, one
  division) — ``round(sum(double), k)`` depends on partial-agg order
  at the last ulp and has flipped driver hashes twice (q9/q10 r4).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    headline: bool = False  # included in bench.py
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
):
    def deco(fn):
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            headline=headline,
            tags=tags,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


# ---------------------------------------------------------------------------
# Driver-window curation.
#
# The round driver verifies only the FIRST 50 entries of this registry
# against the DuckDB oracle (exact value hash at sf0.01); everything
# past the window ships with only the local comparator.  Registration
# order is therefore part of the correctness contract: each round the
# window is re-curated so that queries that have never held a driver
# row — plus anything modified this round — come first, padded with one
# already-green anchor per SURVEY §2 operator family so no family goes
# unwatched.  ``scripts/gen_query_catalog.py`` renders the per-round
# driver history (from CORRECTNESS_r*.json) that drives the rotation.
# ---------------------------------------------------------------------------
DRIVER_WINDOW = 50

_WINDOW_PRIORITY: tuple[str, ...] = (
    # =====================================================================
    # ROUND 8 WINDOW (r7 verdict #1/#7). Composition, per the rotation
    # policy: (a) the 14 queries with NO driver row yet — the 5 late-r7
    # additions, then every r8 addition/rewrite in landing order (the
    # scale-safe RFM pair, the composed BFJ pipeline manifest, the raw
    # 8-way-split archive, the stateless flat-op gates, the CSV sink
    # round-trip, the Kafka wire-codec round-trip, the cohort
    # experiment readout, the Kafka-contract streaming ingest);
    # (b) the r3 rows, now the longest-unwatched greens; (c) 30 of the
    # 33 r4 rows; (d) 4 r5 family-coverage picks. Displaced to lead
    # the r9 rotation queue: ann_lsh_recall, ann_lsh_multiprobe_topk
    # (family keeps 2 in-window + 3 r7 rows), daily_rollup_metrics,
    # q2_min_cost_supplier, corpus_pack_chunks, doc_pii_scrub (their
    # families stay watched — see the inline notes below).
    # =====================================================================
    # --- (a) never driver-verified
    "corpus_distinct_ngrams",
    "doc_quality_train_eval",
    "dedup_cluster_size_histogram",
    "value_stats_winsorized",
    # --- (b) r8-modified: RFM rewritten scale-safe + its NTILE spec
    # twin; the composed BFJ pipeline manifest is NEW in r8
    "orders_rfm_segments",
    "orders_rfm_ntile_spec",
    "bfj_pipeline_manifest",
    "raw_split_archive",
    "flat_ops_gates",
    "csv_sink_roundtrip",
    "raw_wire_roundtrip",
    "cohort_experiment_report",
    "streaming_raw_ingest",
    # --- (c) r3 greens (oldest rows on record)
    "q12_priority_lines",
    "q14_promo_effect",
    "q5_local_supplier_volume",
    # --- (d) all r4 greens
    "ann_ivf_topk",
    # (ann_lsh_recall and ann_lsh_multiprobe_topk ceded their slots to
    # raw_wire_roundtrip and cohort_experiment_report — the ANN family
    # keeps TWO r4 rows in-window plus the r7-green brute/filtered/PQ
    # rows; the two displaced rows rejoin the r9 rotation)
    "ann_lsh_topk",
    "bfj_flat_sessions",
    "bfj_joined_impressions",
    "bfj_redundant_remap",
    "bfj_tiny_actions",
    "corpus_prep_manifest",
    "cumulate_hourly",
    "daily_event_metrics",
    # (daily_rollup_metrics ceded its slot to streaming_raw_ingest —
    # the SQL-surface metrics family keeps pivot/histogram/percentiles
    # in-window; rollup rejoins the r9 rotation)
    "daily_type_pivot",
    "doc_fingerprint",
    "doc_lang_guess",
    "doc_token_stats",
    "embedding_dedup_clusters",
    "embedding_neardup",
    "embedding_quantize",
    "funnel_conversion",
    "hourly_anomaly_zscore",
    "interval_click_counts",
    "pick_best_15m",
    "session_rollup_30m",
    "simhash_neardup",
    "sliding_daily_counter",
    "streaming_hourly_content_metrics",
    "streaming_keep_first",
    "streaming_last_time_and_count",
    "streaming_sliding_counter",
    "user_retention_cohorts",
    "value_histogram",
    "value_percentiles_by_type",
    # --- (e) r5 family-coverage picks
    "bfj_join_side_outputs",
    "multimodal_resize_stats",
    "upsert_two_batches",
    "streaming_interval_join",
    # (q2_min_cost_supplier, corpus_pack_chunks and doc_pii_scrub ceded
    # their slots to the r8 additions raw_split_archive, flat_ops_gates
    # and csv_sink_roundtrip — gating the split's non-join half +
    # SetLogTimestamp, the stateless flat-output operators, and the CSV
    # header sink. TPC-H stays watched via q12/q14/q5, corpus via
    # corpus_prep_manifest, PII via flat_ops_gates' pii stages; the
    # three displaced r5 rows lead the r9 rotation queue)
)


def all_queries() -> dict[str, QuerySpec]:
    # import side-effect registration
    from openmetrics_spark.queries import (  # noqa: F401
        bfj_pipeline_q,
        bfj_q,
        corpus_q,
        counter_q,
        docs_q,
        sql_surface_q,
        streaming_q,
        events_q,
        experiment_q,
        flat_ops_q,
        graph_q,
        media_q,
        raw_archive_q,
        sinks_q,
        sketch_q,
        streaming_bfj_q,
        tpch,
        tpch_ext,
        corpus_mix_q,
        upsert_q,
        users_q,
        validate_q,
    )

    ordered: dict[str, QuerySpec] = {}
    for name in _WINDOW_PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
