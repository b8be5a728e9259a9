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
    # ROUND 11 WINDOW (r10 verdict #1/#2/#4/#6/#7). Composition:
    # (a) corpus_quality_drift — the one query without a driver row
    # (landed after the r10 freeze), leading exactly as promised;
    # (b) the three r9-green anchors that ceded r10 slots
    # (multimodal_av_features, keep_first_dedup, gated_query_counts);
    # (c) the r11 additions — the planted-hot-key skew pair over both
    # 22-stage BFJ manifests (verdict #1), the heavy-hitter counter
    # fan-out (#6), the foreachBatch streaming admission (#4), the
    # windowed streaming drift monitor (#7) — plus every query whose
    # code changed this round: both uniform BFJ manifests (skew knob
    # threaded through _events/_tail_stages), the production-TTL pair
    # (stream_inferred_join gained the indexed candidate lookup and the
    # shared _decide_ready core);
    # R12 QUEUE HEAD: streaming_admission_restart,
    # streaming_ttl_inferred_join_skewed, events_hot_key_report and
    # streaming_hot_key_report (all landed after this window froze and
    # its 50/50 rehearsal; green in the local driver-strict checks at
    # both SFs) lead the r12 rotation, followed by the 15 deferred r7
    # rows below.
    # (d) 34 of the 49 r7-stale rows (every one the rotation machinery
    # owes a refresh). The 15 r7 rows left for the R12 QUEUE each keep
    # an in-window family sibling watching their operator:
    # user_scd2_intervals (ceded its slot to the late-landing
    # streaming_corpus_admission_n4; events_scd2_enrich + the r10-green
    # cohort_membership_intervals watch the SCD2 family),
    # corpus_vocab_topk + upsert_time_travel (ceded to the two
    # TWS-core-extraction re-gates; corpus_upsample_balanced and the
    # r10-green upsert rows watch those families) plus:
    # approx_distinct_buyers_hll (customers twin in), ann_filtered_topk
    # (brute/PQ in), corpus_prep_manifest_v2 (v3 in), events_profile +
    # events_zorder_layout + props_json_metrics (events family in),
    # top_event_types (streaming twin r10-green), topk_parts_per_brand
    # (TPC-H shapes in), bloom_customer_prefilter (streaming_bloom_
    # ingest in), decayed_user_counts (streaming twin in),
    # doc_bigram_logprob (doc text family in), hll_merge_monthly_
    # sketches (HLL family in). After this window the stale tail is
    # those 12 rows — r12 clears them.
    # =====================================================================
    # --- (a) never driver-gated, promised the queue head
    "corpus_quality_drift",
    # --- (b) the three anchors that ceded r10 slots
    "multimodal_av_features",
    "keep_first_dedup",
    "gated_query_counts",
    # --- (c) r11 additions + r11-modified code
    "bfj_pipeline_manifest_skewed",
    "streaming_bfj_pipeline_skewed",
    "counter_commands_skewed",
    "streaming_corpus_admission",
    "streaming_corpus_admission_n4",
    "streaming_quality_drift",
    "bfj_pipeline_manifest",
    "streaming_bfj_pipeline",
    "streaming_ttl_inferred_join",
    "streaming_ttl_late_channel",
    # (the TWS-core extraction touched the cumulate/combine/redundant/
    # ALI GroupState paths; their two consumers not already in-window
    # re-enter here, displacing corpus_vocab_topk + upsert_time_travel
    # to the r12 queue — corpus_upsample_balanced and the r10-green
    # upsert_mor_snapshot / upsert_incremental_pull watch those
    # families meanwhile)
    "streaming_cumulate_hourly",
    "cumulated_metrics_envelope",
    # --- (d) 37 of the 49 r7-stale rows (r12 queue documented above)
    "counter_commands_full",
    "counter_commands_weekly",
    "inferred_view_attribution",
    "streaming_counter_commands",
    "streaming_latest_impressions",
    "sliding_hourly_counter",
    "counter_backfill_gate",
    "ann_brute_topk",
    "ann_pq_adc_topk",
    "approx_distinct_customers_hll",
    "approx_heavy_hitters_cms",
    "approx_value_percentiles",
    "bfj_combined_delivery_logs",
    "bfj_joined_actions",
    "content_lookup_enrich",
    "corpus_leakage_safe_split",
    "corpus_prep_manifest_v3",
    "corpus_upsample_balanced",
    "doc_dedup_spans_rewrite",
    "doc_quality_train",
    "embedding_pq_codes",
    "events_scd2_enrich",
    "latest_impressions_negatives",
    "purchase_attribution_ushape",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "streaming_approx_distinct",
    "streaming_bloom_ingest",
    "streaming_decayed_counts",
    "streaming_heavy_hitters",
    "streaming_minhash_ingest",
    "streaming_value_percentiles",
    "supplier_pagerank",
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
        scale_q,
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
