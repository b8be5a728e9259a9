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
    # ROUND 9 WINDOW (r8 verdict #1/#2). Composition: (a) the r9
    # additions/rewrites — the streaming BFJ pipeline (verdict #1), the
    # SCD2 membership intervals (verdict #7), the planted-neighbor
    # recall rewrite (verdict #4) — plus the two r8 rows whose
    # fixture/oracle changed this round (the redundant-FK fixture
    # pattern feeds bfj_pipeline_manifest; the wire-key oracle
    # NULL-semantics fix feeds raw_wire_roundtrip); (b) the six rows
    # displaced in r8 and promised the head of this queue; (c) ALL 15
    # remaining r5-stale rows — after this window no query's newest
    # driver row is older than r6; (d) 25 of the 42 r6 rows, oldest
    # families first (streaming twins, upsert, bfj instances, the
    # dedup tier, TPC-H). embedding_cell_purity and
    # corpus_chunk_overlap (landed after the r9 window froze, never
    # driver-gated) lead the r10 queue, then the 24 r6 rows left for
    # it:
    # ann_ivf_kmeans_topk, bfj_merge_details_drops, corpus_bpe_encode,
    # ngram_jaccard_neardup, streaming_top_event_types,
    # upsert_mor_snapshot,
    # cumulated_metrics_envelope, doc_bm25_topk, doc_decontaminate,
    # doc_repetition_stats, embedding_kmeans_cells, embedding_outliers,
    # hourly_dense_series, hourly_event_metrics, multimodal_image_stats,
    # q10_returned_items, q15_top_supplier, q16_supplier_part_counts,
    # q17_small_qty_revenue, q19_disjunctive_revenue,
    # q20_excess_suppliers, q22_dormant_customers, user_set_ops,
    # user_versioned_join.
    # =====================================================================
    # --- (a) r9 additions + r9-modified fixtures/oracles
    "streaming_bfj_pipeline",
    "cohort_membership_intervals",
    "ann_lsh_recall",
    "corpus_shuffle_shards",
    "scale_join_strategies",
    "corpus_token_budget_select",
    "neardup_keep_best_quality",
    "compaction_roundtrip",
    "schema_drift_union_read",
    "corpus_curation_pipeline",
    "bfj_pipeline_manifest",
    "raw_wire_roundtrip",
    # --- (b) the six rows displaced in r8 (promised queue head;
    # ann_lsh_recall is already above as an r9 rewrite)
    "ann_lsh_multiprobe_topk",
    "daily_rollup_metrics",
    "q2_min_cost_supplier",
    "corpus_pack_chunks",
    "doc_pii_scrub",
    # --- (c) all 15 remaining r5-stale rows
    "corpus_bpe_first_merges",
    "corpus_sample_stratified",
    "doc_dup_span_coverage",
    "doc_quality_classifier",
    "doc_unigram_logprob",
    "doc_unigram_logprob_capped",
    "domain_mix_weights",
    "multimodal_av_features",
    "q11_important_parts",
    "q13_customer_distribution",
    "q18_large_volume_customer",
    "q21_waiting_supplier",
    "q4_order_priority",
    "q8_market_share",
    "quality_filter_funnel",
    # --- (d) 25 r6 rows, family-balanced
    "streaming_content_lookup",
    "streaming_cumulate_hourly",
    "streaming_inferred_attribution",
    "streaming_session_rollup",
    # (streaming_top_event_types and upsert_mor_snapshot ceded their
    # slots to the late-r9 compaction_roundtrip and
    # schema_drift_union_read; the streaming family keeps 5 rows
    # in-window incl. the composed streaming BFJ chain, the upsert
    # family keeps upsert_incremental_pull — the ceded pair joins the
    # r10 queue listed above)
    "streaming_user_asof_join",
    "upsert_incremental_pull",
    "bfj_view_insertions",
    # (bfj_merge_details_drops ceded its slot to the late-r9
    # corpus_curation_pipeline — MergeDetails + its dropped channel
    # stay in-window as composed stages of bfj_pipeline_manifest;
    # the standalone row joins the r10 queue listed above)
    "doc_exact_dedup",
    "doc_dedup_clusters",
    "minhash_lsh_neardup",
    "minhash_incremental_neardup",
    # (ngram_jaccard_neardup ceded its slot to the late-r9
    # neardup_keep_best_quality, whose oracle replays the SAME
    # 3-gram pair generator + CC end-to-end — the machinery stays
    # cross-engine-watched in-window; the plain pair query joins
    # the r10 queue)
    "asof_attribution",
    "gated_query_counts",
    "validation_error_split",
    "keep_first_dedup",
    "last_time_and_count",
    "q7_volume_shipping",
    "q9_product_profit",
    # (q16_supplier_part_counts ceded its slot to the late-r9
    # corpus_shuffle_shards addition, then q10_returned_items and
    # q15_top_supplier ceded theirs to the two late-r9 additions
    # scale_join_strategies and corpus_token_budget_select — new
    # capability driver-green in its landing round beats refreshing
    # an already-r6-green anchor. TPC-H keeps q7/q9 in-window;
    # q10/q15/q16 join the r10 queue listed above)
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
