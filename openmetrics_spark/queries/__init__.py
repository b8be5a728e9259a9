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
    # ROUND 7 WINDOW (r6 verdict #1): the 18 round-6 queries that have
    # never held a driver row — a green row on each makes every
    # registered query driver-verified at least once (139/139).
    # =====================================================================
    "counter_backfill_gate",        # backfill start/stop + buffer collapse
    "doc_bigram_logprob",           # bigram-LM scoring
    "streaming_approx_distinct",    # HLL streaming twin
    "approx_distinct_buyers_hll",   # HLL over string keys + join
    "hll_segment_overlap",          # register algebra (union/intersect)
    "streaming_value_percentiles",  # histogram-percentile streaming twin
    "streaming_counter_commands",   # fused counter stream
    "doc_dedup_spans_rewrite",      # Lee et al. span REWRITE
    "user_scd2_intervals",          # SCD2 validity intervals
    "ann_filtered_topk",            # predicate-pushdown ANN
    "events_profile",               # one-scan table profiler
    "doc_quality_train",            # Bernoulli-NB trainer
    "streaming_minhash_ingest",     # stream-static LSH ingest
    "embedding_pq_codes",           # product-quantization codebooks
    "ann_pq_adc_topk",              # ADC search over PQ codes
    "events_zorder_layout",         # Z-order/Morton layout
    "decayed_user_counts",          # time-decayed counts (batch)
    "streaming_decayed_counts",     # time-decayed counts (streaming)
    # --- modified in r7 — must re-verify at the driver:
    # TTL fidelity fix (redis EXPIRE is key-level; only DAY_30 sets one)
    "counter_commands_full",
    "counter_commands_weekly",
    "sliding_hourly_counter",
    # pair-free AddLatestImpressions rewrite (seq equi-join)
    "latest_impressions_negatives",
    "streaming_latest_impressions",
    # forced corpus-proportional broadcasts dropped (plan-only, values
    # unchanged — still re-gated on principle)
    "corpus_prep_manifest_v2",
    # hll_registers now null-gates inside the operator (both engines)
    "approx_distinct_customers_hll",
    "hll_merge_monthly_sketches",
    "approx_value_percentiles",
    # --- NEW in r7 (registered as they land; names listed here so the
    # window picks them up the moment they exist)
    "corpus_prep_manifest_v3",      # + span rewrite + NB quality score
    "approx_heavy_hitters_cms",     # count-min / heavy hitters sketch
    "corpus_leakage_safe_split",    # cluster-aware train/val/test split
    "streaming_heavy_hitters",      # CMS streaming twin
    "upsert_time_travel",           # MOR point-in-time read
    "supplier_pagerank",            # integer-exact iterative PageRank
    "bloom_customer_prefilter",     # Bloom membership / semi-join gate
    "streaming_bloom_ingest",       # bit_or bitmap as a streaming agg
    "purchase_attribution_ushape",  # multi-touch attribution model
    "corpus_upsample_balanced",     # deterministic balanced resampling
    "events_scd2_enrich",           # SCD2 point-in-time probe (as-of)
    # --- green anchors: longest-unwatched families per docs/QUERIES.md
    # (inferred_view_attribution last green r2; the q*/top_event rows
    # r3; bfj/ann/text/metrics anchors r4) — one per family so nothing
    # drifts unwatched while the rotation lands
    "inferred_view_attribution",    # inferred-reference join (r2!)
    "content_lookup_enrich",        # content lookup batch (r3)
    "props_json_metrics",           # JSON props extraction (r3)
    "q1_pricing_summary",           # TPC-H agg (r3)
    "q3_shipping_priority",         # TPC-H join (r3, headliner)
    "q6_forecast_revenue",          # TPC-H scan/pushdown (r3)
    # (q12/q14 ceded their slots to the two BFJ anchors below once the
    # r7 additions filled the window: TPC-H stays watched via q1/q3/q6,
    # and the reference's core flat-output-join family must keep a row)
    "top_event_types",              # TopN batch (r3)
    "topk_parts_per_brand",         # window functions (r3)
    "ann_brute_topk",               # exact ANN baseline (r4)
    "bfj_combined_delivery_logs",   # CombineDeliveryLog (r4)
    "bfj_joined_actions",           # impression→action instance (r4)
    "corpus_vocab_topk",            # vocab counting (r4)
    "cumulate_hourly",              # CUMULATE batch (r4)
    "daily_event_metrics",          # daily metrics + CSV (r4)
    "doc_lang_guess",               # language ID (r4)
    "streaming_keep_first",         # streaming dedup (r4)
    "pick_best_15m",                # pick-best dedup (r4)
    "q5_local_supplier_volume",     # TPC-H 6-way join (r3, headliner)
    "bfj_tiny_actions",             # ToTiny + cart fan-out (r4)
    "streaming_sliding_counter",    # sliding counter streaming twin (r4)
    # =====================================================================
    # r6 window below (kept for history; names already listed above win,
    # duplicates are ignored by the ordered-dict build)
    # =====================================================================
    "bfj_merge_details_drops",
    "ann_ivf_kmeans_topk",
    "embedding_outliers",
    "user_set_ops",
    "q16_supplier_part_counts",
    "q17_small_qty_revenue",
    "q20_excess_suppliers",
    "q22_dormant_customers",
    "upsert_incremental_pull",
    # --- new this round
    "counter_commands_weekly",       # DAY_7/DAY_30 packing + TTLs (verdict #3)
    "streaming_latest_impressions",  # AddLatestImpressions stream (verdict #4)
    # --- code changed this round — must re-verify at the driver
    "counter_commands_full",   # fan-out fused: 1 shuffle/slide + 1 Last* pass
    "q7_volume_shipping",      # sum_money4: exact 1e-4 units, cents once
    "q9_product_profit",       # (ADVICE r5: cent-quantized rows drifted
    "q10_returned_items",      #  from round(sum,2); both engines moved
    "q15_top_supplier",        #  to the shared integer-space round)
    "q19_disjunctive_revenue",
    "minhash_lsh_neardup",         # short-doc sentinel-band gate added
    "minhash_incremental_neardup", # (ADVICE r5 quadratic-candidate fix)
    "user_versioned_join",         # user_join fallback tiebreak totalized
    "streaming_user_asof_join",    # rides the same user_join path
    "latest_impressions_negatives",  # oracle refactored into _latest_imp_oracle()
    # --- green anchors: one per SURVEY §2 / LLM-pipeline family so no
    # family goes unwatched while the rotation lands (r4/r5 green
    # history per docs/QUERIES.md)
    "bfj_view_insertions",           # inferred join, view→insertion
    "streaming_inferred_attribution",  # inferred join streaming twin
    "hourly_event_metrics",          # unified event stream + metrics
    "streaming_cumulate_hourly",     # custom CUMULATE state machine
    "cumulated_metrics_envelope",    # Kinesis envelope
    "upsert_mor_snapshot",           # Hudi-style MOR sink
    "validation_error_split",        # Validate* error side output
    "last_time_and_count",           # LastTimeAndCount batch
    "keep_first_dedup",              # KeepFirstRow
    "gated_query_counts",            # top-query gating + xxhash64
    "hourly_dense_series",           # gap-fill + forward-fill
    "streaming_top_event_types",     # TopNEmitter delta stream
    "streaming_session_rollup",      # session windows
    "streaming_content_lookup",      # cached-client lookup
    "ngram_jaccard_neardup",         # inverted-index near-dup
    "doc_exact_dedup",               # exact dedup
    "doc_dedup_clusters",            # connected components
    "doc_decontaminate",             # benchmark decontamination
    "embedding_kmeans_cells",        # distributed Lloyd k-means
    "doc_repetition_stats",          # text analysis
    "doc_bm25_topk",                 # keyword retrieval
    "corpus_prep_manifest_v2",       # full corpus chain, one query
    "corpus_bpe_encode",             # NEW r6: BPE merge application
    # (doc_dup_span_coverage ceded its anchor slot to the new BPE
    # encoder: it stays a bench headliner with an r5 green row, and
    # the dup-span family is adjacent to the in-window manifest)
    # --- NEW r6: engine-exact sketches (operators/sketches.py) —
    # they take the slots of doc_pii_scrub and the resize/av
    # multimodal rows (all r5-green; text keeps repetition+bm25 and
    # multimodal keeps image_stats as family anchors)
    "approx_distinct_customers_hll",
    "hll_merge_monthly_sketches",
    "approx_value_percentiles",
    "multimodal_image_stats",        # multimodal: image decode
    "asof_attribution",              # TemporalJoin core (bench headliner)
    # (rotated out this round, all with green rows on record:
    # doc_unigram_logprob/_capped, doc_quality_classifier,
    # corpus_pack_chunks/domain_mix_weights/corpus_sample_stratified/
    # quality_filter_funnel/corpus_bpe_first_merges — the corpus
    # family rides corpus_prep_manifest_v2, which composes the whole
    # chain; streaming_interval_join, upsert_two_batches,
    # bfj_join_side_outputs and the green TPC-H rows q1-q21 — their
    # families stay covered by the in-window anchors and the 9 TPC-H
    # priority/modified rows.)
    # NB the late-r6 trunc->floor bucket fix touches many OUT-of-window
    # queries (sliding_*, pick_best_15m, the sql_surface metrics set,
    # cumulate/daily metrics). They deliberately do NOT jump the window:
    # the change is provably inert on non-negative epoch millis (all
    # driver data; pinned by test_bucket_floor_semantics_on_negative_
    # millis), and every affected query was locally re-verified at
    # sf0.01 under the driver-strict comparator on the day of the
    # change — evicting the nine never-verified rows for a no-op would
    # invert the rotation's priority.
    # --- r8 rotation plan: the window below holds the 18 r6
    # stragglers + 9 r7-modified rows + the first 12 r7 additions +
    # 11 family anchors. THREE late-r7 additions did NOT fit and are
    # r8's first priorities: corpus_distinct_ngrams,
    # doc_quality_train_eval, dedup_cluster_size_histogram,
    # value_stats_winsorized, orders_rfm_segments (all green
    # in the builder's sf0.001+sf0.01 oracle runs, see
    # docs/VERIFICATION.md). After those: anything new or modified in
    # r8, then rotate anchors toward the longest-unwatched rows in
    # docs/QUERIES.md — the r3/r4 green rows displaced this round
    # (q5_local_supplier_volume, bfj_tiny_actions, corpus_vocab_topk,
    # cumulate_hourly, daily_event_metrics, doc_lang_guess,
    # streaming_keep_first, pick_best_15m, streaming_sliding_counter)
    # are first in line.
    # --- historical r7 plan note (superseded by the list above):
    # r7 window priorities, in order: counter_backfill_gate,
    # doc_bigram_logprob, streaming_approx_distinct,
    # approx_distinct_buyers_hll, hll_segment_overlap,
    # streaming_value_percentiles, streaming_counter_commands,
    # doc_dedup_spans_rewrite, user_scd2_intervals,
    # ann_filtered_topk, events_profile, doc_quality_train,
    # streaming_minhash_ingest, embedding_pq_codes,
    # ann_pq_adc_topk, events_zorder_layout,
    # decayed_user_counts and streaming_decayed_counts (all added
    # after this round's window filled — local-green at
    # sf0.001/0.01/0.1 so far), anything modified in r7, then rotate
    # green anchors toward whichever families r6's rows leave
    # longest-unwatched. Also consider a corpus_prep_manifest_v3
    # composing the r6 additions (span-rewrite cleaned text + NB
    # quality score) into the chain — deferred from r6 because its
    # oracle compounds three large CTE families and deserves a fresh
    # session's attention, not an end-of-round rush.
)


def all_queries() -> dict[str, QuerySpec]:
    # import side-effect registration
    from openmetrics_spark.queries import (  # noqa: F401
        bfj_q,
        corpus_q,
        counter_q,
        docs_q,
        sql_surface_q,
        streaming_q,
        events_q,
        graph_q,
        media_q,
        sketch_q,
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
