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
    # fixed / modified this round — must re-verify at the driver
    "doc_repetition_stats",       # r4's only red row: oracle CAST fixed
    "counter_commands_full",      # UA-family extraction now in the path
    "bfj_join_side_outputs",      # new: inferred-join mismatch/dup side channels
    "doc_unigram_logprob_capped", # new: broadcast capped-vocab variant
    "validation_error_split",     # new: Validate* error side output
    "doc_pii_scrub",              # new: document PII redaction
    "doc_bm25_topk",              # new: BM25 keyword retrieval
    "embedding_kmeans_cells",     # new: distributed Lloyd k-means
    "hourly_dense_series",        # new: gap-fill + forward-fill
    "streaming_top_event_types",  # new: TopNEmitter update stream
    "streaming_user_asof_join",   # new: TemporalJoin streaming twin
    # never driver-verified: corpus-mix module
    "doc_decontaminate",
    "corpus_pack_chunks",
    "domain_mix_weights",
    "corpus_sample_stratified",
    "quality_filter_funnel",
    "doc_dup_span_coverage",
    "corpus_bpe_first_merges",
    "doc_unigram_logprob",
    "doc_quality_classifier",
    "corpus_prep_manifest_v2",
    # never driver-verified: streaming pipelines
    "streaming_inferred_attribution",
    "streaming_session_rollup",
    "streaming_interval_join",
    # never driver-verified: sinks / joins / envelopes
    "upsert_mor_snapshot",   # new: merge-on-read twin of the COW sink
    "upsert_two_batches",
    "user_versioned_join",
    "cumulated_metrics_envelope",
    "streaming_content_lookup",      # new: cached-client lookup variant
    "minhash_incremental_neardup",   # new: batch-vs-corpus dedup
    # never driver-verified: multimodal (av gained an oracle in r4)
    "multimodal_image_stats",
    "multimodal_resize_stats",
    "multimodal_av_features",
    # never driver-verified: TPC-H remainder
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q18_large_volume_customer",
    "q19_disjunctive_revenue",
    "q21_waiting_supplier",
    # (q16/q17/q20/q22, ann_ivf_kmeans_topk, upsert_incremental_pull
    # user_set_ops and embedding_outliers
    # rotate into the r6 window — the list must stay at 50 and the
    # slots go to queries whose CODE changed this round; the kmeans
    # core and the reworked MOR internals each already have an
    # in-window twin this round)
    # green anchors — one per §2 family stays inside every window;
    # ngram/clusters/ann re-verify the r5 shingle + connected-
    # components refactors
    "last_time_and_count",        # LastTimeAndCount
    "streaming_cumulate_hourly",  # custom streaming state machine
    # (asof_attribution rotated out: streaming_user_asof_join makes
    # the temporal-join family claim with the strictly harder twin;
    # bfj_view_insertions rotated out: the inferred-join family rides
    # on bfj_join_side_outputs this round — if that row comes back
    # red, restore bfj_view_insertions as the family's green anchor)
    # (cumulate_hourly rotated out: the streaming twin covers the
    # CUMULATE family with the strictly harder claim)
    "ngram_jaccard_neardup",      # LLM near-dup (r5 posting refactor)
    "doc_dedup_clusters",         # connected components (r5 edge cut)
    "minhash_lsh_neardup",        # shingles() signature path (r5)
    # (bfj_joined_actions / doc_exact_dedup / hourly_event_metrics /
    # q1_pricing_summary rotated out this round: their families stay
    # covered by bfj_join_side_outputs, the near-dup trio, the two
    # cumulate rows, and the 12 in-window TPC-H queries.)
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
        media_q,
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
