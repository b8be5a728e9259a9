"""Benchmark runner.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop write (full execution, no
driver-side collect). A tiny warmup query first amortizes JVM/codegen
startup out of the per-query numbers.

Methodology note for cross-round comparisons: BENCH_r01/r02 used only
a 64-row warmup, so their numbers include one-time C2-compile cost in
the first measured queries; r04 onward warms the ngram and ANN hot
loops past the JIT threshold first (see the warmup legs below), which
measures steady-state throughput — the regime that matters at 100 TB,
where startup is noise. r04 additionally REWROTE the ngram query
(15.6 s → 3.2 s is real plan change, warmup explains only ~1 s of
it); r05 widens the headline set from 11 to 15 queries (adds
counter_commands_full, corpus_prep_manifest_v2, doc_dup_span_coverage,
streaming_cumulate_hourly — the engine's heaviest work), so r05's
total is NOT comparable to r04's total; per-query times are.

r5→r6 note: inferred_view_attribution's r5 reading (1.429 s, +8% vs
r4's 1.327 s) was re-measured ×5 warm in r6: [1.479, 1.142, 0.907,
0.837, 0.839] — single-shot numbers for this query carry ±40% noise
around a ~0.85 s steady state; the r5 delta was noise, no plan
change was made. r6 also REWROTE the counter job's fan-out (one
bucket shuffle per slide for all families + one Last* pass), so
counter_commands_full r6 vs r5 is a real plan change (~2x).
r6 additionally adds 4 headliners for the round's new/optimized ops
(minhash_lsh_neardup after its codegen-signature rewrite,
counter_commands_weekly, corpus_bpe_encode, and the new
approx_distinct_customers_hll sketch), then 4 more for the late-r6
additions (streaming_counter_commands — the fused fan-out as a real
streaming replay, user_scd2_intervals, doc_dedup_spans_rewrite,
hll_segment_overlap) — the r6 total is again NOT comparable to r5's;
per-query times are.

r6→r7 note: the protocol moved to MEDIAN-OF-3 (singles kept in
"raw"); r6's apparent regressions (q1 +50%, ann_brute +33%,
streaming_cumulate_hourly +32%, session_rollup_30m +27%, ngram +18% —
none with plan-affecting diffs) were re-measured under it and all
landed at or below their r5 levels (e.g. ngram 2.15 s vs r6's 3.41 s
single shot; streaming_cumulate_hourly 6.37 s vs 8.24 s): confirmed
noise, specifically the first warm shot carrying one-time JIT/stage-
scheduling cost that the old single-shot numbers billed to whichever
query ran it (the raw arrays show shot-1 routinely 30-60% above
shots 2-3). Totals are sums of medians from r7 on — NOT comparable
to earlier single-shot totals; steady-state per-query medians are
the cross-round comparable quantity now.

r7→r8 note: the headline SET is unchanged (totals comparable for the
first time since r4). The round's big composed addition —
bfj_pipeline_manifest, the whole flat-output topology as one manifest
query — is deliberately NOT a headliner: its fresh-process wall at
sf0.1 swings 31-87 s shot to shot (GC/worker churn across an
~80-stage plan), which would inject phantom regressions into the
cross-round medians; its performance record lives in docs/SCALE.md
(per-stage profile, 8x probe at 1.9x). Mid-r8 medians for the r7 set:
counter_commands_weekly 1.193 s (the r7 2.103 s was noise, see
SCALE.md), counter_commands_full 4.58 s, manifest_v3 8.97 s.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from openmetrics_spark.queries import all_queries
    from openmetrics_spark.session import get_spark
    from openmetrics_spark.tables import table

    spark = get_spark("bench")
    # warmup: JVM + whole-stage codegen + parquet footer caches. The
    # tiny expression job exercises the regex/higher-order-function
    # codegen paths so their one-time JIT cost isn't attributed to
    # whichever headline query happens to run first.
    from pyspark.sql import functions as F

    table(spark, sf_dir, "region").count()
    (
        table(spark, sf_dir, "documents")
        .limit(64)
        .select(F.md5("text"), F.split(F.lower("text"), "[^a-z0-9]+"))
        .write.format("noop").mode("overwrite").save()
    )
    # second warmup leg: run the HEAVIEST query's real shape over a
    # small spread sample. The higher-order-function interpreter,
    # explode, md5/conv, hash-join and hash-agg loops all JIT lazily,
    # and C2 only compiles after ~10k invocations — a 64-row touch
    # leaves the compile cost billed to the first measured query
    # (measured ~3s of ngram's first run vs ~2s steady-state at
    # sf0.1). 1024 docs × ~45 shingles crosses the compile threshold
    # for every hot loop; the repartition matters because limit()
    # collapses to one partition and would serialize the warmup.
    from openmetrics_spark.llm.dedup import ngram_jaccard_pairs

    warm_docs = (
        table(spark, sf_dir, "documents")
        .limit(1024)
        .repartition(64)
        .select("doc_id", "text")
    )
    (
        ngram_jaccard_pairs(warm_docs, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    )
    # third warmup leg: the zip_with/aggregate dot-product loops of the
    # ANN queries JIT separately from the ngram paths (same reasoning —
    # 512 vectors × queries × 64 dims crosses the compile threshold).
    from openmetrics_spark.llm.similarity import brute_topk

    warm_emb = (
        table(spark, sf_dir, "embeddings").limit(512).repartition(32)
    )
    (
        brute_topk(
            warm_emb, "vec_id", "embedding",
            warm_emb.select("vec_id").filter(F.col("vec_id") < 10),
        )
        .write.format("noop").mode("overwrite").save()
    )

    # fourth warmup leg: the Arrow pandas_udf worker pool (xxhash64)
    # and the Structured-Streaming machinery (state-store provider,
    # micro-batch planner, applyInPandasWithState codegen + its python
    # worker protocol) each initialize lazily on FIRST use — measured
    # ~2-3 s billed to counter_commands_full / streaming_cumulate_
    # hourly without this, pure one-time setup that is noise at
    # steady state. A 64-row hash job plus a 2-slice micro-stream
    # touch both paths once, outside the timed window.
    from openmetrics_spark.functions.hashing import xxhash64_udf

    (
        table(spark, sf_dir, "documents")
        .limit(64)
        .select(xxhash64_udf(F.col("text")))
        .write.format("noop").mode("overwrite").save()
    )
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from openmetrics_spark.jobs.streaming_flat_output import (
        _drain,
        _restage,
        _stream,
    )
    from openmetrics_spark.streaming.stateful import stream_cumulate_counter

    _warm_work = _tempfile.mkdtemp(prefix="bench_stream_warm_")
    try:
        ev64 = (
            table(spark, sf_dir, "events")
            .limit(256)
            .select("user_id", "ts", F.unix_millis("ts").alias("ms"))
        )
        mid = int(ev64.agg(F.avg("ms")).first()[0])
        _staged = _os.path.join(_warm_work, "ev")
        _restage(spark, ev64, _staged, "ms", [mid], sentinel=True)
        warm_cum = stream_cumulate_counter(
            _stream(spark, _staged),
            key_col="user_id", ts_col="ts",
            step_ms=3_600_000, period_ms=86_400_000, delay_ms=2000,
        )
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        try:
            _drain(
                warm_cum,
                _os.path.join(_warm_work, "out"),
                _os.path.join(_warm_work, "chk"),
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    finally:
        _shutil.rmtree(_warm_work, ignore_errors=True)

    from openmetrics_spark.tables import release_caches

    specs = {n: s for n, s in all_queries().items() if s.headline}
    # run the long-standing (r1-r4-comparable) headline set first, in
    # its historical order, then the heavyweights added in r5 — so the
    # carried-over per-query numbers stay comparable across rounds and
    # JVM/python-worker memory pressure from the heavy queries can't
    # inflate the light ones.
    order = [
        "sliding_hourly_counter", "asof_attribution", "hourly_event_metrics",
        "ngram_jaccard_neardup", "ann_brute_topk", "q1_pricing_summary",
        "doc_token_stats", "session_rollup_30m", "inferred_view_attribution",
        "q3_shipping_priority", "q5_local_supplier_volume",
        "doc_dup_span_coverage", "counter_commands_full",
        "corpus_prep_manifest_v2", "streaming_cumulate_hourly",
    ]
    specs = {
        **{n: specs[n] for n in order if n in specs},
        **{n: s for n, s in specs.items() if n not in order},
    }
    # r7 protocol change: median-of-N (default 3). Single shots of ~1 s
    # queries swing ±40% on this box (the ×5 re-measure above), which
    # had grown larger than the effects being tracked — r6's "+9.7%
    # aggregate regression" was indistinguishable from noise. The
    # median of 3 consecutive warm runs is what we publish per query;
    # the individual shots stay in "raw" for transparency. Consecutive
    # (not interleaved) repeats are deliberate: they share page-cache /
    # JIT state, which is the steady-state regime the headline number
    # claims to measure.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    times: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    for name, spec in specs.items():
        shots: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            shots.append(round(time.perf_counter() - t0, 3))
            # cache cleanup runs OUTSIDE the timed window: unpersist
            # cost belongs to the harness, and charging it to whichever
            # query pinned intermediates would skew comparisons
            release_caches()
        raw[name] = shots
        times[name] = sorted(shots)[len(shots) // 2]

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "raw": raw,
                "reps": reps,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
