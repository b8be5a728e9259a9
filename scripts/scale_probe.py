"""Empirical scaling probe: run key operators at 1x and 8x the sf0.1
input and report the wall-time ratio — the measured backing for
docs/SCALE.md's "would this survive 100x?" claims.

The 8x inputs are CONTENT-DISJOINT replicas (ids offset; document
tokens prefixed per copy so shingle spaces don't overlap; event users
offset) — so output growth reflects the ALGORITHM's scaling, not
pairs manufactured between identical copies. A near-linear ratio
(<= ~8x wall for 8x rows, typically less while fixed overhead
amortizes) is the pass condition; a superlinear ratio flags a plan
whose cost bends the wrong way.

Usage: python scripts/scale_probe.py  (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F  # noqa: E402


def replicated_docs(docs, copies: int):
    out = None
    for i in range(copies):
        c = docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            # prefix every token so copies share no shingles
            F.regexp_replace("text", r"([a-z0-9]+)", f"c{i}x$1").alias("text")
            if i
            else F.col("text"),
        )
        out = c if out is None else out.unionByName(c)
    return out


def replicated_docs_full(docs, copies: int):
    """Full-schema variant of replicated_docs: keeps every column the
    manifest chain reads (lang drives stratified sampling, text feeds
    the tokenizer), offsets ids and prefixes tokens per copy so the
    copies share no shingles or md5s."""
    cols = [c for c in docs.columns if c not in ("doc_id", "text")]
    out = None
    for i in range(copies):
        c = docs.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            (
                F.regexp_replace("text", r"([a-z0-9]+)", f"c{i}x$1")
                if i
                else F.col("text")
            ).alias("text"),
            *cols,
        )
        out = c if out is None else out.unionByName(c)
    return out


def replicated_events(ev, copies: int):
    out = None
    for i in range(copies):
        c = ev.select(
            (F.col("user_id") + F.lit(i * 1_000_000)).alias("user_id"),
            "ts",
            "event_type",
            "value",
            (F.col("event_id") + F.lit(i * 100_000_000)).alias("event_id"),
            "props",
        )
        out = c if out is None else out.unionByName(c)
    return out


def main() -> int:
    from openmetrics_spark.llm.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_neardup_pairs,
    )
    from openmetrics_spark.jobs.counter import counter_commands
    from openmetrics_spark.operators.counters import sliding_counter
    from openmetrics_spark.session import get_spark
    from openmetrics_spark.tables import release_caches, table

    def _flatify(ev):
        """Counter-job flat-event shape off the events table — key
        cardinality rides user_id/event_id, so replicas add keys."""
        return ev.select(
            (F.col("user_id") % 4).alias("platform_id"),
            F.concat(
                F.lit("c"), (F.col("event_id") % 50).cast("string")
            ).alias("content_id"),
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias(
                "user_id"
            ),
            F.concat(F.lit("lu"), F.col("user_id").cast("string")).alias(
                "log_user_id"
            ),
            F.lower(F.hex(F.col("event_id") % 256)).alias("query_hex"),
            F.element_at(
                F.array(F.lit("Linux"), F.lit("iOS"), F.lit("Mac OS X")),
                (F.col("event_id") % 3 + 1).cast("int"),
            ).alias("os"),
            F.element_at(
                F.array(F.lit("Chrome"), F.lit("Mobile Safari")),
                (F.col("event_id") % 2 + 1).cast("int"),
            ).alias("user_agent_family"),
            F.lit(32).cast("long").alias("agg_metric"),
            "ts",
        )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    copies = int(os.environ.get("SCALE_PROBE_COPIES", "8"))
    spark = get_spark("scale-probe")

    docs1 = table(spark, sf_dir, "documents").select("doc_id", "text")
    docsN = replicated_docs(docs1, copies)
    ev1 = table(spark, sf_dir, "events")
    evN = replicated_events(ev1, copies)

    from openmetrics_spark.operators.sketches import (
        bloom_build,
        cms_counters,
        hist_percentiles,
        hll_estimate,
        hll_registers,
    )
    from openmetrics_spark.queries.graph_q import pagerank_ranks

    probes = {
        "ngram_jaccard": lambda d: ngram_jaccard_pairs(
            d, "doc_id", "text", n=3, threshold=0.5, max_df=50
        ),
        "minhash_lsh": lambda d: minhash_lsh_pairs(d, "doc_id", "text"),
        "simhash": lambda d: simhash_neardup_pairs(d, "doc_id", "text"),
        "sliding_counter": lambda e: sliding_counter(
            e, ["user_id"], "ts", 86_400_000, 14_400_000
        ),
        # sketches: wall time should grow ~linearly (scan-bound) while
        # OUTPUT stays fixed at groups x sketch rows — the shape that
        # makes them the 100 TB path for distinct counts/percentiles
        "hll_distinct": lambda e: hll_estimate(
            hll_registers(e, ["event_type"], "event_id"),
            ["event_type"],
        ),
        "hist_percentiles": lambda e: hist_percentiles(
            e, ["event_type"], "value", width=1.0, qs=(0.5, 0.9, 0.99)
        ),
        # CMS counters / Bloom bitmap: scan-bound linear wall, output
        # FIXED at depth x width / bits/32 words regardless of rows
        "cms_counters": lambda e: cms_counters(e, [], "user_id"),
        "bloom_build": lambda e: bloom_build(e, "user_id"),
        # 5 damped iterations on a content-disjoint replicated graph:
        # per-iteration cost is one src join + one dst sum, so wall
        # must stay ~linear in edges (replicas add nodes AND edges)
        "pagerank_5it": lambda e: pagerank_ranks(
            e.select(
                (F.col("user_id") * 2).alias("src"),
                (F.expr("event_id DIV 100") * 2 + 1).alias("dst"),
            ).distinct()
        ),
        # the WHOLE fused counter fan-out (6 families x 4 windows off
        # one struct-array explode + one bucket shuffle per slide):
        # replicated users mean 8x distinct keys, so both the shuffled
        # bucket rows and the output grow ~linearly — the ratio checks
        # that no family x window branch re-scans raw events
        "counter_fanout": lambda e: counter_commands(_flatify(e)),
    }

    # ---- composed chains (r7 verdict #6): the two heaviest REGISTERED
    # queries, probed end-to-end. Their fns read the documents/events
    # parquet via tables.table, so the 8x leg patches the loader in the
    # query module's namespace to serve the content-disjoint replica —
    # the measured code path is exactly the registered query's.
    def _patched(module, frames, fn):
        """Serve the replicated frame(s) for the named table(s) while
        ``fn`` builds the registered query's plan. ``frames`` maps
        table name -> replica; every entry must be asked for at least
        once (see the loud assert below)."""
        import openmetrics_spark.tables as _tables

        real = module.table
        served = {name: 0 for name in frames}

        def fake(spark_, sf_dir_, name_):
            if name_ in frames:
                served[name_] += 1
                return frames[name_]
            return _tables.table(spark_, sf_dir_, name_)

        module.table = fake
        try:
            out = fn()
        finally:
            module.table = real
        # the patch only works if the registered fn resolved its
        # table() calls eagerly during plan build — a query that defers
        # the call into an action-time closure would silently probe the
        # un-replicated data, so fail loudly instead
        missing = [n for n, k in served.items() if k == 0]
        assert not missing, (
            f"{module.__name__}.table was never asked for {missing} "
            "while patched — the probe measured the wrong data"
        )
        return out

    import openmetrics_spark.queries.bfj_pipeline_q as _bfj_mod
    import openmetrics_spark.queries.corpus_mix_q as _corpus_mod
    import openmetrics_spark.queries.docs_q as _docs_mod
    import openmetrics_spark.queries.scale_q as _scale_mod
    from openmetrics_spark.queries import all_queries

    Q = all_queries()
    docs_full1 = table(spark, sf_dir, "documents")
    docs_fullN = replicated_docs_full(docs_full1, copies)
    ev_full1 = table(spark, sf_dir, "events")
    ev_fullN = replicated_events(ev_full1, copies)

    def probe_composed(name, module, table_name, frame):
        return _patched(
            module, {table_name: frame},
            lambda: Q[name].fn(spark, sf_dir),
        )

    probes["corpus_manifest_v3"] = lambda d: probe_composed(
        "corpus_prep_manifest_v3", _corpus_mod, "documents", d
    )
    probes["bfj_pipeline"] = lambda e: probe_composed(
        "bfj_pipeline_manifest", _bfj_mod, "events", e
    )
    probes["token_budget_select"] = lambda d: probe_composed(
        "corpus_token_budget_select", _docs_mod, "documents", d
    )
    probes["curation_pipeline"] = lambda d: probe_composed(
        "corpus_curation_pipeline", _docs_mod, "documents", d
    )
    probes["chunk_overlap"] = lambda d: probe_composed(
        "corpus_chunk_overlap", _docs_mod, "documents", d
    )
    probes["incremental_admit"] = lambda d: probe_composed(
        "corpus_incremental_admit", _docs_mod, "documents", d
    )

    # scale_join_strategies reads TWO tables; replicate both with the
    # SAME orderkey offset so each copy's lineitem still matches its
    # own orders (8x rows on both sides, 8x join output upstream of
    # the fixed 5-row-per-strategy aggregate). The bucketed leg's
    # write-time shuffle happens eagerly at plan build — i.e. OUTSIDE
    # the timed noop write, like every pin() warm — so the ratio
    # measures the three read-side join legs; the write is the
    # amortized once-per-dataset prep by design.
    def _replicated_keyed(df, key, copies_):
        out = None
        for i in range(copies_):
            c = df.withColumn(key, F.col(key) + F.lit(i * 1_000_000_000))
            out = c if out is None else out.unionByName(c)
        return out

    li_full1 = table(spark, sf_dir, "lineitem")
    o_full1 = table(spark, sf_dir, "orders")

    def _probe_scale_strategies(frames):
        return _patched(
            _scale_mod, frames,
            lambda: Q["scale_join_strategies"].fn(spark, sf_dir),
        )

    probes["scale_strategies"] = _probe_scale_strategies

    inputs = {
        "ngram_jaccard": (docs1, docsN),
        "minhash_lsh": (docs1, docsN),
        "simhash": (docs1, docsN),
        "sliding_counter": (ev1, evN),
        "hll_distinct": (ev1, evN),
        "hist_percentiles": (ev1, evN),
        "cms_counters": (ev1, evN),
        "bloom_build": (ev1, evN),
        "pagerank_5it": (ev1, evN),
        "counter_fanout": (ev1, evN),
        "corpus_manifest_v3": (docs_full1, docs_fullN),
        "bfj_pipeline": (ev_full1, ev_fullN),
        "token_budget_select": (docs_full1, docs_fullN),
        "curation_pipeline": (docs_full1, docs_fullN),
        "chunk_overlap": (docs_full1, docs_fullN),
        "incremental_admit": (docs_full1, docs_fullN),
        "scale_strategies": (
            {"lineitem": li_full1, "orders": o_full1},
            {
                "lineitem": _replicated_keyed(
                    li_full1, "l_orderkey", copies
                ),
                "orders": _replicated_keyed(o_full1, "o_orderkey", copies),
            },
        ),
    }

    reps = int(os.environ.get("SCALE_PROBE_REPS", "3"))

    def run(df, reps_=None) -> tuple[float, int]:
        # time a noop WRITE, not count(): Catalyst prunes projections
        # and aggregate expressions a count() never reads (measured:
        # manifest_v3's md5/span projections and the composed
        # manifests' bit_xor checksums vanish under count, halving the
        # apparent wall) — the write forces every output column, the
        # same methodology bench.py uses. The row count for the output
        # column rides an untimed second action on the still-cached
        # pins.
        #
        # MEDIAN-OF-REPS (r9): a single timed shot on a multi-stage
        # chain carries the same long-lived-JVM swing that forced the
        # bfj manifest onto a trimmed-mean protocol — the v3 probe
        # read 15.9x and 3.3x for IDENTICAL code in one afternoon.
        # Caches release between shots so every rep pays full compute.
        shots = []
        n = 0
        for _ in range(reps_ or reps):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            shots.append(time.perf_counter() - t0)
            n = df.count()
            release_caches()
        return sorted(shots)[len(shots) // 2], n

    only = set(sys.argv[1:])
    if only:
        unknown = only - set(probes)
        assert not unknown, f"unknown probes: {sorted(unknown)}"
        probes = {k: v for k, v in probes.items() if k in only}

    results = {}
    for name, build in probes.items():
        small, big = inputs[name]
        # warm BOTH legs: the first execution of a plan carries one-time
        # JIT/GC/stage-scheduling cost that varies wildly (the 8x
        # counter fan-out measured 205 s cold vs 54 s warm in the same
        # JVM) — the ratio claim is about steady-state scaling, so both
        # numerator and denominator must be steady-state. (r6/r7 probe
        # rows warmed only the 1x leg; their 8x readings are inflated.)
        run(build(small), 1)
        t1, n1 = run(build(small))
        run(build(big), 1)
        tn, nn = run(build(big))
        results[name] = {
            "t_1x": round(t1, 2),
            f"t_{copies}x": round(tn, 2),
            "ratio": round(tn / t1, 2) if t1 > 0 else None,
            "rows_1x": n1,
            f"rows_{copies}x": nn,
        }
        print(f"{name}: {results[name]}", flush=True)

    print(json.dumps({"copies": copies, "probes": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
