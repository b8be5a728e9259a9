"""In-process INTERLEAVED A/B for the r13 changes (guide §1): one
Spark session, variants alternated shot-by-shot so host-noise bursts
(this box shows 10-60 s pathological shots on identical code) hit both
legs equally. Reports per-leg min + median; a canary query is timed
between pairs to mark burst windows.

Variants (pick with argv[1]):
  counter  — SHARED_FINE knob on/off; queries: counter_commands_full
  v3stage  — stage_parquet vs eager localCheckpoint in manifest v3
  shj      — preferSortMergeJoin/maxShuffledHashJoinLocalMapThreshold
             runtime conf flip; queries: inferred_view_attribution
Usage: python scripts/ab_interleaved_r13.py <variant> [pairs=6]
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> int:
    variant = sys.argv[1]
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from openmetrics_spark.queries import all_queries
    from openmetrics_spark.session import get_spark
    from openmetrics_spark.tables import release_caches, table

    spark = get_spark("ab-interleaved-r13")
    from pyspark.sql import functions as F

    table(spark, sf_dir, "region").count()
    qs = all_queries()

    import openmetrics_spark.operators.counters as counters_mod
    import openmetrics_spark.queries.corpus_mix_q as cmx
    from openmetrics_spark.tables import stage_parquet as real_stage

    def set_mode(new: bool) -> None:
        if variant == "counter":
            # knob removed after the negative result (shared-fine
            # measured slower at sf0.1 AND 5x; see OPTIMIZATION_r13.md)
            assert hasattr(counters_mod, "SHARED_FINE"), (
                "counter variant needs the SHARED_FINE knob (reverted)"
            )
            counters_mod.SHARED_FINE = new
        elif variant == "v3stage":
            cmx.stage_parquet = (
                real_stage if new else (lambda df, tag: df.localCheckpoint())
            )
        elif variant == "shj":
            spark.conf.set(
                "spark.sql.join.preferSortMergeJoin", str(not new).lower()
            )
            spark.conf.set(
                "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                str(64 * 1024 * 1024) if new else "0",
            )
        else:
            raise SystemExit(f"unknown variant {variant}")

    names = {
        "counter": ["counter_commands_full"],
        "v3stage": ["corpus_prep_manifest_v3"],
        "shj": ["inferred_view_attribution"],
    }[variant]
    if os.environ.get("AB_QUERIES"):
        names = os.environ["AB_QUERIES"].split(",")

    def shot(name: str) -> float:
        t0 = time.perf_counter()
        qs[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        release_caches()
        return round(dt, 3)

    def canary() -> float:
        t0 = time.perf_counter()
        table(spark, sf_dir, "lineitem").groupBy("l_returnflag").agg(
            F.sum("l_quantity")
        ).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # warm both variants once (discarded)
    for mode in (False, True):
        set_mode(mode)
        for n in names:
            shot(n)

    res = {n: {"old": [], "new": []} for n in names}
    canaries = []
    for p in range(pairs):
        # alternate which leg goes first inside each pair
        order = [(False, "old"), (True, "new")]
        if p % 2:
            order.reverse()
        for mode, tag in order:
            set_mode(mode)
            for n in names:
                spark.sparkContext.setJobDescription(f"ab:{variant}:{tag}:{p}")
                res[n][tag].append(shot(n))
        canaries.append(canary())

    set_mode(True)  # leave the module in its committed state
    summary = {}
    for n in names:
        o, w = sorted(res[n]["old"]), sorted(res[n]["new"])
        summary[n] = {
            "old_min": o[0], "new_min": w[0],
            "old_med": o[len(o) // 2], "new_med": w[len(w) // 2],
            "old_raw": res[n]["old"], "new_raw": res[n]["new"],
        }
    print(json.dumps({"variant": variant, "summary": summary,
                      "canaries": canaries, "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
