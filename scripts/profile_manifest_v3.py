"""Per-stage wall-clock profile of corpus_prep_manifest_v3 (and v2) at
$SPARK_GRAFT_SF_DIR (default sf0.1) — guide §1: measure first, isolate
with the noop sink so the computation is timed, not the sink.

Each stage is timed in dependency order with its upstream pins warm,
so a stage's number is ITS marginal cost (the production sharing).
Median-of-N (default 3) per stage.
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def _t(spark, label, df, reps=3):
    shots = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(f"profile:{label}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        shots.append(time.perf_counter() - t0)
    med = sorted(shots)[len(shots) // 2]
    print(f"{label:40s} {med:7.3f} s  raw={[round(s,3) for s in shots]}")
    return med


def main() -> int:
    from pyspark.sql import functions as F

    from openmetrics_spark.queries.corpus_mix_q import (
        _manifest_sample_gate,
        _manifest_survivors,
        _nb_model,
        _span_kept,
    )
    from openmetrics_spark.llm.text import tokens
    from openmetrics_spark.session import get_spark
    from openmetrics_spark.tables import pin, release_caches, spread_for_compute, table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-manifest")

    # warm the JVM/codegen paths once
    table(spark, sf_dir, "documents").limit(64).select(
        F.md5("text"), F.split(F.lower("text"), "[^a-z0-9]+")
    ).write.format("noop").mode("overwrite").save()

    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    t = pin(docs.select("doc_id", "text", "lang", tokens("text").alias("tok")))
    _t(spark, "t = tokenize corpus (pin)", t)

    surv = pin(_manifest_survivors(spark, sf_dir, t=t))
    _t(spark, "surv = survivor chain (marginal)", surv)

    kept = _span_kept(surv.select("doc_id", "tok"))
    _t(spark, "kept = span rewrite over surv", kept)

    t_nb = t.select(F.col("doc_id").alias("d"), "tok")
    present, w, const = _nb_model(t_nb)
    _t(spark, "nb w (model fit)", w)
    score = (
        present.join(w.select(F.col("bucket").alias("b"), "w_e6"), "b")
        .groupBy("d")
        .agg(F.sum("w_e6").cast("long").alias("s"))
    )
    _t(spark, "score = present x w (all docs)", score)

    gated = surv.filter(_manifest_sample_gate())
    _t(spark, "gated survivors (filter only)", gated)
    n_surv = surv.count()
    n_gated = gated.count()
    print(f"survivors={n_surv} gated={n_gated} ({100.0*n_gated/max(1,n_surv):.1f}%)")

    from openmetrics_spark.queries import all_queries

    release_caches()
    qs = all_queries()
    for name in ("corpus_prep_manifest_v3", "corpus_prep_manifest_v2"):
        shots = []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            qs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            shots.append(time.perf_counter() - t0)
            release_caches()
        med = sorted(shots)[len(shots) // 2]
        print(f"{name:40s} {med:7.3f} s  raw={[round(s,3) for s in shots]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
