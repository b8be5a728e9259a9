"""Decompose the COMPOSED corpus_prep_manifest_v3 run into its two
sequential legs (guide §1: isolate the barrier cost):

  leg A = stage_parquet(survivor chain)   (one write job, cold pins)
  leg B = the final noop action           (span rewrite + NB + joins)

run cold exactly as the bench sees them (release_caches between reps).
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> int:
    from pyspark.sql import functions as F

    from openmetrics_spark.llm.text import tokens
    from openmetrics_spark.queries.corpus_mix_q import (
        _manifest_sample_gate,
        _manifest_survivors,
        _nb_model,
        _nb_present,
        _span_kept,
    )
    from openmetrics_spark.session import get_spark
    from openmetrics_spark.tables import (
        pin,
        release_caches,
        spread_for_compute,
        stage_parquet,
        table,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-v3-legs")

    # warm codegen once
    table(spark, sf_dir, "documents").limit(64).select(
        F.md5("text"), F.split(F.lower("text"), "[^a-z0-9]+")
    ).write.format("noop").mode("overwrite").save()

    for rep in range(3):
        t0 = time.perf_counter()
        docs = spread_for_compute(table(spark, sf_dir, "documents"))
        t = pin(docs.select("doc_id", "text", "lang", tokens("text").alias("tok")))
        surv = stage_parquet(
            _manifest_survivors(spark, sf_dir, t=t).select(
                "doc_id", "lang", "tok", "n_tokens", "quality"
            ),
            "profile_v3_surv",
        )
        t1 = time.perf_counter()
        gated = surv.filter(_manifest_sample_gate())
        kept = _span_kept(
            surv.select("doc_id", "tok"), t_out=gated.select("doc_id", "tok")
        )
        t_nb = t.select(F.col("doc_id").alias("d"), "tok")
        present, w, const = _nb_model(t_nb)
        score = (
            _nb_present(
                t_nb.join(gated.select(F.col("doc_id").alias("d")), "d", "left_semi")
            )
            .join(w.select(F.col("bucket").alias("b"), "w_e6"), "b")
            .groupBy("d")
            .agg(F.sum("w_e6").cast("long").alias("s"))
            .withColumnRenamed("d", "doc_id")
        )
        const_c = const.select(F.col("w_e6").alias("c"))
        out = (
            gated.join(kept, "doc_id", "left")
            .join(score, "doc_id", "left")
            .crossJoin(F.broadcast(const_c))
            .select(
                "doc_id",
                "n_tokens",
                "quality",
                (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
                .cast("long")
                .alias("n_removed"),
                F.coalesce(F.col("n_kept"), F.lit(0))
                .cast("long")
                .alias("n_clean_tokens"),
                F.md5(F.coalesce(F.col("cleaned"), F.lit(""))).alias("clean_md5"),
                (F.col("c") + F.coalesce(F.col("s"), F.lit(0)))
                .cast("long")
                .alias("nb_score_e6"),
            )
        )
        t2 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        print(
            f"rep {rep}: legA(stage) {t1-t0:7.3f}s  plan-build {t2-t1:6.3f}s  "
            f"legB(final action) {t3-t2:7.3f}s  total {t3-t0:7.3f}s",
            flush=True,
        )
        release_caches()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
