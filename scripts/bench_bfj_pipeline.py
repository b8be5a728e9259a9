"""Stable wall-time protocol for bfj_pipeline_manifest (r8 verdict
"What's wrong" #1): the ~80-stage composed topology swings 31-87 s
FRESH-PROCESS at sf0.1 (GC/worker churn amplified by stage count), so
the citable statistic is measured differently:

- reps-5 IN-PROCESS with pinned caches released between shots, so
  every rep pays the full compute but shares the warmed JVM/worker
  pool — the churn the fresh-process number drowns in;
- the statistic is the TRIMMED MEAN (drop min+max, mean of middle 3)
  plus the full raw spread, recorded in docs/SCALE.md each round.

Usage: python scripts/bench_bfj_pipeline.py  [SPARK_GRAFT_SF_DIR]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if len(sys.argv) > 1:
        sf_dir = sys.argv[1]
    from openmetrics_spark.queries.bfj_pipeline_q import bfj_pipeline_manifest
    from openmetrics_spark.session import get_spark
    from openmetrics_spark.tables import release_caches

    spark = get_spark("bfj-pipeline-bench")

    def run_once() -> float:
        t0 = time.perf_counter()
        rows = bfj_pipeline_manifest(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        # 22 rows since r10 (stages 20-22: user join, AddLatest-
        # Impressions, PII strip); 19 through r9
        assert len(rows) == 22, f"manifest returned {len(rows)} rows"
        release_caches()
        spark.catalog.clearCache()
        return round(dt, 3)

    run_once()  # discarded warm shot (JVM/codegen/worker spin-up)
    shots = [run_once() for _ in range(5)]
    trimmed = round(statistics.mean(sorted(shots)[1:-1]), 3)
    out = {
        "sf_dir": sf_dir,
        "trimmed_mean": trimmed,
        "median": statistics.median(shots),
        "raw": shots,
        "spread": round(max(shots) - min(shots), 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
