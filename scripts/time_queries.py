"""Focused per-query timing harness for A/B runs (guide §1): times the
named registered queries with the noop sink, median of
$SPARK_GRAFT_BENCH_REPS (default 5) warm shots after one discarded
warmup shot per query. Prints one JSON line.

Usage: python scripts/time_queries.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))

    from openmetrics_spark.queries import all_queries
    from openmetrics_spark.session import get_spark
    from openmetrics_spark.tables import release_caches, table

    spark = get_spark("time-queries")
    from pyspark.sql import functions as F

    table(spark, sf_dir, "region").count()
    (
        table(spark, sf_dir, "documents")
        .limit(64)
        .select(F.md5("text"), F.split(F.lower("text"), "[^a-z0-9]+"))
        .write.format("noop").mode("overwrite").save()
    )
    qs = all_queries()
    out: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    for name in names:
        shots = []
        for i in range(reps + 1):
            spark.sparkContext.setJobDescription(f"time:{name}:{i}")
            t0 = time.perf_counter()
            qs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            shots.append(round(time.perf_counter() - t0, 3))
            release_caches()
        shots = shots[1:]  # discard the per-query warmup shot
        raw[name] = shots
        out[name] = sorted(shots)[len(shots) // 2]
    print(json.dumps({"queries": out, "raw": raw, "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
