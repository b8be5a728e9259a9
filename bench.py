"""Benchmark runner.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop write (full execution, no
driver-side collect). A tiny warmup query first amortizes JVM/codegen
startup out of the per-query numbers.
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
    # second warmup leg: the higher-order-function interpreter
    # (transform/slice/array_join), explode, hash-join and hash-agg
    # code paths — these JIT lazily and otherwise bill their one-time
    # compilation to the first query that touches them (measured ~6s
    # of the ngram query's first run vs ~2.5s steady-state at sf0.1).
    # 64 rows: compute cost is nil, only the code paths matter.
    (
        table(spark, sf_dir, "documents")
        .limit(64)
        .select(
            F.col("doc_id").alias("doc"),
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.lit(3)),
                        lambda i: F.array_join(
                            F.slice(F.split(F.lower("text"), "[^a-z0-9]+"), i, 3), " "
                        ),
                    )
                )
            ).alias("g"),
        )
        .select("doc", F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long").alias("s"))
        .write.format("noop").mode("overwrite").save()
    )

    specs = {n: s for n, s in all_queries().items() if s.headline}
    times: dict[str, float] = {}
    for name, spec in specs.items():
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
