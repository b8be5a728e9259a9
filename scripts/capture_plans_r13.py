"""Capture .explain("formatted") output for r13 optimization evidence.

Writes plans/r13/<query>_<tag>.txt for each requested query — the
executed (AQE-finalized) formatted plan, plus a short header with the
exchange/join/python-boundary counts the optimization notes cite.

Usage:
    python scripts/capture_plans_r13.py before [query ...]
    python scripts/capture_plans_r13.py after  [query ...]

With no query names, captures the full headline (bench) set. Reads
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01 — plan SHAPE, not
timing, is the point; sf0.01 keeps the capture fast).
"""

from __future__ import annotations

import os
import re
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> int:
    from openmetrics_spark.queries import all_queries
    from openmetrics_spark.session import get_spark
    from openmetrics_spark.tables import release_caches

    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("plan-capture-r13")
    qs = all_queries()
    if not names:
        names = [n for n, s in qs.items() if s.headline]
    out_dir = os.path.join(_ROOT, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        spark.sparkContext.setJobDescription(f"plan-capture:{name}")
        df = qs[name].fn(spark, sf_dir)
        # Execute THE DF'S OWN QueryExecution so AQE finalizes (a write
        # wraps the plan in a new execution and leaves this one
        # un-finalized); drain without buffering.
        for _ in df.toLocalIterator():
            pass
        plan = df._jdf.queryExecution().explainString(mode)
        release_caches()
        n_ex = len(re.findall(r"Exchange \(", plan))
        n_bhj = len(re.findall(r"BroadcastHashJoin", plan))
        n_smj = len(re.findall(r"SortMergeJoin", plan))
        n_shj = len(re.findall(r"ShuffledHashJoin", plan))
        n_py = len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)
        )
        n_mem = len(re.findall(r"InMemoryTableScan", plan))
        header = (
            f"query: {name}\n"
            f"tag: {tag}\n"
            f"sf_dir: {sf_dir}\n"
            f"exchange_nodes(incl AQE/pinned reprints): {n_ex}\n"
            f"broadcast_hash_joins: {n_bhj}\n"
            f"sort_merge_joins: {n_smj}\n"
            f"shuffled_hash_joins: {n_shj}\n"
            f"python_boundary_nodes: {n_py}\n"
            f"in_memory_table_scans: {n_mem}\n"
            + "-" * 72 + "\n"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(header + plan + "\n")
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
