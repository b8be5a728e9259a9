"""50-query driver-window rehearsal through the EXACT gate path.

The round driver verifies the FIRST 50 `__spark_entry__.queries()`
entries against `oracle_sql()` at sf0.01 in ONE vanilla default-memory
session. Rehearsing through the same path (the wrapped callables with
their boundary cache release, driver registration order, the
driver-strict comparator) is the only pre-flight that catches
composition failures no per-query check can: cache pile-up across 50
queries, plan-string/UI-listener memory, catalog collisions between
queries sharing helper tables. House practice since r7; this script
replaces the ad-hoc inline version so every round runs the identical
rehearsal.

Usage: python scripts/rehearse_window.py  [SF_DIR] [N]
Prints OK/FAIL per query + a final SUMMARY line; exit 1 on any FAIL.
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.chdir(_ROOT)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()

    import __spark_entry__ as e
    from openmetrics_spark.oracle import compare, duck_connection

    qs = e.queries()
    oracles = e.oracle_sql()
    names = list(qs)[:n]
    con = duck_connection(sf_dir)
    fails = []
    for i, name in enumerate(names, 1):
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            if name in oracles:
                odf = con.execute(oracles[name]).df()
                errs = compare(sdf, odf)
            else:
                errs = [] if len(sdf) >= 0 else ["no rows"]
        except Exception as ex:  # noqa: BLE001 — rehearsal must report, not die
            errs = [f"EXCEPTION {type(ex).__name__}: {ex}"]
        dt = time.perf_counter() - t0
        mark = "OK  " if not errs else "FAIL"
        print(f"{mark} {i:2d}/{len(names)} {name}  {dt:.1f}s", flush=True)
        if errs:
            fails.append(name)
            for err in errs[:3]:
                print(f"      {err}", flush=True)
    print(f"SUMMARY {len(names) - len(fails)}/{len(names)} OK"
          + (f"  FAILS: {fails}" if fails else ""))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
