"""Stage-time breakdown of counter_commands_full (r6 verdict item:
"reconcile the fan-out claim with the stopwatch").

Times each stage of the assembled counter job separately at
$SPARK_GRAFT_SF_DIR (default sf0.1), median-of-3 after one discarded
warm shot, and prints a JSON line + a markdown table for
docs/SCALE.md. Stages:

  enrich      as-of LogUserUser enrichment, noop-written WITHOUT the
              checkpoint (what the enrichment itself costs)
  checkpoint  localCheckpoint(eager=True) materialization of the
              enriched frame (the lineage cut the fan-out reads from)
  sliding     unified sliding fan-out from the checkpointed frame
              (families x windows, bucket shuffles + expansion)
  last        unified Last* window pass from the checkpointed frame
  full        the registered query end-to-end (reference point; its
              median should be approximately checkpoint+sliding+last)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def _timed(fn, reps=3):
    fn()  # discarded warm shot
    shots = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        shots.append(round(time.perf_counter() - t0, 3))
    return statistics.median(shots), shots


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from openmetrics_spark.jobs.counter import (
        FAMILIES,
        LAST_FAMILIES,
        enrich_with_log_user_user,
        full_counter_commands,
        unified_last_commands,
        unified_sliding_commands,
    )
    from openmetrics_spark.queries.counter_q import (
        DRIVER_WINDOWS,
        _90D_MS,
        _flat_and_luu,
    )
    from openmetrics_spark.session import get_spark

    spark = get_spark("counter-breakdown")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    flat, luu = _flat_and_luu(spark, sf_dir)
    out: dict[str, object] = {"sf_dir": sf_dir}

    med, shots = _timed(lambda: noop(enrich_with_log_user_user(flat, luu)))
    out["enrich"] = {"median": med, "raw": shots}

    med, shots = _timed(
        lambda: enrich_with_log_user_user(flat, luu)
        .localCheckpoint(eager=True)
        ._jdf.unpersist()  # free the blocks so reps don't accumulate
    )
    out["checkpoint"] = {"median": med, "raw": shots}

    chk = enrich_with_log_user_user(flat, luu).localCheckpoint(eager=True)
    med, shots = _timed(
        lambda: noop(unified_sliding_commands(chk, FAMILIES, DRIVER_WINDOWS))
    )
    out["sliding"] = {"median": med, "raw": shots}

    med, shots = _timed(
        lambda: noop(unified_last_commands(chk, LAST_FAMILIES, _90D_MS))
    )
    out["last"] = {"median": med, "raw": shots}

    med, shots = _timed(
        lambda: noop(
            full_counter_commands(
                flat,
                log_user_user=luu,
                window_configs=DRIVER_WINDOWS,
                last_horizon_ms=_90D_MS,
            )
        )
    )
    out["full"] = {"median": med, "raw": shots}

    print(json.dumps(out))
    rows = ["| stage | median s | shots |", "|---|---|---|"]
    for k in ("enrich", "checkpoint", "sliding", "last", "full"):
        d = out[k]
        rows.append(f"| {k} | {d['median']} | {d['raw']} |")
    print("\n".join(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
