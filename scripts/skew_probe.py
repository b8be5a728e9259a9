"""Hot-key skew probe (r11, verdict ask #1c): wall-time of the
22-stage BFJ manifest — batch AND streaming — on the PLANTED-hot-key
derivation vs the uniform one at sf0.1. ~12-13% of all events collapse
onto a single (platform_id=0, 'uhot') key, so every user-keyed window,
dedup group, session cogroup, as-of join and stateful twin carries one
power-law partition. Pass condition: sub-linear degradation (skewed
wall within a small constant of uniform — the hot key concentrates
~13% of rows on one task, so anything far beyond ~1.2-1.5x means a
per-key quadratic or a serialization cliff).

Protocol: batch = median of 3 in-process shots per variant, caches
released between shots (the house probe protocol); streaming = one
shot per variant (its per-batch fixed costs dominate and the staged
replay is already multi-minute). Recorded in docs/SCALE.md.

Usage: python scripts/skew_probe.py  [SPARK_GRAFT_SF_DIR]
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
    from openmetrics_spark.queries.bfj_pipeline_q import (
        bfj_pipeline_manifest,
        bfj_pipeline_manifest_skewed,
    )
    from openmetrics_spark.queries.streaming_bfj_q import (
        streaming_bfj_pipeline,
        streaming_bfj_pipeline_skewed,
    )
    from openmetrics_spark.session import get_spark
    from openmetrics_spark.tables import release_caches

    spark = get_spark("skew-probe")

    def shot(fn) -> float:
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        assert len(rows) == 22, f"manifest returned {len(rows)} rows"
        release_caches()
        spark.catalog.clearCache()
        return round(dt, 3)

    out: dict = {"sf_dir": sf_dir}
    shot(bfj_pipeline_manifest)  # discarded warm shot
    for name, fn in (
        ("batch_uniform", bfj_pipeline_manifest),
        ("batch_skewed", bfj_pipeline_manifest_skewed),
    ):
        shots = [shot(fn) for _ in range(3)]
        out[name] = {"median": statistics.median(shots), "raw": shots}
    out["batch_ratio"] = round(
        out["batch_skewed"]["median"] / out["batch_uniform"]["median"], 3
    )
    for name, fn in (
        ("stream_uniform", streaming_bfj_pipeline),
        ("stream_skewed", streaming_bfj_pipeline_skewed),
    ):
        out[name] = {"wall": shot(fn)}
    out["stream_ratio"] = round(
        out["stream_skewed"]["wall"] / out["stream_uniform"]["wall"], 3
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
