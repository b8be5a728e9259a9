"""Skewed-TTL wall probe (r11 verdict ask #5): the production-TTL
inferred-join path (45 m TTL, evict-before-decide) timed skewed vs
uniform at sf0.1 — the TTL path has different eviction arithmetic
under a hot key than the plain join (the summed-budget rule trims the
hot key's candidate list at every decide), so the manifest probe's
0.85x/0.95x readings don't automatically transfer. One shot per
variant (streaming per-batch fixed costs dominate, same protocol as
scripts/skew_probe.py's streaming half), caches released between.

Usage: python scripts/ttl_skew_probe.py [SF_DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if len(sys.argv) > 1:
        sf_dir = sys.argv[1]
    from openmetrics_spark.queries.streaming_q import (
        streaming_ttl_inferred_join,
        streaming_ttl_inferred_join_skewed,
    )
    from openmetrics_spark.session import get_spark
    from openmetrics_spark.tables import release_caches

    spark = get_spark("ttl-skew-probe")

    def shot(fn) -> tuple[float, int]:
        t0 = time.perf_counter()
        n = len(fn(spark, sf_dir).collect())
        dt = time.perf_counter() - t0
        release_caches()
        spark.catalog.clearCache()
        return round(dt, 3), n

    out: dict = {"sf_dir": sf_dir}
    for name, fn in (
        ("ttl_uniform", streaming_ttl_inferred_join),
        ("ttl_skewed", streaming_ttl_inferred_join_skewed),
    ):
        wall, n = shot(fn)
        out[name] = {"wall": wall, "rows": n}
    out["ratio"] = round(
        out["ttl_skewed"]["wall"] / out["ttl_uniform"]["wall"], 3
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
