"""Harsher-skew mitigation probe (r11 verdict ask #2): wall-time of
the Last* counter pass — the one non-pre-aggregating stage of the
counter job — under a 55%-of-stream hot key, window form vs the
detector-routed two-phase form.

The r11 skew gates planted ~12-50% on one axis and measured the
window form FASTER (fewer distinct keys beats serial hot-key work at
sf0.1) because no single (family-key, metric) GROUP was monstrous:
the counter skew spread across users, the BFJ skew across contents.
This probe builds the shape where the window form actually serializes
— ONE (platform, user, content) identity carrying 55% of all events,
so both content-bearing Last* families put half the exploded stream
into a single Window partition (one task sorts it) — and shows the
detect_hot_keys -> two-phase routing winning there, while the gated
``counter_commands_skewed_mitigated`` row pins that the routing never
changes a byte of output.

Events are replicated ``xfactor`` ways with ms jitter so the monster
group reaches MILLIONS of rows — sf0.1 events are only 100k rows, and
a sub-second single-task sort hides behind the routing's two extra
(fully parallel) scans: the first probe run at xfactor 6 (monster
~27k rows/group) measured the WINDOW form 2.33x FASTER, which is the
honest small-scale answer and exactly why the mitigation is detector-
GATED rather than always-on. The hot identity maps to one platform
and one metric so the hot stream is ONE window partition per content
family. Median of 3 per variant, caches cleared between shots;
outputs verified equal (count + order-free xxhash64 digest) on every
shot.

Usage: python scripts/probe_hot_last.py [SF_DIR] [XFACTOR]
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
    xfactor = int(sys.argv[2]) if len(sys.argv) > 2 else 60

    from pyspark.sql import functions as F

    from openmetrics_spark.jobs.counter import unified_last_commands
    from openmetrics_spark.operators.scale import detect_hot_keys
    from openmetrics_spark.session import get_spark
    from openmetrics_spark.tables import table

    spark = get_spark("hot-last-probe")

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.get_json_object("props", "$.k").cast("int").alias("__k"),
        F.col("event_type"),
    )
    # replicate with ms jitter: the monster group must be big enough
    # for its single-task sort to dominate scheduling noise
    ev = ev.withColumn(
        "__r", F.explode(F.array(*[F.lit(i) for i in range(xfactor)]))
    ).withColumn(
        "ts", F.timestamp_millis(F.unix_millis("ts") + F.col("__r") * 7)
    )
    # 55% of the stream on ONE (platform, user, content) identity with
    # a single metric, so the hot stream is ONE window partition per
    # content-bearing family; queries stay diverse so only the two
    # content families hold monster groups — exactly the families a
    # content_id route covers
    hot = (F.col("user_id") % 20) < 11
    flat = ev.select(
        F.when(hot, F.lit(0))
        .otherwise(F.col("user_id") % 4)
        .alias("platform_id"),
        F.when(hot, F.lit("ubot"))
        .otherwise(F.concat(F.lit("u"), F.col("user_id")))
        .alias("user_id"),
        F.when(hot, F.lit("lubot"))
        .otherwise(F.concat(F.lit("lu"), F.col("user_id")))
        .alias("log_user_id"),
        F.when(hot, F.lit("chot"))
        .otherwise(F.concat(F.lit("c"), (F.col("__k") % 10)))
        .alias("content_id"),
        F.concat(F.lit("q"), F.col("__k")).alias("query_hex"),
        F.lit(32).cast("long").alias("agg_metric"),
        "ts",
    ).localCheckpoint(eager=True)

    flagged = detect_hot_keys(
        flat, ["content_id"], threshold_bp=1000, top_n=20
    ).localCheckpoint(eager=True)
    print("flagged:", [r.content_id for r in flagged.collect()])

    def digest(df):
        # bit_xor: order-free and overflow-free under ANSI mode
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(
                F.xxhash64("command", "key", "field", "value", "ttl_s")
            ).alias("h"),
        ).first()

    def shot(fn) -> tuple[float, tuple]:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        d = digest(fn())
        return round(time.perf_counter() - t0, 3), (d.n, d.h)

    variants = {
        "window_form": lambda: unified_last_commands(flat),
        "routed_two_phase": lambda: unified_last_commands(
            flat, hot_keys=flagged, route_cols=("content_id",)
        ),
    }
    out: dict = {"sf_dir": sf_dir, "xfactor": xfactor}
    digests = {}
    shot(variants["window_form"])  # discarded warm shot
    for name, fn in variants.items():
        times = []
        for _ in range(3):
            dt, dg = shot(fn)
            times.append(dt)
            digests.setdefault(name, dg)
            assert digests[name] == dg
        out[name] = {"median": statistics.median(times), "raw": times}
    assert digests["window_form"] == digests["routed_two_phase"], digests
    out["rows_and_hash_equal"] = True
    out["n_rows"] = digests["window_form"][0]
    out["ratio_routed_vs_window"] = round(
        out["routed_two_phase"]["median"] / out["window_form"]["median"], 3
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
