"""r12 verdict item 6: re-probe the MinHash SLIM-BAND shape at >=2.5x
the bench SF before the r12 revert is accepted as final.

Two shapes, interleaved in one session (host bursts make cross-process
medians unusable here):

  wide (shipped): the banded frame carries the FULL shingle set
      through the band exchange twice (x/y self-join sides) — shingle
      sets x bands x 2 of exchange bytes, zero re-attach joins.
  slim (r12 reverted restructure, reconstructed from its description):
      only (doc, band-key) rides the band exchange; candidate pairs
      come from the same self-join; shingle sets re-attach to the
      SURVIVING pairs from the pin()ned signature base via two joins.

Identical outputs by construction (same base, same candidates, same
jaccard); the script asserts row-count equality once per SF dir.

Usage: python scripts/probe_minhash_slim_r13.py [pairs=5] <sf_dir>...
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.1"]

    from openmetrics_spark.llm.dedup import (
        _minhash_base,
        jaccard,
        lsh_band_keys,
        minhash_lsh_pairs,
    )
    from openmetrics_spark.session import get_spark
    from openmetrics_spark.tables import pin, release_caches, table

    spark = get_spark("probe-minhash-slim")
    table(spark, sf_dirs[0], "region").count()

    NUM_HASHES, BANDS, THRESHOLD, SEED, N = 32, 8, 0.5, 7, 3
    rows = NUM_HASHES // BANDS

    def slim_pairs(docs):
        base = pin(_minhash_base(docs, "doc_id", "text", N, NUM_HASHES, SEED))
        banded = base.select(
            "doc", F.explode(lsh_band_keys(F.col("sig"), BANDS, rows)).alias("bk")
        )
        cand = (
            banded.alias("x")
            .join(banded.alias("y"), "bk")
            .filter(F.col("x.doc") < F.col("y.doc"))
            .select(
                F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b")
            )
            .dropDuplicates(["doc_a", "doc_b"])
        )
        a = base.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
        b = base.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
        return (
            cand.join(a, "doc_a")
            .join(b, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias(
                    "jaccard"
                ),
            )
            .filter(F.col("jaccard") >= THRESHOLD)
        )

    def wide_pairs(docs):
        return minhash_lsh_pairs(
            docs, "doc_id", "text", n=N, num_hashes=NUM_HASHES,
            bands=BANDS, threshold=THRESHOLD, seed=SEED,
        )

    out = {}
    for sf_dir in sf_dirs:
        docs = lambda: table(spark, sf_dir, "documents").select(  # noqa: E731
            "doc_id", "text"
        )
        nw = wide_pairs(docs()).count()
        ns = slim_pairs(docs()).count()
        release_caches()
        assert nw == ns, f"{sf_dir}: wide {nw} != slim {ns}"

        def shot(fn) -> float:
            t0 = time.perf_counter()
            fn(docs()).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            release_caches()
            return round(dt, 3)

        shot(wide_pairs)
        shot(slim_pairs)  # warm both
        res = {"wide": [], "slim": []}
        for p in range(pairs):
            order = [("wide", wide_pairs), ("slim", slim_pairs)]
            if p % 2:
                order.reverse()
            for tag, fn in order:
                spark.sparkContext.setJobDescription(f"minhash:{tag}:{p}")
                res[tag].append(shot(fn))
        w, s = sorted(res["wide"]), sorted(res["slim"])
        out[sf_dir] = {
            "pairs_rows": nw,
            "wide_min": w[0], "slim_min": s[0],
            "wide_med": w[len(w) // 2], "slim_med": s[len(s) // 2],
            "wide_raw": res["wide"], "slim_raw": res["slim"],
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
