"""Distributed k-means clustering over embedding columns.

Spherical Lloyd iterations expressed as DataFrame ops, using the same
bounded-driver-state pattern as MLlib's KMeans (and this repo's IVF
coarse quantizer, ``llm/similarity.py``): per iteration the k×dim
centroid table is collected to the driver and inlined as literals, so
cell ASSIGNMENT is a narrow projection — the big table never
shuffles — and the centroid RECOMPUTE is one map-side-combined
aggregate of dim integer sums.

Exactness design (what makes an exact SQL oracle possible for an
iterative float algorithm):

- vectors are quantized to integers (``round(x * 1000)``) before any
  arithmetic, so per-cell centroid sums are EXACT — no float
  summation-order drift between engines or between retries;
- cosine is scale-invariant, so centroids are kept as the raw integer
  sums (never divided by the member count): every input to the
  assignment's cosine is an integer-valued double and the argmax is
  deterministic down to the last bit;
- ties break to the highest centroid id, mirroring the IVF oracle's
  ``ORDER BY cos DESC, cid DESC`` convention.

At 100 TB: each iteration reads the (pruned) vector column once,
keeps k×dim longs of driver state, and shuffles only the k×(dim+1)
partial-agg rows — the textbook scalable Lloyd layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openmetrics_spark.llm.similarity import cosine

QUANT = 1000


def quantized(vec: Column) -> Column:
    """Integer-quantized copy of a float vector (exact across engines:
    float→double is exact, ×1000 is one correctly-rounded op, and
    round-half cases cannot occur because (2n+1)/2000 is not dyadic)."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * QUANT).cast("long")
    )


def _nearest(v: Column, cents: list[tuple[int, list[int]]]) -> Column:
    scored = F.array(
        *[
            F.struct(
                cosine(v, F.array(*[F.lit(float(x)) for x in cv])).alias("cos"),
                F.lit(int(cid)).cast("long").alias("cid"),
            )
            for cid, cv in cents
        ]
    )
    # array_sort ascending by (cos, cid); reverse → cos desc, cid desc
    return F.reverse(F.array_sort(scored))[0]["cid"]


def kmeans_assign(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    dim: int | None = None,
) -> DataFrame:
    """Run ``iters`` Lloyd iterations (init: the k lowest-id vectors)
    and return the final (id, cell) assignment. Cells that lose all
    members simply drop out of the next iteration's centroid set —
    the oracle reproduces that by construction."""
    if dim is None:
        dim = len(
            embeddings.select(F.col(vec_col).alias("v")).first()["v"]
        )
    base = embeddings.select(
        F.col(id_col).alias("vid"), quantized(F.col(vec_col)).alias("qv")
    ).withColumn("v", F.transform("qv", lambda x: x.cast("double")))

    cents = [
        (r["vid"], [int(x) for x in r["qv"]])
        for r in base.select("vid", "qv").orderBy("vid").limit(k).collect()
    ]
    assigned = None
    for it in range(iters):
        assigned = base.withColumn("cell", _nearest(F.col("v"), cents))
        if it == iters - 1:
            break  # the final assignment needs no centroid recompute
        sums = (
            assigned.groupBy("cell")
            .agg(*[F.sum(F.col("qv")[i]).alias(f"s{i}") for i in range(dim)])
            .collect()
        )
        cents = [
            (r["cell"], [int(r[f"s{i}"]) for i in range(dim)]) for r in sums
        ]
    return assigned.select("vid", F.col("cell").cast("long").alias("cell"))
