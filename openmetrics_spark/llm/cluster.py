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


def _lloyd(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int,
    dim: int | None,
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """Run ``iters`` Lloyd iterations (init: the k lowest-id vectors).
    Returns (final assignment DF with vid/qv/v/cell, the centroids the
    final assignment was scored against). Cells that lose all members
    simply drop out of the next iteration's centroid set — the oracle
    reproduces that by construction."""
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
    assigned = base
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
    return assigned, cents


def kmeans_assign(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    dim: int | None = None,
) -> DataFrame:
    """Final (id, cell) assignment after ``iters`` Lloyd iterations."""
    assigned, _ = _lloyd(embeddings, id_col, vec_col, k, iters, dim)
    return assigned.select("vid", F.col("cell").cast("long").alias("cell"))


def kmeans_assign_new(
    train: DataFrame,
    new: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    dim: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Index MAINTENANCE: train the codebook on ``train`` only, then
    assign ``new`` vectors against the standing centroids WITHOUT
    retraining — the operational shape of every IVF/cell index as data
    arrives (a retrain would move every standing vector's cell and
    force a full index rebuild). Returns (standing assignment, new
    assignment), both (vid, cell). 100 TB: the centroids are k x dim
    longs of driver state (the MLlib pattern); assigning the incoming
    batch is a narrow join-free projection over that broadcast, linear
    in the batch."""
    assigned, cents = _lloyd(train, id_col, vec_col, k, iters, dim)
    base = new.select(
        F.col(id_col).alias("vid"), quantized(F.col(vec_col)).alias("qv")
    ).withColumn("v", F.transform("qv", lambda x: x.cast("double")))
    newa = base.withColumn("cell", _nearest(F.col("v"), cents))
    return (
        assigned.select("vid", F.col("cell").cast("long").alias("cell")),
        newa.select("vid", F.col("cell").cast("long").alias("cell")),
    )


def kmeans_ivf_topk(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    iters: int = 3,
    nprobe: int = 3,
    dim: int | None = None,
) -> DataFrame:
    """IVF approximate top-k over the k-means cells: a query scores
    only vectors whose cell is one of its ``nprobe`` nearest centroids
    (by cosine, ties to the higher cell id). Same probe plumbing as
    ``llm/similarity.ivf_topk``, but with trained centroids instead of
    the lowest-id stand-in — candidate generation stays a bucketed
    equi-join; the only cross product is against the tiny broadcast
    query side."""
    assigned, cents = _lloyd(embeddings, id_col, vec_col, n_cells, iters, dim)

    def probe_cells(v: Column, take: int) -> Column:
        scored = F.array(
            *[
                F.struct(
                    cosine(v, F.array(*[F.lit(float(x)) for x in cv])).alias("cos"),
                    F.lit(int(cid)).cast("long").alias("cid"),
                )
                for cid, cv in cents
            ]
        )
        ordered = F.reverse(F.array_sort(scored))
        return F.slice(F.transform(ordered, lambda s: s["cid"]), 1, take)

    q = (
        assigned.join(
            query_ids.select(F.col(query_ids.columns[0]).alias("vid")),
            "vid",
            "left_semi",
        )
        .select(
            F.col("vid").alias("query_id"),
            F.col("v").alias("qv2"),
            F.explode(probe_cells(F.col("v"), nprobe)).alias("cell"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("raw_cos").desc(), F.col("neighbor_id")
    )
    return (
        assigned.join(F.broadcast(q), "cell")
        .filter(F.col("vid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            cosine(F.col("qv2"), F.col("v")).alias("raw_cos"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "neighbor_id",
            F.round("raw_cos", 6).alias("cos"),
        )
    )
