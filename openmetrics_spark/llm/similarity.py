"""Similarity search over embedding columns (array<float>).

- ``brute_topk``: exact top-k cosine neighbors for a (small) query
  set: broadcast the queries, one pass over the candidate table, per
  query a TakeOrdered-style window. The baseline and the verifier for
  the approximate paths.
- ``lsh_topk``: random-hyperplane LSH — bucket vectors by the sign
  pattern of dot products with fixed hyperplanes; only same-bucket
  candidates are scored. At 100 TB the bucket join replaces the cross
  product; recall is tunable by planes/probes.

Dot products use ``zip_with`` + ``aggregate`` higher-order functions —
JVM-side, no Python. Cast to double FIRST so the sum order and
precision are reproducible by SQL oracles (same left-to-right fold).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dvec(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """By-index dot product for a KNOWN dimension — a flat dim-term
    arithmetic expression that stays in whole-stage codegen, where
    ``dot``'s zip_with/aggregate lambdas evaluate interpreted per
    element. Bit-identical to ``dot``: the fold adds the products
    left-to-right from 0.0, and 0.0 + p0 == p0 exactly, so the
    left-associated sum here reproduces the same double at every
    step (parity-pinned in tests/test_similarity.py).

    USE WITH CARE: only for a handful of dot products per plan. An
    A/B that swapped it into the k-centroid fan-outs (k × dim ≈ 512+
    expression terms, literal centroid arrays repeated per term)
    regressed k-means 3.3 s → 22.6 s and trained-IVF to 92 s at
    sf0.1 — Catalyst analysis/codegen cost grows superlinearly with
    the expression tree, dwarfing the interpreted-fold savings. The
    HOF ``dot``/``cosine`` remain the right form for centroid fans;
    this is the right form for one or two fixed-dim products."""
    out = a[0] * b[0]
    for i in range(1, dim):
        out = out + a[i] * b[i]
    return out


def cosine_fixed(a: Column, b: Column, dim: int) -> Column:
    """Codegen cosine for a known dimension; with a literal array on
    either side, Catalyst constant-folds that side's norm at plan
    time (same double ops, same value)."""
    return dot_fixed(a, b, dim) / (
        F.sqrt(dot_fixed(a, a, dim)) * F.sqrt(dot_fixed(b, b, dim))
    )


def brute_topk(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: DataFrame,
    k: int = 5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors (excluding self) for every id in
    ``query_ids`` (a one-column DF of ids). Queries are broadcast —
    the big side streams through unshuffled; the only shuffle is the
    per-query top-k (tiny). ``candidates`` restricts the searched side
    (filtered vector search — e.g. a metadata predicate pre-applied);
    queries always resolve against the full ``embeddings`` frame."""
    q = (
        embeddings.join(query_ids, on=id_col, how="left_semi")
        .select(F.col(id_col).alias("query_id"), _dvec(F.col(vec_col)).alias("qv"))
    )
    c = (embeddings if candidates is None else candidates).select(
        F.col(id_col).alias("neighbor_id"), _dvec(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round(F.col("cos"), 6).alias("cos"),
        )
    )


def hyperplanes(dim: int, planes: int, seed: int = 11) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG-driven,
    library-free so any oracle can regenerate them)."""
    out = []
    state = seed
    for _ in range(planes):
        v = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            # uniform in [-1, 1)
            v.append((state / float(1 << 62)) - 1.0)
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        out.append([x / n for x in v])
    return out


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id (long) of a vector vs the hyperplanes."""
    acc = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        acc = acc + F.when(dot(vec, plane) > 0, F.lit(1 << i).cast("long")).otherwise(0)
    return acc


def lsh_topk(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: DataFrame,
    k: int = 5,
    planes: int = 8,
    dim: int = 64,
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing the query's
    LSH bucket. One equi-join on bucket id instead of a cross join."""
    hp = hyperplanes(dim, planes, seed)
    base = embeddings.select(
        F.col(id_col).alias("vid"), _dvec(F.col(vec_col)).alias("v")
    ).withColumn("bucket", lsh_bucket(F.col("v"), hp))
    q = base.join(
        query_ids.select(F.col(query_ids.columns[0]).alias("vid")), "vid", "left_semi"
    ).select(
        F.col("vid").alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    scored = (
        base.join(F.broadcast(q), "bucket")
        .filter(F.col("vid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
    )


def lsh_multiprobe_topk(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: DataFrame,
    k: int = 5,
    planes: int = 8,
    dim: int = 64,
    seed: int = 11,
) -> DataFrame:
    """Multi-probe variant of ``lsh_topk``: each query probes its own
    bucket PLUS every single-bit-flip neighbor bucket (``planes`` + 1
    probes), recovering most of the recall lost to unlucky sign flips
    without adding hash tables. Candidates are still found by one equi
    hash join — the query side just carries ``planes + 1`` rows per
    query (exploded JVM-side), all broadcast. A stored vector lives in
    exactly one bucket and the probe set is distinct, so no candidate
    dedup is needed before ranking."""
    hp = hyperplanes(dim, planes, seed)
    base = embeddings.select(
        F.col(id_col).alias("vid"), _dvec(F.col(vec_col)).alias("v")
    ).withColumn("bucket", lsh_bucket(F.col("v"), hp))
    probe_set = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
            for i in range(planes)
        ],
    )
    q = (
        base.join(
            query_ids.select(F.col(query_ids.columns[0]).alias("vid")),
            "vid",
            "left_semi",
        )
        .select(
            F.col("vid").alias("query_id"),
            F.col("v").alias("qv"),
            F.explode(probe_set).alias("bucket"),
        )
    )
    scored = (
        base.join(F.broadcast(q), "bucket")
        .filter(F.col("vid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
    )


def ivf_topk(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 3,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the vector
    space into ``n_cells`` coarse cells, assign every vector to its
    nearest centroid, and score a query only against the ``nprobe``
    cells nearest to it.

    The coarse quantizer here takes the ``n_cells`` lowest-id vectors
    as centroids — a deterministic stand-in for the sampled k-means a
    production build would run (the assignment/probe plumbing is
    identical either way, and determinism lets a SQL oracle rebuild
    the exact same cells). Centroids are bounded driver state
    (``n_cells`` rows, exactly like MLlib k-means iterations), inlined
    as literals so cell assignment is a NARROW projection — the big
    table never shuffles; the only shuffle is the tiny per-query
    top-k."""
    centroids = [
        (r["cid"], [float(x) for x in r["cv"]])
        for r in embeddings.select(
            F.col(id_col).alias("cid"), _dvec(F.col(vec_col)).alias("cv")
        )
        .orderBy("cid")
        .limit(n_cells)
        .collect()
    ]

    def nearest_cells(vec: Column, take: int) -> Column:
        # array of (cos, cid) structs -> sort desc -> first `take` cids
        scored = F.array(
            *[
                F.struct(
                    cosine(vec, F.array(*[F.lit(x) for x in cv])).alias("cos"),
                    F.lit(cid).cast("long").alias("cid"),
                )
                for cid, cv in centroids
            ]
        )
        ordered = F.reverse(F.array_sort(scored))
        return F.slice(F.transform(ordered, lambda s: s["cid"]), 1, take)

    base = embeddings.select(
        F.col(id_col).alias("vid"), _dvec(F.col(vec_col)).alias("v")
    )
    assigned = base.withColumn("cell", nearest_cells(F.col("v"), 1)[0])
    q = (
        base.join(
            query_ids.select(F.col(query_ids.columns[0]).alias("vid")),
            "vid",
            "left_semi",
        )
        .select(
            F.col("vid").alias("query_id"),
            F.col("v").alias("qv"),
            F.explode(nearest_cells(F.col("v"), nprobe)).alias("cell"),
        )
    )
    scored = (
        assigned.join(F.broadcast(q), "cell")
        .filter(F.col("vid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("v")).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
    )
