"""Recall of the approximate ANN paths against the exact baseline.

The DuckDB oracle (test_queries_oracle) proves each path computes what
it claims; these tests prove the approximations are USEFUL — that the
candidate pruning (LSH buckets / IVF cells) still surfaces most of the
true neighbors, and that multi-probe strictly widens single-probe LSH.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openmetrics_spark.llm.similarity import (
    brute_topk,
    ivf_topk,
    lsh_multiprobe_topk,
    lsh_topk,
)
from openmetrics_spark.tables import table


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_ann_recall_hierarchy(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    q_ids = emb.select("vec_id").filter(F.col("vec_id") < 10)
    exact = _pairs(brute_topk(emb, "vec_id", "embedding", q_ids, k=5))
    # planes=4 (16 buckets) is the right granularity for this tiny
    # corpus — at 100 TB you'd raise planes with corpus size; recall
    # here is about the method, measured at a matched bucket density.
    single = _pairs(lsh_topk(emb, "vec_id", "embedding", q_ids, k=5, planes=4))
    multi = _pairs(
        lsh_multiprobe_topk(emb, "vec_id", "embedding", q_ids, k=5, planes=4)
    )
    ivf = _pairs(ivf_topk(emb, "vec_id", "embedding", q_ids, k=5, nprobe=3))

    assert exact, "brute-force baseline returned nothing"
    # multi-probe candidates are a superset of single-probe candidates,
    # so its recall vs exact can only be >= single-probe's
    recall_single = len(single & exact) / len(exact)
    recall_multi = len(multi & exact) / len(exact)
    recall_ivf = len(ivf & exact) / len(exact)
    assert recall_multi >= recall_single
    # measured on the fixed synthetic corpus: 0.64 multi-probe (vs
    # 0.14 single-probe) and 0.94 ivf; thresholds leave headroom
    assert recall_multi >= 0.5, f"multi-probe recall {recall_multi:.2f}"
    assert recall_ivf >= 0.7, f"ivf recall {recall_ivf:.2f}"


def test_planted_recall_floors(spark, sf_dir):
    """The planted-neighbor recall gate (r8 verdict #4): on the
    augmented corpus where each query's true top-5 are its planted
    perturbed copies (cos ≥ 0.93, far above any organic neighbor),
    recall is ACHIEVABLE — so floors are meaningful. Measured on the
    fixed corpus: multiprobe 0.90 (sf0.001) / 0.86 (sf0.01), single
    0.56 / 0.60; thresholds leave headroom."""
    from openmetrics_spark.queries.docs_q import ann_lsh_recall

    rows = ann_lsh_recall(spark, sf_dir).collect()
    by_method: dict[str, list[float]] = {}
    for r in rows:
        by_method.setdefault(r["method"], []).append(r["recall"])
    mean = {m: sum(v) / len(v) for m, v in by_method.items()}
    assert mean["multiprobe"] >= 0.8, f"multiprobe planted recall {mean}"
    assert mean["lsh"] >= 0.4, f"single-probe planted recall {mean}"
    assert mean["multiprobe"] >= mean["lsh"]


def test_ivf_assignment_is_total(spark, sf_dir):
    """Every vector lands in exactly one cell and every query probes
    exactly nprobe cells (the join fan-out the plan promises)."""
    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()
    q_ids = emb.select("vec_id").filter(F.col("vec_id") < 3)
    out = ivf_topk(emb, "vec_id", "embedding", q_ids, k=n, n_cells=4, nprobe=4)
    # nprobe == n_cells -> no pruning -> must equal brute force exactly
    exact = brute_topk(emb, "vec_id", "embedding", q_ids, k=n)
    assert _pairs(out) == _pairs(exact)


def test_dot_fixed_matches_hof_dot(spark):
    """dot_fixed must reproduce the zip_with/aggregate fold's double
    BIT-FOR-BIT (same left-to-right association from 0.0) — the
    contract that lets the codegen path replace the HOF path under
    hash-compared oracles."""
    from pyspark.sql import functions as F

    from openmetrics_spark.llm.similarity import cosine, cosine_fixed, dot, dot_fixed

    rows = [
        (1, [0.1, -2.5, 3.75, 0.003, 9.0, -0.125, 7.5, 1e-7]),
        (2, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]),
        (3, [-0.333, 0.999, -1e-3, 2.5e4, 0.0, -8.25, 3.14159, 2.71828]),
    ]
    df = spark.createDataFrame(rows, "id LONG, v ARRAY<DOUBLE>")
    a = df.alias("a")
    b = df.alias("b")
    pairs = a.crossJoin(b).select(
        dot(F.col("a.v"), F.col("b.v")).alias("hof"),
        dot_fixed(F.col("a.v"), F.col("b.v"), 8).alias("idx"),
        cosine(F.col("a.v"), F.col("b.v")).alias("chof"),
        cosine_fixed(F.col("a.v"), F.col("b.v"), 8).alias("cidx"),
    )
    for r in pairs.collect():
        assert r.hof == r.idx, (r.hof, r.idx)
        assert r.chof == r.cidx, (r.chof, r.cidx)


def test_pq_codes_compress_and_cover(spark, sf_dir):
    """PQ invariants: every vector gets exactly one code per subspace,
    each subspace uses at most K distinct codewords (the codebook is
    real — a degenerate fit collapsing to one codeword would also fail
    the >1 check), and the representation is 4 small ids per 64-dim
    vector."""
    from pyspark.sql import functions as F

    from openmetrics_spark.queries.docs_q import (
        _PQ_K,
        _PQ_M,
        embedding_pq_codes,
    )
    from openmetrics_spark.tables import table

    codes = embedding_pq_codes(spark, sf_dir)
    n_vec = table(spark, sf_dir, "embeddings").count()
    assert codes.count() == n_vec
    assert len(codes.columns) == 1 + _PQ_M
    for m in range(_PQ_M):
        k = codes.select(f"code_{m}").distinct().count()
        assert 1 < k <= _PQ_K, (m, k)


def test_pq_adc_recall_vs_exact(spark, sf_dir):
    """ADC recall@5 against exact brute-force cosine. The synthetic
    embeddings are near-uniform (neighbors barely separate — the
    single-probe LSH query's recall on the same data is ~0.04), so the
    bar is RELATIVE, not absolute: ADC must beat random top-5 overlap
    (~0.01 at 500 candidates) by an order of magnitude, which on real
    clustered embeddings corresponds to the usual usable-PQ regime.
    The exact path remains ann_brute_topk."""
    from openmetrics_spark.queries.docs_q import (
        ann_brute_topk,
        ann_pq_adc_topk,
    )

    exact = {}
    for r in ann_brute_topk(spark, sf_dir).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    adc = {}
    for r in ann_pq_adc_topk(spark, sf_dir).collect():
        adc.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(adc) == set(exact)
    hits = sum(len(adc[q] & exact[q]) for q in exact)
    total = sum(len(v) for v in exact.values())
    recall = hits / total
    assert recall >= 0.1, recall


def test_incremental_assign_freezes_standing_cells(spark, sf_dir):
    """Index maintenance must NOT move standing vectors: the standing
    assignment equals a plain kmeans_assign over the same training
    half, and every incoming vector lands in an existing cell."""
    from pyspark.sql import functions as F

    from openmetrics_spark.llm.cluster import kmeans_assign, kmeans_assign_new
    from openmetrics_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    train = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    standing, incoming = kmeans_assign_new(
        train, new, "vec_id", "embedding", k=8, iters=3, dim=64
    )
    plain = kmeans_assign(train, "vec_id", "embedding", k=8, iters=3, dim=64)
    got = sorted((r.vid, r.cell) for r in standing.collect())
    want = sorted((r.vid, r.cell) for r in plain.collect())
    assert got == want, "maintenance moved standing vectors"
    inc = incoming.collect()
    assert inc, "no incoming vectors assigned"
    assert len(inc) == new.count(), "incoming assignment dropped vectors"
    assert all(r.cell is not None for r in inc)
    # the exact per-vector cells are pinned by the driver oracle's
    # assign_hash; here pin the distribution shape: incoming spreads
    # over more than one standing cell (a degenerate all-one-cell
    # assignment would signal a broken nearest pick)
    assert len({r.cell for r in inc}) > 1
