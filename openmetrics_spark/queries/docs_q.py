"""Training-data-pipeline queries over ``documents`` and
``embeddings`` — the beyond-reference operator set (dedup, text
analysis, similarity search) designed for 100 TB corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openmetrics_spark.llm.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
)
from openmetrics_spark.llm.similarity import brute_topk, cosine, _dvec
from openmetrics_spark.llm.text import (
    LANG_MARKERS,
    fingerprint,
    marker_hits,
    quality_score,
    token_count,
    tokens,
    unique_token_count,
)
from openmetrics_spark.queries import register
from openmetrics_spark.tables import pin, spread_for_compute, table

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

_EXACT_DEDUP_ORACLE = """
SELECT md5(text) AS text_hash, min(doc_id) AS canonical_id,
       count(*) AS n_rows
FROM documents
GROUP BY 1
"""


@register("doc_exact_dedup", oracle=_EXACT_DEDUP_ORACLE, tags=("llm", "dedup"))
def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one shuffle of (hash, id) pairs; canonical = min id."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    return (
        docs.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("n_rows"))
    )


# ---------------------------------------------------------------------------
# token stats / quality
# ---------------------------------------------------------------------------

_STOP_SQL = "['the','and','of','to','a','in','is','that','it','for','on','with','as','this']"

_TOKEN_STATS_ORACLE = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
)
SELECT doc_id,
       CAST(len(tok) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(tok)) AS BIGINT) AS n_unique,
       round(
         0.5 * (CASE WHEN len(tok) > 0
                     THEN CAST(len(list_distinct(tok)) AS DOUBLE) / len(tok)
                     ELSE 0 END)
         + 0.5 * least(
             (CASE WHEN len(tok) > 0
                   THEN CAST(len(list_filter(tok, x -> list_contains({_STOP_SQL}, x))) AS DOUBLE) / len(tok)
                   ELSE 0 END) * 5, 1.0),
         6) AS quality
FROM t
"""


@register("doc_token_stats", oracle=_TOKEN_STATS_ORACLE, headline=True, tags=("llm", "text"))
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring, all JVM-side expressions.
    Tokenization is materialized in its own projection so the regexp
    runs once per row — CollapseProject keeps non-cheap expressions
    out of the downstream consumers instead of re-inlining them."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", tokens("text").alias("tok"))
    tok = F.col("tok")
    return t.select(
        "doc_id",
        token_count(tok).alias("n_tokens"),
        unique_token_count(tok).alias("n_unique"),
        quality_score("text", tok).alias("quality"),
    )


# ---------------------------------------------------------------------------
# language-ID scoring
# ---------------------------------------------------------------------------


def _lang_sql_list(lang: str) -> str:
    return "[" + ",".join(f"'{m}'" for m in LANG_MARKERS[lang]) + "]"


_LANG_ORACLE = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), h AS (
  SELECT doc_id,
    CAST(len(list_filter(tok, x -> list_contains({_lang_sql_list('en')}, x))) AS BIGINT) AS en_hits,
    CAST(len(list_filter(tok, x -> list_contains({_lang_sql_list('de')}, x))) AS BIGINT) AS de_hits,
    CAST(len(list_filter(tok, x -> list_contains({_lang_sql_list('fr')}, x))) AS BIGINT) AS fr_hits,
    CAST(len(list_filter(tok, x -> list_contains({_lang_sql_list('es')}, x))) AS BIGINT) AS es_hits
  FROM t
)
SELECT doc_id, en_hits, de_hits, fr_hits, es_hits,
  CASE WHEN en_hits >= greatest(de_hits, fr_hits, es_hits) THEN 'en'
       WHEN de_hits >= greatest(fr_hits, es_hits) THEN 'de'
       WHEN fr_hits >= es_hits THEN 'fr'
       ELSE 'es' END AS guess
FROM h
"""


@register("doc_lang_guess", oracle=_LANG_ORACLE, tags=("llm", "text"))
def doc_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language voting (n-gram-heuristic language ID).
    Ties break by the fixed priority en > de > fr > es."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", tokens("text").alias("tok"))
    tok = F.col("tok")
    h = t.select(
        "doc_id",
        marker_hits(tok, LANG_MARKERS["en"]).alias("en_hits"),
        marker_hits(tok, LANG_MARKERS["de"]).alias("de_hits"),
        marker_hits(tok, LANG_MARKERS["fr"]).alias("fr_hits"),
        marker_hits(tok, LANG_MARKERS["es"]).alias("es_hits"),
    )
    guess = (
        F.when(
            F.col("en_hits")
            >= F.greatest("de_hits", "fr_hits", "es_hits"),
            "en",
        )
        .when(F.col("de_hits") >= F.greatest("fr_hits", "es_hits"), "de")
        .when(F.col("fr_hits") >= F.col("es_hits"), "fr")
        .otherwise("es")
    )
    return h.withColumn("guess", guess)


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------

_FP_ORACLE = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
)
SELECT doc_id,
       CAST(('0x' || substr(md5(array_to_string(tok[1:64], ' ')), 1, 15)) AS BIGINT) AS fp
FROM t
"""


@register("doc_fingerprint", oracle=_FP_ORACLE, tags=("llm", "text"))
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalized 64-token-prefix fingerprint (rolling-hash family)."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    return docs.select("doc_id", fingerprint("text", 64).alias("fp"))


# ---------------------------------------------------------------------------
# distributed k-means (spherical Lloyd, exact-integer centroid sums)
# ---------------------------------------------------------------------------

_KM_K, _KM_ITERS, _KM_DIM = 8, 3, 64


def _kmeans_ctes_for(
    pref: str,
    k: int,
    iters: int,
    dim: int,
    vec_expr: str = "embedding",
    where: str = "",
) -> list[str]:
    """Unrolled Lloyd iterations as CTEs — they replay the exact
    integer/double op sequence of llm/cluster.py. The final assignment
    is {pref}a{iters}; the centroids it was scored against are
    {pref}c{iters-1}. ``pref`` namespaces the chain so several
    codebooks (e.g. PQ subspaces over ``embedding[lo:hi]`` slices) can
    coexist in one oracle."""
    sums = ", ".join(
        f"CAST(sum(qv[{i + 1}]) AS DOUBLE)" for i in range(dim)
    )
    parts = [
        f"""{pref}e AS (
  SELECT vec_id,
         list_transform({vec_expr},
           x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM embeddings{where}
), {pref}d AS (
  SELECT vec_id, list_transform(qv, x -> CAST(x AS DOUBLE)) AS v FROM {pref}e
), {pref}c0 AS (
  SELECT vec_id AS cid, v AS cv FROM {pref}d ORDER BY vec_id LIMIT {k}
)"""
    ]
    prev = f"{pref}c0"
    for it in range(1, iters + 1):
        parts.append(
            f"""{pref}a{it} AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT d.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY d.vec_id
             ORDER BY list_cosine_similarity(d.v, c.cv) DESC, c.cid DESC
           ) AS rn
    FROM {pref}d d CROSS JOIN {prev} c
  ) WHERE rn = 1
)"""
        )
        if it < iters:
            parts.append(
                f"""{pref}c{it} AS (
  SELECT cell AS cid, list_value({sums}) AS cv
  FROM {pref}a{it} JOIN {pref}e USING (vec_id) GROUP BY cell
)"""
            )
            prev = f"{pref}c{it}"
    return parts


def _kmeans_ctes() -> list[str]:
    return _kmeans_ctes_for("", _KM_K, _KM_ITERS, _KM_DIM, "embedding")


_KMEANS_ORACLE = (
    "WITH "
    + ", ".join(_kmeans_ctes())
    + f"\nSELECT vec_id, CAST(cell AS BIGINT) AS cell FROM a{_KM_ITERS}"
)


_KM_NPROBE, _KM_TOPK = 3, 5

_KMEANS_IVF_ORACLE = (
    "WITH "
    + ", ".join(_kmeans_ctes())
    + f""", q AS (
  SELECT vec_id AS query_id, v AS qv2 FROM d WHERE vec_id < 10
), probes AS (
  SELECT query_id, cid AS cell FROM (
    SELECT q.query_id, c.cid,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qv2, c.cv) DESC, c.cid DESC
           ) AS rn
    FROM q CROSS JOIN c{_KM_ITERS - 1} c
  ) WHERE rn <= {_KM_NPROBE}
), cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN a{_KM_ITERS} a ON a.cell = p.cell
  WHERE a.vec_id != p.query_id
), s AS (
  SELECT query_id, neighbor_id, list_cosine_similarity(q.qv2, d.v) AS raw_cos
  FROM cand JOIN q USING (query_id) JOIN d ON d.vec_id = neighbor_id
)
SELECT query_id, rank, neighbor_id, cos FROM (
  SELECT query_id, neighbor_id, round(raw_cos, 6) AS cos,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY raw_cos DESC, neighbor_id
         ) AS BIGINT) AS rank
  FROM s
) WHERE rank <= {_KM_TOPK}"""
)


@register("ann_ivf_kmeans_topk", oracle=_KMEANS_IVF_ORACLE, tags=("llm", "similarity"))
def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k over TRAINED k-means cells (vs ann_ivf_topk's
    lowest-id coarse quantizer): each query probes its 3 nearest
    centroids and scores only those cells' members. Candidate
    generation is a bucketed equi-join against a broadcast query side;
    the big table shuffles nowhere."""
    from openmetrics_spark.llm.cluster import kmeans_ivf_topk

    emb = spread_for_compute(table(spark, sf_dir, "embeddings"))
    queries = emb.select("vec_id").filter(F.col("vec_id") < 10)
    return kmeans_ivf_topk(
        emb, "vec_id", "embedding", queries,
        k=_KM_TOPK, n_cells=_KM_K, iters=_KM_ITERS, nprobe=_KM_NPROBE,
        dim=_KM_DIM,
    )


_OUTLIERS_PER_CELL = 3

_KMEANS_OUTLIER_ORACLE = (
    "WITH "
    + ", ".join(_kmeans_ctes())
    + f""", sc AS (
  SELECT a.vec_id, a.cell,
         list_cosine_similarity(d.v, c.cv) AS cos_c
  FROM a{_KM_ITERS} a
  JOIN d ON d.vec_id = a.vec_id
  JOIN c{_KM_ITERS - 1} c ON c.cid = a.cell
)
SELECT vec_id, CAST(cell AS BIGINT) AS cell,
       round(cos_c, 6) AS centroid_cos, rank
FROM (
  SELECT vec_id, cell, cos_c,
         CAST(row_number() OVER (
           PARTITION BY cell ORDER BY cos_c, vec_id
         ) AS BIGINT) AS rank
  FROM sc
) WHERE rank <= {_OUTLIERS_PER_CELL}"""
)


@register("embedding_outliers", oracle=_KMEANS_OUTLIER_ORACLE, tags=("llm", "similarity"))
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QA: the {n} vectors per k-means cell FARTHEST from
    their own centroid (lowest cosine) — the corrupt-embedding /
    out-of-distribution screen a pipeline runs before vectors feed
    retrieval or dedup. The per-vector centroid cosine is the argmax
    the assignment already computed; ranking happens per cell over a
    handful of candidates. Integer-exact like the rest of the kmeans
    family, so the oracle replays it bit-for-bit."""
    from openmetrics_spark.llm.cluster import _lloyd
    from openmetrics_spark.llm.similarity import cosine

    emb = spread_for_compute(table(spark, sf_dir, "embeddings"))
    assigned, cents = _lloyd(
        emb, "vec_id", "embedding", _KM_K, _KM_ITERS, _KM_DIM
    )
    # CASE chain over the (bounded) centroid set: each row's cosine to
    # its OWN cell's centroid
    expr = None
    for cid, cv in cents:
        leg = cosine(F.col("v"), F.array(*[F.lit(float(x)) for x in cv]))
        expr = (
            F.when(F.col("cell") == int(cid), leg)
            if expr is None
            else expr.when(F.col("cell") == int(cid), leg)
        )
    w = Window.partitionBy("cell").orderBy(F.col("cos_c"), F.col("vid"))
    return (
        assigned.select(
            "vid", F.col("cell").cast("long").alias("cell"), expr.alias("cos_c")
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _OUTLIERS_PER_CELL)
        .select(
            F.col("vid").alias("vec_id"),
            "cell",
            F.round("cos_c", 6).alias("centroid_cos"),
            "rank",
        )
    )


@register("embedding_kmeans_cells", oracle=_KMEANS_ORACLE, tags=("llm", "similarity"))
def embedding_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed spherical k-means (k=8, 3 Lloyd iterations) over the
    embedding table — the real coarse quantizer behind an IVF index
    (upgrading ann_ivf_topk's lowest-id stand-in). Assignment is a
    narrow projection against driver-inlined centroids (MLlib's
    pattern); recompute is one map-side-combined aggregate; integer
    quantization + scale-invariant cosine keep every op exact, which
    is what lets a SQL oracle replay an ITERATIVE float algorithm."""
    from openmetrics_spark.llm.cluster import kmeans_assign

    emb = spread_for_compute(table(spark, sf_dir, "embeddings"))
    return kmeans_assign(
        emb, "vec_id", "embedding", k=_KM_K, iters=_KM_ITERS, dim=_KM_DIM
    ).select(F.col("vid").alias("vec_id"), "cell")


# ---------------------------------------------------------------------------
# BM25 keyword retrieval
# ---------------------------------------------------------------------------

# Every scalar feeding the score is an exact integer (tf, df, N,
# sum-of-lengths) so both engines perform the identical sequence of
# IEEE double ops; the per-term sum is pivoted into a FIXED addition
# order (sum order over a groupBy is nondeterministic and doubles
# don't associate). That makes the scores bit-equal across engines
# before the defensive round.

_BM25_TERMS = ("spark", "join", "window")
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)
_BM25_FIXED_SUM_SQL = " + ".join(
    f"coalesce(max(CASE WHEN term = '{t}' THEN s END), 0)" for t in _BM25_TERMS
)

_BM25_ORACLE = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), l AS (
  SELECT doc_id, CAST(len(tok) AS BIGINT) AS dl FROM t
), st AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sl FROM l
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(tok) AS term FROM t) u
  WHERE term IN ({_BM25_TERMS_SQL})
  GROUP BY 1, 2
), dfq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
), sc AS (
  SELECT tf.doc_id, tf.term,
    ln((st.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
      * (tf.tf * (1.2 + 1.0))
      / (tf.tf + 1.2 * (0.25 + 0.75 * l.dl / (CAST(st.sl AS DOUBLE) / st.n))) AS s
  FROM tf JOIN dfq USING (term) JOIN l USING (doc_id) CROSS JOIN st
), pd AS (
  SELECT doc_id, {_BM25_FIXED_SUM_SQL} AS score FROM sc GROUP BY 1
)
SELECT doc_id, round(score, 6) AS bm25,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
FROM pd
QUALIFY rank <= 20
"""


@register("doc_bm25_topk", oracle=_BM25_ORACLE, tags=("llm", "text", "similarity"))
def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) keyword retrieval: top-20 documents for a
    fixed conjunctive query. The token stream is filtered to the query
    terms BEFORE the (doc, term) groupBy, so only matching postings
    shuffle; df and the corpus stats are broadcast one-row/3-row
    frames. At 100 TB the heavy pass is one map-side-combined count
    over the filtered postings — the classic inverted-index build."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", tokens("text").alias("tok"))
    lens = t.select("doc_id", F.size("tok").cast("long").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sl")
    )
    tf = (
        t.select("doc_id", F.explode("tok").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfq), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            (
                F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
                * (F.col("tf") * (1.2 + 1.0))
                / (
                    F.col("tf")
                    + 1.2
                    * (0.25 + 0.75 * F.col("dl") / (F.col("sl").cast("double") / F.col("n")))
                )
            ).alias("s"),
        )
    )
    fixed_sum = None
    for w in _BM25_TERMS:
        leg = F.coalesce(F.max(F.when(F.col("term") == w, F.col("s"))), F.lit(0.0))
        fixed_sum = leg if fixed_sum is None else fixed_sum + leg
    pd_ = scored.groupBy("doc_id").agg(fixed_sum.alias("score"))
    # TakeOrderedAndProject first (per-partition top-20 → merge), THEN
    # rank the 20 survivors: an unpartitioned row_number window over
    # all matching docs would single-partition the whole match set
    top = pd_.orderBy(F.col("score").desc(), F.col("doc_id")).limit(20)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.select(
        "doc_id",
        F.round("score", 6).alias("bm25"),
        F.row_number().over(w).cast("long").alias("rank"),
    )


# ---------------------------------------------------------------------------
# PII scrub (emails / IPv4 / phones → typed redaction tokens)
# ---------------------------------------------------------------------------

# The synthetic corpus is word-soup with no natural identifiers, so the
# query first injects deterministic PII footers derived from doc_id —
# the SAME construction in both engines — then counts and scrubs them.
# Counting is staged in scrub order (emails first, then IPs on the
# email-scrubbed text, then phones on the IP-scrubbed text) so an IP's
# digit run is never double-counted as a phone number.

from openmetrics_spark.llm.text import PII_EMAIL, PII_IPV4, PII_PHONE, scrub_pii

_PII_ORACLE = f"""
WITH aug AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 3 = 0
            THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
            ELSE '' END
    || CASE WHEN doc_id % 4 = 0
            THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
                 || '.0.' || CAST(doc_id % 250 AS VARCHAR)
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' call +1 555-0' || CAST(doc_id % 90 + 10 AS VARCHAR)
            ELSE '' END AS t
  FROM documents
), s1 AS (
  SELECT doc_id, t, regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g') AS e
  FROM aug
), s2 AS (
  SELECT doc_id, t, e, regexp_replace(e, '{PII_IPV4}', '<IP>', 'g') AS i
  FROM s1
)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(e, '{PII_IPV4}')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(i, '{PII_PHONE}')) AS BIGINT) AS n_phones,
  regexp_replace(i, '{PII_PHONE}', '<PHONE>', 'g') AS scrubbed
FROM s2
"""


@register("doc_pii_scrub", oracle=_PII_ORACLE, tags=("llm", "text"))
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction before text reaches a training shard (the standard
    curation step the reference's event-side PII strip plays for logs —
    operators/flat.py strips user fields; this is the document twin).
    Pure per-row regex work: a narrow projection, no shuffle, no UDF —
    at 100 TB it runs scan-speed inside whole-stage codegen."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit(" from 10."), (did % 200).cast("string"),
                F.lit(".0."), (did % 250).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(F.lit(" call +1 555-0"), (did % 90 + 10).cast("string")),
        ).otherwise(F.lit("")),
    )
    t = docs.select("doc_id", aug.alias("t"))
    s1 = t.select("doc_id", "t", F.regexp_replace("t", PII_EMAIL, "<EMAIL>").alias("e"))
    s2 = s1.select(
        "doc_id", "t", "e", F.regexp_replace("e", PII_IPV4, "<IP>").alias("i")
    )
    return s2.select(
        "doc_id",
        F.regexp_count("t", F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count("e", F.lit(PII_IPV4)).cast("long").alias("n_ipv4"),
        F.regexp_count("i", F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.regexp_replace("i", PII_PHONE, "<PHONE>").alias("scrubbed"),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (inverted index + stop-shingle cap)
# ---------------------------------------------------------------------------

_JACCARD_SQL_HASH = "CAST(('0x' || substr(md5(array_to_string(tok[(i+1):(i+3)], ' ')), 1, 15)) AS BIGINT)"

_JACCARD_CTES = f"""t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(len(tok) - 2),
                                      i -> {_JACCARD_SQL_HASH})) AS sh
  FROM t WHERE len(tok) >= 3
), p AS (
  SELECT doc_id, unnest(sh) AS s FROM g
), rare AS (
  SELECT s FROM p GROUP BY s HAVING count(*) <= 50
), pr AS (
  SELECT p.doc_id, p.s FROM p JOIN rare USING (s)
), sz AS (
  SELECT doc_id, count(*) AS sz FROM pr GROUP BY doc_id
), inter AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
  FROM pr x JOIN pr y USING (s)
  WHERE x.doc_id < y.doc_id
  GROUP BY 1, 2
), scored AS (
  SELECT doc_a, doc_b,
         round(CAST(inter AS DOUBLE) / (a.sz + b.sz - inter), 6) AS jaccard
  FROM inter
  JOIN sz a ON a.doc_id = doc_a
  JOIN sz b ON b.doc_id = doc_b
)"""

_JACCARD_ORACLE = f"""
WITH {_JACCARD_CTES}
SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.5
"""


@register("ngram_jaccard_neardup", oracle=_JACCARD_ORACLE, headline=True, tags=("llm", "dedup"))
def ngram_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram shingle Jaccard near-dup pairs (≥0.5) over the
    stop-shingle-filtered space (df ≤ 50): one inverted-index
    self-join + pair-count aggregation; no arrays in any shuffle."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    return ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5, max_df=50)


# ---------------------------------------------------------------------------
# near-dup clustering: pairs -> connected components -> canonical ids
# (the step a real dedup pipeline runs after candidate scoring: keep
# one survivor per cluster, drop the rest)
# ---------------------------------------------------------------------------

_CLUSTER_ORACLE = f"""
WITH RECURSIVE {_JACCARD_CTES}, edges AS (
  SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.5
), sym AS (
  SELECT doc_a AS s, doc_b AS d FROM edges
  UNION
  SELECT doc_b AS s, doc_a AS d FROM edges
), reach(id, r) AS (
  SELECT s, s FROM sym
  UNION
  SELECT sym.s, reach.r FROM sym JOIN reach ON reach.id = sym.d
), lab AS (
  SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id
)
SELECT doc_id, canonical_id,
       CAST(count(*) OVER (PARTITION BY canonical_id) AS BIGINT) AS cluster_size,
       doc_id = canonical_id AS keep
FROM lab
"""


@register("doc_dedup_clusters", oracle=_CLUSTER_ORACLE, tags=("llm", "dedup"))
def doc_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: n-gram-Jaccard pairs (>=0.5) resolved
    into connected components; every clustered doc gets its component's
    min doc_id as canonical and a keep flag (the survivor). This is the
    drop-the-duplicates step after any of the pair generators
    (ngram/minhash/simhash/embedding) — the DuckDB oracle rebuilds the
    same components with a recursive transitive closure."""
    from openmetrics_spark.llm.dedup import connected_components

    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_df=50
    )
    comp = connected_components(pairs, "doc_a", "doc_b")
    w = Window.partitionBy("canonical_id")
    return (
        comp.select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("canonical_id"),
        )
        .withColumn("cluster_size", F.count("*").over(w))
        .withColumn("keep", F.col("doc_id") == F.col("canonical_id"))
    )


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_ANN_ORACLE = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10
), s AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(qv, v) AS raw_cos
  FROM q, e WHERE e.vec_id != query_id
)
SELECT query_id, rank, neighbor_id, cos FROM (
  SELECT query_id, neighbor_id, round(raw_cos, 6) AS cos,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY raw_cos DESC, neighbor_id
         ) AS BIGINT) AS rank
  FROM s
)
WHERE rank <= 5
"""


@register("ann_brute_topk", oracle=_ANN_ORACLE, headline=True, tags=("llm", "similarity"))
def ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for query vectors (vec_id < 10):
    broadcast queries × one streaming pass over candidates."""
    emb = spread_for_compute(table(spark, sf_dir, "embeddings"))
    q_ids = emb.select("vec_id").filter(F.col("vec_id") < 10)
    out = brute_topk(emb, "vec_id", "embedding", q_ids, k=5)
    return out.withColumn("rank", F.col("rank").cast("long"))


_NEARDUP_EMB_ORACLE = """
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cos
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.40
"""


@register("embedding_neardup", oracle=_NEARDUP_EMB_ORACLE, tags=("llm", "dedup"))
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (≥0.40 — the synthetic
    embeddings' same-label cosines top out near 0.5, so this cutoff
    keeps the query non-vacuous), blocked by label — the blocking key
    stands in for an LSH bucket at this scale; the lsh_topk operator
    is the unblocked scale path."""
    emb = spread_for_compute(table(spark, sf_dir, "embeddings"))
    e = emb.select("vec_id", "label", _dvec(F.col("embedding")).alias("v"))
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("la"), F.col("v").alias("va")
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"), F.col("v").alias("vb")
    )
    return (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("raw_cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("raw_cos") >= 0.40)
        .select("vec_a", "vec_b", F.round("raw_cos", 6).alias("cos"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (the 100 TB dedup path: candidate generation is
# linear in docs x bands, then exact Jaccard verifies candidates)
# ---------------------------------------------------------------------------

_MH_HASH = (
    "CAST(('0x' || substr(md5('7_' || CAST(i AS VARCHAR) || '_' "
    "|| CAST(x AS VARCHAR)), 1, 15)) AS BIGINT)"
)

_MINHASH_ORACLE = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(len(tok) - 2),
                                      i -> {_JACCARD_SQL_HASH})) AS sh
  FROM t WHERE len(tok) >= 3
), sig AS (
  SELECT doc_id, sh,
         list_transform(range(16),
           i -> list_min(list_transform(sh, x -> {_MH_HASH}))) AS sg
  FROM g
), banded AS (
  SELECT doc_id, sh,
         unnest(list_transform(range(4), b ->
           CAST(('0x' || substr(md5(CAST(b AS VARCHAR) || '_' ||
             array_to_string(sg[(b*4+1):(b*4+4)], '_')), 1, 15)) AS BIGINT)
         )) AS bk
  FROM sig
), pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
  FROM banded x JOIN banded y USING (bk)
  WHERE x.doc_id < y.doc_id
), scored AS (
  SELECT doc_a, doc_b,
         round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
  FROM pairs
  JOIN g a ON a.doc_id = doc_a
  JOIN g b ON b.doc_id = doc_b
)
SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.5
"""


@register("minhash_lsh_neardup", oracle=_MINHASH_ORACLE, headline=True, tags=("llm", "dedup"))
def minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) banded 4x4 LSH candidate pairs, verified by exact
    Jaccard >= 0.5. All signature math is salted md5 column expressions
    (JVM-side), so the DuckDB oracle reproduces identical buckets."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    return minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=16, bands=4, threshold=0.5
    )


# ---------------------------------------------------------------------------
# SimHash near-dup (Hamming-distance fingerprints, chunk-blocked)
# ---------------------------------------------------------------------------

_SIMHASH_ORACLE = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), h AS (
  SELECT doc_id,
         list_transform(tok,
           x -> CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)) AS th
  FROM t
), f AS (
  SELECT doc_id,
         CAST(coalesce(list_sum(list_transform(range(60), b ->
           CASE WHEN coalesce(list_sum(list_transform(th,
                  x -> CASE WHEN (x >> b) % 2 = 1 THEN 1 ELSE -1 END)), 0) > 0
                THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)), 0) AS BIGINT) AS fp
  FROM h
), k AS (
  SELECT doc_id, fp,
         unnest(list_transform(range(4),
           i -> ((fp >> (i*15)) & 32767) + i*32768)) AS ck
  FROM f
), pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         x.fp AS fp_a, y.fp AS fp_b
  FROM k x JOIN k y USING (ck)
  WHERE x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(fp_a, fp_b)) AS BIGINT) AS hamming
FROM pairs WHERE bit_count(xor(fp_a, fp_b)) <= 3
"""


@register("simhash_neardup", oracle=_SIMHASH_ORACLE, tags=("llm", "dedup"))
def simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-60 near-dup pairs within Hamming distance 3, blocked on
    15-bit fingerprint chunks (pigeonhole guarantees recall at d<=3
    with 4 chunks)."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    return simhash_neardup_pairs(
        docs, "doc_id", "text", bits=60, chunk_bits=15, max_hamming=3
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN — the scale path for similarity search: score only
# candidates sharing the query's random-hyperplane sign bucket, one
# equi-join on bucket id instead of a cross join. The hyperplanes are
# LCG-generated (library-free), so the SQL oracle below inlines the
# exact same constants and recomputes identical buckets in DuckDB.
# ---------------------------------------------------------------------------


def _lsh_oracle() -> str:
    from openmetrics_spark.llm.similarity import hyperplanes

    hp = hyperplanes(dim=64, planes=8, seed=11)
    terms = []
    for i, p in enumerate(hp):
        arr = "[" + ",".join(repr(x) for x in p) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {arr}) > 0 "
            f"THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), hb AS (
  SELECT vec_id, v, {bucket} AS bucket FROM e
), q AS (
  SELECT vec_id AS query_id, v AS qv, bucket FROM hb WHERE vec_id < 10
), s AS (
  SELECT query_id, hb.vec_id AS neighbor_id,
         list_cosine_similarity(qv, v) AS raw_cos
  FROM q JOIN hb USING (bucket) WHERE hb.vec_id != query_id
)
SELECT query_id, rank, neighbor_id, cos FROM (
  SELECT query_id, neighbor_id, round(raw_cos, 6) AS cos,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY raw_cos DESC, neighbor_id
         ) AS BIGINT) AS rank
  FROM s
)
WHERE rank <= 5
"""


def _lsh_multiprobe_oracle() -> str:
    from openmetrics_spark.llm.similarity import hyperplanes

    hp = hyperplanes(dim=64, planes=8, seed=11)
    terms = []
    for i, p in enumerate(hp):
        arr = "[" + ",".join(repr(x) for x in p) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {arr}) > 0 "
            f"THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), hb AS (
  SELECT vec_id, v, {bucket} AS bucket FROM e
), q AS (
  SELECT query_id, qv, unnest(probes) AS bucket FROM (
    SELECT vec_id AS query_id, v AS qv,
           list_prepend(bucket, list_transform(range(8),
             i -> xor(bucket, CAST(1 AS BIGINT) << i))) AS probes
    FROM hb WHERE vec_id < 10
  )
), s AS (
  SELECT query_id, hb.vec_id AS neighbor_id,
         list_cosine_similarity(qv, v) AS raw_cos
  FROM q JOIN hb USING (bucket) WHERE hb.vec_id != query_id
)
SELECT query_id, rank, neighbor_id, cos FROM (
  SELECT query_id, neighbor_id, round(raw_cos, 6) AS cos,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY raw_cos DESC, neighbor_id
         ) AS BIGINT) AS rank
  FROM s
)
WHERE rank <= 5
"""


_IVF_ORACLE = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), c AS (
  SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT 16
), ranked AS (
  SELECT e.vec_id, e.v, c.cid,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid DESC
         ) AS rn
  FROM e, c
), a AS (
  SELECT vec_id, v, cid AS cell FROM ranked WHERE rn = 1
), qp AS (
  SELECT vec_id AS query_id, v AS qv, cid AS cell
  FROM ranked WHERE vec_id < 10 AND rn <= 3
), s AS (
  SELECT query_id, a.vec_id AS neighbor_id,
         list_cosine_similarity(qv, v) AS raw_cos
  FROM qp JOIN a USING (cell) WHERE a.vec_id != query_id
)
SELECT query_id, rank, neighbor_id, cos FROM (
  SELECT query_id, neighbor_id, round(raw_cos, 6) AS cos,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY raw_cos DESC, neighbor_id
         ) AS BIGINT) AS rank
  FROM s
)
WHERE rank <= 5
"""


@register("ann_lsh_multiprobe_topk", oracle=_lsh_multiprobe_oracle(), tags=("llm", "similarity"))
def ann_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-5: each query probes its sign bucket plus
    all 8 single-bit flips (9 probes), closing most of single-probe
    LSH's recall gap at ~9× the (still tiny, broadcast) query side.
    The candidate join stays one equi hash join on bucket id."""
    from openmetrics_spark.llm.similarity import lsh_multiprobe_topk

    emb = spread_for_compute(table(spark, sf_dir, "embeddings"))
    q_ids = emb.select("vec_id").filter(F.col("vec_id") < 10)
    out = lsh_multiprobe_topk(
        emb, "vec_id", "embedding", q_ids, k=5, planes=8, dim=64, seed=11
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


@register("ann_ivf_topk", oracle=_IVF_ORACLE, tags=("llm", "similarity"))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-5: 16 coarse cells (deterministic lowest-id centroids
    standing in for sampled k-means), nprobe=3. Cell assignment is a
    narrow projection against literal centroids — the big table never
    shuffles; queries probe their 3 nearest cells via one equi join."""
    from openmetrics_spark.llm.similarity import ivf_topk

    emb = spread_for_compute(table(spark, sf_dir, "embeddings"))
    q_ids = emb.select("vec_id").filter(F.col("vec_id") < 10)
    out = ivf_topk(emb, "vec_id", "embedding", q_ids, k=5, n_cells=16, nprobe=3)
    return out.withColumn("rank", F.col("rank").cast("long"))


@register("ann_lsh_topk", oracle=_lsh_oracle(), tags=("llm", "similarity"))
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 cosine neighbors via 8-bit random-hyperplane
    LSH buckets (vec_id < 10 queries): candidates shrink ~256×, the
    bucket join is an equi hash join with the tiny query side
    broadcast. This is the 100 TB path next to ann_brute_topk's exact
    baseline."""
    from openmetrics_spark.llm.similarity import lsh_topk

    emb = spread_for_compute(table(spark, sf_dir, "embeddings"))
    q_ids = emb.select("vec_id").filter(F.col("vec_id") < 10)
    out = lsh_topk(emb, "vec_id", "embedding", q_ids, k=5, planes=8, dim=64, seed=11)
    return out.withColumn("rank", F.col("rank").cast("long"))


# ---------------------------------------------------------------------------
# embedding normalization + int8 scalar quantization (how a 100 TB ANN
# index is actually stored: unit vectors, one signed byte per dim)
# ---------------------------------------------------------------------------

_QUANT_ORACLE = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (
  SELECT vec_id, v,
         sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
  FROM e
), u AS (
  SELECT vec_id, nrm, list_transform(v, x -> x / nrm) AS unit FROM n
), q AS (
  SELECT vec_id, nrm, unit,
         list_transform(unit, x -> CAST(round(x * 127) AS INTEGER)) AS qv
  FROM u
)
SELECT vec_id,
       CAST(len(qv) AS INTEGER) AS dim,
       round(nrm, 6) AS norm,
       list_min(qv) AS q_min,
       list_max(qv) AS q_max,
       round(sqrt(
         list_aggregate(
           list_transform(range(len(unit)),
                          i -> pow(unit[i + 1] - CAST(qv[i + 1] AS DOUBLE) / 127.0, 2)),
           'sum') / len(unit)), 6) AS quant_rmse
FROM q
"""


@register("embedding_quantize", oracle=_QUANT_ORACLE, tags=("llm", "similarity"))
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize each embedding and scalar-quantize to int8
    (q_i = round(127·unit_i)), reporting the per-vector reconstruction
    RMSE. All higher-order column expressions — the quantized index
    build is a narrow projection, no shuffle at any scale; downstream
    ANN queries dot int8 vectors against broadcast queries."""
    from openmetrics_spark.llm.similarity import norm as l2_norm

    emb = spread_for_compute(table(spark, sf_dir, "embeddings"))
    e = emb.select("vec_id", _dvec(F.col("embedding")).alias("v"))
    n = e.select("vec_id", "v", l2_norm(F.col("v")).alias("nrm"))
    u = n.select(
        "vec_id",
        "nrm",
        F.transform("v", lambda x: x / F.col("nrm")).alias("unit"),
    )
    q = u.select(
        "vec_id",
        "nrm",
        "unit",
        F.transform("unit", lambda x: F.round(x * 127).cast("int")).alias("qv"),
    )
    err2 = F.aggregate(
        F.zip_with(
            "unit", "qv", lambda x, y: F.pow(x - y.cast("double") / 127.0, F.lit(2))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return q.select(
        "vec_id",
        F.size("qv").alias("dim"),
        F.round("nrm", 6).alias("norm"),
        F.array_min("qv").alias("q_min"),
        F.array_max("qv").alias("q_max"),
        F.round(F.sqrt(err2 / F.size("unit")), 6).alias("quant_rmse"),
    )


# ---------------------------------------------------------------------------
# ANN recall measurement — "measure, don't guess": the quality metric
# that justifies shipping the LSH path at scale. Joins the approximate
# top-k against the exact baseline and reports recall@5 per query.
# ---------------------------------------------------------------------------


# Planted-neighbor recall (r8 verdict #4): the synthetic embeddings
# are near-uniform (max corpus cosine ~0.4), which caps ANY bucketed
# index's recall at ~0.2 — a meaningless gate. So the recall query
# PLANTS the truth: for each query vector u, 5 perturbed copies
# u + ε_j·shift(u) (ε_j = 0.08j, shift = cyclic index shift) at known
# similarity ranks (cos ≈ 1/√(1+ε²) ∈ [0.93, 0.997], far above any
# organic neighbor), appended to the corpus with derived ids. The
# exact top-5 of every query is then the planted set by construction
# — recall measures how many planted neighbors the LSH path finds, a
# distribution where recall is ACHIEVABLE and a regression is visible.
_PLANTED_EPS = [j * 0.08 for j in range(1, 6)]


def _planted_recall_oracle() -> str:
    from openmetrics_spark.llm.similarity import hyperplanes

    hp = hyperplanes(dim=64, planes=8, seed=11)
    terms = []
    for i, p in enumerate(hp):
        arr = "[" + ",".join(repr(x) for x in p) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {arr}) > 0 "
            f"THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    eps_rows = ", ".join(
        f"({j + 1}, {repr(e)})" for j, e in enumerate(_PLANTED_EPS)
    )
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), q0 AS (
  SELECT vec_id, v,
         list_transform(range(64), i -> v[((i + 1) % 64) + 1]) AS wv
  FROM e WHERE vec_id < 10
), planted AS (
  SELECT 1000000 + q0.vec_id * 10 + j AS vec_id,
         list_transform(range(64), i -> v[i + 1] + eps * wv[i + 1]) AS v
  FROM q0, (VALUES {eps_rows}) x(j, eps)
), aug AS (
  SELECT vec_id, v FROM e UNION ALL SELECT vec_id, v FROM planted
), qs AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10
), exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, aug.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY list_cosine_similarity(qv, v) DESC, aug.vec_id
           ) AS rank
    FROM qs, aug WHERE aug.vec_id != query_id
  ) WHERE rank <= 5
), hb AS (
  SELECT vec_id, v, {bucket} AS bucket FROM aug
), qb AS (
  SELECT vec_id AS query_id, v AS qv, bucket FROM hb WHERE vec_id < 10
), single AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, hb.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY list_cosine_similarity(qv, v) DESC, hb.vec_id
           ) AS rank
    FROM qb JOIN hb USING (bucket) WHERE hb.vec_id != query_id
  ) WHERE rank <= 5
), qm AS (
  SELECT query_id, qv, unnest(probes) AS bucket FROM (
    SELECT vec_id AS query_id, v AS qv,
           list_prepend(bucket, list_transform(range(8),
             i -> xor(bucket, CAST(1 AS BIGINT) << i))) AS probes
    FROM hb WHERE vec_id < 10
  )
), multi AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, hb.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY list_cosine_similarity(qv, v) DESC, hb.vec_id
           ) AS rank
    FROM qm JOIN hb USING (bucket) WHERE hb.vec_id != query_id
  ) WHERE rank <= 5
), methods AS (
  SELECT 'lsh' AS method, query_id, neighbor_id FROM single
  UNION ALL
  SELECT 'multiprobe', query_id, neighbor_id FROM multi
), hit AS (
  SELECT m.method, m.query_id, count(*) AS c
  FROM methods m JOIN exact e USING (query_id, neighbor_id)
  GROUP BY 1, 2
)
SELECT b.method, b.query_id,
       CAST(coalesce(hit.c, 0) AS BIGINT) AS n_hit,
       round(coalesce(hit.c, 0) / 5.0, 6) AS recall
FROM (SELECT DISTINCT x.method, q.query_id
      FROM (VALUES ('lsh'), ('multiprobe')) x(method),
           (SELECT DISTINCT query_id FROM exact) q) b
LEFT JOIN hit ON b.method = hit.method AND b.query_id = hit.query_id
"""


def _planted_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ the 5 planted perturbed copies per query vector
    (see the block comment above) — a narrow projection on 10 rows,
    never a shuffle; the planted frame unions onto the scan."""
    emb = spread_for_compute(table(spark, sf_dir, "embeddings")).select(
        "vec_id", _dvec(F.col("embedding")).alias("v")
    )
    q0 = emb.filter(F.col("vec_id") < 10).withColumn(
        "wv",
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: F.element_at(F.col("v"), ((i + 1) % 64 + 1).cast("int")),
        ),
    )
    planted = None
    for j, eps in enumerate(_PLANTED_EPS, start=1):
        p = q0.select(
            (F.lit(1000000) + F.col("vec_id") * 10 + F.lit(j)).alias("vec_id"),
            F.zip_with(
                "v", "wv", lambda x, y: x + F.lit(eps) * y
            ).alias("v"),
        )
        planted = p if planted is None else planted.unionByName(p)
    return emb.unionByName(planted)


@register(
    "ann_lsh_recall", oracle=_planted_recall_oracle(), tags=("llm", "similarity")
)
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of single-probe AND multi-probe LSH vs the exact
    brute-force top-5 over the planted-neighbor corpus (see block
    comment) — the acceptance metric for the approximate index on a
    distribution where recall is achievable; tests assert the floors
    (multiprobe ≥ 0.8 mean). The comparison is a left-semi join on
    (query, neighbor) + a per-query count — k×|queries| rows at any
    corpus scale."""
    from openmetrics_spark.llm.similarity import (
        brute_topk,
        lsh_multiprobe_topk,
        lsh_topk,
    )

    aug = pin(_planted_corpus(spark, sf_dir))
    q_ids = aug.select("vec_id").filter(F.col("vec_id") < 10)
    exact = pin(
        brute_topk(aug, "vec_id", "v", q_ids, k=5).select(
            "query_id", "neighbor_id"
        )
    )

    def recall_of(approx: DataFrame, method: str) -> DataFrame:
        hits = (
            exact.join(
                approx.select("query_id", "neighbor_id"),
                ["query_id", "neighbor_id"],
                "left_semi",
            )
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        base = exact.select("query_id").distinct()
        return base.join(hits, "query_id", "left").select(
            F.lit(method).alias("method"),
            "query_id",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("n_hit"),
            F.round(F.coalesce(F.col("c"), F.lit(0)) / 5.0, 6).alias("recall"),
        )

    single = lsh_topk(aug, "vec_id", "v", q_ids, k=5, planes=8, dim=64, seed=11)
    multi = lsh_multiprobe_topk(
        aug, "vec_id", "v", q_ids, k=5, planes=8, dim=64, seed=11
    )
    return recall_of(single, "lsh").unionByName(recall_of(multi, "multiprobe"))


_EMB_CLUSTER_ORACLE = """
WITH RECURSIVE e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), edges AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= 0.40
), sym AS (
  SELECT vec_a AS s, vec_b AS d FROM edges
  UNION
  SELECT vec_b AS s, vec_a AS d FROM edges
), reach(id, r) AS (
  SELECT s, s FROM sym
  UNION
  SELECT sym.s, reach.r FROM sym JOIN reach ON reach.id = sym.d
), lab AS (
  SELECT id AS vec_id, min(r) AS canonical_id FROM reach GROUP BY id
)
SELECT vec_id, canonical_id,
       CAST(count(*) OVER (PARTITION BY canonical_id) AS BIGINT)
         AS cluster_size,
       vec_id = canonical_id AS keep
FROM lab
"""


@register(
    "embedding_dedup_clusters", oracle=_EMB_CLUSTER_ORACLE, tags=("llm", "dedup")
)
def embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup end to end: embedding-cosine near-dup pairs
    (label-blocked candidate generation, ≥0.40) resolved into
    connected components — each vector labeled with its cluster
    canonical and a keep flag. Completes the pair→cluster story for
    the embedding tier exactly as doc_dedup_clusters does for the
    n-gram tier; same (long, long) label-propagation shuffles."""
    from openmetrics_spark.llm.dedup import connected_components

    pairs = embedding_neardup(spark, sf_dir).select("vec_a", "vec_b")
    comp = connected_components(pairs, "vec_a", "vec_b")
    w = Window.partitionBy("component")
    return comp.select(
        F.col("id").alias("vec_id"),
        F.col("component").alias("canonical_id"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col("id") == F.col("component")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Incremental near-dup: new batch vs existing corpus (the ingest shape)
# ---------------------------------------------------------------------------

_MINHASH_INCR_ORACLE = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(len(tok) - 2),
                                      i -> {_JACCARD_SQL_HASH})) AS sh
  FROM t WHERE len(tok) >= 3
), sig AS (
  SELECT doc_id, sh,
         list_transform(range(16),
           i -> list_min(list_transform(sh, x -> {_MH_HASH}))) AS sg
  FROM g
), banded AS (
  SELECT doc_id, sh,
         unnest(list_transform(range(4), b ->
           CAST(('0x' || substr(md5(CAST(b AS VARCHAR) || '_' ||
             array_to_string(sg[(b*4+1):(b*4+4)], '_')), 1, 15)) AS BIGINT)
         )) AS bk
  FROM sig
), pairs AS (
  SELECT DISTINCT i.doc_id AS incoming_id, e.doc_id AS existing_id
  FROM banded i JOIN banded e USING (bk)
  WHERE i.doc_id % 2 = 1 AND e.doc_id % 2 = 0
), scored AS (
  SELECT incoming_id, existing_id,
         round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
           AS jaccard
  FROM pairs
  JOIN g a ON a.doc_id = incoming_id
  JOIN g b ON b.doc_id = existing_id
)
SELECT incoming_id, existing_id, jaccard FROM scored WHERE jaccard >= 0.5
"""


@register(
    "minhash_incremental_neardup",
    oracle=_MINHASH_INCR_ORACLE,
    tags=("llm", "dedup"),
)
def minhash_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: odd doc_ids play the incoming crawl
    batch, even doc_ids the already-curated corpus; incoming docs that
    near-duplicate (MinHash-16 banded 4x4, exact Jaccard >= 0.5) any
    existing doc are the batch's drop/link list. Candidate generation
    is the incoming bands probing the existing band index — per-batch
    cost linear in the batch, never corpus x corpus (at scale the
    existing side is a persisted banded index table)."""
    from openmetrics_spark.llm.dedup import minhash_incremental_pairs

    docs = table(spark, sf_dir, "documents")
    return minhash_incremental_pairs(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "doc_id",
        "text",
        n=3,
        num_hashes=16,
        bands=4,
        threshold=0.5,
    )


_ANN_FILTERED_ORACLE = """
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10
), s AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(qv, v) AS raw_cos
  FROM q, e WHERE e.vec_id != query_id AND e.label <= 2
)
SELECT query_id, rank, neighbor_id, cos FROM (
  SELECT query_id, neighbor_id, round(raw_cos, 6) AS cos,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY raw_cos DESC, neighbor_id
         ) AS BIGINT) AS rank
  FROM s
)
WHERE rank <= 5
"""


@register(
    "ann_filtered_topk", oracle=_ANN_FILTERED_ORACLE, tags=("llm", "similarity")
)
def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search — top-5 cosine neighbors restricted to
    candidates passing a metadata predicate (label <= 2), the
    "search within a collection/tenant/language" shape every real
    retrieval deployment needs. The predicate prunes candidates
    BEFORE any distance math: it is a plain comparison on a scan
    column, so it reaches the parquet reader as a pushed filter
    (asserted in tests/test_plans.py) and the distance pass streams
    only the surviving fraction — at 100 TB the filter, not the ANN
    index, is the first-order cost lever. Composes unchanged with the
    IVF/LSH candidate generators (filter the candidate side before
    the bucket join)."""
    emb = spread_for_compute(table(spark, sf_dir, "embeddings"))
    q_ids = emb.select("vec_id").filter(F.col("vec_id") < 10)
    out = brute_topk(
        emb,
        "vec_id",
        "embedding",
        q_ids,
        k=5,
        candidates=emb.filter(F.col("label") <= 2),
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


# ---------------------------------------------------------------------------
# embedding_pq_codes — product quantization: the 100 TB embedding
# STORAGE op. Split each 64-dim vector into 4 subspaces of 16 dims,
# train an independent 16-codeword spherical codebook per subspace
# (the same integer-exact Lloyd as embedding_kmeans_cells), and emit
# each vector as 4 codeword ids — 4 small codes instead of 64 floats
# (~64x), the compression behind every billion-scale ANN store
# (Jegou et al. 2011). Asymmetric-distance search then scores against
# codebook entries, never raw vectors.
# ---------------------------------------------------------------------------

_PQ_M, _PQ_SUBDIM, _PQ_K, _PQ_ITERS = 4, 16, 16, 2


def _pq_oracle() -> str:
    ctes: list[str] = []
    for m in range(_PQ_M):
        lo, hi = m * _PQ_SUBDIM + 1, (m + 1) * _PQ_SUBDIM
        ctes += _kmeans_ctes_for(
            f"s{m}_", _PQ_K, _PQ_ITERS, _PQ_SUBDIM, f"embedding[{lo}:{hi}]"
        )
    joins = " ".join(
        f"JOIN s{m}_a{_PQ_ITERS} s{m} USING (vec_id)" for m in range(1, _PQ_M)
    )
    codes = ", ".join(
        f"CAST(s{m}.cell AS BIGINT) AS code_{m}" for m in range(_PQ_M)
    )
    return (
        "WITH "
        + ", ".join(ctes)
        + f"\nSELECT vec_id, {codes} FROM s0_a{_PQ_ITERS} s0 {joins}"
    )


@register(
    "embedding_pq_codes", oracle=_pq_oracle(), tags=("llm", "similarity")
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encoding: per 16-dim subspace an independent 16-codeword
    spherical codebook (integer-quantized Lloyd, 2 iterations — the
    embedding_kmeans_cells machinery applied to vector slices), each
    vector emitted as 4 codeword ids. Training cost per subspace is
    one narrow sliced projection + a 16×17-long aggregate per
    iteration; encoding is a pure projection against driver-inlined
    codebooks — at 100 TB the raw vectors are read once and what
    persists is ~64× smaller. The oracle replays all four codebooks'
    iterations as namespaced CTE chains."""
    from openmetrics_spark.llm.cluster import kmeans_assign

    emb = spread_for_compute(table(spark, sf_dir, "embeddings"))
    out = None
    for m in range(_PQ_M):
        sub = emb.select(
            "vec_id",
            F.slice(F.col("embedding"), m * _PQ_SUBDIM + 1, _PQ_SUBDIM).alias(
                "sub"
            ),
        )
        a = kmeans_assign(
            sub, "vec_id", "sub", k=_PQ_K, iters=_PQ_ITERS, dim=_PQ_SUBDIM
        ).select(F.col("vid").alias("vec_id"), F.col("cell").alias(f"code_{m}"))
        out = a if out is None else out.join(a, "vec_id")
    return out


def _pq_adc_oracle() -> str:
    ctes: list[str] = []
    for m in range(_PQ_M):
        lo, hi = m * _PQ_SUBDIM + 1, (m + 1) * _PQ_SUBDIM
        ctes += _kmeans_ctes_for(
            f"s{m}_", _PQ_K, _PQ_ITERS, _PQ_SUBDIM, f"embedding[{lo}:{hi}]"
        )
    joins = " ".join(
        f"JOIN s{m}_a{_PQ_ITERS} s{m} USING (vec_id)" for m in range(1, _PQ_M)
    )
    cjoins = " ".join(
        f"JOIN s{m}_c{_PQ_ITERS - 1} c{m} ON codes.code_{m} = c{m}.cid"
        for m in range(_PQ_M)
    )
    code_cols = ", ".join(f"s{m}.cell AS code_{m}" for m in range(_PQ_M))
    recon = " || ".join(f"c{m}.cv" for m in range(_PQ_M))
    return (
        "WITH "
        + ", ".join(ctes)
        + f""", codes AS (
  SELECT vec_id, {code_cols} FROM s0_a{_PQ_ITERS} s0 {joins}
), recon AS (
  SELECT codes.vec_id, {recon} AS rv FROM codes {cjoins}
), q AS (
  SELECT e.vec_id AS query_id,
         list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings e WHERE e.vec_id < 10
), s AS (
  SELECT query_id, recon.vec_id AS neighbor_id,
         list_cosine_similarity(qv, rv) AS raw_cos
  FROM q, recon WHERE recon.vec_id != query_id
)
SELECT query_id, rank, neighbor_id, cos FROM (
  SELECT query_id, neighbor_id, round(raw_cos, 6) AS cos,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY raw_cos DESC, neighbor_id
         ) AS BIGINT) AS rank
  FROM s
)
WHERE rank <= 5
"""
    )


@register(
    "ann_pq_adc_topk", oracle=_pq_adc_oracle(), tags=("llm", "similarity")
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance search over the PQ codes: each query's
    top-5 by cosine against candidate RECONSTRUCTIONS (the 4 codeword
    centroids concatenated) — candidates' raw vectors are never read
    at query time, which is the whole point of PQ at 100 TB: the
    store holds 4 ids per vector, scoring joins codes to the
    driver-bounded codebook (4 broadcast joins) and runs one streaming
    cosine pass. Queries use their raw vectors (the 'asymmetric' in
    ADC), so accuracy degrades only by the candidate quantization;
    tests pin recall@5 against the exact brute-force neighbors."""
    from openmetrics_spark.llm.cluster import _lloyd

    emb = spread_for_compute(table(spark, sf_dir, "embeddings"))
    codes = None
    spark_sess = spark
    for m in range(_PQ_M):
        sub = emb.select(
            "vec_id",
            F.slice(F.col("embedding"), m * _PQ_SUBDIM + 1, _PQ_SUBDIM).alias(
                "sub"
            ),
        )
        assigned, cents = _lloyd(
            sub, "vec_id", "sub", _PQ_K, _PQ_ITERS, _PQ_SUBDIM
        )
        from openmetrics_spark.tables import literal_df

        cdf = literal_df(
            spark_sess,
            [(int(cid), [float(x) for x in cv]) for cid, cv in cents],
            f"cid LONG, cv_{m} ARRAY<DOUBLE>",
        )
        a = (
            assigned.select(
                F.col("vid").alias("vec_id"), F.col("cell").alias("cid")
            )
            .join(F.broadcast(cdf), "cid")
            .select("vec_id", f"cv_{m}")
        )
        codes = a if codes is None else codes.join(a, "vec_id")
    recon = codes.select(
        F.col("vec_id").alias("neighbor_id"),
        F.concat(*[F.col(f"cv_{m}") for m in range(_PQ_M)]).alias("rv"),
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), _dvec(F.col("embedding")).alias("qv")
    )
    scored = (
        recon.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("rv")).alias("raw"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "rank", "neighbor_id", F.round("raw", 6).alias("cos"))
    )


# ---------------------------------------------------------------------------
# corpus_leakage_safe_split — cluster-aware train/val/test assignment:
# a doc-level hash split leaks near-duplicates across the boundary
# (train/test contamination, the classic eval bug); splitting on the
# near-dup CLUSTER id keeps every duplicate family in one split.
# ---------------------------------------------------------------------------

from openmetrics_spark.functions.hashing import (  # noqa: E402
    portable_hash60,
    portable_hash60_sql,
)

_SPLIT_GATE = portable_hash60_sql("'split_' || CAST(cluster_id AS VARCHAR)")

_LEAKAGE_SPLIT_ORACLE = f"""
WITH RECURSIVE {_JACCARD_CTES}, edges AS (
  SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.5
), sym AS (
  SELECT doc_a AS s, doc_b AS d FROM edges
  UNION
  SELECT doc_b AS s, doc_a AS d FROM edges
), reach(id, r) AS (
  SELECT s, s FROM sym
  UNION
  SELECT sym.s, reach.r FROM sym JOIN reach ON reach.id = sym.d
), lab AS (
  SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id
), allc AS (
  SELECT d.doc_id, coalesce(lab.canonical_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id
)
SELECT doc_id, cluster_id,
       CASE WHEN g < 80 THEN 'train'
            WHEN g < 90 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, cluster_id, {_SPLIT_GATE} % 100 AS g FROM allc)
"""


@register(
    "corpus_leakage_safe_split",
    oracle=_LEAKAGE_SPLIT_ORACLE,
    tags=("llm", "pipeline"),
)
def corpus_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split that cannot leak
    near-duplicates across the boundary: docs are first resolved into
    near-dup connected components (ngram-Jaccard >= 0.5, the same
    pair generator as doc_dedup_clusters), then the split gate hashes
    the CLUSTER id — every member of a duplicate family lands in the
    same split by construction (pinned by
    tests/test_corpus_mix.py::test_leakage_safe_split_no_cross_split_pairs).
    Docs in no cluster are their own singleton cluster. 100 TB shape:
    the pair generator's df-capped inverted index + pointer-jumping CC
    dominate (both bucketed, no all-pairs); the split itself is a
    narrow hash projection, and the assignment is stable under corpus
    growth — new docs can't move an existing cluster to another split
    unless dedup itself merges clusters (in which case min-id
    canonicalization keeps the union in the OLDEST cluster's split)."""
    from openmetrics_spark.llm.dedup import connected_components

    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_df=50
    )
    comp = connected_components(pairs, "doc_a", "doc_b")
    lab = comp.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cid")
    )
    allc = (
        docs.select("doc_id")
        .join(lab, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cid"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    g = (
        portable_hash60(
            F.concat(F.lit("split_"), F.col("cluster_id").cast("string"))
        )
        % 100
    )
    return allc.select(
        "doc_id",
        "cluster_id",
        F.when(g < 80, F.lit("train"))
        .when(g < 90, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


_CLUSTER_SIZES_ORACLE = f"""
WITH RECURSIVE {_JACCARD_CTES}, edges AS (
  SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.5
), sym AS (
  SELECT doc_a AS s, doc_b AS d FROM edges
  UNION
  SELECT doc_b AS s, doc_a AS d FROM edges
), reach(id, r) AS (
  SELECT s, s FROM sym
  UNION
  SELECT sym.s, reach.r FROM sym JOIN reach ON reach.id = sym.d
), lab AS (
  SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id
), sizes AS (
  SELECT canonical_id, count(*) AS cluster_size FROM lab GROUP BY 1
), all_sizes AS (
  SELECT cluster_size FROM sizes
  UNION ALL
  SELECT 1 AS cluster_size
  FROM documents d LEFT JOIN lab ON d.doc_id = lab.doc_id
  WHERE lab.doc_id IS NULL
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_docs
FROM all_sizes GROUP BY cluster_size
"""


@register(
    "dedup_cluster_size_histogram",
    oracle=_CLUSTER_SIZES_ORACLE,
    tags=("llm", "dedup"),
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup REPORT every curation run ships: how big are the
    near-dup families? Clustered docs aggregate per canonical id;
    unclustered docs count as singleton clusters, so
    sum(n_docs) == |corpus| (the sanity invariant a report reader
    checks first). One extra aggregate over the CC output — the pair
    generation + pointer jumping dominate, both already bucketed."""
    from openmetrics_spark.llm.dedup import connected_components

    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_df=50
    )
    comp = pin(connected_components(pairs, "doc_a", "doc_b"))
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    singles = (
        docs.select("doc_id")
        .join(comp.select(F.col("id").alias("doc_id")), "doc_id", "left_anti")
        .select(F.lit(1).cast("long").alias("cluster_size"))
    )
    return (
        sizes.select("cluster_size")
        .unionByName(singles)
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            F.col("cluster_size").cast("long").alias("cluster_size"),
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Token-budget greedy selection (quality-ordered data curation)
# ---------------------------------------------------------------------------
#
# The standard curation move once every document carries a quality
# score: per source, keep the highest-quality documents until a token
# budget is exhausted (greedy prefix of the quality-descending order;
# ties break by doc_id). The budget here is 30% of each source's
# total tokens, so the selection stays non-trivial at every SF.
#
# 100 TB posture: the naive form is ONE window over all documents
# partitioned by source — a handful of sources means a handful of
# reducers sorting the whole corpus. Instead the quality score is
# bucketed onto a fixed 1001-point grid (the selection ORDER is the
# grid value; same value in both engines, so semantics — not an
# approximation — change to "greedy by quality bucket"), and then:
#   1. one map-combinable shuffle builds the (source, q_int) level
#      frame — at most 1001 rows per source;
#   2. the running token total over that TINY frame finds, per
#      source, the fully-admitted levels and the single boundary
#      level where the budget crosses;
#   3. fully-admitted levels join back broadcast; only the ~1/1001
#      of documents sitting exactly on the boundary level flow
#      through a per-(source, level) doc_id-ordered window.
# Same shape as the RFM histogram-bounds rewrite
# (sql_surface_q.py:676): the global sort collapses onto a bounded
# grid, the corpus is touched by broadcast joins only.

_BUDGET_SQL_QINT = (
    "CAST(floor(round(0.5 * (CASE WHEN len(tok) > 0 THEN "
    "CAST(len(list_distinct(tok)) AS DOUBLE) / len(tok) ELSE 0 END) "
    "+ 0.5 * least((CASE WHEN len(tok) > 0 THEN "
    f"CAST(len(list_filter(tok, x -> list_contains({_STOP_SQL}, x))) AS DOUBLE) / len(tok) "
    "ELSE 0 END) * 5, 1.0), 6) * 1000 + 0.5) AS BIGINT)"
)

_TOKEN_BUDGET_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), d AS (
  SELECT doc_id, source, CAST(len(tok) AS BIGINT) AS n_tok,
         {_BUDGET_SQL_QINT} AS q_int
  FROM t
), b AS (
  SELECT source,
         CAST(floor(0.3 * sum(n_tok)) AS BIGINT) AS budget_tokens
  FROM d GROUP BY 1
), c AS (
  SELECT d.*, b.budget_tokens,
         sum(n_tok) OVER (PARTITION BY d.source
                          ORDER BY q_int DESC, doc_id ASC
                          ROWS UNBOUNDED PRECEDING) AS cum_tok
  FROM d JOIN b USING (source)
)
SELECT source, budget_tokens,
       CAST(count(*) AS BIGINT) AS n_selected,
       CAST(sum(n_tok) AS BIGINT) AS tokens_selected,
       CAST(min(q_int) AS BIGINT) AS min_q_admitted
FROM c WHERE cum_tok <= budget_tokens
GROUP BY 1, 2
"""


def _grid_budget_admitted(
    d: DataFrame, frac: float, budgets: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """The grid-bounded greedy admission core shared by
    corpus_token_budget_select, corpus_curation_pipeline and
    corpus_incremental_admit: over ``d(doc_id, source, n_tok,
    q_int)``, admit the quality-descending (doc_id tie-break) prefix
    of each source until ``frac`` of its tokens are spent — or, when
    ``budgets(source, budget_tokens)`` is given, until that EXPLICIT
    per-source budget is spent (the incremental shape: the remaining
    standing budget, not a fraction of the incoming batch). Returns
    ``(admitted(doc_id, source, q_int, n_tok), budgets(source,
    budget_tokens))``. Fully-admitted quality levels resolve on the
    tiny (source, level) frame; only the single boundary level per
    source flows through a doc_id-ordered window."""
    lvl = d.groupBy("source", "q_int").agg(
        F.sum("n_tok").cast("long").alias("lvl_tok")
    )
    if budgets is None:
        b = lvl.groupBy("source").agg(
            F.floor(F.sum("lvl_tok") * frac).cast("long").alias("budget_tokens")
        )
    else:
        b = budgets.select("source", "budget_tokens")
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("q_int"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lv = (
        lvl.join(b, "source")
        .withColumn("cum_tok", F.sum("lvl_tok").over(w))
        .withColumn("cum_excl", F.col("cum_tok") - F.col("lvl_tok"))
    )
    full = lv.filter(F.col("cum_tok") <= F.col("budget_tokens")).select(
        "source", "q_int"
    )
    bnd = lv.filter(
        (F.col("cum_excl") <= F.col("budget_tokens"))
        & (F.col("cum_tok") > F.col("budget_tokens"))
    ).select("source", "q_int", "cum_excl", "budget_tokens")
    cols = ["doc_id", "source", "q_int", "n_tok"]
    full_docs = d.join(F.broadcast(full), ["source", "q_int"]).select(cols)
    # boundary window: one q_int per source, ~1/grid of the corpus
    wb = Window.partitionBy("source", "q_int").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bnd_admit = (
        d.join(F.broadcast(bnd), ["source", "q_int"])
        .withColumn("c", F.sum("n_tok").over(wb))
        .filter(F.col("c") + F.col("cum_excl") <= F.col("budget_tokens"))
        .select(cols)
    )
    return full_docs.unionByName(bnd_admit), b


@register(
    "corpus_token_budget_select",
    oracle=_TOKEN_BUDGET_ORACLE,
    tags=("llm", "select"),
)
def corpus_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source greedy token-budget selection: keep the
    highest-quality documents (1001-point quality grid, doc_id
    tie-break) until 30% of the source's tokens are spent; emit per
    source the docs/tokens admitted and the lowest quality level that
    made the cut. Scale shape: level-frame running totals + broadcast
    boundary join, never a corpus-wide sort (see block comment)."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", "source", tokens("text").alias("tok"))
    d = pin(
        t.select(
            "doc_id",
            "source",
            token_count(F.col("tok")).alias("n_tok"),
            F.floor(quality_score("text", F.col("tok")) * 1000 + F.lit(0.5))
            .cast("long")
            .alias("q_int"),
        )
    )
    admitted, b = _grid_budget_admitted(d, 0.3)
    return (
        admitted.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_selected"),
            F.sum("n_tok").cast("long").alias("tokens_selected"),
            F.min("q_int").cast("long").alias("min_q_admitted"),
        )
        .join(b, "source")
        .select(
            "source",
            "budget_tokens",
            "n_selected",
            "tokens_selected",
            "min_q_admitted",
        )
    )


# ---------------------------------------------------------------------------
# Quality-aware near-dup canonical selection
# ---------------------------------------------------------------------------
#
# min-id canonicalization (doc_dedup_clusters) is what a dedup REPORT
# wants — stable ids. What a CURATION run wants is to keep the BEST
# member of each near-dup family: the highest-quality variant, not
# whichever happened to get the smallest id. The argmax must be
# deterministic under ties for the cross-engine hash, and DuckDB's
# arg_max leaves ties unspecified — so the keeper is selected by a
# pure min() over an order-packed integer key:
#     key = (1000 - q_int) * 2^44 + doc_id
# min(key) IS lexicographic (quality DESC, doc_id ASC); the packed
# key decodes back to (keeper_id, keeper quality) with div/mod — no
# window, no tie ambiguity, one map-combinable aggregate per cluster.

# doc_id < 2^44 is ENFORCED per row (F.assert_true inside the key
# projection below): an overflowing id would corrupt the quality bits
# identically in both engines, which is the one failure class the
# cross-engine hash gate cannot catch — so it must fail loudly instead.
_KEY_BASE = 1 << 44


def _guarded_packed_key(q_int_col, doc_id_col):
    """(1000 - q_int) * 2^44 + doc_id, with the per-row overflow
    assert riding the expression (NULL -> +0 on success, loud runtime
    error on an id that would corrupt the quality bits — the one
    failure class the cross-engine hash gate cannot catch)."""
    id_guard = F.coalesce(
        F.assert_true(
            doc_id_col < F.lit(_KEY_BASE),
            F.lit("doc_id >= 2^44 overflows the packed quality key"),
        ).cast("long"),
        F.lit(0),
    )
    return (F.lit(1000) - q_int_col) * F.lit(_KEY_BASE) + doc_id_col + id_guard

_KEEP_BEST_ORACLE = f"""
WITH RECURSIVE {_JACCARD_CTES}, edges AS (
  SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.5
), sym AS (
  SELECT doc_a AS s, doc_b AS d FROM edges
  UNION
  SELECT doc_b AS s, doc_a AS d FROM edges
), reach(id, r) AS (
  SELECT s, s FROM sym
  UNION
  SELECT sym.s, reach.r FROM sym JOIN reach ON reach.id = sym.d
), lab AS (
  SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
), dq AS (
  SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_tok,
         {_BUDGET_SQL_QINT} AS q_int
  FROM t
), m AS (
  SELECT lab.cluster_id, dq.doc_id, dq.n_tok, dq.q_int,
         (1000 - dq.q_int) * {_KEY_BASE} + dq.doc_id AS key
  FROM lab JOIN dq USING (doc_id)
), agg AS (
  SELECT cluster_id,
         CAST(count(*) AS BIGINT) AS cluster_size,
         CAST(sum(n_tok) AS BIGINT) AS total_tok,
         min(key) AS min_key
  FROM m GROUP BY 1
)
SELECT agg.cluster_id,
       CAST(agg.min_key % {_KEY_BASE} AS BIGINT) AS keeper_id,
       CAST(1000 - agg.min_key // {_KEY_BASE} AS BIGINT) AS q_keeper,
       agg.cluster_size,
       CAST(agg.total_tok - k.n_tok AS BIGINT) AS tokens_dropped
FROM agg JOIN dq k ON k.doc_id = agg.min_key % {_KEY_BASE}
"""


@register(
    "neardup_keep_best_quality",
    oracle=_KEEP_BEST_ORACLE,
    tags=("llm", "dedup"),
)
def neardup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per near-dup family (3-gram Jaccard >= 0.5, pointer-jumping
    CC): keep the highest-quality member (1001-point quality grid,
    doc_id tie-break) and report the tokens the drop reclaims. The
    keeper argmax is a single min() over an order-packed integer key
    (see block comment) — map-side combinable, no per-cluster window.
    100 TB shape: pair generation + CC dominate (df-capped inverted
    index, O(log d) pointer jumping, both bucketed); the quality pass
    runs only over cluster MEMBERS (left-semi against the CC output),
    and everything after is one aggregate plus a keeper re-join."""
    from openmetrics_spark.llm.dedup import connected_components

    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_df=50
    )
    comp = pin(connected_components(pairs, "doc_a", "doc_b"))
    # quality is only ever read for CLUSTER MEMBERS (the member agg and
    # the keeper re-join) — semi-join first so the tokenize + quality
    # pass runs over the near-dup fraction of the corpus, not all of it
    members = comp.select(F.col("id").alias("doc_id"))
    t = docs.join(members, "doc_id", "left_semi").select(
        "doc_id", "text", tokens("text").alias("tok")
    )
    dq = pin(
        t.select(
            "doc_id",
            token_count(F.col("tok")).alias("n_tok"),
            F.floor(quality_score("text", F.col("tok")) * 1000 + F.lit(0.5))
            .cast("long")
            .alias("q_int"),
        )
    )
    m = comp.select(
        F.col("component").alias("cluster_id"),
        F.col("id").alias("doc_id"),
    ).join(dq, "doc_id")
    agg = m.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size"),
        F.sum("n_tok").cast("long").alias("total_tok"),
        F.min(
            _guarded_packed_key(F.col("q_int"), F.col("doc_id"))
        ).alias("min_key"),
    )
    # decode with exact integer arithmetic only: (min_key - mod) is an
    # exact multiple of 2^44 with <= 10 significant bits, so even the
    # double-typed division below is lossless; no raw min_key/2^44,
    # whose low bits would round at ~2^54.
    kid = F.col("min_key") % F.lit(_KEY_BASE)
    keyed = agg.select(
        "cluster_id",
        kid.cast("long").alias("keeper_id"),
        (
            F.lit(1000)
            - ((F.col("min_key") - kid) / F.lit(_KEY_BASE)).cast("long")
        )
        .cast("long")
        .alias("q_keeper"),
        "cluster_size",
        "total_tok",
    )
    return keyed.join(
        dq.select(F.col("doc_id").alias("keeper_id"), "n_tok"), "keeper_id"
    ).select(
        "cluster_id",
        "keeper_id",
        "q_keeper",
        "cluster_size",
        (F.col("total_tok") - F.col("n_tok")).cast("long").alias(
            "tokens_dropped"
        ),
    )


# ---------------------------------------------------------------------------
# Composed curation pipeline over the r9 operators
# ---------------------------------------------------------------------------
#
# The r9 additions composed as ONE chain, the way a curation run
# would actually use them — composition is where stage-boundary bugs
# live (the same thesis the composed BFJ manifest gates on the event
# side):
#   p0 input
#   p1 near-dup keep-BEST-quality retention (packed-key argmax per
#      3-gram/CC family; non-clustered docs keep themselves)
#   p2 exact dedup of the kept set (md5 min-id — catches identical
#      docs with < 3 tokens, which have no shingles and therefore
#      never reach the near-dup pair generator)
#   p3 per-source token-budget selection (30%, quality grid)
#   p4 deterministic shard assignment of the selected set
# The manifest carries (stage, n_docs, n_tokens) per stage plus one
# row per shard, so every boundary's survivor multiset is pinned by
# the cross-engine hash.

_PIPE_SHARDS = 8
_PIPE_SHARD_GATE = portable_hash60_sql("'shard_' || CAST(doc_id AS VARCHAR)")

_CURATION_PIPELINE_ORACLE = f"""
WITH RECURSIVE {_JACCARD_CTES}, edges AS (
  SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.5
), sym AS (
  SELECT doc_a AS s, doc_b AS d FROM edges
  UNION
  SELECT doc_b AS s, doc_a AS d FROM edges
), reach(id, r) AS (
  SELECT s, s FROM sym
  UNION
  SELECT sym.s, reach.r FROM sym JOIN reach ON reach.id = sym.d
), lab AS (
  SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
), dq AS (
  SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_tok,
         {_BUDGET_SQL_QINT} AS q_int
  FROM t
), keepers AS (
  SELECT min((1000 - dq.q_int) * {_KEY_BASE} + dq.doc_id)
         % {_KEY_BASE} AS doc_id
  FROM lab JOIN dq USING (doc_id)
  GROUP BY lab.cluster_id
), s1 AS (
  SELECT doc_id FROM keepers
  UNION ALL
  SELECT d.doc_id FROM documents d LEFT JOIN lab USING (doc_id)
  WHERE lab.doc_id IS NULL
), s2 AS (
  SELECT min(d.doc_id) AS doc_id
  FROM documents d JOIN s1 USING (doc_id)
  GROUP BY md5(d.text)
), s2q AS (
  SELECT s2.doc_id, d.source, dq.n_tok, dq.q_int
  FROM s2 JOIN documents d USING (doc_id) JOIN dq USING (doc_id)
), bq AS (
  SELECT source, CAST(floor(0.3 * sum(n_tok)) AS BIGINT) AS budget
  FROM s2q GROUP BY 1
), cq AS (
  SELECT s2q.*, bq.budget,
         sum(n_tok) OVER (PARTITION BY s2q.source
                          ORDER BY q_int DESC, doc_id ASC
                          ROWS UNBOUNDED PRECEDING) AS cum_tok
  FROM s2q JOIN bq USING (source)
), sel AS (
  SELECT doc_id, n_tok FROM cq WHERE cum_tok <= budget
)
SELECT 'p0_input' AS stage,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS n_tokens
FROM dq
UNION ALL
SELECT 'p1_neardup_keep_best',
       CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(dq.n_tok), 0) AS BIGINT)
FROM s1 JOIN dq USING (doc_id)
UNION ALL
SELECT 'p2_exact_dedup',
       CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(dq.n_tok), 0) AS BIGINT)
FROM s2 JOIN dq USING (doc_id)
UNION ALL
SELECT 'p3_budget_select',
       CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT)
FROM sel
UNION ALL
SELECT 'p4_shard_' || CAST({_PIPE_SHARD_GATE} % {_PIPE_SHARDS} AS VARCHAR),
       CAST(count(*) AS BIGINT),
       CAST(sum(n_tok) AS BIGINT)
FROM sel
GROUP BY 1
"""


@register(
    "corpus_curation_pipeline",
    oracle=_CURATION_PIPELINE_ORACLE,
    tags=("llm", "pipeline"),
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best near-dup retention → exact dedup → token-budget
    selection → shard assignment, as one per-stage manifest (see
    block comment). 100 TB shape: each stage is the already-probed
    operator (df-capped pair generation + pointer-jumping CC, one
    md5 agg shuffle, grid-bounded budget windows, hash-mod shards);
    the chain adds only keep-set semi-joins between stages."""
    from openmetrics_spark.llm.dedup import connected_components

    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    t = pin(
        docs.select("doc_id", "text", "source", tokens("text").alias("tok"))
    )
    dq = pin(
        t.select(
            "doc_id",
            "source",
            token_count(F.col("tok")).alias("n_tok"),
            F.floor(quality_score("text", F.col("tok")) * 1000 + F.lit(0.5))
            .cast("long")
            .alias("q_int"),
        )
    )
    # pairs from the pinned token arrays — skips re-running the
    # tokenize regex over the corpus (r12, guide §1.2)
    pairs = ngram_jaccard_pairs(
        t.select("doc_id", "tok"), "doc_id",
        n=3, threshold=0.5, max_df=50, tok_col="tok",
    )
    comp = connected_components(pairs, "doc_a", "doc_b")
    # p1: keep the best-quality member per family (packed-key argmax,
    # the neardup_keep_best_quality core), everyone unclustered stays
    keepers = (
        comp.select(F.col("component").alias("cid"), F.col("id").alias("doc_id"))
        .join(dq, "doc_id")
        .groupBy("cid")
        .agg(
            F.min(
                _guarded_packed_key(F.col("q_int"), F.col("doc_id"))
            ).alias("min_key")
        )
        .select((F.col("min_key") % F.lit(_KEY_BASE)).cast("long").alias("doc_id"))
    )
    unclustered = dq.select("doc_id").join(
        comp.select(F.col("id").alias("doc_id")), "doc_id", "left_anti"
    )
    s1 = pin(keepers.unionByName(unclustered))
    # p2: exact dedup of the kept set
    s2 = pin(
        t.join(s1, "doc_id", "left_semi")
        .groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # p3: per-source token-budget selection over s2 (grid greedy — the
    # corpus_token_budget_select core, here returning the admitted docs)
    s2q = dq.join(s2, "doc_id", "left_semi")
    admitted, _ = _grid_budget_admitted(s2q, 0.3)
    sel = pin(admitted.select("doc_id", "n_tok"))

    def _stage(df, name):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("n_tokens"),
        ).select(F.lit(name).alias("stage"), "n_docs", "n_tokens")

    p0 = _stage(dq, "p0_input")
    p1 = _stage(s1.join(dq, "doc_id"), "p1_neardup_keep_best")
    p2 = _stage(s2.join(dq, "doc_id"), "p2_exact_dedup")
    p3 = _stage(sel, "p3_budget_select")
    p4 = (
        sel.groupBy(
            F.concat(
                F.lit("p4_shard_"),
                (
                    portable_hash60(
                        F.concat(F.lit("shard_"), F.col("doc_id").cast("string"))
                    )
                    % _PIPE_SHARDS
                ).cast("string"),
            ).alias("stage")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .select("stage", "n_docs", "n_tokens")
    )
    return p0.unionByName(p1).unionByName(p2).unionByName(p3).unionByName(p4)


# ---------------------------------------------------------------------------
# Cluster-quality evaluation: per-cell label purity
# ---------------------------------------------------------------------------
#
# The evaluation loop every clustering deployment runs: how well do
# the unsupervised cells align with a known labeling? Purity per cell
# = majority-label share. The majority argmax must be tie-deterministic
# for the cross-engine hash, so it is one max() over a packed integer
# key (n * 1024 - label: count dominant, ties -> smaller label), the
# same trick as the dedup keeper; labels are runtime-asserted into
# [0, 1024) so the packing cannot silently corrupt.

_PURITY_PACK = 1024

_CELL_PURITY_ORACLE = (
    "WITH "
    + ", ".join(_kmeans_ctes())
    + f"""
, m AS (
  SELECT a.cell, e.label, count(*) AS n
  FROM a{_KM_ITERS} a JOIN embeddings e USING (vec_id)
  GROUP BY 1, 2
), per AS (
  SELECT cell,
         CAST(sum(n) AS BIGINT) AS cell_size,
         max(n * {_PURITY_PACK} - label) AS pk
  FROM m GROUP BY 1
)
SELECT CAST(cell AS BIGINT) AS cell,
       cell_size,
       CAST((pk + {_PURITY_PACK - 1}) // {_PURITY_PACK} AS BIGINT) AS majority_n,
       CAST(-(pk - ((pk + {_PURITY_PACK - 1}) // {_PURITY_PACK}) * {_PURITY_PACK}) AS BIGINT)
         AS majority_label,
       round(CAST((pk + {_PURITY_PACK - 1}) // {_PURITY_PACK} AS DOUBLE) / cell_size, 6)
         AS purity
FROM per
"""
)


@register(
    "embedding_cell_purity",
    oracle=_CELL_PURITY_ORACLE,
    tags=("llm", "similarity"),
)
def embedding_cell_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per k-means cell: size, majority label (packed-key argmax,
    ties to the smaller label) and purity — the cluster-vs-labels
    evaluation report (see block comment). 100 TB shape: assignment
    is the driver-inlined-centroid projection, then ONE (cell, label)
    map-combinable aggregate and one tiny per-cell reduce; nothing
    shuffles vectors."""
    from openmetrics_spark.llm.cluster import kmeans_assign

    emb = spread_for_compute(table(spark, sf_dir, "embeddings"))
    assigned = kmeans_assign(
        emb, "vec_id", "embedding", k=_KM_K, iters=_KM_ITERS, dim=_KM_DIM
    )
    lab_guard = F.coalesce(
        F.assert_true(
            (F.col("label") >= 0) & (F.col("label") < _PURITY_PACK),
            F.lit("label outside [0, 1024) breaks the purity packing"),
        ).cast("long"),
        F.lit(0),
    )
    m = (
        assigned.join(
            emb.select(F.col("vec_id").alias("vid"), "label"), "vid"
        )
        .groupBy("cell", "label")
        .agg((F.count(F.lit(1)) + F.max(lab_guard)).cast("long").alias("n"))
    )
    per = m.groupBy("cell").agg(
        F.sum("n").cast("long").alias("cell_size"),
        F.max(F.col("n") * _PURITY_PACK - F.col("label")).alias("pk"),
    )
    maj_n = F.floor((F.col("pk") + (_PURITY_PACK - 1)) / _PURITY_PACK).cast(
        "long"
    )
    return per.select(
        F.col("cell").cast("long").alias("cell"),
        "cell_size",
        maj_n.alias("majority_n"),
        (-(F.col("pk") - maj_n * _PURITY_PACK)).cast("long").alias(
            "majority_label"
        ),
        F.round(maj_n / F.col("cell_size"), 6).alias("purity"),
    )


# ---------------------------------------------------------------------------
# Sliding-window chunking with overlap (RAG/context prep)
# ---------------------------------------------------------------------------
#
# corpus_pack_chunks packs documents INTO fixed token budgets; the
# retrieval-side prep is the opposite cut: split each document into
# fixed-size windows with overlap (stride < window) so no boundary
# sentence is ever lost to a hard cut. The gate is content-level:
# every chunk row carries the md5 of its space-joined tokens, so a
# one-token drift at any window boundary flips the hash.

_CHUNK_TOKENS = 32
_CHUNK_STRIDE = 24  # 25% overlap

_CHUNK_OVERLAP_ORACLE = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
)
SELECT doc_id,
       CAST(s // {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(s AS BIGINT) AS start_tok,
       CAST(len(tok[s+1 : s+{_CHUNK_TOKENS}]) AS BIGINT) AS n_in_chunk,
       md5(array_to_string(tok[s+1 : s+{_CHUNK_TOKENS}], ' ')) AS chunk_md5
FROM t, unnest(range(0, len(tok), {_CHUNK_STRIDE})) AS u(s)
"""


@register(
    "corpus_chunk_overlap",
    oracle=_CHUNK_OVERLAP_ORACLE,
    tags=("llm", "pipeline"),
)
def corpus_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window chunking: every document becomes
    ceil(n_tok/stride) windows of up to 32 tokens sliding by 24, each
    chunk hash-pinned by the md5 of its joined tokens (see block
    comment). 100 TB shape: pure per-row array ops — tokenize once,
    one explode of start offsets, no shuffle at all until a consumer
    aggregates; output grows ~n_tokens/stride, the expected chunk
    inflation."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", tokens("text").alias("tok"))
    n = F.size("tok")
    exploded = t.filter(n > 0).select(
        "doc_id",
        "tok",
        F.explode(
            F.sequence(F.lit(0), n - 1, F.lit(_CHUNK_STRIDE))
        ).alias("s"),
    )
    chunk = F.slice(F.col("tok"), F.col("s") + 1, _CHUNK_TOKENS)
    return exploded.select(
        "doc_id",
        F.floor(F.col("s") / _CHUNK_STRIDE).cast("long").alias("chunk_idx"),
        F.col("s").cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_in_chunk"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# Incremental curation admission: a new batch vs the STANDING corpus
# ---------------------------------------------------------------------------
#
# The r9 curation pipeline is one-shot; the operational shape at
# 100 TB is a new document batch arriving against an EXISTING curated
# corpus. Even doc_ids play the standing corpus, odd the incoming
# batch. The batch flows through the standing state:
#   p1  exact dedup against the existing md5 set (a bloom/set probe
#       at scale — never recomputes the corpus);
#   p2  near-dup check against the STANDING LSH band index (the
#       minhash_incremental_pairs asymmetric probe: per-batch cost
#       linear in the batch, the existing side a persisted index);
#   p3  token-budget admission against the REMAINING standing budget:
#       the corpus-wide target is 30% of total tokens, the existing
#       corpus's own greedy run already consumed C_s per source, and
#       the arriving batch grows the pie — so the batch competes for
#       floor(0.3 * (T_existing + T_surviving_batch)) - C_s, in
#       quality order, through the same grid-bounded admission core;
#   p4  deterministic shard assignment for the admitted docs (the
#       corpus_curation_pipeline hash).
# rem_<source> rows pin the remaining-budget arithmetic itself;
# src_<source> rows pin the per-source admission. The DuckDB oracle
# replays the FULL standing state (existing admission, band index,
# budget ledger) relationally.

_INCR_ADMIT_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source, text,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), d AS (
  SELECT doc_id, source, CAST(len(tok) AS BIGINT) AS n_tok,
         {_BUDGET_SQL_QINT} AS q_int
  FROM t
), de AS (SELECT * FROM d WHERE doc_id % 2 = 0),
db AS (SELECT * FROM d WHERE doc_id % 2 = 1),
be AS (
  SELECT source, CAST(floor(0.3 * sum(n_tok)) AS BIGINT) AS budget_e
  FROM de GROUP BY 1
), ce AS (
  SELECT de.*, be.budget_e,
         sum(n_tok) OVER (PARTITION BY de.source
                          ORDER BY q_int DESC, doc_id ASC
                          ROWS UNBOUNDED PRECEDING) AS cum_tok
  FROM de JOIN be USING (source)
), consumed AS (
  SELECT source, CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS c_tok
  FROM ce WHERE cum_tok <= budget_e GROUP BY source
),
s1 AS (
  SELECT db.* FROM db JOIN t USING (doc_id)
  WHERE md5(t.text) NOT IN
        (SELECT md5(t2.text) FROM t t2 WHERE t2.doc_id % 2 = 0)
),
g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(len(tok) - 2),
                                      i -> {_JACCARD_SQL_HASH})) AS sh
  FROM t WHERE len(tok) >= 3
), sig AS (
  SELECT doc_id, sh,
         list_transform(range(16),
           i -> list_min(list_transform(sh, x -> {_MH_HASH}))) AS sg
  FROM g
), banded AS (
  SELECT doc_id, sh,
         unnest(list_transform(range(4), b ->
           CAST(('0x' || substr(md5(CAST(b AS VARCHAR) || '_' ||
             array_to_string(sg[(b*4+1):(b*4+4)], '_')), 1, 15)) AS BIGINT)
         )) AS bk
  FROM sig
), ndp AS (
  SELECT DISTINCT i.doc_id AS incoming_id, e.doc_id AS existing_id
  FROM banded i JOIN banded e USING (bk)
  WHERE i.doc_id IN (SELECT doc_id FROM s1) AND e.doc_id % 2 = 0
), nds AS (
  SELECT incoming_id,
         round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
               6) AS j
  FROM ndp
  JOIN g a ON a.doc_id = incoming_id
  JOIN g b ON b.doc_id = existing_id
), ndrej AS (SELECT DISTINCT incoming_id AS doc_id FROM nds WHERE j >= 0.5),
s2 AS (
  SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM ndrej)
),
tot AS (
  SELECT source, CAST(sum(n_tok) AS BIGINT) AS t_all
  FROM (SELECT source, n_tok FROM de
        UNION ALL SELECT source, n_tok FROM s2)
  GROUP BY 1
), remb AS (
  SELECT tot.source,
         greatest(CAST(0 AS BIGINT),
                  CAST(floor(0.3 * t_all) AS BIGINT)
                  - coalesce(c.c_tok, 0)) AS rem_tokens
  FROM tot LEFT JOIN consumed c USING (source)
), adm AS (
  SELECT s2.*, r.rem_tokens,
         sum(n_tok) OVER (PARTITION BY s2.source
                          ORDER BY q_int DESC, doc_id ASC
                          ROWS UNBOUNDED PRECEDING) AS cum_tok
  FROM s2 JOIN remb r USING (source)
), admitted AS (SELECT * FROM adm WHERE cum_tok <= rem_tokens)
SELECT 'p0_batch' AS stage,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS n_tokens
FROM db
UNION ALL
SELECT 'p1_exact_survivors', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT)
FROM s1
UNION ALL
SELECT 'p2_neardup_survivors', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT)
FROM s2
UNION ALL
SELECT 'p3_admitted', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT)
FROM admitted
UNION ALL
SELECT 'rem_' || source, CAST(0 AS BIGINT), rem_tokens FROM remb
UNION ALL
SELECT 'src_' || source, CAST(count(*) AS BIGINT),
       CAST(sum(n_tok) AS BIGINT)
FROM admitted GROUP BY source
UNION ALL
SELECT 'p4_shard_' || CAST({_PIPE_SHARD_GATE} % {_PIPE_SHARDS} AS VARCHAR),
       CAST(count(*) AS BIGINT), CAST(sum(n_tok) AS BIGINT)
FROM admitted GROUP BY 1
"""


@register(
    "corpus_incremental_admit",
    oracle=_INCR_ADMIT_ORACLE,
    tags=("llm", "pipeline"),
)
def corpus_incremental_admit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental curation admission: the odd-id batch dedupes
    (exact, then asymmetric LSH) against the even-id STANDING corpus,
    competes for the remaining standing token budget in quality order,
    and gets shard assignments — one per-stage manifest with the
    remaining-budget ledger pinned per source (see block comment).
    100 TB: the existing side contributes a persisted md5 set, a
    persisted band index and a per-source (budget, consumed) ledger —
    per-batch cost is linear in the batch; admission reuses the
    grid-bounded core (broadcast levels, one boundary window)."""
    from openmetrics_spark.llm.dedup import minhash_incremental_pairs

    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    t = pin(docs.select("doc_id", "source", "text", tokens("text").alias("tok")))
    d = pin(
        t.select(
            "doc_id",
            "source",
            token_count(F.col("tok")).alias("n_tok"),
            F.floor(quality_score("text", F.col("tok")) * 1000 + F.lit(0.5))
            .cast("long")
            .alias("q_int"),
        )
    )
    de = d.filter(F.col("doc_id") % 2 == 0)
    db = d.filter(F.col("doc_id") % 2 == 1)

    # standing state: what the existing corpus's own greedy run consumed
    adm_e, _be = _grid_budget_admitted(de, 0.3)
    consumed = adm_e.groupBy("source").agg(
        F.sum("n_tok").cast("long").alias("c_tok")
    )

    # p1: exact dedup against the standing md5 set
    eh = (
        t.filter(F.col("doc_id") % 2 == 0)
        .select(F.md5("text").alias("__h"))
        .distinct()
    )
    s1 = pin(
        db.join(t.select("doc_id", F.md5("text").alias("__h")), "doc_id")
        .join(eh, "__h", "left_anti")
        .drop("__h")
    )

    # p2: near-dup against the standing LSH band index
    nd = minhash_incremental_pairs(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.join(s1.select("doc_id"), "doc_id", "left_semi"),
        "doc_id",
        "text",
        n=3,
        num_hashes=16,
        bands=4,
        threshold=0.5,
    )
    s2 = pin(
        s1.join(
            nd.select(F.col("incoming_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        )
    )

    # p3: remaining standing budget per source (pie grows with the batch)
    tot = (
        de.select("source", "n_tok")
        .unionByName(s2.select("source", "n_tok"))
        .groupBy("source")
        .agg(F.sum("n_tok").cast("long").alias("t_all"))
    )
    remb = pin(
        tot.join(consumed, "source", "left").select(
            "source",
            F.greatest(
                F.lit(0).cast("long"),
                F.floor(F.col("t_all") * 0.3).cast("long")
                - F.coalesce(F.col("c_tok"), F.lit(0).cast("long")),
            ).alias("budget_tokens"),
        )
    )
    admitted, _ = _grid_budget_admitted(s2, 0.3, budgets=remb)
    admitted = pin(admitted)

    def _row(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("n_tokens"),
        ).select(F.lit(name).alias("stage"), "n_docs", "n_tokens")

    rem_rows = remb.select(
        F.concat(F.lit("rem_"), F.col("source")).alias("stage"),
        F.lit(0).cast("long").alias("n_docs"),
        F.col("budget_tokens").alias("n_tokens"),
    )
    src_rows = (
        admitted.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .select(
            F.concat(F.lit("src_"), F.col("source")).alias("stage"),
            "n_docs",
            "n_tokens",
        )
    )
    shard_rows = (
        admitted.groupBy(
            F.concat(
                F.lit("p4_shard_"),
                (
                    portable_hash60(
                        F.concat(F.lit("shard_"), F.col("doc_id").cast("string"))
                    )
                    % _PIPE_SHARDS
                ).cast("string"),
            ).alias("stage")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .select("stage", "n_docs", "n_tokens")
    )
    return (
        _row(db, "p0_batch")
        .unionByName(_row(s1, "p1_exact_survivors"))
        .unionByName(_row(s2, "p2_neardup_survivors"))
        .unionByName(_row(admitted, "p3_admitted"))
        .unionByName(rem_rows)
        .unionByName(src_rows)
        .unionByName(shard_rows)
    )


# ---------------------------------------------------------------------------
# Two-batch ledger evolution: the standing state must actually evolve
# ---------------------------------------------------------------------------
#
# corpus_incremental_admit proves ONE admission step against standing
# state; operations run MANY. This query runs two consecutive batches
# and gates the state EVOLUTION between them: batch 1 (doc_id%4==1)
# admits against the standing evens exactly as corpus_incremental_admit
# does; then the md5 set, the LSH band index and the budget ledger all
# GROW by batch 1's admitted set before batch 2 (doc_id%4==3) arrives.
# Budget pie at step k = standing tokens + all dedup-surviving batch
# tokens seen so far; consumed_k = consumed_{k-1} + admitted_k.
#
# Evolution is made provably load-bearing with PLANTED rows (the
# ann_lsh_recall r9 precedent — derived identically in both engines):
# batch 2 additionally carries an exact copy (doc_id + 10^9) of every
# batch-1 doc with doc_id%20==1. A planted copy is exact-rejected iff
# its original's text entered the corpus — standing text, or ADMITTED
# in batch 1 — and survives iff its original was budget-excluded. A
# frozen (non-evolving) index flips plant_exact_rejected and every
# downstream stage. Rejected batch docs never enter any standing
# state; intra-batch exact duplicates are deliberately NOT collapsed
# (both compete — deterministic in both engines; a production ingest
# would pre-dedupe the batch, which is the one-shot pipeline's p2).

_PLANT_OFF = 1_000_000_000

_TWO_BATCH_ORACLE = f"""
WITH alldocs AS MATERIALIZED (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + {_PLANT_OFF}, source, text
  FROM documents WHERE doc_id % 20 = 1
), t AS MATERIALIZED (
  SELECT doc_id, source, text,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM alldocs
), d AS MATERIALIZED (
  SELECT doc_id, source, CAST(len(tok) AS BIGINT) AS n_tok,
         {_BUDGET_SQL_QINT} AS q_int
  FROM t
), de AS MATERIALIZED (SELECT * FROM d WHERE doc_id % 2 = 0),
b1 AS MATERIALIZED (SELECT * FROM d WHERE doc_id % 4 = 1 AND doc_id < {_PLANT_OFF}),
b2 AS MATERIALIZED (SELECT * FROM d
       WHERE (doc_id % 4 = 3 AND doc_id < {_PLANT_OFF})
          OR doc_id >= {_PLANT_OFF}),
be AS (
  SELECT source, CAST(floor(0.3 * sum(n_tok)) AS BIGINT) AS budget_e
  FROM de GROUP BY 1
), ce AS (
  SELECT de.*, be.budget_e,
         sum(n_tok) OVER (PARTITION BY de.source
                          ORDER BY q_int DESC, doc_id ASC
                          ROWS UNBOUNDED PRECEDING) AS cum_tok
  FROM de JOIN be USING (source)
), c0 AS (
  SELECT source, CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS c_tok
  FROM ce WHERE cum_tok <= budget_e GROUP BY source
),
emd5 AS MATERIALIZED (SELECT DISTINCT md5(text) AS h FROM t WHERE doc_id % 2 = 0),
-- shared near-dup machinery over alldocs (planted rows share shingles
-- with their originals by construction)
g AS MATERIALIZED (
  SELECT doc_id,
         list_distinct(list_transform(range(len(tok) - 2),
                                      i -> {_JACCARD_SQL_HASH})) AS sh
  FROM t WHERE len(tok) >= 3
), sig AS MATERIALIZED (
  SELECT doc_id, sh,
         list_transform(range(16),
           i -> list_min(list_transform(sh, x -> {_MH_HASH}))) AS sg
  FROM g
), banded AS MATERIALIZED (
  SELECT doc_id, sh,
         unnest(list_transform(range(4), b ->
           CAST(('0x' || substr(md5(CAST(b AS VARCHAR) || '_' ||
             array_to_string(sg[(b*4+1):(b*4+4)], '_')), 1, 15)) AS BIGINT)
         )) AS bk
  FROM sig
),
-- ---- batch 1 ----
s1_1 AS MATERIALIZED (
  SELECT b1.* FROM b1 JOIN t USING (doc_id)
  WHERE md5(t.text) NOT IN (SELECT h FROM emd5)
), ndp1 AS (
  SELECT DISTINCT i.doc_id AS incoming_id, e.doc_id AS existing_id
  FROM banded i JOIN banded e USING (bk)
  WHERE i.doc_id IN (SELECT doc_id FROM s1_1) AND e.doc_id % 2 = 0
), nds1 AS (
  SELECT incoming_id,
         round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
               6) AS j
  FROM ndp1
  JOIN g a ON a.doc_id = incoming_id
  JOIN g b ON b.doc_id = existing_id
), ndrej1 AS (SELECT DISTINCT incoming_id AS doc_id FROM nds1 WHERE j >= 0.5),
s2_1 AS MATERIALIZED (SELECT * FROM s1_1 WHERE doc_id NOT IN (SELECT doc_id FROM ndrej1)),
tot1 AS (
  SELECT source, CAST(sum(n_tok) AS BIGINT) AS pie
  FROM (SELECT source, n_tok FROM de UNION ALL SELECT source, n_tok FROM s2_1)
  GROUP BY 1
), rem1 AS (
  SELECT tot1.source,
         greatest(CAST(0 AS BIGINT),
                  CAST(floor(0.3 * pie) AS BIGINT) - coalesce(c0.c_tok, 0))
           AS rem_tokens
  FROM tot1 LEFT JOIN c0 USING (source)
), adm1 AS (
  SELECT s2_1.*, r.rem_tokens,
         sum(n_tok) OVER (PARTITION BY s2_1.source
                          ORDER BY q_int DESC, doc_id ASC
                          ROWS UNBOUNDED PRECEDING) AS cum_tok
  FROM s2_1 JOIN rem1 r USING (source)
), a1 AS MATERIALIZED (SELECT * FROM adm1 WHERE cum_tok <= rem_tokens),
c1 AS MATERIALIZED (
  SELECT s.source,
         CAST(coalesce(c0.c_tok, 0)
              + coalesce((SELECT sum(a1.n_tok) FROM a1
                          WHERE a1.source = s.source), 0) AS BIGINT) AS c_tok
  FROM (SELECT DISTINCT source FROM d) s LEFT JOIN c0 USING (source)
),
-- ---- batch 2 against the EVOLVED state ----
md5_2 AS MATERIALIZED (
  SELECT h FROM emd5
  UNION
  SELECT md5(t.text) AS h FROM a1 JOIN t USING (doc_id)
), s1_2 AS MATERIALIZED (
  SELECT b2.* FROM b2 JOIN t USING (doc_id)
  WHERE md5(t.text) NOT IN (SELECT h FROM md5_2)
), ndp2 AS (
  SELECT DISTINCT i.doc_id AS incoming_id, e.doc_id AS existing_id
  FROM banded i JOIN banded e USING (bk)
  WHERE i.doc_id IN (SELECT doc_id FROM s1_2)
    AND (e.doc_id % 2 = 0 OR e.doc_id IN (SELECT doc_id FROM a1))
), nds2 AS (
  SELECT incoming_id,
         round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
               6) AS j
  FROM ndp2
  JOIN g a ON a.doc_id = incoming_id
  JOIN g b ON b.doc_id = existing_id
), ndrej2 AS (SELECT DISTINCT incoming_id AS doc_id FROM nds2 WHERE j >= 0.5),
s2_2 AS MATERIALIZED (SELECT * FROM s1_2 WHERE doc_id NOT IN (SELECT doc_id FROM ndrej2)),
tot2 AS (
  SELECT source, CAST(sum(n_tok) AS BIGINT) AS pie
  FROM (SELECT source, n_tok FROM de
        UNION ALL SELECT source, n_tok FROM s2_1
        UNION ALL SELECT source, n_tok FROM s2_2)
  GROUP BY 1
), rem2 AS MATERIALIZED (
  SELECT tot2.source,
         greatest(CAST(0 AS BIGINT),
                  CAST(floor(0.3 * pie) AS BIGINT) - coalesce(c1.c_tok, 0))
           AS rem_tokens
  FROM tot2 LEFT JOIN c1 USING (source)
), adm2 AS (
  SELECT s2_2.*, r.rem_tokens,
         sum(n_tok) OVER (PARTITION BY s2_2.source
                          ORDER BY q_int DESC, doc_id ASC
                          ROWS UNBOUNDED PRECEDING) AS cum_tok
  FROM s2_2 JOIN rem2 r USING (source)
), a2 AS MATERIALIZED (SELECT * FROM adm2 WHERE cum_tok <= rem_tokens),
plant AS (SELECT * FROM b2 WHERE doc_id >= {_PLANT_OFF})
SELECT 'b1_in' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS n_tokens FROM b1
UNION ALL SELECT 'b1_exact_surv', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM s1_1
UNION ALL SELECT 'b1_nd_surv', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM s2_1
UNION ALL SELECT 'b1_admitted', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM a1
UNION ALL SELECT 'b2_in', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM b2
UNION ALL SELECT 'b2_exact_surv', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM s1_2
UNION ALL SELECT 'b2_nd_surv', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM s2_2
UNION ALL SELECT 'b2_admitted', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM a2
UNION ALL SELECT 'plant_in', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM plant
UNION ALL
SELECT 'plant_exact_rejected', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT)
FROM plant WHERE doc_id NOT IN (SELECT doc_id FROM s1_2)
UNION ALL
SELECT 'led_' || source, CAST(0 AS BIGINT),
       CAST(c_tok + coalesce((SELECT sum(a2.n_tok) FROM a2
                              WHERE a2.source = c1.source), 0) AS BIGINT)
FROM c1
UNION ALL
SELECT 'rem_' || source, CAST(0 AS BIGINT), rem_tokens FROM rem2
"""


@register(
    "corpus_two_batch_ledger",
    oracle=_TWO_BATCH_ORACLE,
    tags=("llm", "pipeline"),
)
def corpus_two_batch_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two consecutive incremental admissions with the standing state
    (md5 set, LSH band index, budget ledger) EVOLVING between them,
    planted batch-1 copies in batch 2 making the evolution provably
    load-bearing (see block comment). 100 TB: each step is the
    linear-in-batch corpus_incremental_admit shape; the evolved state
    is the same persisted md5 set / band index / two-longs-per-source
    ledger, grown by one append per step."""
    from openmetrics_spark.llm.dedup import minhash_incremental_pairs

    base = spread_for_compute(table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "text"
    )
    planted = base.filter(F.col("doc_id") % 20 == 1).select(
        (F.col("doc_id") + F.lit(_PLANT_OFF)).alias("doc_id"), "source", "text"
    )
    alldocs = pin(base.unionByName(planted))
    t = pin(
        alldocs.select("doc_id", "source", "text", tokens("text").alias("tok"))
    )
    d = pin(
        t.select(
            "doc_id",
            "source",
            token_count(F.col("tok")).alias("n_tok"),
            F.floor(quality_score("text", F.col("tok")) * 1000 + F.lit(0.5))
            .cast("long")
            .alias("q_int"),
        )
    )
    de = d.filter(F.col("doc_id") % 2 == 0)
    b1 = d.filter((F.col("doc_id") % 4 == 1) & (F.col("doc_id") < _PLANT_OFF))
    b2 = d.filter(
        ((F.col("doc_id") % 4 == 3) & (F.col("doc_id") < _PLANT_OFF))
        | (F.col("doc_id") >= _PLANT_OFF)
    )

    adm_e, _ = _grid_budget_admitted(de, 0.3)
    c0 = adm_e.groupBy("source").agg(F.sum("n_tok").cast("long").alias("c_tok"))
    emd5 = (
        t.filter(F.col("doc_id") % 2 == 0)
        .select(F.md5("text").alias("__h"))
        .distinct()
    )
    tmd5 = t.select("doc_id", F.md5("text").alias("__h"))

    def step(
        batch: DataFrame,
        md5_set: DataFrame,
        index_docs: DataFrame,
        consumed: DataFrame,
        prior_surv: list[DataFrame],
    ):
        """One admission step: (exact survivors, nd survivors,
        admitted, remaining-budget frame)."""
        s1 = pin(batch.join(tmd5, "doc_id").join(md5_set, "__h", "left_anti").drop("__h"))
        nd = minhash_incremental_pairs(
            index_docs,
            alldocs.join(s1.select("doc_id"), "doc_id", "left_semi"),
            "doc_id",
            "text",
            n=3,
            num_hashes=16,
            bands=4,
            threshold=0.5,
        )
        s2 = pin(
            s1.join(
                nd.select(F.col("incoming_id").alias("doc_id")).distinct(),
                "doc_id",
                "left_anti",
            )
        )
        pie = de.select("source", "n_tok")
        for f in [*prior_surv, s2]:
            pie = pie.unionByName(f.select("source", "n_tok"))
        tot = pie.groupBy("source").agg(F.sum("n_tok").cast("long").alias("pie"))
        remb = pin(
            tot.join(consumed, "source", "left").select(
                "source",
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor(F.col("pie") * 0.3).cast("long")
                    - F.coalesce(F.col("c_tok"), F.lit(0).cast("long")),
                ).alias("budget_tokens"),
            )
        )
        adm, _ = _grid_budget_admitted(s2, 0.3, budgets=remb)
        return s1, s2, pin(adm), remb

    evens = base.filter(F.col("doc_id") % 2 == 0)
    s1_1, s2_1, a1, _rem1 = step(b1, emd5, evens, c0, [])
    # ---- the state EVOLVES: md5 set, band index, ledger grow by a1.
    # localCheckpoint CUTS the lineage here — semantically this IS the
    # deployment boundary (the standing index/set/ledger are PERSISTED
    # between batches), and without the cut batch 2's minhash subgraph
    # re-expands batch 1's whole admission plan inside every one of its
    # 16 signature aggregates (optimizer blow-up measured in minutes at
    # sf0.001; the same lineage-cut the CC pointer-jumping loop uses).
    a1 = a1.localCheckpoint(eager=True)
    s2_1 = s2_1.localCheckpoint(eager=True)
    md5_2 = emd5.unionByName(
        tmd5.join(a1.select("doc_id"), "doc_id", "left_semi").select("__h")
    ).distinct()
    index_2 = evens.unionByName(
        alldocs.join(a1.select("doc_id"), "doc_id", "left_semi")
    )
    all_sources = d.select("source").distinct()
    c1 = pin(
        all_sources.join(c0, "source", "left")
        .join(
            a1.groupBy("source").agg(F.sum("n_tok").cast("long").alias("__a1")),
            "source",
            "left",
        )
        .select(
            "source",
            (
                F.coalesce(F.col("c_tok"), F.lit(0).cast("long"))
                + F.coalesce(F.col("__a1"), F.lit(0).cast("long"))
            ).alias("c_tok"),
        )
    )
    s1_2, s2_2, a2, rem2 = step(b2, md5_2, index_2, c1, [s2_1])

    plant = b2.filter(F.col("doc_id") >= _PLANT_OFF)
    plant_rej = plant.join(s1_2.select("doc_id"), "doc_id", "left_anti")

    def _row(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("n_tokens"),
        ).select(F.lit(name).alias("stage"), "n_docs", "n_tokens")

    led = c1.join(
        a2.groupBy("source").agg(F.sum("n_tok").cast("long").alias("__a2")),
        "source",
        "left",
    ).select(
        F.concat(F.lit("led_"), F.col("source")).alias("stage"),
        F.lit(0).cast("long").alias("n_docs"),
        (
            F.col("c_tok") + F.coalesce(F.col("__a2"), F.lit(0).cast("long"))
        ).alias("n_tokens"),
    )
    rem = rem2.select(
        F.concat(F.lit("rem_"), F.col("source")).alias("stage"),
        F.lit(0).cast("long").alias("n_docs"),
        F.col("budget_tokens").alias("n_tokens"),
    )
    return (
        _row(b1, "b1_in")
        .unionByName(_row(s1_1, "b1_exact_surv"))
        .unionByName(_row(s2_1, "b1_nd_surv"))
        .unionByName(_row(a1, "b1_admitted"))
        .unionByName(_row(b2, "b2_in"))
        .unionByName(_row(s1_2, "b2_exact_surv"))
        .unionByName(_row(s2_2, "b2_nd_surv"))
        .unionByName(_row(a2, "b2_admitted"))
        .unionByName(_row(plant, "plant_in"))
        .unionByName(_row(plant_rej, "plant_exact_rejected"))
        .unionByName(led)
        .unionByName(rem)
    )


# ---------------------------------------------------------------------------
# Incremental ANN index maintenance: assign new vectors, no retrain
# ---------------------------------------------------------------------------
#
# The IVF/cell tier's operational counterpart of corpus_incremental_admit:
# a batch of NEW vectors (odd vec_ids) arrives against a STANDING cell
# index trained on the existing vectors (even vec_ids). Retraining
# would move every standing vector's cell — a full index rebuild — so
# maintenance assigns the new batch against the FROZEN centroids. The
# manifest pins, per cell, the standing population, the incoming
# population, and a bit_xor hash over the incoming (vec_id, cell)
# assignments — any single vector landing in the wrong cell flips it.

_INCR_ASSIGN_HASH = (
    "CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '_' "
    "|| CAST(cell AS VARCHAR)), 1, 15)) AS BIGINT)"
)

_INCR_ASSIGN_ORACLE = (
    "WITH "
    + ", ".join(
        _kmeans_ctes_for(
            "", _KM_K, _KM_ITERS, _KM_DIM, "embedding",
            where=" WHERE vec_id % 2 = 0",
        )
    )
    + f""",
newd AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)
                     AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id % 2 = 1
),
newa AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT d.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY d.vec_id
             ORDER BY list_cosine_similarity(d.v, c.cv) DESC, c.cid DESC
           ) AS rn
    FROM newd d CROSS JOIN c{_KM_ITERS - 1} c
  ) WHERE rn = 1
),
cells AS (
  SELECT cell FROM a{_KM_ITERS}
  UNION
  SELECT cell FROM newa
),
sn AS (SELECT cell, count(*) AS n FROM a{_KM_ITERS} GROUP BY 1),
nn AS (
  SELECT cell, count(*) AS n,
         bit_xor({_INCR_ASSIGN_HASH}) AS h
  FROM newa GROUP BY 1
)
SELECT CAST(cells.cell AS BIGINT) AS cell,
       CAST(coalesce(sn.n, 0) AS BIGINT) AS standing_n,
       CAST(coalesce(nn.n, 0) AS BIGINT) AS incoming_n,
       CAST(coalesce(nn.h, 0) AS BIGINT) AS assign_hash
FROM cells LEFT JOIN sn USING (cell) LEFT JOIN nn USING (cell)
"""
)


@register(
    "embedding_incremental_assign",
    oracle=_INCR_ASSIGN_ORACLE,
    tags=("llm", "similarity"),
)
def embedding_incremental_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index maintenance: the odd-id vector batch is assigned to
    the cell index trained on the even-id standing vectors WITHOUT
    retraining; per cell, the standing and incoming populations plus a
    per-vector assignment hash (see block comment). 100 TB: centroids
    are k x dim longs of driver state; the incoming assignment is a
    join-free narrow projection, linear in the batch — the standing
    corpus is never rescanned."""
    from openmetrics_spark.llm.cluster import kmeans_assign_new

    emb = spread_for_compute(table(spark, sf_dir, "embeddings"))
    standing, incoming = kmeans_assign_new(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
        "vec_id",
        "embedding",
        k=_KM_K,
        iters=_KM_ITERS,
        dim=_KM_DIM,
    )
    sn = standing.groupBy("cell").agg(F.count(F.lit(1)).alias("sn"))
    nn = incoming.groupBy("cell").agg(
        F.count(F.lit(1)).alias("nn"),
        F.expr(
            "bit_xor(CAST(conv(substring(md5(concat(CAST(vid AS STRING), '_',"
            " CAST(cell AS STRING))), 1, 15), 16, 10) AS BIGINT))"
        ).alias("h"),
    )
    cells = (
        standing.select("cell").unionByName(incoming.select("cell")).distinct()
    )
    return (
        cells.join(sn, "cell", "left")
        .join(nn, "cell", "left")
        .select(
            F.col("cell").cast("long").alias("cell"),
            F.coalesce(F.col("sn"), F.lit(0)).cast("long").alias("standing_n"),
            F.coalesce(F.col("nn"), F.lit(0)).cast("long").alias("incoming_n"),
            F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("assign_hash"),
        )
    )


# ---------------------------------------------------------------------------
# Quality-drift monitor: incoming batch vs standing corpus
# ---------------------------------------------------------------------------
#
# The monitoring op every ingest pipeline runs next to admission: has
# the incoming batch's quality DISTRIBUTION drifted from the standing
# corpus's? The halves split on a HASH of the doc id (not a modulus:
# the fixture's source rides doc_id % 20, so any small-modulus split
# is constant within a source and the monitor would degenerate to
# one-sided zero-drift rows). Both halves histogram onto a shared
# 10-bucket grid of the
# (already cross-engine-exact) 1001-point quality score, and the drift
# statistic is an EXACT integer form of the L1 histogram distance:
#     l1_scaled = sum_i | c_inc[i] * n_sta - c_sta[i] * n_inc |
# (the common-denominator form of sum |p_inc - p_sta| — no division,
# no float, hash-exact in both engines). Alerting thresholds divide by
# n_sta * n_inc downstream.

_DRIFT_BUCKETS = 10

_QUALITY_DRIFT_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), d AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5('drift_' || CAST(doc_id AS VARCHAR)),
                              1, 15)) AS BIGINT) % 2 AS half,
         least({_DRIFT_BUCKETS - 1}, {_BUDGET_SQL_QINT} * {_DRIFT_BUCKETS} // 1001)
           AS b
  FROM t
), h AS (
  SELECT source, half, b, CAST(count(*) AS BIGINT) AS c
  FROM d GROUP BY 1, 2, 3
), n AS (
  SELECT source,
         CAST(coalesce(sum(CASE WHEN half = 0 THEN c END), 0) AS BIGINT) AS n_sta,
         CAST(coalesce(sum(CASE WHEN half = 1 THEN c END), 0) AS BIGINT) AS n_inc
  FROM h GROUP BY 1
), grid AS (
  SELECT s.source, g.b, n.n_sta, n.n_inc,
         CAST(coalesce(sta.c, 0) AS BIGINT) AS c_sta,
         CAST(coalesce(inc.c, 0) AS BIGINT) AS c_inc
  FROM (SELECT DISTINCT source FROM d) s
  CROSS JOIN range({_DRIFT_BUCKETS}) g(b)
  JOIN n USING (source)
  LEFT JOIN h sta ON sta.source = s.source AND sta.b = g.b AND sta.half = 0
  LEFT JOIN h inc ON inc.source = s.source AND inc.b = g.b AND inc.half = 1
)
SELECT source, n_sta, n_inc,
       CAST(sum(abs(c_inc * n_sta - c_sta * n_inc)) AS BIGINT) AS l1_scaled
FROM grid GROUP BY 1, 2, 3
"""


@register(
    "corpus_quality_drift",
    oracle=_QUALITY_DRIFT_ORACLE,
    tags=("llm", "monitor"),
)
def corpus_quality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-distribution drift between the standing
    corpus (even ids) and the incoming batch (odd ids): shared
    10-bucket histograms over the exact quality grid, L1 distance in
    the common-denominator integer form (see block comment). 100 TB:
    one map-combinable (source, half, bucket) aggregate over the scan;
    the drift arithmetic runs on the tiny histogram frame."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", "source", tokens("text").alias("tok"))
    q_int = (
        F.floor(quality_score("text", F.col("tok")) * 1000 + F.lit(0.5))
        .cast("long")
    )
    d = t.select(
        "source",
        (
            portable_hash60(
                F.concat(F.lit("drift_"), F.col("doc_id").cast("string"))
            )
            % 2
        ).alias("half"),
        F.least(
            F.lit(_DRIFT_BUCKETS - 1).cast("long"),
            ((q_int * _DRIFT_BUCKETS) / F.lit(1001)).cast("long"),
        ).alias("b"),
    )
    h = d.groupBy("source", "half", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n = h.groupBy("source").agg(
        F.coalesce(
            F.sum(F.when(F.col("half") == 0, F.col("c"))), F.lit(0)
        ).cast("long").alias("n_sta"),
        F.coalesce(
            F.sum(F.when(F.col("half") == 1, F.col("c"))), F.lit(0)
        ).cast("long").alias("n_inc"),
    )
    grid = (
        d.select("source").distinct()
        .crossJoin(
            spark.range(_DRIFT_BUCKETS).select(F.col("id").alias("b"))
        )
        .join(n, "source")
        .join(
            h.filter(F.col("half") == 0).select(
                "source", "b", F.col("c").alias("c_sta")
            ),
            ["source", "b"],
            "left",
        )
        .join(
            h.filter(F.col("half") == 1).select(
                "source", "b", F.col("c").alias("c_inc")
            ),
            ["source", "b"],
            "left",
        )
        .select(
            "source",
            "n_sta",
            "n_inc",
            F.coalesce(F.col("c_sta"), F.lit(0)).cast("long").alias("c_sta"),
            F.coalesce(F.col("c_inc"), F.lit(0)).cast("long").alias("c_inc"),
        )
    )
    return grid.groupBy("source", "n_sta", "n_inc").agg(
        F.sum(
            F.abs(
                F.col("c_inc") * F.col("n_sta")
                - F.col("c_sta") * F.col("n_inc")
            )
        )
        .cast("long")
        .alias("l1_scaled")
    )


# ---------------------------------------------------------------------------
# streaming quality-drift monitor (r10 verdict #7): the batch L1 form is
# map-combinable, so the windowed streaming monitor is one tumbling
# window()-groupBy over the SAME (source, half, bucket) histogram — the
# operational shape: per-hour drift alarms over an arriving corpus.
# Event time is derived deterministically from doc_id (documents carry
# no timestamp), spreading the corpus over four hours so the gate
# covers multiple window emissions, a mid-stream watermark, and the
# final flush. The drift arithmetic stays a batch post-pass over the
# drained histogram (O(windows x sources x 10) rows).
# ---------------------------------------------------------------------------

_DRIFT_HOUR_MS = 3_600_000
_DRIFT_SPAN_MS = 4 * _DRIFT_HOUR_MS
_DRIFT_BASE_MS = 1_700_000_000_000
# Knuth multiplicative constant: big enough that consecutive doc_ids
# land hours apart (997 put every sf0.001 doc in hour 0 — one window
# emission gates nothing)
_DRIFT_MULT = 2_654_435_761

_STREAM_DRIFT_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         {_DRIFT_BASE_MS} + (doc_id * {_DRIFT_MULT}) % {_DRIFT_SPAN_MS} AS ms,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), d AS (
  SELECT source,
         (ms // {_DRIFT_HOUR_MS}) * {_DRIFT_HOUR_MS} AS window_start_ms,
         {portable_hash60_sql("'drift_' || CAST(doc_id AS VARCHAR)")} % 2
           AS half,
         least({_DRIFT_BUCKETS - 1}, {_BUDGET_SQL_QINT} * {_DRIFT_BUCKETS} // 1001)
           AS b
  FROM t
), h AS (
  SELECT source, window_start_ms, half, b, CAST(count(*) AS BIGINT) AS c
  FROM d GROUP BY 1, 2, 3, 4
), n AS (
  SELECT source, window_start_ms,
         CAST(coalesce(sum(CASE WHEN half = 0 THEN c END), 0) AS BIGINT) AS n_sta,
         CAST(coalesce(sum(CASE WHEN half = 1 THEN c END), 0) AS BIGINT) AS n_inc
  FROM h GROUP BY 1, 2
), grid AS (
  SELECT s.source, s.window_start_ms, g.b, n.n_sta, n.n_inc,
         CAST(coalesce(sta.c, 0) AS BIGINT) AS c_sta,
         CAST(coalesce(inc.c, 0) AS BIGINT) AS c_inc
  FROM (SELECT DISTINCT source, window_start_ms FROM d) s
  CROSS JOIN range({_DRIFT_BUCKETS}) g(b)
  JOIN n USING (source, window_start_ms)
  LEFT JOIN h sta ON sta.source = s.source
                 AND sta.window_start_ms = s.window_start_ms
                 AND sta.b = g.b AND sta.half = 0
  LEFT JOIN h inc ON inc.source = s.source
                 AND inc.window_start_ms = s.window_start_ms
                 AND inc.b = g.b AND inc.half = 1
)
SELECT source, window_start_ms, n_sta, n_inc,
       CAST(sum(abs(c_inc * n_sta - c_sta * n_inc)) AS BIGINT) AS l1_scaled
FROM grid GROUP BY 1, 2, 3, 4
"""


@register(
    "streaming_quality_drift",
    oracle=_STREAM_DRIFT_ORACLE,
    tags=("llm", "monitor", "streaming"),
)
def streaming_quality_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus_quality_drift as a WINDOWED STREAMING monitor: documents
    arrive as a multi-batch file stream; a tumbling 1 h window x
    (source, half, quality-bucket) histogram aggregates in append mode
    behind a watermark (windows emit exactly once, when the watermark
    passes their end), and the integer-form L1 drift runs as a batch
    post-pass over the tiny drained histogram. 100 TB: the streaming
    stage is one map-combinable shuffle per window over the scan —
    state per key is a single count — and the drift pass touches
    O(windows x sources x buckets) rows."""
    import os as _os

    from openmetrics_spark.jobs.streaming_flat_output import (
        _drain,
        _restage,
        _stream,
    )
    from openmetrics_spark.queries.streaming_q import (
        _stream_shuffle_partitions,
        _workdir,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "text",
        (
            F.lit(_DRIFT_BASE_MS)
            + (F.col("doc_id") * _DRIFT_MULT) % _DRIFT_SPAN_MS
        ).alias("ms"),
    ).withColumn("ts", F.timestamp_millis("ms"))
    work = _workdir("quality_drift")
    staged = _os.path.join(work, "docs")
    boundaries = [_DRIFT_BASE_MS + _DRIFT_SPAN_MS // 2]
    _restage(spark, docs, staged, "ms", boundaries, sentinel=True)

    # NO in-stream sentinel filter: Catalyst pushes a doc_id predicate
    # BELOW the EventTimeWatermark node (it doesn't touch the event-time
    # column), which would strip the sentinel before it can advance the
    # watermark and leave the last window unflushed. The sentinel
    # self-excludes instead: its far-future window can never emit (the
    # watermark stops 1 ms short of it), so no 'zz' row reaches output.
    s = _stream(spark, staged).withWatermark("ts", "1 millisecond")
    tok = tokens("text")
    q_int = (
        F.floor(quality_score("text", tok) * 1000 + F.lit(0.5)).cast("long")
    )
    hist = (
        s.select(
            "ts",
            "source",
            (
                portable_hash60(
                    F.concat(F.lit("drift_"), F.col("doc_id").cast("string"))
                )
                % 2
            ).alias("half"),
            F.least(
                F.lit(_DRIFT_BUCKETS - 1).cast("long"),
                ((q_int * _DRIFT_BUCKETS) / F.lit(1001)).cast("long"),
            ).alias("b"),
        )
        .groupBy(
            F.window("ts", f"{_DRIFT_HOUR_MS} milliseconds").alias("w"),
            "source",
            "half",
            "b",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "source",
            "half",
            "b",
            "c",
        )
    )
    out = _os.path.join(work, "hist")
    with _stream_shuffle_partitions(spark):
        _drain(hist, out, _os.path.join(work, "_chk", "hist"))

    h = pin(spark.read.parquet(out))
    n = h.groupBy("source", "window_start_ms").agg(
        F.coalesce(
            F.sum(F.when(F.col("half") == 0, F.col("c"))), F.lit(0)
        ).cast("long").alias("n_sta"),
        F.coalesce(
            F.sum(F.when(F.col("half") == 1, F.col("c"))), F.lit(0)
        ).cast("long").alias("n_inc"),
    )
    grid = (
        h.select("source", "window_start_ms").distinct()
        .crossJoin(
            spark.range(_DRIFT_BUCKETS).select(F.col("id").alias("b"))
        )
        .join(n, ["source", "window_start_ms"])
        .join(
            h.filter(F.col("half") == 0).select(
                "source", "window_start_ms", "b", F.col("c").alias("c_sta")
            ),
            ["source", "window_start_ms", "b"],
            "left",
        )
        .join(
            h.filter(F.col("half") == 1).select(
                "source", "window_start_ms", "b", F.col("c").alias("c_inc")
            ),
            ["source", "window_start_ms", "b"],
            "left",
        )
        .select(
            "source",
            "window_start_ms",
            "n_sta",
            "n_inc",
            F.coalesce(F.col("c_sta"), F.lit(0)).cast("long").alias("c_sta"),
            F.coalesce(F.col("c_inc"), F.lit(0)).cast("long").alias("c_inc"),
        )
    )
    return grid.groupBy("source", "window_start_ms", "n_sta", "n_inc").agg(
        F.sum(
            F.abs(
                F.col("c_inc") * F.col("n_sta")
                - F.col("c_sta") * F.col("n_inc")
            )
        )
        .cast("long")
        .alias("l1_scaled")
    )


# ---------------------------------------------------------------------------
# streaming incremental admission (r10 verdict #4): the two-batch
# ledger replay as an ACTUAL micro-batched stream. corpus_two_batch_
# ledger drives the state evolution through explicit dataframe plumbing
# in one job; operations run it as arrivals against PERSISTED standing
# state. Here the same two batches arrive as a 2-file stream consumed
# by foreachBatch; the handler knows nothing about batch composition —
# it dedupes whatever arrived (exact md5 anti-join, then asymmetric LSH
# probe against the standing band index), competes it against the
# per-source remaining-budget ledger, appends the admitted set to every
# piece of standing state (md5 set, index docs, pie, ledger — each a
# parquet the next batch reads), and emits the same manifest stages.
# The gate is the SAME full-replay DuckDB oracle as the batch query:
# the stream must reproduce the replay bit-for-bit, planted copies and
# all. 100 TB: per-batch cost linear in the batch (the standing side is
# persisted, band-indexed, never rescanned); state writes are appends.
# ---------------------------------------------------------------------------


def _admission_oracle_n(n: int) -> str:
    """Generate the full-replay oracle for the N-batch admission loop —
    the same CTE chain as ``_TWO_BATCH_ORACLE`` (which stays the
    hand-written, r10-gated N=2 instance) unrolled per step: batch k =
    odd ids with doc_id % 2n == 2k-1, plants ride batch n, and the md5
    set / band-index membership / ledger CTEs accumulate one step at a
    time exactly as the handler's persisted state does."""
    steps = []
    for k in range(1, n + 1):
        cond = f"doc_id % {2 * n} = {2 * k - 1} AND doc_id < {_PLANT_OFF}"
        if k == n:
            cond = f"({cond}) OR doc_id >= {_PLANT_OFF}"
        steps.append(f"b{k} AS MATERIALIZED (SELECT * FROM d WHERE {cond})")
    body = []
    for k in range(1, n + 1):
        md5_prev = "emd5" if k == 1 else f"md5_{k - 1}"
        cl_prev = "cl0" if k == 1 else f"cl{k - 1}"
        index_ors = "".join(
            f" OR e.doc_id IN (SELECT doc_id FROM a{j})" for j in range(1, k)
        )
        pie_unions = "".join(
            f" UNION ALL SELECT source, n_tok FROM s2_{j}"
            for j in range(1, k + 1)
        )
        body.append(f"""
s1_{k} AS MATERIALIZED (
  SELECT b{k}.* FROM b{k} JOIN t USING (doc_id)
  WHERE md5(t.text) NOT IN (SELECT h FROM {md5_prev})
), ndp{k} AS (
  SELECT DISTINCT i.doc_id AS incoming_id, e.doc_id AS existing_id
  FROM banded i JOIN banded e USING (bk)
  WHERE i.doc_id IN (SELECT doc_id FROM s1_{k})
    AND (e.doc_id % 2 = 0{index_ors})
), nds{k} AS (
  SELECT incoming_id,
         round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
               6) AS j
  FROM ndp{k}
  JOIN g a ON a.doc_id = incoming_id
  JOIN g b ON b.doc_id = existing_id
), ndrej{k} AS (SELECT DISTINCT incoming_id AS doc_id FROM nds{k} WHERE j >= 0.5),
s2_{k} AS MATERIALIZED (
  SELECT * FROM s1_{k} WHERE doc_id NOT IN (SELECT doc_id FROM ndrej{k})
), tot{k} AS (
  SELECT source, CAST(sum(n_tok) AS BIGINT) AS pie
  FROM (SELECT source, n_tok FROM de{pie_unions}) GROUP BY 1
), rem{k} AS MATERIALIZED (
  SELECT tot{k}.source,
         greatest(CAST(0 AS BIGINT),
                  CAST(floor(0.3 * pie) AS BIGINT)
                  - coalesce({cl_prev}.c_tok, 0)) AS rem_tokens
  FROM tot{k} LEFT JOIN {cl_prev} USING (source)
), adm{k} AS (
  SELECT s2_{k}.*, r.rem_tokens,
         sum(n_tok) OVER (PARTITION BY s2_{k}.source
                          ORDER BY q_int DESC, doc_id ASC
                          ROWS UNBOUNDED PRECEDING) AS cum_tok
  FROM s2_{k} JOIN rem{k} r USING (source)
), a{k} AS MATERIALIZED (SELECT * FROM adm{k} WHERE cum_tok <= rem_tokens),
cl{k} AS MATERIALIZED (
  SELECT c.source,
         CAST(c.c_tok + coalesce((SELECT sum(a{k}.n_tok) FROM a{k}
                                  WHERE a{k}.source = c.source), 0)
              AS BIGINT) AS c_tok
  FROM {cl_prev} c
), md5_{k} AS MATERIALIZED (
  SELECT h FROM {md5_prev}
  UNION
  SELECT md5(t.text) AS h FROM a{k} JOIN t USING (doc_id)
)""")
    rows = []
    for k in range(1, n + 1):
        rows.append(f"""SELECT 'b{k}_in' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS n_tokens FROM b{k}
UNION ALL SELECT 'b{k}_exact_surv', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM s1_{k}
UNION ALL SELECT 'b{k}_nd_surv', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM s2_{k}
UNION ALL SELECT 'b{k}_admitted', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM a{k}""")
    rows.append(f"""SELECT 'plant_in', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM plant
UNION ALL
SELECT 'plant_exact_rejected', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tok), 0) AS BIGINT)
FROM plant WHERE doc_id NOT IN (SELECT doc_id FROM s1_{n})
UNION ALL
SELECT 'led_' || source, CAST(0 AS BIGINT), c_tok FROM cl{n}
UNION ALL
SELECT 'rem_' || source, CAST(0 AS BIGINT), rem_tokens FROM rem{n}""")
    return f"""
WITH alldocs AS MATERIALIZED (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + {_PLANT_OFF}, source, text
  FROM documents WHERE doc_id % 20 = 1
), t AS MATERIALIZED (
  SELECT doc_id, source, text,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM alldocs
), d AS MATERIALIZED (
  SELECT doc_id, source, CAST(len(tok) AS BIGINT) AS n_tok,
         {_BUDGET_SQL_QINT} AS q_int
  FROM t
), de AS MATERIALIZED (SELECT * FROM d WHERE doc_id % 2 = 0),
{", ".join(steps)},
be AS (
  SELECT source, CAST(floor(0.3 * sum(n_tok)) AS BIGINT) AS budget_e
  FROM de GROUP BY 1
), ce AS (
  SELECT de.*, be.budget_e,
         sum(n_tok) OVER (PARTITION BY de.source
                          ORDER BY q_int DESC, doc_id ASC
                          ROWS UNBOUNDED PRECEDING) AS cum_tok
  FROM de JOIN be USING (source)
), c0 AS (
  SELECT source, CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS c_tok
  FROM ce WHERE cum_tok <= budget_e GROUP BY source
), cl0 AS MATERIALIZED (
  SELECT s.source, CAST(coalesce(c0.c_tok, 0) AS BIGINT) AS c_tok
  FROM (SELECT DISTINCT source FROM d) s LEFT JOIN c0 USING (source)
),
emd5 AS MATERIALIZED (SELECT DISTINCT md5(text) AS h FROM t WHERE doc_id % 2 = 0),
g AS MATERIALIZED (
  SELECT doc_id,
         list_distinct(list_transform(range(len(tok) - 2),
                                      i -> {_JACCARD_SQL_HASH})) AS sh
  FROM t WHERE len(tok) >= 3
), sig AS MATERIALIZED (
  SELECT doc_id, sh,
         list_transform(range(16),
           i -> list_min(list_transform(sh, x -> {_MH_HASH}))) AS sg
  FROM g
), banded AS MATERIALIZED (
  SELECT doc_id, sh,
         unnest(list_transform(range(4), b ->
           CAST(('0x' || substr(md5(CAST(b AS VARCHAR) || '_' ||
             array_to_string(sg[(b*4+1):(b*4+4)], '_')), 1, 15)) AS BIGINT)
         )) AS bk
  FROM sig
),{",".join(body)},
plant AS (SELECT * FROM b{n} WHERE doc_id >= {_PLANT_OFF})
{chr(10).join("UNION ALL" + chr(10) + r if i else r for i, r in enumerate(rows))}
"""


_ADMISSION_N4_ORACLE = _admission_oracle_n(4)


def _run_streaming_admission(
    spark: SparkSession,
    sf_dir: str,
    n_batches: int,
    staged_restart: bool = False,
    replay_batches: bool = False,
    insert_empty_batch: bool = False,
) -> DataFrame:
    """The foreachBatch admission loop over ``n_batches`` staged
    arrivals (see block comment). The handler is N-agnostic — it
    dedupes whatever arrives against the persisted standing state and
    appends the admitted set back; only the staging splits the odd ids
    ``n_batches`` ways (batch k = doc_id % 2n == 2k+1; the planted
    copies always ride the LAST batch, so their originals' admission
    decisions have all happened)."""
    import os as _os

    from openmetrics_spark.jobs.streaming_flat_output import _restage, _stream
    from openmetrics_spark.llm.dedup import minhash_incremental_pairs
    from openmetrics_spark.queries.streaming_q import (
        _stream_shuffle_partitions,
        _workdir,
    )

    work = _workdir(f"corpus_admission_n{n_batches}")

    def p(name: str) -> str:
        return _os.path.join(work, name)

    base = spread_for_compute(table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "text"
    )
    planted = base.filter(F.col("doc_id") % 20 == 1).select(
        (F.col("doc_id") + F.lit(_PLANT_OFF)).alias("doc_id"), "source", "text"
    )
    alldocs = base.unionByName(planted)

    def enrich(docs: DataFrame) -> DataFrame:
        """(doc_id, source, text) -> + n_tok, q_int (the d derivation)."""
        tok = tokens("text")
        return docs.select(
            "doc_id",
            "source",
            "text",
            token_count(tok).alias("n_tok"),
            F.floor(quality_score("text", tok) * 1000 + F.lit(0.5))
            .cast("long")
            .alias("q_int"),
        )

    # ---- standing state at deploy time (the evens corpus) ----------
    # Every standing-state surface is VERSIONED PER BATCH (b0 = deploy
    # state, b{k} = batch k's delta, ledger_v{k} = batch k's snapshot)
    # and every batch write is mode("overwrite") of its own version
    # directory. Batch k reads exactly versions 0..k-1, so a micro-
    # batch REPLAYED after a mid-batch failure sees the same as-of-k-1
    # state as the failed attempt and overwrites the partial outputs it
    # left behind — exact-once state evolution under at-least-once
    # batch execution, with the step number derived from the
    # CHECKPOINTED batch_id rather than a side-channel counter.
    evens = base.filter(F.col("doc_id") % 2 == 0)
    de = enrich(evens)
    adm_e, _ = _grid_budget_admitted(de.drop("text"), 0.3)
    c0 = adm_e.groupBy("source").agg(
        F.sum("n_tok").cast("long").alias("c_tok")
    )
    # every source the replay can see starts on the ledger at 0 — the
    # oracle's c1 CTE spans DISTINCT source FROM d the same way
    all_sources = enrich(alldocs).select("source").distinct()
    all_sources.join(c0, "source", "left").select(
        "source",
        F.coalesce(F.col("c_tok"), F.lit(0).cast("long")).alias("c_tok"),
    ).write.parquet(p("ledger_v0"))
    evens.select(F.md5("text").alias("__h")).distinct().write.parquet(
        p(_os.path.join("md5", "b0"))
    )
    evens.write.parquet(p(_os.path.join("index", "b0")))
    de.groupBy("source").agg(
        F.sum("n_tok").cast("long").alias("tok")
    ).write.parquet(p(_os.path.join("pie", "b0")))

    def state_versions(name: str, k: int) -> list[str]:
        """The state surface as of step k-1: version dirs b0..b{k-1}.
        Enumerating EXACTLY this range (not a recursive listing) is
        what excludes a failed attempt's own partial b{k} delta on
        replay. Empty arrival batches write no delta (they also add no
        manifest rows), so missing intermediate versions are skipped."""
        out = [
            p(_os.path.join(name, f"b{j}"))
            for j in range(k)
            if _os.path.isdir(p(_os.path.join(name, f"b{j}")))
        ]
        return out

    def ledger_as_of(k: int) -> DataFrame:
        """The newest ledger version <= k-1. An EMPTY micro-batch
        consumes a batch_id but changes no state (and writes no ledger
        version), so the ledger chain may have gaps under batch_id
        numbering — the newest surviving version IS the as-of-k-1
        state. Scanning down from k-1 (never k) also keeps replay
        exclusion exact: a failed attempt's own partial ledger_v{k}
        is never read back."""
        for j in range(k - 1, -1, -1):
            path = p(f"ledger_v{j}")
            if _os.path.isdir(path):
                return spark.read.parquet(path)
        raise FileNotFoundError(f"no ledger version <= {k - 1} under {work}")

    # ---- the incoming stream: one file per arrival batch ------------
    incoming = (
        alldocs.filter(
            (F.col("doc_id") % 2 == 1) & (F.col("doc_id") < _PLANT_OFF)
        )
        .withColumn(
            "__b",
            ((F.col("doc_id") % (2 * n_batches)) / 2).cast("long"),
        )
        .unionByName(
            alldocs.filter(F.col("doc_id") >= _PLANT_OFF).withColumn(
                "__b", F.lit(n_batches - 1).cast("long")
            )
        )
    )
    # staged_restart: the arrivals are staged in a holding dir and
    # MOVED into the source one batch per stream run — the query stops
    # and RESTARTS between every arrival with the same checkpoint, so
    # the source offsets and the persisted standing state must both
    # survive a process boundary (the operational deploy/restart shape)
    stage_dir = p("in_hold") if staged_restart else p("in")
    boundaries = list(range(1, n_batches))
    if insert_empty_batch:
        # test hook: push the second arrival to slice 2, leaving slice
        # 1 as an aligned 0-row file — an EMPTY micro-batch that
        # consumes a batch_id but evolves no state. Exercises the
        # ledger_as_of gap walk (batch 3 must read ledger_v1, since
        # ledger_v2 was never written).
        incoming = incoming.withColumn(
            "__b",
            F.when(F.col("__b") == 1, F.lit(2).cast("long")).otherwise(
                F.col("__b")
            ),
        )
        boundaries = [1, 2]
    _restage(spark, incoming, stage_dir, "__b", boundaries)

    manifest = p("manifest")
    _os.makedirs(manifest)

    def row(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("n_tokens"),
        ).select(F.lit(name).alias("stage"), "n_docs", "n_tokens")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        raw = batch_df.drop("__b").localCheckpoint(eager=True)
        if raw.isEmpty():
            return
        # the step IS the checkpointed batch id: one staged file per
        # micro-batch (maxFilesPerTrigger=1), ids monotonic within the
        # checkpoint across restarts — a replayed batch re-derives the
        # same k instead of double-incrementing a side-channel counter
        k = int(batch_id) + 1
        dq = enrich(raw).localCheckpoint(eager=True)

        # exact dedup against the standing md5 set (versions 0..k-1)
        s1 = (
            dq.withColumn("__h", F.md5("text"))
            .join(spark.read.parquet(*state_versions("md5", k)), "__h", "left_anti")
            .drop("__h")
            .localCheckpoint(eager=True)
        )
        # LSH probe against the standing band index
        nd = minhash_incremental_pairs(
            spark.read.parquet(*state_versions("index", k)),
            raw.join(s1.select("doc_id"), "doc_id", "left_semi"),
            "doc_id",
            "text",
            n=3,
            num_hashes=16,
            bands=4,
            threshold=0.5,
        )
        s2 = s1.join(
            nd.select(F.col("incoming_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        ).localCheckpoint(eager=True)

        # the budget pie grows by this batch's dedup survivors; the
        # ledger holds what previous steps consumed
        tot = (
            spark.read.parquet(*state_versions("pie", k))
            .unionByName(
                s2.groupBy("source").agg(
                    F.sum("n_tok").cast("long").alias("tok")
                )
            )
            .groupBy("source")
            .agg(F.sum("tok").cast("long").alias("pie"))
        )
        ledger = ledger_as_of(k)
        remb = (
            tot.join(ledger, "source", "left")
            .select(
                "source",
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor(F.col("pie") * 0.3).cast("long")
                    - F.coalesce(F.col("c_tok"), F.lit(0).cast("long")),
                ).alias("budget_tokens"),
            )
            .localCheckpoint(eager=True)
        )
        adm, _ = _grid_budget_admitted(s2.drop("text"), 0.3, budgets=remb)
        adm = adm.localCheckpoint(eager=True)

        # ---- manifest rows for this arrival ----
        out = (
            row(dq, f"b{k}_in")
            .unionByName(row(s1, f"b{k}_exact_surv"))
            .unionByName(row(s2, f"b{k}_nd_surv"))
            .unionByName(row(adm, f"b{k}_admitted"))
        )
        plants = dq.filter(F.col("doc_id") >= _PLANT_OFF)
        if not plants.isEmpty():
            out = out.unionByName(row(plants, "plant_in")).unionByName(
                row(
                    plants.join(s1.select("doc_id"), "doc_id", "left_anti"),
                    "plant_exact_rejected",
                )
            )
        out.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(manifest, f"b{k}")
        )

        # ---- evolve the standing state: every surface writes ONLY its
        # own version directory, mode overwrite — a replayed batch
        # rewrites the same deltas instead of double-appending ----
        raw.join(adm.select("doc_id"), "doc_id", "left_semi").select(
            F.md5("text").alias("__h")
        ).distinct().write.mode("overwrite").parquet(
            p(_os.path.join("md5", f"b{k}"))
        )
        raw.join(adm.select("doc_id"), "doc_id", "left_semi").write.mode(
            "overwrite"
        ).parquet(p(_os.path.join("index", f"b{k}")))
        s2.groupBy("source").agg(
            F.sum("n_tok").cast("long").alias("tok")
        ).write.mode("overwrite").parquet(p(_os.path.join("pie", f"b{k}")))
        ledger.join(
            adm.groupBy("source").agg(
                F.sum("n_tok").cast("long").alias("__a")
            ),
            "source",
            "left",
        ).select(
            "source",
            (
                F.col("c_tok")
                + F.coalesce(F.col("__a"), F.lit(0).cast("long"))
            ).alias("c_tok"),
        ).write.mode("overwrite").parquet(p(f"ledger_v{k}"))
        remb.write.mode("overwrite").parquet(p("rem_last"))

    def handle_maybe_replayed(batch_df: DataFrame, batch_id: int) -> None:
        handle(batch_df, batch_id)
        if replay_batches:
            # test hook: re-execute the batch with the SAME checkpointed
            # id — the at-least-once shape a mid-batch failure produces.
            # Idempotent state evolution means the second run reads the
            # same as-of-k-1 versions and overwrites the same deltas.
            handle(batch_df, batch_id)

    def _drain_once() -> None:
        q = (
            _stream(spark, p("in"))
            .writeStream.foreachBatch(handle_maybe_replayed)
            .option("checkpointLocation", p("_chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with _stream_shuffle_partitions(spark):
        if staged_restart:
            import shutil as _shutil

            files = sorted(
                (f for f in _os.listdir(stage_dir) if not f.startswith("_")),
                key=lambda f: _os.path.getmtime(_os.path.join(stage_dir, f)),
            )
            _os.makedirs(p("in"))
            for f in files:
                _shutil.move(
                    _os.path.join(stage_dir, f), _os.path.join(p("in"), f)
                )
                _drain_once()  # one stream lifetime per arrival
        else:
            _drain_once()

    k_final = max(
        int(d[len("ledger_v"):])
        for d in _os.listdir(work)
        if d.startswith("ledger_v")
    )
    led = spark.read.parquet(p(f"ledger_v{k_final}")).select(
        F.concat(F.lit("led_"), F.col("source")).alias("stage"),
        F.lit(0).cast("long").alias("n_docs"),
        F.col("c_tok").alias("n_tokens"),
    )
    rem = spark.read.parquet(p("rem_last")).select(
        F.concat(F.lit("rem_"), F.col("source")).alias("stage"),
        F.lit(0).cast("long").alias("n_docs"),
        F.col("budget_tokens").alias("n_tokens"),
    )
    batch_manifests = sorted(
        _os.path.join(manifest, d) for d in _os.listdir(manifest)
    )
    return (
        spark.read.parquet(*batch_manifests).unionByName(led).unionByName(rem)
    )


@register(
    "streaming_corpus_admission",
    oracle=_TWO_BATCH_ORACLE,
    tags=("llm", "pipeline", "streaming"),
)
def streaming_corpus_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus_two_batch_ledger as a Structured Streaming foreachBatch
    loop over staged arrivals, standing state persisted between
    micro-batches (see block comment). Unites the curation tier with
    the streaming machinery — the operational form of incremental
    admission. Gated against the SAME full-replay DuckDB oracle as the
    batch query: the stream must reproduce the replay bit-for-bit
    (tests/test_streaming_admission.py also pins row-for-row equality
    with the batch fn locally)."""
    return _run_streaming_admission(spark, sf_dir, n_batches=2)


@register(
    "streaming_admission_restart",
    oracle=_TWO_BATCH_ORACLE,
    tags=("llm", "pipeline", "streaming", "recovery"),
)
def streaming_admission_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The admission loop with a STREAM RESTART between every arrival:
    each batch runs in its own query lifetime against the same
    checkpoint (source offsets resume; no batch is reprocessed) and the
    same persisted standing state (md5 set, band index, ledger). The
    manifest must still reproduce the one-shot full-replay oracle
    bit-for-bit — the deploy/restart shape of the operational ingest,
    gated the same way the r8 checkpoint-restart proofs gate the
    counter streams. State evolution is also idempotent under
    MID-BATCH re-execution (step = checkpointed batch_id; per-batch
    versioned overwrites — see _run_streaming_admission), proven by
    tests/test_streaming_admission.py's double-invocation replay."""
    return _run_streaming_admission(spark, sf_dir, 2, staged_restart=True)


@register(
    "streaming_corpus_admission_n4",
    oracle=_ADMISSION_N4_ORACLE,
    tags=("llm", "pipeline", "streaming"),
)
def streaming_corpus_admission_n4(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The admission loop at FOUR arrival batches (odd ids split
    doc_id%8 ∈ {1,3,5,7}; planted copies ride batch 4): the ledger,
    md5 set and band index evolve through three growth steps before
    the last batch competes, and the generated N-step oracle models
    every one. Proves the operational loop is genuinely N-agnostic —
    nothing in the handler knows the batch count."""
    return _run_streaming_admission(spark, sf_dir, n_batches=4)
