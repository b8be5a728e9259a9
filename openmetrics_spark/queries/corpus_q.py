"""End-to-end training-corpus preparation: the composed pipeline a
100 TB pretraining-data job actually runs, as ONE query —

  stats (tokenize → token counts, quality score, language vote)
    → gate (keep en-voted docs above quality/length floors)
    → exact dedup (keep min doc_id per identical text)
    → near-dup removal (n-gram Jaccard pairs → connected components →
      keep each cluster's canonical)
    → surviving manifest (doc_id, n_tokens, quality)

Every stage is one of the already-oracled operators (doc_token_stats,
doc_lang_guess, doc_exact_dedup, ngram_jaccard_neardup,
doc_dedup_clusters); this query proves they compose — filters stay
pushed down through the stats projection, the dedup stages only ever
shuffle (long, long) pairs, and the final manifest join is a
left_anti against the (tiny) drop list.

The DuckDB oracle replays the identical chain, with a recursive
transitive closure standing in for the distributed label-propagation
connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmetrics_spark.llm.dedup import connected_components, ngram_jaccard_pairs
from openmetrics_spark.llm.text import (
    LANG_MARKERS,
    marker_hits,
    quality_score,
    token_count,
    tokens,
)
from openmetrics_spark.queries import register
from openmetrics_spark.tables import pin, spread_for_compute, table

_MIN_QUALITY = 0.30
_MIN_TOKENS = 20

_STOP_SQL = "['the','and','of','to','a','in','is','that','it','for','on','with','as','this']"
_JACCARD_SQL_HASH = "CAST(('0x' || substr(md5(array_to_string(tok[(i+1):(i+3)], ' ')), 1, 15)) AS BIGINT)"


def _sql_list(lang: str) -> str:
    return "[" + ",".join(f"'{m}'" for m in LANG_MARKERS[lang]) + "]"


_MANIFEST_ORACLE = f"""
WITH RECURSIVE t AS (
  SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), s AS (
  SELECT doc_id, text, tok,
    CAST(len(tok) AS BIGINT) AS n_tokens,
    round(
      0.5 * (CASE WHEN len(tok) > 0
                  THEN CAST(len(list_distinct(tok)) AS DOUBLE) / len(tok)
                  ELSE 0 END)
      + 0.5 * least(
          (CASE WHEN len(tok) > 0
                THEN CAST(len(list_filter(tok, x -> list_contains({_STOP_SQL}, x))) AS DOUBLE) / len(tok)
                ELSE 0 END) * 5, 1.0),
      6) AS quality,
    len(list_filter(tok, x -> list_contains({_sql_list('en')}, x))) AS en_hits,
    len(list_filter(tok, x -> list_contains({_sql_list('de')}, x))) AS de_hits,
    len(list_filter(tok, x -> list_contains({_sql_list('fr')}, x))) AS fr_hits,
    len(list_filter(tok, x -> list_contains({_sql_list('es')}, x))) AS es_hits
  FROM t
), kept AS (
  SELECT * FROM s
  WHERE en_hits >= greatest(de_hits, fr_hits, es_hits)
    AND quality >= {_MIN_QUALITY} AND n_tokens >= {_MIN_TOKENS}
), exact AS (
  SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
), k2 AS (
  SELECT kept.* FROM kept JOIN exact USING (doc_id)
), g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(len(tok) - 2),
                                      i -> {_JACCARD_SQL_HASH})) AS sh
  FROM k2 WHERE len(tok) >= 3
), p AS (
  SELECT doc_id, unnest(sh) AS sid FROM g
), rare AS (
  SELECT sid FROM p GROUP BY sid HAVING count(*) <= 50
), pr AS (
  SELECT p.doc_id, p.sid FROM p JOIN rare USING (sid)
), sz AS (
  SELECT doc_id, count(*) AS sz FROM pr GROUP BY doc_id
), inter AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
  FROM pr x JOIN pr y USING (sid)
  WHERE x.doc_id < y.doc_id
  GROUP BY 1, 2
), edges AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN sz a ON a.doc_id = doc_a
  JOIN sz b ON b.doc_id = doc_b
  WHERE round(CAST(inter AS DOUBLE) / (a.sz + b.sz - inter), 6) >= 0.5
), sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM edges
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM edges
), reach(id, r) AS (
  SELECT src, src FROM sym
  UNION
  SELECT sym.src, reach.r FROM sym JOIN reach ON reach.id = sym.dst
), lab AS (
  SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id
)
SELECT k2.doc_id, k2.n_tokens, k2.quality
FROM k2 LEFT JOIN lab ON k2.doc_id = lab.doc_id
WHERE lab.doc_id IS NULL OR lab.canonical_id = k2.doc_id
"""


@register(
    "corpus_prep_manifest",
    oracle=_MANIFEST_ORACLE,
    tags=("llm", "pipeline"),
)
def corpus_prep_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-prep pipeline (see module docstring). The
    stats projection runs once; the quality/language gate cuts the
    corpus before any dedup shuffle happens, so at 100 TB the
    expensive inverted-index stage only ever sees gated survivors."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", "text", tokens("text").alias("tok"))
    tok = F.col("tok")
    stats = t.select(
        "doc_id",
        "text",
        "tok",
        token_count(tok).alias("n_tokens"),
        quality_score("text", tok).alias("quality"),
        marker_hits(tok, LANG_MARKERS["en"]).alias("en_hits"),
        marker_hits(tok, LANG_MARKERS["de"]).alias("de_hits"),
        marker_hits(tok, LANG_MARKERS["fr"]).alias("fr_hits"),
        marker_hits(tok, LANG_MARKERS["es"]).alias("es_hits"),
    )
    kept = stats.filter(
        (F.col("en_hits") >= F.greatest("de_hits", "fr_hits", "es_hits"))
        & (F.col("quality") >= _MIN_QUALITY)
        & (F.col("n_tokens") >= _MIN_TOKENS)
    )
    # exact dedup: canonical = min doc_id per identical text. The
    # aggregate frame carries only (hash, id); the semi join restores
    # the full stats row for survivors without re-tokenizing.
    exact_ids = (
        kept.groupBy(F.md5("text").alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    # pin only what downstream reads (doc_id, tok, n_tokens, quality):
    # the md5 dedup key is computed from `kept` above, the pair stage
    # consumes tok, and the manifest projects n_tokens/quality — text
    # and the lang-marker hit counts in the cached survivor frame were
    # pure cache footprint (r12 ADVICE)
    k2 = pin(
        kept.join(exact_ids, "doc_id", "left_semi").select(
            "doc_id", "tok", "n_tokens", "quality"
        )
    )
    # pairs from the carried token arrays — skips re-running the
    # tokenize regex over the survivor corpus (r12, guide §1.2)
    pairs = ngram_jaccard_pairs(
        k2.select("doc_id", "tok"), "doc_id",
        n=3, threshold=0.5, max_df=50, tok_col="tok",
    )
    comp = connected_components(pairs, "doc_a", "doc_b")
    drop = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    return k2.join(F.broadcast(drop), "doc_id", "left_anti").select(
        "doc_id", "n_tokens", "quality"
    )


# ---------------------------------------------------------------------------
# corpus vocabulary: top-k token frequencies (the tokenizer-building
# counting pass: explode -> map-side-combined count -> tiny top-k)
# ---------------------------------------------------------------------------

_VOCAB_ORACLE = """
WITH t AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS tok FROM documents
), u AS (
  SELECT unnest(tok) AS token FROM t
), c AS (
  SELECT token, count(*) AS freq FROM u GROUP BY token
)
SELECT token, freq, rank FROM (
  SELECT token, freq,
         CAST(row_number() OVER (ORDER BY freq DESC, token) AS BIGINT) AS rank
  FROM c
)
WHERE rank <= 100
"""


@register("corpus_vocab_topk", oracle=_VOCAB_ORACLE, tags=("llm", "text"))
def corpus_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 corpus token frequencies — the counting pass a
    (BPE-ish) tokenizer build starts from. The explode shuffles one
    (token) row with map-side partial counts; the global order runs
    as TakeOrderedAndProject over the aggregated vocab (never the raw
    token stream), and the rank window touches only the 100 survivors.
    """
    from pyspark.sql import Window

    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    counts = (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = counts.orderBy(F.col("freq").desc(), F.col("token")).limit(100)
    w = Window.orderBy(F.col("freq").desc(), F.col("token"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


# ---------------------------------------------------------------------------
# Gopher-style repetition stats: the quality gate that removes
# degenerate repetitive documents before pretraining (Rae et al. 2021,
# arXiv:2112.11446 Table A1 — top-unigram fraction and duplicate
# n-gram fraction are the two strongest single signals).
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), u AS (
  SELECT doc_id, unnest(tok) AS token FROM t
), tc AS (
  SELECT doc_id, token, count(*) AS c FROM u GROUP BY 1, 2
), topf AS (
  SELECT doc_id, max(c) AS topc, sum(c) AS total FROM tc GROUP BY 1
), g AS (
  SELECT doc_id,
    CASE WHEN len(tok) >= 2
      THEN list_transform(range(len(tok) - 1), i -> tok[i+1] || ' ' || tok[i+2])
      ELSE [] END AS grams,
    CASE WHEN len(tok) > 0
      THEN round(CAST(list_aggregate(list_transform(tok, x -> len(x)), 'sum') AS DOUBLE) / len(tok), 6)
      ELSE 0.0 END AS mean_tok_len
  FROM t
), r AS (
  SELECT doc_id,
    CASE WHEN len(grams) > 0
      THEN round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
      ELSE 0.0 END AS dup_2gram_frac,
    mean_tok_len
  FROM g
)
SELECT r.doc_id,
       CAST(coalesce(topf.total, 0) AS BIGINT) AS n_tokens,
       coalesce(round(CAST(topf.topc AS DOUBLE) / topf.total, 6), 0.0) AS top_token_frac,
       r.dup_2gram_frac,
       r.mean_tok_len,
       (coalesce(round(CAST(topf.topc AS DOUBLE) / topf.total, 6), 0.0) > 0.12
        OR r.dup_2gram_frac > 0.05) AS is_repetitive
FROM r LEFT JOIN topf ON r.doc_id = topf.doc_id
"""


@register("doc_repetition_stats", oracle=_REPETITION_ORACLE, tags=("llm", "text"))
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals + the repetitive flag. The
    top-unigram fraction runs as explode → two map-side-combinable
    aggregates (per (doc, token), then per doc) — the shuffled rows
    are (doc, token, partial count), never token arrays; the n-gram
    and token-length stats are per-row column expressions that shuffle
    nothing. One equi-join on doc_id re-attaches the two frames, which
    AQE plans as a local join at small SF and a co-partitioned
    sort-merge at corpus scale."""
    from openmetrics_spark.llm.text import dup_ngram_fraction, mean_token_len

    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", tokens("text").alias("tok"))
    per_row = t.select(
        "doc_id",
        dup_ngram_fraction(F.col("tok"), 2).alias("dup_2gram_frac"),
        mean_token_len(F.col("tok")).alias("mean_tok_len"),
    )
    tc = (
        t.select("doc_id", F.explode("tok").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    topf = tc.groupBy("doc_id").agg(
        F.max("c").alias("topc"), F.sum("c").alias("total")
    )
    top_frac = F.coalesce(
        F.round(F.col("topc").cast("double") / F.col("total"), 6), F.lit(0.0)
    )
    return (
        per_row.join(topf, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("total"), F.lit(0)).alias("n_tokens"),
            top_frac.alias("top_token_frac"),
            "dup_2gram_frac",
            "mean_tok_len",
            ((top_frac > 0.12) | (F.col("dup_2gram_frac") > 0.05)).alias(
                "is_repetitive"
            ),
        )
    )
