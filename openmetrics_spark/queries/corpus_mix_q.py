"""Corpus curation beyond dedup: decontamination, packing, mixing.

The second half of a pretraining-data pipeline — after cleaning and
dedup (corpus_q.py) the corpus still has to be (a) scrubbed of eval
benchmark text, (b) packed into fixed-length training sequences, and
(c) re-weighted / down-sampled across domains. Each step here is a
deterministic, SQL-oracle-checkable query over the `documents` table:

- doc_decontaminate: flag training docs sharing any 5-gram with a
  benchmark set (the GPT-3 / PaLM n-gram-collision decontamination;
  Brown et al. 2020 appendix C). Benchmark n-grams are tiny relative
  to the corpus, so the overlap test is a broadcast semi-join against
  the exploded training n-grams — the 100 TB shape.
- corpus_pack_chunks: greedy in-order sequence packing (concatenate
  docs, cut every `seq_len` tokens) per source partition via a
  windowed prefix sum — distributed because the window partitions by
  source, never a global sort.
- domain_mix_weights: temperature-scaled sampling weights per
  (source, lang) — w_i ∝ tokens_i^alpha, the multilingual mixing rule
  (alpha=0.7; Conneau & Lample 2019 §3.1).
- corpus_sample_stratified: deterministic hash-based per-language
  sampling that APPLIES a mix — membership depends only on
  (doc_id, lang), so re-runs and the SQL oracle agree exactly.
- quality_filter_funnel: the Gopher rule cascade as a funnel table —
  per rule: rows in, rows dropped, rows out — the accounting view a
  data-curation run reports before committing a corpus version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openmetrics_spark.functions.hashing import (
    portable_hash60,
    portable_hash60_sql,
)
from openmetrics_spark.llm.dedup import shingles  # noqa: F401 (re-exported for tests)
from openmetrics_spark.llm.text import (
    STOPWORDS_EN,
    dup_ngram_fraction,
    marker_hits,
    mean_token_len,
    tokens,
)
from openmetrics_spark.queries import register
from openmetrics_spark.tables import pin, spread_for_compute, stage_parquet, table

# ---------------------------------------------------------------------------
# doc_decontaminate — benchmark n-gram overlap
# ---------------------------------------------------------------------------

_DECONTAM_N = 5
_BENCH_MOD = 10  # doc_id % 10 == 0 stands in for the eval benchmark

_DECONTAM_SQL_HASH = (
    "CAST(('0x' || substr(md5(array_to_string(tok[(i+1):(i+5)], ' ')), 1, 15))"
    " AS BIGINT)"
)

_DECONTAM_ORACLE = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(len(tok) - {_DECONTAM_N - 1}),
                                      i -> {_DECONTAM_SQL_HASH})) AS sh
  FROM t WHERE len(tok) >= {_DECONTAM_N}
), bench AS (
  SELECT DISTINCT unnest(sh) AS s FROM g WHERE doc_id % {_BENCH_MOD} = 0
), train AS (
  SELECT doc_id, len(sh) AS n_grams, unnest(sh) AS s
  FROM g WHERE doc_id % {_BENCH_MOD} <> 0
)
SELECT doc_id,
       CAST(max(n_grams) AS BIGINT) AS n_grams,
       CAST(count(*) AS BIGINT) AS n_overlap
FROM train JOIN bench USING (s)
GROUP BY doc_id
"""


@register("doc_decontaminate", oracle=_DECONTAM_ORACLE, tags=("llm", "decontam"))
def doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs that collide with the benchmark on any 5-gram,
    with their overlap counts — the decontamination drop list.

    Scale shape: the benchmark's distinct n-gram hash set is tiny (eval
    suites are MBs against a 100 TB corpus), so it broadcasts; the
    training side streams through explode → broadcast hash join →
    per-doc count, all map-side until the final (doc, count) agg. No
    shingle ARRAY ever enters a shuffle — only (doc, long) pairs."""
    from openmetrics_spark.llm.dedup import _hash_expr, distinct_grams

    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    # string grams pre-explode (n_grams needs the per-doc size), hash
    # post-explode in codegen — the interpreted in-array hash was the
    # dominant cost of this scan
    sh = docs.select(
        "doc_id", distinct_grams("text", _DECONTAM_N).alias("gr")
    ).filter(F.size("gr") > 0)
    bench = (
        sh.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select(F.explode("gr").alias("g"))
        .select(_hash_expr(F.col("g")).alias("s"))
        .distinct()
    )
    train = (
        sh.filter(F.col("doc_id") % _BENCH_MOD != 0)
        .select("doc_id", F.size("gr").cast("long").alias("n_grams"),
                F.explode("gr").alias("g"))
        .select("doc_id", "n_grams", _hash_expr(F.col("g")).alias("s"))
    )
    return (
        train.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.count(F.lit(1)).alias("n_overlap"),
        )
    )


# ---------------------------------------------------------------------------
# corpus_pack_chunks — in-order sequence packing
# ---------------------------------------------------------------------------

_SEQ_LEN = 512

_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
           AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM t
)
SELECT source,
       CAST(floor(cum_before / {_SEQ_LEN}) AS BIGINT) AS chunk,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM c
GROUP BY 1, 2
"""


@register("corpus_pack_chunks", oracle=_PACK_ORACLE, tags=("llm", "pipeline"))
def corpus_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy in-order sequence packing: docs are concatenated in
    doc_id order within each source and cut into `seq_len`-token
    training chunks; output is the per-chunk manifest (doc count,
    token count, doc-id span) a packed-dataset writer would emit.

    The prefix sum is a window PARTITIONED BY source — each source
    sorts independently, so the plan is a per-partition sort, never a
    global one; at 100 TB a superhot source would additionally split
    on a date prefix, which only changes the partition key."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id", "source", F.size(tokens("text")).cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return (
        c.groupBy(
            "source",
            F.floor(F.col("cum_before") / _SEQ_LEN).cast("long").alias("chunk"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# domain_mix_weights — temperature-scaled sampling weights
# ---------------------------------------------------------------------------

_MIX_ALPHA = 0.7

_MIX_ORACLE = f"""
WITH d AS (
  SELECT source, lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
              AS BIGINT) AS n_tokens
  FROM documents
  GROUP BY 1, 2
)
SELECT source, lang, n_docs, n_tokens,
       round(pow(n_tokens, {_MIX_ALPHA})
             / sum(pow(n_tokens, {_MIX_ALPHA})) OVER (), 6) AS weight
FROM d
"""


@register("domain_mix_weights", oracle=_MIX_ORACLE, tags=("llm", "pipeline"))
def domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) token totals and temperature-scaled sampling
    weights (w ∝ tokens^0.7) — the domain-mixing table a pretraining
    run samples from. The heavy pass is the map-side-combined token
    count; the unpartitioned window normalizing the weights runs over
    the POST-AGG frame, whose row count is the number of domains
    (hundreds at any corpus scale), so the single-partition window is
    bounded regardless of input size."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    d = (
        docs.select("source", "lang", F.size(tokens("text")).alias("nt"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
        )
    )
    scaled = F.pow(F.col("n_tokens").cast("double"), F.lit(_MIX_ALPHA))
    w = Window.partitionBy()
    return d.select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        F.round(scaled / F.sum(scaled).over(w), 6).alias("weight"),
    )


# ---------------------------------------------------------------------------
# corpus_sample_stratified — deterministic hash sampling
# ---------------------------------------------------------------------------

_EN_PCT = 40  # keep 40% of English docs ...
_OTHER_PCT = 20  # ... and 20% of everything else (upsample the target lang)

_SAMPLE_ORACLE = f"""
SELECT doc_id, lang, source
FROM documents
WHERE {portable_hash60_sql("'smp_' || CAST(doc_id AS VARCHAR)")} % 100
      < (CASE WHEN lang = 'en' THEN {_EN_PCT} ELSE {_OTHER_PCT} END)
"""


@register(
    "corpus_sample_stratified", oracle=_SAMPLE_ORACLE, tags=("llm", "pipeline")
)
def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a domain mix as a deterministic per-row hash gate: keep
    40% of English, 20% of other languages, membership a pure function
    of doc_id — so backfills, retries, and the SQL oracle all select
    the identical subset (`rand()`-based sampling can't be replayed or
    oracle-checked). A narrow filter projection: no shuffle at all,
    and the parquet scan prunes to three columns."""
    docs = table(spark, sf_dir, "documents")
    bucket = (
        portable_hash60(F.concat(F.lit("smp_"), F.col("doc_id").cast("string")))
        % 100
    )
    rate = F.when(F.col("lang") == "en", F.lit(_EN_PCT)).otherwise(
        F.lit(_OTHER_PCT)
    )
    return docs.filter(bucket < rate).select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# quality_filter_funnel — the rule cascade with per-stage accounting
# ---------------------------------------------------------------------------

_STOP_SQL = "[" + ",".join(f"'{s}'" for s in STOPWORDS_EN) + "]"

_FUNNEL_ORACLE = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), u AS (
  SELECT doc_id, unnest(tok) AS token FROM t
), tc AS (
  SELECT doc_id, token, count(*) AS c FROM u GROUP BY 1, 2
), topf AS (
  SELECT doc_id, max(c) AS topc, sum(c) AS total FROM tc GROUP BY 1
), f AS (
  SELECT t.doc_id,
    CAST(len(tok) AS BIGINT) AS n_tokens,
    CASE WHEN len(tok) > 0
      THEN round(CAST(list_aggregate(list_transform(tok, x -> len(x)), 'sum')
                 AS DOUBLE) / len(tok), 6) ELSE 0.0 END AS mtl,
    CASE WHEN len(tok) >= 2
      THEN round(1.0 - CAST(len(list_distinct(list_transform(range(len(tok) - 1),
             i -> tok[i+1] || ' ' || tok[i+2]))) AS DOUBLE) / (len(tok) - 1), 6)
      ELSE 0.0 END AS dup2,
    coalesce(round(CAST(topf.topc AS DOUBLE) / topf.total, 6), 0.0) AS topfrac,
    len(list_filter(tok, x -> list_contains({_STOP_SQL}, x))) AS stop_hits
  FROM t LEFT JOIN topf ON t.doc_id = topf.doc_id
), r AS (
  SELECT doc_id,
    n_tokens >= 20 AS r1,
    n_tokens <= 5000 AS r2,
    mtl BETWEEN 2 AND 12 AS r3,
    topfrac <= 0.12 AS r4,
    dup2 <= 0.05 AS r5,
    stop_hits >= 2 AS r6
  FROM f
), a AS (
  SELECT
    CAST(count(*) AS BIGINT) AS n0,
    CAST(count(*) FILTER (WHERE NOT r1) AS BIGINT) AS d1,
    CAST(count(*) FILTER (WHERE r1 AND NOT r2) AS BIGINT) AS d2,
    CAST(count(*) FILTER (WHERE r1 AND r2 AND NOT r3) AS BIGINT) AS d3,
    CAST(count(*) FILTER (WHERE r1 AND r2 AND r3 AND NOT r4) AS BIGINT) AS d4,
    CAST(count(*) FILTER (WHERE r1 AND r2 AND r3 AND r4 AND NOT r5) AS BIGINT) AS d5,
    CAST(count(*) FILTER (WHERE r1 AND r2 AND r3 AND r4 AND r5 AND NOT r6)
         AS BIGINT) AS d6
  FROM r
)
SELECT CAST(1 AS BIGINT) AS stage, 'min_tokens' AS rule,
       n0 AS n_in, d1 AS n_dropped, n0 - d1 AS n_out FROM a
UNION ALL SELECT 2, 'max_tokens', n0 - d1, d2, n0 - d1 - d2 FROM a
UNION ALL SELECT 3, 'mean_token_len', n0 - d1 - d2, d3, n0 - d1 - d2 - d3 FROM a
UNION ALL SELECT 4, 'top_token_frac', n0 - d1 - d2 - d3, d4,
       n0 - d1 - d2 - d3 - d4 FROM a
UNION ALL SELECT 5, 'dup_2gram', n0 - d1 - d2 - d3 - d4, d5,
       n0 - d1 - d2 - d3 - d4 - d5 FROM a
UNION ALL SELECT 6, 'stopword_floor', n0 - d1 - d2 - d3 - d4 - d5, d6,
       n0 - d1 - d2 - d3 - d4 - d5 - d6 FROM a
"""

_FUNNEL_RULES = [
    "min_tokens",
    "max_tokens",
    "mean_token_len",
    "top_token_frac",
    "dup_2gram",
    "stopword_floor",
]


@register("quality_filter_funnel", oracle=_FUNNEL_ORACLE, tags=("llm", "text"))
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher rule cascade (Rae et al. 2021 Table A1) as a funnel:
    one row per rule with rows-in / rows-dropped / rows-out, applied in
    order — the acceptance report of a corpus-curation run.

    One tokenize pass computes every per-row signal; the top-token
    fraction reuses the explode → (doc, token) count → per-doc max
    shape of doc_repetition_stats (the only shuffle besides the final
    single-row agg). The funnel itself is a 6-counter aggregate of
    boolean conjunctions — the 6-row output is built by exploding an
    inline array, not by re-scanning per rule."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", tokens("text").alias("tok"))
    tc = (
        t.select("doc_id", F.explode("tok").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    topf = tc.groupBy("doc_id").agg(
        F.max("c").alias("topc"), F.sum("c").alias("total")
    )
    tok = F.col("tok")
    f = t.join(topf, "doc_id", "left").select(
        F.size(tok).cast("long").alias("n_tokens"),
        mean_token_len(tok).alias("mtl"),
        dup_ngram_fraction(tok, 2).alias("dup2"),
        F.coalesce(
            F.round(F.col("topc").cast("double") / F.col("total"), 6),
            F.lit(0.0),
        ).alias("topfrac"),
        marker_hits(tok, STOPWORDS_EN).alias("stop_hits"),
    )
    r = f.select(
        (F.col("n_tokens") >= 20).alias("r1"),
        (F.col("n_tokens") <= 5000).alias("r2"),
        F.col("mtl").between(2, 12).alias("r3"),
        (F.col("topfrac") <= 0.12).alias("r4"),
        (F.col("dup2") <= 0.05).alias("r5"),
        (F.col("stop_hits") >= 2).alias("r6"),
    )

    def _drop(*conds) -> F.Column:
        keep = conds[:-1]
        fail = conds[-1]
        c = ~F.col(fail)
        for k in keep:
            c = c & F.col(k)
        return F.sum(F.when(c, 1).otherwise(0)).cast("long")

    a = r.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        _drop("r1").alias("d1"),
        _drop("r1", "r2").alias("d2"),
        _drop("r1", "r2", "r3").alias("d3"),
        _drop("r1", "r2", "r3", "r4").alias("d4"),
        _drop("r1", "r2", "r3", "r4", "r5").alias("d5"),
        _drop("r1", "r2", "r3", "r4", "r5", "r6").alias("d6"),
    )
    stages = []
    n_in: F.Column = F.col("n0")
    for i, rule in enumerate(_FUNNEL_RULES, start=1):
        dropped = F.col(f"d{i}")
        stages.append(
            F.struct(
                F.lit(i).cast("long").alias("stage"),
                F.lit(rule).alias("rule"),
                n_in.alias("n_in"),
                dropped.alias("n_dropped"),
                (n_in - dropped).alias("n_out"),
            )
        )
        n_in = n_in - dropped
    return a.select(F.explode(F.array(*stages)).alias("s")).select("s.*")


# ---------------------------------------------------------------------------
# doc_dup_span_coverage — duplicate-substring coverage (Lee et al.
# 2022, "Deduplicating Training Data Makes Language Models Better":
# exact repeated substrings are the strongest dedup signal). Instead
# of a distributed suffix array, hash every `_SPAN_N`-token window
# (stride 1) and measure, per doc, the fraction of windows whose hash
# also occurs in ANOTHER doc — the fraction of the doc covered by
# cross-document repeated text.
# ---------------------------------------------------------------------------

_SPAN_N = 20

_SPAN_SQL_HASH = (
    "CAST(('0x' || substr(md5(array_to_string(tok[(i+1):(i+20)], ' ')), 1, 15))"
    " AS BIGINT)"
)

_SPAN_ORACLE = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), g AS (
  SELECT doc_id,
         list_transform(range(len(tok) - {_SPAN_N - 1}),
                        i -> {_SPAN_SQL_HASH}) AS ws
  FROM t WHERE len(tok) >= {_SPAN_N}
), p AS (
  SELECT doc_id, unnest(ws) AS w FROM g
), pc AS (
  SELECT doc_id, w, count(*) AS c FROM p GROUP BY 1, 2
), df AS (
  SELECT w, count(*) AS d FROM pc GROUP BY 1
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_windows,
       CAST(coalesce(sum(c) FILTER (WHERE d >= 2), 0) AS BIGINT)
         AS n_dup_windows,
       round(coalesce(sum(c) FILTER (WHERE d >= 2), 0)
             / CAST(sum(c) AS DOUBLE), 6) AS dup_frac
FROM pc JOIN df USING (w)
GROUP BY doc_id
"""


@register(
    "doc_dup_span_coverage",
    oracle=_SPAN_ORACLE,
    headline=True,
    tags=("llm", "dedup"),
)
def doc_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fraction of 20-token windows whose hash occurs in
    another document — substring-level duplicate coverage, the signal
    Lee et al. remove with a suffix array, re-expressed as two
    map-side-combinable aggregates over (doc, window-hash) pairs.

    Scale shape: windows never leave their doc as strings — the
    posting rows are (doc, long, count); cross-doc document frequency
    is a second groupBy on the hash; the re-join is hash-partitioned
    on the same key it was just aggregated on. Stride-1 windows mean
    ~1 row per token: the posting list is the tokenized corpus size,
    same order as the n-gram dedup index."""
    from pyspark.sql import Window

    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    tok = tokens("text")
    idx = F.when(
        F.size(tok) >= _SPAN_N,
        F.sequence(F.lit(1), F.size(tok) - (_SPAN_N - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(tok, i, _SPAN_N), " ")
    )
    p = docs.select(
        F.col("doc_id").alias("doc_id"), F.explode(grams).alias("g")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long").alias("w"),
    )
    # One explicit exchange on w; the (doc,w) count, the per-w doc
    # frequency (a window count — pc is unique on (doc,w), so
    # count(*) over w IS the distinct-doc frequency) and the final
    # rollup all derive from it without re-shuffling the posting list
    # (guide §2.4 — operations keyed the same way share one exchange;
    # the old shape aggregated pc, aggregated df separately and
    # re-joined them: the pinned posting crossed the network twice).
    # Map-side combine on (doc,w) is not lost in practice: stride-1
    # window hashes almost never repeat within a doc, so c ≈ 1 and
    # the raw posting is the same size as the combined one.
    pc = p.repartition("w").groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).alias("c")
    )
    pcd = pc.withColumn("d", F.count(F.lit(1)).over(Window.partitionBy("w")))
    dup_c = F.sum(F.when(F.col("d") >= 2, F.col("c")).otherwise(0))
    return (
        pcd.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_windows"),
            dup_c.alias("n_dup_windows"),
            F.round(dup_c / F.sum("c").cast("double"), 6).alias("dup_frac"),
        )
    )


# ---------------------------------------------------------------------------
# corpus_bpe_first_merges — the inner step of a BPE tokenizer build:
# count adjacent token pairs across the corpus, rank the top merges.
# ---------------------------------------------------------------------------

_BPE_ORACLE = """
WITH t AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS tok FROM documents
), p AS (
  SELECT unnest(list_transform(range(len(tok) - 1),
                               i -> tok[i+1] || ' ' || tok[i+2])) AS pair
  FROM t WHERE len(tok) >= 2
), c AS (
  SELECT pair, count(*) AS freq FROM p GROUP BY pair
)
SELECT pair, freq, rank FROM (
  SELECT pair, freq,
         CAST(row_number() OVER (ORDER BY freq DESC, pair) AS BIGINT) AS rank
  FROM c
)
WHERE rank <= 50
"""


@register("corpus_bpe_first_merges", oracle=_BPE_ORACLE, tags=("llm", "text"))
def corpus_bpe_first_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent token pairs by corpus frequency — the counting
    pass of a BPE merge iteration (Sennrich et al. 2016). One explode
    of per-row bigrams into a map-side-combined count; the global
    top-50 runs as TakeOrderedAndProject over the aggregated pair
    vocabulary, never the raw pair stream."""
    from pyspark.sql import Window

    from openmetrics_spark.llm.text import ngrams

    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    pairs = (
        docs.select(ngrams(tokens("text"), 2).alias("g"))
        .select(F.explode("g").alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = pairs.orderBy(F.col("freq").desc(), F.col("pair")).limit(50)
    w = Window.orderBy(F.col("freq").desc(), F.col("pair"))
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


# ---------------------------------------------------------------------------
# corpus_bpe_encode — APPLY the learned merges: greedy leftmost
# encoding of every document under the top-K merge table, the
# tokenizer-application half of the BPE pair (corpus_bpe_first_merges
# is the learning half).
# ---------------------------------------------------------------------------

_BPE_K = 16

# each token is wrapped chr(31)token chr(30) so a merge pattern can
# only match WHOLE adjacent tokens (never a token suffix), and
# adjacent matches share no boundary characters — left-to-right
# non-overlapping replace() (identical in Spark and DuckDB) is then
# exactly BPE's greedy leftmost application of one merge.
_BPE_ENCODE_ORACLE = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), c AS (
  SELECT pair, count(*) AS freq FROM (
    SELECT unnest(list_transform(range(len(tok) - 1),
                                 i -> tok[i+1] || ' ' || tok[i+2])) AS pair
    FROM t WHERE len(tok) >= 2
  ) GROUP BY pair
), topk AS (
  SELECT pair, rank FROM (
    SELECT pair, row_number() OVER (ORDER BY freq DESC, pair) AS rank FROM c
  ) WHERE rank <= {{k}}
), ms AS (
  SELECT list({{{{'pat': chr(31) || split_part(pair, ' ', 1) || chr(30)
                        || chr(31) || split_part(pair, ' ', 2) || chr(30),
               'rep': chr(31) || pair || chr(30)}}}} ORDER BY rank) AS ml
  FROM topk
), enc AS (
  SELECT doc_id, len(tok) AS n_raw,
    list_reduce(
      list_prepend(
        {{{{'pat': CASE WHEN len(tok) > 0
                      THEN chr(31) || array_to_string(tok, chr(30) || chr(31)) || chr(30)
                      ELSE '' END,
          'rep': ''}}}},
        ml),
      (acc, m) -> {{{{'pat': replace(acc.pat, m.pat, m.rep), 'rep': ''}}}}
    ).pat AS s
  FROM t, ms
)
SELECT doc_id, CAST(n_raw AS BIGINT) AS n_raw,
       CAST(len(s) - len(replace(s, chr(31), '')) AS BIGINT) AS n_encoded
FROM enc
""".format(k=_BPE_K)


@register(
    "corpus_bpe_encode",
    oracle=_BPE_ENCODE_ORACLE,
    headline=True,
    tags=("llm", "text"),
)
def corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document under the corpus's own top-16 BPE merge
    table (the application half of Sennrich et al. 2016; the learning
    half is corpus_bpe_first_merges): per doc, the raw token count and
    the count after greedily merging the learned pairs in rank order.

    Spark-first shape: the merge table folds over each document as a
    SINGLE column expression — F.aggregate over a broadcast K-element
    merge array with a literal replace() per step — so encoding is one
    narrow projection, no Python, no per-merge pass over the corpus;
    the merge table itself is one map-side-combined pair count + a
    TakeOrderedAndProject. The token-wrapping scheme (chr(31)/chr(30)
    delimiters) makes whole-token adjacency a plain substring match,
    and left-to-right non-overlapping replace() is exactly greedy
    leftmost BPE — bit-identical in both engines."""
    from pyspark.sql import Window

    from openmetrics_spark.llm.text import ngrams

    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", tokens("text").alias("tok"))
    counts = (
        t.filter(F.size("tok") >= 2)
        .select(F.explode(ngrams(F.col("tok"), 2)).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("pair"))
    topk = (
        counts.orderBy(F.col("freq").desc(), F.col("pair"))
        .limit(_BPE_K)
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )
    SEP_L, SEP_R = "\x1f", "\x1e"
    x = F.split_part(F.col("pair"), F.lit(" "), F.lit(1))
    y = F.split_part(F.col("pair"), F.lit(" "), F.lit(2))
    ms = topk.select(
        F.struct(
            F.col("rank"),
            F.concat(
                F.lit(SEP_L), x, F.lit(SEP_R), F.lit(SEP_L), y, F.lit(SEP_R)
            ).alias("pat"),
            F.concat(F.lit(SEP_L), F.col("pair"), F.lit(SEP_R)).alias("rep"),
        ).alias("m")
    ).agg(F.array_sort(F.collect_list("m")).alias("ml"))
    doc_s = F.when(
        F.size("tok") > 0,
        F.concat(
            F.lit(SEP_L),
            F.array_join(F.col("tok"), SEP_R + SEP_L),
            F.lit(SEP_R),
        ),
    ).otherwise(F.lit(""))
    enc = (
        t.crossJoin(F.broadcast(ms))
        .select(
            "doc_id",
            F.size("tok").cast("long").alias("n_raw"),
            F.aggregate(
                F.col("ml"),
                doc_s,
                lambda acc, m: F.replace(acc, m["pat"], m["rep"]),
            ).alias("s"),
        )
    )
    return enc.select(
        "doc_id",
        "n_raw",
        (
            F.length("s") - F.length(F.replace(F.col("s"), F.lit(SEP_L)))
        ).cast("long").alias("n_encoded"),
    )


# ---------------------------------------------------------------------------
# doc_unigram_logprob — perplexity-proxy quality scoring (the CCNet
# recipe, Wenzek et al. 2020: score documents under a language model
# and filter the tail; here the LM is the corpus's own unigram model).
# ---------------------------------------------------------------------------

_LOGPROB_ORACLE = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), u AS (
  SELECT doc_id, unnest(tok) AS token FROM t
), v AS (
  SELECT token, count(*) AS c FROM u GROUP BY token
), tot AS (
  SELECT sum(c) AS n FROM v
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(sum(-ln(c / CAST(n AS DOUBLE))) / count(*), 4)
         AS avg_neg_logprob
FROM u JOIN v USING (token), tot
GROUP BY doc_id
"""


@register("doc_unigram_logprob", oracle=_LOGPROB_ORACLE, tags=("llm", "text"))
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean negative log-probability of each document under the
    corpus unigram model — the perplexity-filtering signal. Pass 1
    builds the (token, count) vocabulary (map-side combined); pass 2
    re-joins it to the token stream and averages per doc. The
    vocabulary is Zipf-skewed — the hot tokens ('the') dominate the
    join key distribution — which AQE's skew-join split absorbs; at a
    capped vocab the table broadcasts instead. Rounded to 4 dp so the
    two engines' ln()/summation agree bit-for-bit after rounding."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    u = docs.select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    v = u.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = v.agg(F.sum("c").alias("n"))
    scored = (
        u.join(v, "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            (-F.log(F.col("c") / F.col("n").cast("double"))).alias("nlp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.sum("nlp") / F.count(F.lit(1)), 4).alias("avg_neg_logprob"),
    )


_LOGPROB_CAP = 256

_LOGPROB_CAPPED_ORACLE = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), u AS (
  SELECT doc_id, unnest(tok) AS token FROM t
), v AS (
  SELECT token, count(*) AS c FROM u GROUP BY token
), tot AS (
  SELECT sum(c) AS n FROM v
), topk AS (
  SELECT token, c FROM v ORDER BY c DESC, token LIMIT {_LOGPROB_CAP}
), oov AS (
  SELECT greatest((SELECT n FROM tot) - sum(c), 1) AS oovc FROM topk
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(sum(-ln(coalesce(k.c, oov.oovc) / CAST(n AS DOUBLE))) / count(*), 4)
         AS avg_neg_logprob
FROM u LEFT JOIN topk k USING (token), tot, oov
GROUP BY doc_id
"""


@register(
    "doc_unigram_logprob_capped",
    oracle=_LOGPROB_CAPPED_ORACLE,
    tags=("llm", "text"),
)
def doc_unigram_logprob_capped(
    spark: SparkSession, sf_dir: str, cap: int = _LOGPROB_CAP
) -> DataFrame:
    """Capped-vocabulary variant of :func:`doc_unigram_logprob` — the
    100 TB-scale path. The full variant re-joins the Zipf-skewed token
    stream to the whole vocabulary and leans on AQE's skew split; this
    one keeps only the top-``cap`` tokens (order by count desc, token)
    plus a single OOV bucket carrying the remaining probability mass,
    and BROADCASTS that bounded table — the token stream is scored in a
    broadcast hash join with no shuffle before the per-doc aggregate,
    and no hot-key skew exists at any corpus size. With ``cap`` >= the
    true vocabulary size the scores equal the full variant exactly
    (parity-tested in tests/test_corpus_mix.py)."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    u = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    v = u.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = v.agg(F.sum("c").alias("n"))
    topk = v.orderBy(F.col("c").desc(), "token").limit(cap)
    oov = topk.agg(F.sum("c").alias("topc")).crossJoin(total).select(
        F.greatest(F.col("n") - F.col("topc"), F.lit(1)).alias("oovc")
    )
    scored = (
        u.join(F.broadcast(topk), "token", "left")
        .crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(oov))
        .select(
            "doc_id",
            (
                -F.log(
                    F.coalesce(F.col("c"), F.col("oovc")) / F.col("n").cast("double")
                )
            ).alias("nlp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.sum("nlp") / F.count(F.lit(1)), 4).alias("avg_neg_logprob"),
    )


# ---------------------------------------------------------------------------
# doc_bigram_logprob — the bigram upgrade of the perplexity proxy: a
# real conditional LM p(w_i | w_{i-1}) instead of marginal token
# frequency, so repeated-but-coherent text and word-salad separate
# (the unigram score can't tell them apart).
# ---------------------------------------------------------------------------

_BIGRAM_LOGPROB_ORACLE = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), u AS (
  SELECT doc_id, tok[i] AS prev, tok[i + 1] AS cur
  FROM t, unnest(range(1, len(tok))) r(i)
), v2 AS (
  SELECT prev, cur, count(*) AS c2 FROM u GROUP BY 1, 2
), v1 AS (
  SELECT prev, sum(c2) AS c1 FROM v2 GROUP BY 1
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(sum(-ln(c2 / CAST(c1 AS DOUBLE))) / count(*), 4)
         AS avg_neg_logprob
FROM u JOIN v2 USING (prev, cur) JOIN v1 USING (prev)
GROUP BY doc_id
"""


@register(
    "doc_bigram_logprob", oracle=_BIGRAM_LOGPROB_ORACLE, tags=("llm", "text")
)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean negative log-probability of each document under the
    corpus's own MLE bigram model, p(w_i | w_{i-1}) =
    c(prev,cur)/c(prev,·) — the conditional-LM perplexity signal the
    unigram proxy approximates. Docs with < 2 tokens have no bigrams
    and drop out.

    Scale shape: the bigram stream is built WITHOUT a self-join or a
    per-doc window sort — posexplode keeps the token array in the map
    stage and reads the successor with element_at, so nothing wide
    ever shuffles. The denominator c(prev,·) is derived from the
    bigram counts themselves (one extra agg over the distinct-bigram
    frame, not a second pass over the corpus), and per-bigram scores
    are computed once on the distinct-bigram table before re-joining
    the Zipf-skewed occurrence stream (AQE skew-split territory, like
    the full unigram variant; rounded to 4 dp for engine agreement)."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", tokens("text").alias("tok"))
    u = (
        t.select("doc_id", "tok", F.posexplode("tok").alias("pos", "prev"))
        .filter(F.col("pos") < F.size("tok") - 1)
        .select(
            "doc_id",
            "prev",
            F.element_at("tok", F.col("pos") + 2).alias("cur"),
        )
    )
    v2 = u.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))
    v1 = v2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    scored_bigrams = v2.join(v1, "prev").select(
        "prev",
        "cur",
        (-F.log(F.col("c2") / F.col("c1").cast("double"))).alias("nlp"),
    )
    return (
        u.join(scored_bigrams, ["prev", "cur"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum("nlp") / F.count(F.lit(1)), 4).alias(
                "avg_neg_logprob"
            ),
        )
    )


# ---------------------------------------------------------------------------
# doc_quality_classifier — hash-trick linear model inference (the
# fastText-style quality classifier pass of CCNet/GPT-3 curation;
# weights here are a fixed deterministic function of the bucket so the
# SQL oracle scores identically — the PLUMBING, hashing text into a
# bounded feature space and scoring in one pass, is the real thing).
# ---------------------------------------------------------------------------

_CLS_BUCKETS = 4096
_CLS_MIX = 2654435761  # Knuth multiplicative-hash constant

_CLS_ORACLE = f"""
WITH u AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents
), f AS (
  SELECT doc_id,
         (CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT)
          % {_CLS_BUCKETS}) AS b
  FROM u
), w AS (
  SELECT doc_id,
         (b * {_CLS_MIX}) % 2001 - 1000 AS wt
  FROM f
)
SELECT doc_id, n_tokens,
       CAST(floor(m * 10000.0 + 0.5) AS BIGINT) AS mean_weight_e4,
       round(1.0 / (1.0 + exp(-m)), 4) AS prob
FROM (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(wt) AS DOUBLE) / (1000.0 * count(*)) AS m
  FROM w
  GROUP BY doc_id
)
"""


@register(
    "doc_quality_classifier", oracle=_CLS_ORACLE, tags=("llm", "text")
)
def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear classifier inference over hash-trick token features —
    one narrow pass: tokenize → bucket-hash each token into a 4096-dim
    feature space → look the weight up as pure arithmetic (a broadcast
    weight ARRAY in a trained deployment — same plan shape) → per-doc
    mean + sigmoid. No shuffle except the per-doc aggregate; at 100 TB
    this is the exact plumbing of a fastText quality-score pass."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    u = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    b = portable_hash60(F.col("token")) % _CLS_BUCKETS
    # integer weights, summed exactly as BIGINT; the single double
    # division at the end makes the mean bit-identical across engines
    # (summing per-row double weights diverges by ~1 ulp in summation
    # order, which flips round(4) on boundary values)
    wt = (b * F.lit(_CLS_MIX)) % 2001 - 1000
    scored = u.select("doc_id", wt.alias("wt"))
    mean_w = F.sum("wt").cast("double") / (F.lit(1000.0) * F.count(F.lit(1)))
    # mean in exact 1e-4 units: floor(x*1e4 + 0.5) is pure IEEE
    # arithmetic, identical in any engine — round(x, 4) is NOT (Spark
    # rounds the shortest decimal rendering via BigDecimal, DuckDB the
    # binary double, and integer sums make exact .xxxx5 boundaries
    # common enough to bite)
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.floor(mean_w * 10000.0 + 0.5).cast("long").alias("mean_weight_e4"),
        F.round(1.0 / (1.0 + F.exp(-mean_w)), 4).alias("prob"),
    )


# ---------------------------------------------------------------------------
# corpus_prep_manifest_v2 — the FULL curation chain in one query:
#   stats → quality/lang gate → benchmark exclusion → exact dedup →
#   near-dup clusters → decontamination → stratified sampling →
#   manifest. Extends corpus_q.corpus_prep_manifest with the
#   decontam/mix stages of this module; proves the whole module
#   composes with the dedup stack.
# ---------------------------------------------------------------------------

_STOP_SQL_V2 = (
    "['the','and','of','to','a','in','is','that','it','for','on','with','as','this']"
)
_J3 = "CAST(('0x' || substr(md5(array_to_string(tok[(i+1):(i+3)], ' ')), 1, 15)) AS BIGINT)"
_J5 = "CAST(('0x' || substr(md5(array_to_string(tok[(i+1):(i+5)], ' ')), 1, 15)) AS BIGINT)"


def _lang_sql_v2(lang: str) -> str:
    from openmetrics_spark.llm.text import LANG_MARKERS

    return "[" + ",".join(f"'{m}'" for m in LANG_MARKERS[lang]) + "]"


def _manifest_core_sql() -> str:
    """Shared CTE chain of the manifest oracles (v2/v3): tokenize →
    quality/language gates → benchmark exclusion → exact dedup →
    near-dup connected components → 5-gram decontamination, ending in
    the ``surv`` CTE (chain survivors, pre-sample)."""
    return f"""
WITH RECURSIVE t AS (
  SELECT doc_id, text, lang,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), s AS (
  SELECT doc_id, text, lang, tok,
    CAST(len(tok) AS BIGINT) AS n_tokens,
    round(
      0.5 * (CASE WHEN len(tok) > 0
                  THEN CAST(len(list_distinct(tok)) AS DOUBLE) / len(tok)
                  ELSE 0 END)
      + 0.5 * least(
          (CASE WHEN len(tok) > 0
                THEN CAST(len(list_filter(tok, x -> list_contains({_STOP_SQL_V2}, x))) AS DOUBLE) / len(tok)
                ELSE 0 END) * 5, 1.0),
      6) AS quality,
    len(list_filter(tok, x -> list_contains({_lang_sql_v2('en')}, x))) AS en_hits,
    len(list_filter(tok, x -> list_contains({_lang_sql_v2('de')}, x))) AS de_hits,
    len(list_filter(tok, x -> list_contains({_lang_sql_v2('fr')}, x))) AS fr_hits,
    len(list_filter(tok, x -> list_contains({_lang_sql_v2('es')}, x))) AS es_hits
  FROM t
), kept AS (
  SELECT * FROM s
  WHERE en_hits >= greatest(de_hits, fr_hits, es_hits)
    AND quality >= 0.30 AND n_tokens >= 20
    AND doc_id % {_BENCH_MOD} <> 0
), exact AS (
  SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
), k2 AS (
  SELECT kept.* FROM kept JOIN exact USING (doc_id)
), g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(len(tok) - 2), i -> {_J3})) AS sh
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
), k3 AS (
  SELECT k2.* FROM k2 LEFT JOIN lab ON k2.doc_id = lab.doc_id
  WHERE lab.doc_id IS NULL OR lab.canonical_id = k2.doc_id
), bg AS (
  SELECT doc_id,
         list_distinct(list_transform(range(len(tok) - 4), i -> {_J5})) AS sh
  FROM t WHERE len(tok) >= 5
), bench AS (
  SELECT DISTINCT unnest(sh) AS s5 FROM bg WHERE doc_id % {_BENCH_MOD} = 0
), contaminated AS (
  SELECT DISTINCT bg.doc_id
  FROM bg JOIN k3 USING (doc_id), unnest(bg.sh) u(s5)
  WHERE u.s5 IN (SELECT s5 FROM bench)
), surv AS (
  SELECT k3.* FROM k3
  WHERE k3.doc_id NOT IN (SELECT doc_id FROM contaminated)
)"""


def _manifest_sample_gate_sql() -> str:
    return (
        f"""{portable_hash60_sql("'smp_' || CAST(surv.doc_id AS VARCHAR)")}"""
        f" % 100 < (CASE WHEN surv.lang = 'en'"
        f" THEN {_EN_PCT} ELSE {_OTHER_PCT} END)"
    )


def _manifest_v2_oracle() -> str:
    return (
        _manifest_core_sql()
        + f"""
SELECT surv.doc_id, surv.n_tokens, surv.quality
FROM surv
WHERE {_manifest_sample_gate_sql()}
"""
    )


def _manifest_survivors(
    spark: SparkSession,
    sf_dir: str,
    t: DataFrame | None = None,
    sample_gated: bool = False,
) -> DataFrame:
    """Spark twin of the oracle's ``surv`` CTE — stages 1-5 of the
    curation chain (quality/language gating, benchmark exclusion,
    exact dedup, near-dup cluster resolution, 5-gram decontamination),
    shared by the v2/v3 manifests. Returns the chain survivors with
    (doc_id, text, lang, tok, n_tokens, quality). Pass a (pinned)
    pre-tokenized ``t`` (doc_id, text, lang, tok) to share the corpus
    tokenize scan with other stages (v3 reuses it for the NB fit).

    ``sample_gated=True`` applies the deterministic per-doc sample
    gate BEFORE the decontamination stage and returns only GATED
    survivors (r12 optimization, guide §1.2: don't compute things you
    throw away). Output-equivalent for consumers that apply the same
    gate afterwards: the gate is a pure per-doc hash predicate and
    contamination is decided per doc against the (ungated) benchmark
    shingle set, so gate(k3 \\ contaminated) == gate(k3) \\
    contaminated(gate(k3)) — only ~35% of docs pay the 5-gram explode
    and contamination join. v3 CANNOT use this: its span-dup detection
    must see the full survivor set."""
    from openmetrics_spark.llm.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )
    from openmetrics_spark.llm.text import (
        LANG_MARKERS,
        marker_hits,
        quality_score,
        token_count,
    )

    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    if t is None:
        t = docs.select(
            "doc_id", "text", "lang", tokens("text").alias("tok")
        )
    tok = F.col("tok")
    stats = t.select(
        "doc_id",
        "text",
        "lang",
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
        & (F.col("quality") >= 0.30)
        & (F.col("n_tokens") >= 20)
        & (F.col("doc_id") % _BENCH_MOD != 0)
    )
    exact_ids = (
        kept.groupBy(F.md5("text").alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    k2 = pin(kept.join(exact_ids, "doc_id", "left_semi"))
    # near-dup pairs from the ALREADY-TOKENIZED survivors (tok_col):
    # k2 carries the pinned `tok`, so the pairs stage skips its own
    # tokenize regex over the survivor corpus — the same r12 move the
    # decontam branches took (one fewer full-survivor tokenize pass)
    pairs = ngram_jaccard_pairs(
        k2.select("doc_id", "tok"), "doc_id",
        n=3, threshold=0.5, max_df=50, tok_col="tok",
    )
    comp = connected_components(pairs, "doc_a", "doc_b")
    near_drop = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    # NO broadcast hint: near_drop scales with corpus size (a few %
    # of all docs at 100 TB is a multi-GB id set — a forced hint
    # bypasses AQE's size check and dies at the broadcast ceiling).
    # AQE still picks broadcast at any SF where it actually fits.
    k3 = k2.join(near_drop, "doc_id", "left_anti")
    if sample_gated:
        # per-doc hash gate BEFORE decontam: contamination is decided
        # per doc, so un-gated docs' 5-gram work is thrown away
        k3 = k3.filter(_manifest_sample_gate())
    # decontamination against the ORIGINAL (ungated) benchmark docs;
    # hash post-explode (codegen), not inside the shingle array.
    # Both shingle branches derive from the ALREADY-TOKENIZED frames
    # (t / k3 carry `tok`) instead of re-running the tokenize regex
    # over the full corpus twice (r12: the old exploded_shingles(docs)
    # fed both branches from the raw scan — two extra corpus tokenize
    # passes, the chain's single most expensive projection); the
    # benchmark side also only tokenize-explodes the 10% benchmark
    # slice rather than filtering a full-corpus posting list.
    from openmetrics_spark.llm.dedup import exploded_shingles_from_tok

    bench = (
        exploded_shingles_from_tok(
            t.filter(F.col("doc_id") % _BENCH_MOD == 0),
            "doc_id", "tok", _DECONTAM_N,
        )
        .select(F.col("s").alias("s5"))
        .distinct()
    )
    contaminated = (
        exploded_shingles_from_tok(k3, "doc_id", "tok", _DECONTAM_N)
        .select(F.col("doc").alias("doc_id"), F.col("s").alias("s5"))
        .join(F.broadcast(bench), "s5")
        .select("doc_id")
        .distinct()
    )
    # contaminated is corpus-proportional too — same rule as near_drop
    # above: let AQE size it. (The `bench` 5-gram broadcast stays: an
    # eval suite is MBs, genuinely bounded.)
    return k3.join(contaminated, "doc_id", "left_anti").select(
        "doc_id", "text", "lang", "tok", "n_tokens", "quality"
    )


def _manifest_sample_gate():
    """Spark twin of the oracle's sample predicate (deterministic
    lang-stratified hash sample over the survivor set)."""
    bucket = (
        portable_hash60(
            F.concat(F.lit("smp_"), F.col("doc_id").cast("string"))
        )
        % 100
    )
    rate = F.when(F.col("lang") == "en", F.lit(_EN_PCT)).otherwise(
        F.lit(_OTHER_PCT)
    )
    return bucket < rate


@register(
    "corpus_prep_manifest_v2",
    oracle=_manifest_v2_oracle(),
    headline=True,
    tags=("llm", "pipeline"),
)
def corpus_prep_manifest_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain composed into ONE distributed query:
    quality/language gating, benchmark exclusion, exact dedup,
    near-dup cluster resolution, 5-gram decontamination, and the
    deterministic stratified sample, ending in the training manifest.
    Stage order mirrors a production run: cheap row-local gates first,
    the (long,long)-pair dedup shuffles over gated survivors only, the
    broadcast decontam semi-join over dedup survivors only, and the
    final sample is a narrow hash filter — every expensive stage sees
    the smallest possible input."""
    # sample_gated: the deterministic per-doc sample gate commutes
    # with the per-doc decontam stage, so it runs BEFORE it (r12) —
    # the returned frame is already gated; the filter below is
    # idempotent and kept for the output contract's readability.
    survivors = _manifest_survivors(spark, sf_dir, sample_gated=True)
    return survivors.filter(_manifest_sample_gate()).select(
        "doc_id", "n_tokens", "quality"
    )


# ---------------------------------------------------------------------------
# doc_dedup_spans_rewrite — the REWRITE half of Lee et al. span dedup:
# not just measuring cross-document repeated substrings
# (doc_dup_span_coverage) but REMOVING them, emitting the cleaned
# canonical token stream per document.
# ---------------------------------------------------------------------------

_SPAN_REWRITE_ORACLE = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), p AS (
  SELECT doc_id, i + 1 AS i, {_SPAN_SQL_HASH} AS w
  FROM t, unnest(range(len(tok) - {_SPAN_N - 1})) r(i)
  WHERE len(tok) >= {_SPAN_N}
), d AS (
  SELECT w FROM (SELECT DISTINCT doc_id, w FROM p)
  GROUP BY w HAVING count(*) >= 2
), cover AS (
  SELECT DISTINCT doc_id, pos
  FROM (SELECT doc_id, i FROM p JOIN d USING (w)),
       unnest(range(i, i + {_SPAN_N})) r2(pos)
), toks AS (
  SELECT doc_id, pos, tok[pos] AS token
  FROM t, unnest(range(1, len(tok) + 1)) r(pos)
), kept AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(token, ' ' ORDER BY pos) AS cleaned
  FROM toks ANTI JOIN cover USING (doc_id, pos)
  GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.tok) AS BIGINT) AS n_tokens,
       CAST(len(t.tok) - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(k.cleaned, '') AS cleaned_text
FROM t LEFT JOIN kept k USING (doc_id)
"""


@register(
    "doc_dedup_spans_rewrite",
    oracle=_SPAN_REWRITE_ORACLE,
    headline=True,
    tags=("llm", "dedup"),
)
def doc_dedup_spans_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove every token covered by a cross-document repeated
    20-token window (hash df >= 2 distinct docs) and emit the
    cleaned canonical token stream — the rewrite Lee et al. perform
    with a suffix array. Output: doc_id, n_tokens, n_removed,
    cleaned_text ('' when the whole doc is duplicated text).

    Scale shape: posting rows are (doc, pos, long-hash), never window
    strings, exchanged once by hash; the dup-hash set is one map-side
    min/max aggregate of that exchange. The rewrite side moves only
    one covered-position set per dup-affected doc — the cleaned
    stream rebuilds array-side from each doc's own token array
    (array_except + element_at), so the corpus token stream is never
    exploded or shuffled (see _span_kept)."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    tok = tokens("text")
    t = pin(docs.select("doc_id", tok.alias("tok")))
    kept = _span_kept(t)
    return t.select("doc_id", F.size("tok").cast("long").alias("n_tokens")).join(
        kept, "doc_id", "left"
    ).select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
        F.coalesce(F.col("cleaned"), F.lit("")).alias("cleaned_text"),
    )


def _span_kept(t: DataFrame, t_out: DataFrame | None = None) -> DataFrame:
    """Core of the span-dedup rewrite over ``t(doc_id, tok)`` (caller
    pins ``t`` — it is read by three branches): tokens covered by a
    cross-document repeated ``_SPAN_N``-window are removed; returns
    (doc_id, n_kept, cleaned) with docs that kept ≥1 token. Shared by
    doc_dedup_spans_rewrite and corpus_prep_manifest_v3.

    ``t_out`` (r12, guide §1.2): optional subset of ``t`` whose
    rewrites are actually CONSUMED. Duplicate-window DETECTION always
    runs over all of ``t`` (df >= 2 is a global property), but the
    cover explode, the token posting and the ordered reassembly — the
    expensive output side — run only over ``t_out``. Per-doc outputs
    depend only on (the doc's tokens, the global dup-hash set), so
    rows emitted for ``t_out`` docs are bit-identical to the full
    run's; v3 passes its sample-gated survivors (~35%) here."""
    idx = F.when(
        F.size("tok") >= _SPAN_N,
        F.sequence(F.lit(1), F.size("tok") - (_SPAN_N - 1)),
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(F.col("tok"), i, _SPAN_N), " ")
    )
    # The posting list is exchanged ONCE, by w, at pin time: the
    # dup-window aggregate and the dup-posting join both key on w and
    # read the cached frame with its hash partitioning intact
    # (guide §2.4). The old shape pinned the narrow explode and then
    # paid a (doc,w) distinct exchange + a w aggregate exchange + a w
    # join exchange — three posting-sized shuffles instead of one.
    p = pin(
        t.select("doc_id", F.posexplode(grams).alias("p0", "g"))
        .select(
            "doc_id",
            (F.col("p0") + 1).alias("i"),
            F.conv(F.substring(F.md5("g"), 1, 15), 16, 10)
            .cast("long")
            .alias("w"),
        )
        .repartition("w")
    )
    # "w occurs in >= 2 distinct docs" ⟺ min(doc) != max(doc): one
    # map-side-combinable aggregate replaces distinct()+count over the
    # full posting list (guide §2.3 — aggregate before you shuffle).
    dup_w = (
        p.groupBy("w")
        .agg(F.min("doc_id").alias("__mn"), F.max("doc_id").alias("__mx"))
        .filter(F.col("__mn") != F.col("__mx"))
        .select("w")
    )
    src = t if t_out is None else t_out
    pc = p.join(dup_w, "w")
    if t_out is not None:
        # only emitted docs' covered positions matter downstream —
        # shrink the explode and the per-doc covered sets to them
        pc = pc.join(t_out.select("doc_id"), "doc_id", "left_semi")
    covered = (
        pc.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + (_SPAN_N - 1))
            ).alias("pos"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("__cov"))
    )
    # Rewrite ARRAY-SIDE: kept positions = sequence(1..n) \ covered
    # (array_except builds a hash set — O(n + |covered|) per doc), and
    # the cleaned stream rebuilds via element_at over the doc's own
    # token array. This removes the per-token posexplode, the
    # (doc,pos) anti-join and the collect_list reassembly that
    # shuffled the ENTIRE token stream by doc_id — the only frame
    # that now moves for the output side is one covered-position set
    # per dup-affected doc. Per-doc rows depend only on (tok, covered)
    # so the output is bit-identical to the explode/anti-join form.
    kept_pos = F.array_except(
        F.when(
            F.size("tok") >= 1, F.sequence(F.lit(1), F.size("tok"))
        ).otherwise(F.array().cast("array<int>")),
        F.coalesce(F.col("__cov"), F.array().cast("array<int>")),
    )
    return (
        src.join(covered, "doc_id", "left")
        .select("doc_id", "tok", kept_pos.alias("__kp"))
        .select(
            "doc_id",
            F.size("__kp").cast("long").alias("n_kept"),
            F.array_join(
                F.transform("__kp", lambda q: F.element_at(F.col("tok"), q)),
                " ",
            ).alias("cleaned"),
        )
        .filter(F.col("n_kept") >= 1)
    )


# ---------------------------------------------------------------------------
# doc_quality_train — TRAINING the hash-trick text classifier.
# doc_quality_classifier is inference with fixed weights; this FITS a
# Bernoulli Naive Bayes model over the same hash-trick feature space —
# the classic distributed text-classifier fit (spam filtering at scale
# IS distributed NB): training is two exact counting aggregates, so it
# reads the corpus once, shuffles O(buckets) rows, and — unlike
# gradient descent, whose full-batch dynamics on a near-duplicate
# synthetic corpus oscillate without separating — provably recovers
# any label that is a function of bucket presence.
# ---------------------------------------------------------------------------

_NB_BUCKETS = 256
_NB_LABEL = "key"  # present in ~75% of fixture docs; y IS a function
#                    of bucket presence, so the fit must separate it
#                    (pinned by tests/test_corpus_mix.py)

# Bernoulli NB with Laplace smoothing. Per bucket b and class c:
# p_bc = (df_bc + 1) / (n_c + 2), df = docs of class c containing b.
# Per-doc score = const + sum over PRESENT buckets of w_b, where
#   w_b     = ln(p_b1/p_b0) - ln((1-p_b1)/(1-p_b0))
#   const   = ln((n1+1)/(n0+1)) + sum_b ln((1-p_b1)/(1-p_b0))
# Every ln() input is a ratio of small exact integers and every term
# is QUANTIZED to 1e-6 units BEFORE any summation, so the only float
# risk is a last-ulp ln() landing exactly on a .5 boundary — the same
# accepted class as doc_quality_classifier's exp() (round 4) and far
# from the order-dependent-sum class the exact-sum rules exist for.

_NB_W_SQL = (
    "CAST(floor((ln((df_pos + 1.0) / (n_pos + 2.0))"
    " - ln((df_neg + 1.0) / (n_neg + 2.0))"
    " - ln(1.0 - (df_pos + 1.0) / (n_pos + 2.0))"
    " + ln(1.0 - (df_neg + 1.0) / (n_neg + 2.0))) * 1000000.0 + 0.5)"
    " AS BIGINT)"
)

_NB_ABSENT_SQL = (
    "CAST(floor((ln(1.0 - (df_pos + 1.0) / (n_pos + 2.0))"
    " - ln(1.0 - (df_neg + 1.0) / (n_neg + 2.0))) * 1000000.0 + 0.5)"
    " AS BIGINT)"
)


def _nb_train_oracle() -> str:
    from openmetrics_spark.functions.hashing import portable_hash60_sql

    h = portable_hash60_sql("tk")
    return f"""
WITH t AS (
  SELECT doc_id AS d, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), labels AS (
  SELECT d, CASE WHEN list_contains(tok, '{_NB_LABEL}') THEN 1 ELSE 0 END AS y
  FROM t
), nn AS (
  SELECT CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(count(*) - sum(y) AS BIGINT) AS n_neg
  FROM labels
), present AS (
  SELECT DISTINCT d, {h} % {_NB_BUCKETS} AS b
  FROM (SELECT d, unnest(tok) AS tk FROM t)
), df AS (
  SELECT b, CAST(sum(y) AS BIGINT) AS df_pos,
         CAST(count(*) - sum(y) AS BIGINT) AS df_neg
  FROM present JOIN labels USING (d) GROUP BY b
), w AS (
  SELECT b AS bucket, df_pos, df_neg, {_NB_W_SQL} AS w_e6
  FROM df, nn
), const AS (
  SELECT CAST(-1 AS BIGINT) AS bucket, n_pos AS df_pos, n_neg AS df_neg,
         CAST(floor(ln((n_pos + 1.0) / (n_neg + 1.0)) * 1000000.0 + 0.5)
              AS BIGINT)
         + (SELECT CAST(coalesce(sum({_NB_ABSENT_SQL}), 0) AS BIGINT)
            FROM df, nn) AS w_e6
  FROM nn
)
SELECT * FROM w UNION ALL SELECT * FROM const
"""


@register(
    "doc_quality_train", oracle=_nb_train_oracle(), tags=("llm", "train")
)
def doc_quality_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Bernoulli-NB fit over hash-trick buckets (label =
    contains-'key'): one pass builds per-bucket per-class document
    frequencies (map-side-combined, O(buckets) shuffle rows), the
    per-bucket presence weights and the absent-term constant follow as
    projections, and the model ships as exact integers — (bucket,
    df_pos, df_neg, w_e6), with bucket -1 carrying the class prior +
    absent-sum constant. Scoring is const + sum of w_e6 over PRESENT
    buckets > 0 (tests pin that it separates the label). At 100 TB
    training cost = one corpus scan + a 256-row aggregate; per-term
    1e-6 quantization happens BEFORE the constant's sum, so no
    order-dependent float aggregation exists."""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    t = docs.select(F.col("doc_id").alias("d"), tokens("text").alias("tok"))
    _present, w, const = _nb_model(t)
    return w.unionByName(const)


def _nb_present(t: DataFrame) -> DataFrame:
    """Distinct (d, bucket) presence pairs of ``t(d, tok)`` — the
    hash-trick feature extraction shared by the model fit (full
    corpus) and any scoring pass (which may run it over a subset)."""
    return (
        t.select("d", F.explode("tok").alias("tk"))
        .select("d", (portable_hash60(F.col("tk")) % _NB_BUCKETS).alias("b"))
        .distinct()
    )


def _nb_model(t: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Bernoulli-NB fit core over ``t(d, tok)``: returns ``(present,
    w, const)`` — ``present`` = distinct (d, b) doc-bucket pairs,
    ``w`` = (bucket, df_pos, df_neg, w_e6) presence weights,
    ``const`` = the single bucket=-1 row carrying the class prior +
    absent-term sum. Shared by doc_quality_train (emits the model)
    and corpus_prep_manifest_v3 (scores survivors with it)."""
    labels = t.select(
        "d", F.array_contains("tok", _NB_LABEL).cast("int").alias("y")
    )
    present = _nb_present(t)
    # pin both aggregates: the weight projection, the absent-sum and
    # the const row are separate plan branches (no cross-branch
    # exchange reuse) — without the pins the corpus tokenize/explode
    # would run 3x, breaking the one-scan claim above
    nn = pin(
        labels.agg(
            F.sum("y").cast("long").alias("n_pos"),
            (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("n_neg"),
        )
    )
    df_ = pin(
        present.join(labels, "d")
        .groupBy("b")
        .agg(
            F.sum("y").cast("long").alias("df_pos"),
            (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("df_neg"),
        )
        .crossJoin(F.broadcast(nn))
    )
    w = df_.select(
        F.col("b").alias("bucket"),
        "df_pos",
        "df_neg",
        F.expr(_NB_W_SQL).alias("w_e6"),
    )
    absent_sum = df_.select(F.expr(_NB_ABSENT_SQL).alias("a")).agg(
        F.coalesce(F.sum("a"), F.lit(0)).cast("long").alias("s")
    )
    const = (
        nn.crossJoin(F.broadcast(absent_sum))
        .select(
            F.lit(-1).cast("long").alias("bucket"),
            F.col("n_pos").alias("df_pos"),
            F.col("n_neg").alias("df_neg"),
            (
                F.floor(
                    F.log((F.col("n_pos") + 1.0) / (F.col("n_neg") + 1.0))
                    * 1000000.0
                    + 0.5
                ).cast("long")
                + F.col("s")
            ).alias("w_e6"),
        )
    )
    return present, w, const


# ---------------------------------------------------------------------------
# corpus_prep_manifest_v3 — the v2 chain with the round-6 additions
# composed in: the Lee-et-al span REWRITE applied across chain
# survivors, and the Bernoulli-NB quality score (model fit on the
# full corpus, survivors scored with it). Composition is where
# stage-boundary bugs live — the reference's analog is the composed
# FlatOutputJob (pipeline/.../job/join/FlatOutputJob.java:394-641).
# ---------------------------------------------------------------------------


def _manifest_v3_oracle() -> str:
    from openmetrics_spark.functions.hashing import portable_hash60_sql

    h = portable_hash60_sql("tk")
    return (
        _manifest_core_sql()
        + f"""
, sp AS (
  SELECT doc_id, i + 1 AS i, {_SPAN_SQL_HASH} AS w
  FROM surv, unnest(range(len(tok) - {_SPAN_N - 1})) r(i)
  WHERE len(tok) >= {_SPAN_N}
), spd AS (
  SELECT w FROM (SELECT DISTINCT doc_id, w FROM sp)
  GROUP BY w HAVING count(*) >= 2
), spc AS (
  SELECT DISTINCT doc_id, pos
  FROM (SELECT doc_id, i FROM sp JOIN spd USING (w)),
       unnest(range(i, i + {_SPAN_N})) r2(pos)
), sptok AS (
  SELECT doc_id, pos, tok[pos] AS token
  FROM surv, unnest(range(1, len(tok) + 1)) r(pos)
), spkept AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(token, ' ' ORDER BY pos) AS cleaned
  FROM sptok ANTI JOIN spc USING (doc_id, pos)
  GROUP BY doc_id
), nbl AS (
  SELECT doc_id AS d,
         CASE WHEN list_contains(tok, '{_NB_LABEL}') THEN 1 ELSE 0 END AS y
  FROM t
), nbn AS (
  SELECT CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(count(*) - sum(y) AS BIGINT) AS n_neg
  FROM nbl
), nbp AS (
  SELECT DISTINCT d, {h} % {_NB_BUCKETS} AS b
  FROM (SELECT doc_id AS d, unnest(tok) AS tk FROM t)
), nbdf AS (
  SELECT b, CAST(sum(y) AS BIGINT) AS df_pos,
         CAST(count(*) - sum(y) AS BIGINT) AS df_neg
  FROM nbp JOIN nbl USING (d) GROUP BY b
), nbw AS (
  SELECT b, {_NB_W_SQL} AS w_e6 FROM nbdf, nbn
), nbc AS (
  SELECT CAST(floor(ln((n_pos + 1.0) / (n_neg + 1.0)) * 1000000.0 + 0.5)
              AS BIGINT)
         + (SELECT CAST(coalesce(sum({_NB_ABSENT_SQL}), 0) AS BIGINT)
            FROM nbdf, nbn) AS c
  FROM nbn
), nbs AS (
  SELECT d AS doc_id, CAST(sum(w_e6) AS BIGINT) AS s
  FROM nbp JOIN nbw ON nbp.b = nbw.b GROUP BY d
)
SELECT surv.doc_id,
       surv.n_tokens,
       surv.quality,
       CAST(surv.n_tokens - coalesce(spkept.n_kept, 0) AS BIGINT) AS n_removed,
       CAST(coalesce(spkept.n_kept, 0) AS BIGINT) AS n_clean_tokens,
       md5(coalesce(spkept.cleaned, '')) AS clean_md5,
       CAST((SELECT c FROM nbc) + coalesce(nbs.s, 0) AS BIGINT) AS nb_score_e6
FROM surv
LEFT JOIN spkept USING (doc_id)
LEFT JOIN nbs USING (doc_id)
WHERE {_manifest_sample_gate_sql()}
"""
    )


@register(
    "corpus_prep_manifest_v3",
    oracle=_manifest_v3_oracle(),
    headline=True,
    tags=("llm", "pipeline"),
)
def corpus_prep_manifest_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The v2 curation chain with the round-6 operators composed in:

    - **span rewrite over survivors**: cross-document repeated
      20-token windows are detected across the POST-dedup survivor
      set (the production order — near-dup docs are already gone,
      so the posting list is smallest) and every covered token
      removed; the manifest carries the kept-token count and an md5
      fingerprint of the cleaned text, proving the rewritten stream
      itself flowed through the chain while keeping the manifest
      narrow.
    - **NB quality score**: the Bernoulli-NB model is FIT on the full
      corpus (one scan, O(buckets) shuffle — `_nb_model`) and chain
      survivors are scored with it (present-bucket join + integer
      sum; exact 1e-6-unit arithmetic end to end).

    Scale shape: the chain's stage order is v2's; the two new stages
    add one (doc,pos) anti-join over survivor tokens and one
    (doc,bucket)→weight join — both O(survivor tokens), no new
    corpus-wide shuffle beyond what the standalone operators pay."""
    # ONE corpus tokenize scan feeds both the curation chain and the
    # NB fit (pinned; the oracle's `t` CTE is the same sharing)
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    t = pin(
        docs.select("doc_id", "text", "lang", tokens("text").alias("tok"))
    )
    # STAGED PARQUET materialization, not pin or localCheckpoint: surv
    # is read by FOUR downstream branches and its plan subtree is the
    # whole 5-stage curation chain — with pin() each consumer REPRINTS
    # the chain into the final plan (hundreds of
    # Exchange/InMemoryTableScan reprints, a >10 MB plan string) and
    # Catalyst re-optimizes that tree per action; an r12 eager
    # localCheckpoint() truncated the lineage (pin 8.59 s vs ckpt
    # 8.09 s, median-of-7 at sf0.1) but stores blocks on executors
    # with NO lineage fallback — at cluster scale one lost executor
    # kills the job. The write+read-back keeps the truncated plan AND
    # survives executor loss (guide §3.3); `text` is projected out
    # first because no v3 consumer reads it (the gate needs doc_id +
    # lang, span rewrite needs tok, the manifest needs
    # n_tokens/quality) — it was the bulk of the materialized bytes.
    # (The LAZY checkpoint form stays a trap regardless: sibling
    # branches raced its first materialization into repeated
    # full-chain recomputes, shots of 18-41 s observed in r12.)
    surv = stage_parquet(
        _manifest_survivors(spark, sf_dir, t=t).select(
            "doc_id", "lang", "tok", "n_tokens", "quality"
        ),
        "manifest_v3_surv",
    )
    # the sample gate is a deterministic per-doc hash predicate and
    # every downstream stage here is per-doc given global inputs, so
    # gate FIRST and run the expensive output sides over ~35% of
    # survivors (r12, guide §1.2): span-dup DETECTION still sees all
    # survivors (global df >= 2), only the cover/reassembly side and
    # the NB scoring shrink. Outputs for gated docs are bit-identical.
    gated = surv.filter(_manifest_sample_gate())
    kept = _span_kept(
        surv.select("doc_id", "tok"), t_out=gated.select("doc_id", "tok")
    )

    t_nb = t.select(F.col("doc_id").alias("d"), "tok")
    present, w, const = _nb_model(t_nb)
    score = (
        _nb_present(
            t_nb.join(
                gated.select(F.col("doc_id").alias("d")), "d", "left_semi"
            )
        )
        .join(w.select(F.col("bucket").alias("b"), "w_e6"), "b")
        .groupBy("d")
        .agg(F.sum("w_e6").cast("long").alias("s"))
        .withColumnRenamed("d", "doc_id")
    )
    # the fitted prior+absent constant is ONE row — broadcast is bounded
    const_c = const.select(F.col("w_e6").alias("c"))
    return (
        gated
        .join(kept, "doc_id", "left")
        .join(score, "doc_id", "left")
        .crossJoin(F.broadcast(const_c))
        .select(
            "doc_id",
            "n_tokens",
            "quality",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("n_kept"), F.lit(0))
            .cast("long")
            .alias("n_clean_tokens"),
            F.md5(F.coalesce(F.col("cleaned"), F.lit(""))).alias("clean_md5"),
            (F.col("c") + F.coalesce(F.col("s"), F.lit(0)))
            .cast("long")
            .alias("nb_score_e6"),
        )
    )


# ---------------------------------------------------------------------------
# corpus_upsample_balanced — deterministic balanced RESAMPLING (the
# upsample counterpart of corpus_sample_stratified's downsample):
# replicate low-share languages toward a target mix. Replication
# factor r = target_share · total / lang_count in 1e-6 fixed point;
# every doc emits floor(r) copies plus one more iff a per-doc hash
# gate falls under frac(r) — exact integer arithmetic, so the emitted
# multiset (including WHICH docs get the extra copy) is hash-gated.
# ---------------------------------------------------------------------------

_UPSAMPLE_TARGETS = (("en", 40), ("de", 15), ("fr", 15), ("es", 15), ("zh", 15))


def _upsample_oracle() -> str:
    from openmetrics_spark.functions.hashing import portable_hash60_sql

    tgt = " ".join(
        f"WHEN '{lang}' THEN {pct}" for lang, pct in _UPSAMPLE_TARGETS
    )
    gate = portable_hash60_sql("'up_' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH d AS (
  SELECT doc_id, lang, CASE lang {tgt} ELSE 0 END AS pct
  FROM documents
), tot AS (
  SELECT count(*) AS total FROM documents
), ln AS (
  SELECT lang, count(*) AS n_lang FROM d GROUP BY lang
), r AS (
  SELECT d.doc_id, d.lang,
         (d.pct * tot.total * 1000000) // (100 * ln.n_lang) AS r_e6
  FROM d JOIN ln USING (lang), tot
), c AS (
  SELECT doc_id, lang,
         r_e6 // 1000000
         + CASE WHEN {gate} % 1000000 < r_e6 % 1000000 THEN 1 ELSE 0 END
           AS n_copies
  FROM r
)
SELECT doc_id, lang, CAST(i + 1 AS BIGINT) AS copy
FROM c, unnest(range(n_copies)) t(i)
"""


@register(
    "corpus_upsample_balanced",
    oracle=_upsample_oracle(),
    tags=("llm", "pipeline"),
)
def corpus_upsample_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced corpus resampling toward a target language mix: each
    doc of language L replicates ``r = target_L · total / |L|`` times
    — integer part unconditionally, fractional part by a deterministic
    per-doc hash gate (the standard temperature/upsampling step before
    packing a multilingual training mix; cf. the α-weighted mixing of
    domain_mix_weights, which computes WEIGHTS — this op materializes
    the replicated manifest). All arithmetic in 1e-6 fixed point; the
    output multiset is exact. 100 TB shape: two tiny aggregates
    (total, per-lang counts) broadcast onto a single corpus scan, and
    the explode emits only ceil(r) rows per doc — no shuffle of the
    corpus at all."""
    docs = spread_for_compute(table(spark, sf_dir, "documents")).select(
        "doc_id", "lang"
    )
    tgt = F.create_map(
        *[F.lit(x) for pair in _UPSAMPLE_TARGETS for x in pair]
    )
    d = docs.withColumn("pct", F.coalesce(tgt[F.col("lang")], F.lit(0)))
    ln = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    tot = docs.agg(F.count(F.lit(1)).alias("total"))
    r = (
        d.join(F.broadcast(ln), "lang")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "r_e6",
            F.expr("(pct * total * 1000000) DIV (100 * n_lang)"),
        )
    )
    gate = (
        portable_hash60(
            F.concat(F.lit("up_"), F.col("doc_id").cast("string"))
        )
        % 1_000_000
    )
    c = r.withColumn(
        "n_copies",
        F.expr("r_e6 DIV 1000000")
        + F.when(gate < F.col("r_e6") % 1_000_000, 1).otherwise(0),
    )
    return (
        c.filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))).alias(
                "copy"
            ),
        )
    )


# ---------------------------------------------------------------------------
# corpus_distinct_ngrams — distinct-n diversity report (the standard
# corpus-quality metric: low distinct-bigram ratio = templated/
# repetitive text; cf. distinct-n in generation-diversity literature).
# ---------------------------------------------------------------------------

_DISTINCT_NGRAMS_ORACLE = """
WITH t AS (
  SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), bg AS (
  SELECT lang, tok[i + 1] || ' ' || tok[i + 2] AS g
  FROM t, unnest(range(len(tok) - 1)) r(i)
  WHERE len(tok) >= 2
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS total_bigrams,
       CAST(count(DISTINCT g) AS BIGINT) AS distinct_bigrams,
       CAST(count(DISTINCT g) * 1000000 // count(*) AS BIGINT)
         AS distinct_ratio_e6
FROM bg GROUP BY lang
"""


@register(
    "corpus_distinct_ngrams",
    oracle=_DISTINCT_NGRAMS_ORACLE,
    tags=("llm", "text"),
)
def corpus_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-bigram diversity per language: total vs distinct
    bigram counts and their ratio in exact 1e-6 units. One explode +
    one (lang, gram) aggregate — the distinct is per-gram, so the
    shuffle carries one row per DISTINCT (lang, gram), map-side
    combined, never the raw gram stream. (At 100 TB swap the exact
    distinct for the HLL register path in operators/sketches.py; the
    exact form here is what the oracle can gate bit-for-bit.)"""
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", "lang", tokens("text").alias("tok"))
    idx = F.when(
        F.size("tok") >= 2, F.sequence(F.lit(0), F.size("tok") - 2)
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx,
        lambda i: F.concat(
            F.element_at("tok", i + 1), F.lit(" "), F.element_at("tok", i + 2)
        ),
    )
    bg = t.select("lang", F.explode(grams).alias("g"))
    return bg.groupBy("lang").agg(
        F.count(F.lit(1)).alias("total_bigrams"),
        F.countDistinct("g").alias("distinct_bigrams"),
        F.expr(
            "CAST(count(DISTINCT g) * 1000000 DIV count(*) AS BIGINT)"
        ).alias("distinct_ratio_e6"),
    )


# ---------------------------------------------------------------------------
# doc_quality_train_eval — the full ML loop with leakage discipline:
# fit Bernoulli NB on the leakage-safe TRAIN split only, score the
# TEST split, report the confusion matrix + accuracy. Composes
# corpus_leakage_safe_split (cluster-aware split) with _nb_model; all
# integer arithmetic, so the EVALUATION itself is hash-gated.
# ---------------------------------------------------------------------------


def _nb_eval_oracle() -> str:
    from openmetrics_spark.functions.hashing import portable_hash60_sql
    from openmetrics_spark.queries.docs_q import _LEAKAGE_SPLIT_ORACLE

    h = portable_hash60_sql("tk")
    return f"""
WITH spl AS ({_LEAKAGE_SPLIT_ORACLE}),
t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tok
  FROM documents
), tr AS (
  SELECT t.doc_id AS d, t.tok FROM t JOIN spl USING (doc_id)
  WHERE spl.split = 'train'
), te AS (
  SELECT t.doc_id AS d, t.tok FROM t JOIN spl USING (doc_id)
  WHERE spl.split = 'test'
), nbl AS (
  SELECT d, CASE WHEN list_contains(tok, '{_NB_LABEL}') THEN 1 ELSE 0 END AS y
  FROM tr
), nbn AS (
  SELECT CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(count(*) - sum(y) AS BIGINT) AS n_neg
  FROM nbl
), nbp AS (
  SELECT DISTINCT d, {h} % {_NB_BUCKETS} AS b
  FROM (SELECT d, unnest(tok) AS tk FROM tr)
), nbdf AS (
  SELECT b, CAST(sum(y) AS BIGINT) AS df_pos,
         CAST(count(*) - sum(y) AS BIGINT) AS df_neg
  FROM nbp JOIN nbl USING (d) GROUP BY b
), nbw AS (
  SELECT b, {_NB_W_SQL} AS w_e6 FROM nbdf, nbn
), nbc AS (
  SELECT CAST(floor(ln((n_pos + 1.0) / (n_neg + 1.0)) * 1000000.0 + 0.5)
              AS BIGINT)
         + (SELECT CAST(coalesce(sum({_NB_ABSENT_SQL}), 0) AS BIGINT)
            FROM nbdf, nbn) AS c
  FROM nbn
), tep AS (
  SELECT DISTINCT d, {h} % {_NB_BUCKETS} AS b
  FROM (SELECT d, unnest(tok) AS tk FROM te)
), tes AS (
  SELECT te.d,
         CASE WHEN list_contains(te.tok, '{_NB_LABEL}') THEN 1 ELSE 0 END AS y,
         (SELECT c FROM nbc) + coalesce(s.s, 0) AS score
  FROM te LEFT JOIN (
    SELECT d, CAST(sum(w_e6) AS BIGINT) AS s
    FROM tep JOIN nbw ON tep.b = nbw.b GROUP BY d
  ) s USING (d)
)
SELECT CAST(sum(CASE WHEN score > 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       CAST(sum(CASE WHEN score > 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       CAST(sum(CASE WHEN score <= 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
       CAST(sum(CASE WHEN score <= 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN (score > 0) = (y = 1) THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS accuracy_e6
FROM tes
"""


@register(
    "doc_quality_train_eval",
    oracle=_nb_eval_oracle(),
    tags=("llm", "train"),
)
def doc_quality_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval with leakage discipline: the Bernoulli-NB model fits
    on the cluster-aware TRAIN split only (near-duplicates of a test
    doc can never leak into training — corpus_leakage_safe_split),
    the TEST split is scored with the fitted integer weights, and the
    confusion matrix + accuracy (1e-6 units, integer DIV) come back
    as ONE hash-gated row — the evaluation itself is reproducible
    bit-for-bit in both engines. 100 TB shape: split cost = the dedup
    pipeline's; the fit is one train-scan → 256-bucket aggregate; the
    eval is one test-scan + broadcast-size weight join."""
    from openmetrics_spark.queries.docs_q import corpus_leakage_safe_split

    spl = corpus_leakage_safe_split(spark, sf_dir)
    docs = spread_for_compute(table(spark, sf_dir, "documents"))
    t = pin(docs.select("doc_id", tokens("text").alias("tok")))
    tr = t.join(
        spl.filter(F.col("split") == "train").select("doc_id"),
        "doc_id",
        "left_semi",
    ).select(F.col("doc_id").alias("d"), "tok")
    te = pin(
        t.join(
            spl.filter(F.col("split") == "test").select("doc_id"),
            "doc_id",
            "left_semi",
        ).select(F.col("doc_id").alias("d"), "tok")
    )
    _ptr, w, const = _nb_model(tr)
    tep = (
        te.select("d", F.explode("tok").alias("tk"))
        .select("d", (portable_hash60(F.col("tk")) % _NB_BUCKETS).alias("b"))
        .distinct()
    )
    s = (
        tep.join(w.select(F.col("bucket").alias("b"), "w_e6"), "b")
        .groupBy("d")
        .agg(F.sum("w_e6").cast("long").alias("s"))
    )
    scored = (
        te.select(
            "d", F.array_contains("tok", _NB_LABEL).cast("int").alias("y")
        )
        .join(s, "d", "left")
        .crossJoin(F.broadcast(const.select(F.col("w_e6").alias("c"))))
        .withColumn("score", F.col("c") + F.coalesce(F.col("s"), F.lit(0)))
    )
    pred = F.col("score") > 0
    pos = F.col("y") == 1
    return scored.agg(
        F.sum((pred & pos).cast("long")).alias("tp"),
        F.sum((pred & ~pos).cast("long")).alias("fp"),
        F.sum((~pred & ~pos).cast("long")).alias("tn"),
        F.sum((~pred & pos).cast("long")).alias("fn"),
        F.count(F.lit(1)).alias("n_test"),
        F.expr(
            "CAST(sum(CASE WHEN (score > 0) = (y = 1) THEN 1 ELSE 0 END)"
            " * 1000000 DIV count(*) AS BIGINT)"
        ).alias("accuracy_e6"),
    )


# ---------------------------------------------------------------------------
# corpus_shuffle_shards — deterministic global shuffle into training
# shards (r9): the step between curation and tokenization. Every doc
# gets a pseudo-random sort key xxhash64(doc_id) (Spark's built-in
# JVM hash, seed 42 — reproduced bit-exactly in DuckDB by
# functions.hashing_sql.xxhash64_long_sql); shard = key mod 16 (a
# power of two, so signed pmod == unsigned mod and both engines
# agree), order within a shard = (key, doc_id). The manifest pins the
# PERMUTATION, not just membership: one row per shard with doc count,
# char mass, and a bit_xor checksum over (rank, doc_id) — any doc in
# the wrong shard, any pair out of order, any skew in the hash flips
# a row.
#
# 100 TB: the real writer is df.repartition(N, shard).
# sortWithinPartitions(key) → partitionBy(shard) parquet — ONE hash
# shuffle, no global sort; the rank window here partitions by shard
# (16 independent sorts) purely to expose the order to the checksum.
# ---------------------------------------------------------------------------

_N_SHARDS = 16
_U64 = "18446744073709551616"  # 2^64


def _shuffle_oracle() -> str:
    from openmetrics_spark.functions.hashing_sql import xxhash64_long_sql

    hashed = xxhash64_long_sql(
        "SELECT doc_id, n_chars, doc_id AS __v FROM documents"
    )
    return f"""
WITH r AS (
  SELECT doc_id, n_chars,
         CAST(__hash % {_N_SHARDS} AS BIGINT) AS shard,
         row_number() OVER (
           PARTITION BY __hash % {_N_SHARDS} ORDER BY __hash, doc_id
         ) AS rank
  FROM {hashed}
)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(coalesce(bit_xor(CAST(('0x' || substr(md5(
         concat_ws('|', CAST(rank AS VARCHAR), CAST(doc_id AS VARCHAR))),
         1, 15)) AS BIGINT)), 0) AS BIGINT) AS order_checksum
FROM r GROUP BY shard
"""


@register(
    "corpus_shuffle_shards", oracle=_shuffle_oracle(), tags=("llm", "pipeline")
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle into 16 training shards,
    gated as a per-shard permutation manifest (see block comment)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    h = F.xxhash64("doc_id")
    # the unsigned view of the signed JVM hash: one total order shared
    # with the DuckDB twin (decimal(20,0) holds [0, 2^64))
    u = F.when(h < 0, h.cast("decimal(20,0)") + F.lit(_U64).cast("decimal(20,0)")).otherwise(
        h.cast("decimal(20,0)")
    )
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.pmod(h, F.lit(_N_SHARDS)).cast("long").alias("shard"),
        u.alias("u"),
    )
    w = Window.partitionBy("shard").orderBy("u", "doc_id")
    ranked = keyed.withColumn("rank", F.row_number().over(w))
    cs = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("rank").cast("string"), F.col("doc_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return (
        ranked.withColumn("__cs", cs)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.coalesce(F.expr("bit_xor(__cs)"), F.lit(0))
            .cast("long")
            .alias("order_checksum"),
        )
        .select("shard", "n_docs", "sum_chars", "order_checksum")
    )
