"""Driver gates for the stateless flat-output operators that were
previously pytest-only (VERDICT r7 rows 13-18, 20): FilterOperator
split, the full isbot UA filter, the shouldJoin traffic filter,
BuyerPredicate, RestructureDeliveryLog, the recursive PII strip, and
OtherContentIdsConverter — one manifest query, closed-form DuckDB
oracle.

The bot stage is the strong one: the Spark side runs the REAL
compiled automaton (``operators.filters.is_bot`` — one ``rlike`` over
the full 201-pattern isbot alternation) and the oracle runs the SAME
3 KB regex through DuckDB's RE2 ``regexp_matches`` — the two engines'
regex engines must classify every fixture UA identically for the
hash to match, so the whole pattern list is cross-engine-gated, not
just the fixture's expected labels. (The list has no lookarounds, so
it is valid RE2; pinned by this very gate.)

OtherContentIdsConverter's key hashes are config-time Java
``String.hashCode`` constants (functions.hashing.java_string_hash,
golden-pinned in tests/test_hashing.py) — both engines embed the same
Python-computed literals, exactly like the reference precomputes them
at job build (OtherContentIdsConverter.java:19-60).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmetrics_spark.functions.hashing import java_string_hash
from openmetrics_spark.functions.isbot import ISBOT_REGEX
from openmetrics_spark.operators.filters import (
    filter_bots,
    filter_non_buyers,
    filter_non_production,
)
from openmetrics_spark.operators.flat import (
    clear_user_id,
    other_content_ids,
    restructure_delivery_log,
)
from openmetrics_spark.queries import register
from openmetrics_spark.queries.bfj_pipeline_q import _stage
from openmetrics_spark.tables import pin, table

_UAS: tuple[str | None, ...] = (
    "Googlebot/2.1 (+http://www.google.com/bot.html)",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 15_0 like Mac OS X)",
    "curl/7.64.1",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36",
    "python-requests/2.28.1",
    None,
    "Mozilla/5.0 (compatible; bingbot/2.0; +http://www.bing.com/bingbot.htm)",
    "okhttp/4.9.0",
)

_H_STORE = java_string_hash("storeId")
_H_PROMO = java_string_hash("promotionId")
_H_INTERNAL = java_string_hash("internal_tester")
_H_QA = java_string_hash("qa_account")
_NON_BUYER_HASHES = [_H_INTERNAL, _H_QA]


def _clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("id"),
            (F.col("user_id") % 4).alias("platform_id"),
            F.concat(F.lit("u"), F.col("user_id")).alias("log_user_id"),
        )
    )


def _j(*cols) -> F.Column:
    return F.concat_ws("|", *cols)


def _nz(c) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.coalesce(col.cast("string"), F.lit("-"))


def _run(spark: SparkSession, sf_dir: str) -> list[DataFrame]:
    c = pin(_clicks(spark, sf_dir))

    # -- bot filter over the full isbot automaton ---------------------------
    ua = F.element_at(
        F.array(*[F.lit(u) for u in _UAS]), (F.col("id") % 8 + 1).cast("int")
    )
    with_ua = c.select("id", ua.alias("user_agent"))
    _, bots = filter_bots(with_ua)

    # -- shouldJoin traffic filter ------------------------------------------
    traffic = (
        F.when(F.col("id") % 5 == 0, F.lit(4))  # SHADOW
        .when(F.col("id") % 5 == 1, F.lit(None).cast("int"))  # unset=PROD
        .otherwise(F.lit(1))
    )
    with_tr = c.select("id", traffic.alias("traffic_type"))
    tr_kept, tr_dropped = filter_non_production(with_tr)

    # -- BuyerPredicate ------------------------------------------------------
    feats = (
        F.when(
            F.col("id") % 6 == 0,
            F.array(F.lit(_H_INTERNAL).cast("long"), F.lit(77).cast("long")),
        )
        .when(F.col("id") % 6 == 1, F.array(F.lit(_H_QA).cast("long")))
        .when(F.col("id") % 6 == 2, F.lit(None).cast("array<long>"))
        .when(F.col("id") % 6 == 3, F.array().cast("array<long>"))
        .otherwise(F.array((F.col("id") % 1000).cast("long")))
    )
    with_feats = c.select("id", feats.alias("user_sparse_feature_hashes"))
    buy_kept, buy_dropped = filter_non_buyers(with_feats, _NON_BUYER_HASHES)

    # -- RestructureDeliveryLog ----------------------------------------------
    ins = lambda tag: F.struct(  # noqa: E731
        F.concat(F.lit(tag), F.col("id")).alias("insertion_id")
    )
    legacy = c.select(
        "id",
        F.when(F.col("id") % 3 == 1, F.array(ins("r"))).alias(
            "response_insertions"
        ),
        F.when(F.col("id") % 3 == 0, F.array(ins("x"), ins("y")))
        .when(F.col("id") % 3 == 2, F.array(ins("z")))
        .alias("execution_insertions"),
    ).withColumn(
        "response_insertions",
        F.when(F.col("id") % 3 == 2, F.array().cast(
            "array<struct<insertion_id:string>>"
        )).otherwise(F.col("response_insertions")),
    )
    restructured = restructure_delivery_log(legacy).select(
        "id", F.explode("response_insertions").alias("__i")
    ).select("id", F.col("__i.insertion_id").alias("insertion_id"))

    # -- recursive PII strip ---------------------------------------------------
    nested = c.select(
        "id",
        F.concat(F.lit("U"), F.col("id")).alias("user_id"),
        F.struct(
            F.concat(F.lit("U"), F.col("id")).alias("user_id"),
            F.col("log_user_id").alias("keep1"),
        ).alias("meta"),
        F.array(
            F.struct(
                F.concat(F.lit("U"), F.col("id")).alias("user_id"),
                (F.col("id") % 7).cast("long").alias("keep2"),
            )
        ).alias("hist"),
    )
    stripped = pin(clear_user_id(nested))
    leaked = stripped.filter(
        F.col("user_id").isNotNull()
        | F.col("meta.user_id").isNotNull()
        | (
            F.size(
                F.filter("hist", lambda x: x["user_id"].isNotNull())
            )
            > 0
        )
    )

    # -- OtherContentIdsConverter ------------------------------------------------
    props = F.concat(
        F.lit('{"storeId":"s'),
        (F.col("id") % 9).cast("string"),
        F.lit('"'),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(
                F.lit(',"promotionId":"p'),
                (F.col("id") % 4).cast("string"),
                F.lit('"'),
            ),
        ).otherwise(F.lit("")),
        F.lit("}"),
    )
    cmap = c.select(
        "id",
        other_content_ids(props, ["storeId", "promotionId"]).alias("m"),
    ).select("id", F.explode("m").alias("k", "v"))

    return [
        _stage(1, "bots_dropped", bots, _j(_nz("id"), _nz("user_agent"))),
        _stage(2, "traffic_kept", tr_kept, _j(_nz("id"), _nz("traffic_type"))),
        _stage(
            3,
            "traffic_dropped",
            tr_dropped,
            _j(_nz("id"), _nz("traffic_type"), F.col("dropped_reason")),
        ),
        _stage(4, "buyers_kept", buy_kept, _j(_nz("id"))),
        _stage(
            5,
            "non_buyers_dropped",
            buy_dropped,
            _j(_nz("id"), F.col("dropped_reason")),
        ),
        _stage(
            6,
            "restructured_insertions",
            restructured,
            _j(_nz("id"), _nz("insertion_id")),
        ),
        _stage(
            7,
            "pii_preserved",
            stripped,
            _j(_nz("id"), _nz("meta.keep1"), _nz(F.element_at("hist", 1)["keep2"])),
        ),
        _stage(8, "pii_leaked", leaked, _j(_nz("id"))),
        _stage(9, "other_content_ids", cmap, _j(_nz("id"), _nz("k"), _nz("v"))),
    ]


def _oracle() -> str:
    pat = ISBOT_REGEX.replace("'", "''")
    cs = "CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"

    def stage(ord_, name, from_sql, s):
        return f"""
SELECT CAST({ord_} AS BIGINT) AS stage_ord, '{name}' AS stage,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(coalesce(bit_xor({cs.format(s=s)}), 0) AS BIGINT) AS checksum
FROM {from_sql}"""

    uas = ", ".join("NULL" if u is None else f"'{u}'" for u in _UAS)
    return f"""
WITH c AS (
  SELECT event_id AS id, user_id % 4 AS platform_id,
         'u' || CAST(user_id AS VARCHAR) AS log_user_id
  FROM events WHERE event_type = 'click'
),
ua AS (
  SELECT id, ([{uas}])[CAST(id % 8 AS INT) + 1] AS user_agent FROM c
),
bots AS (
  SELECT * FROM ua
  WHERE coalesce(regexp_matches(lower(user_agent), '{pat}'), FALSE)
),
tr AS (
  SELECT id, CASE WHEN id % 5 = 0 THEN 4
                  WHEN id % 5 = 1 THEN NULL ELSE 1 END AS traffic_type
  FROM c
),
tr_kept AS (SELECT * FROM tr WHERE coalesce(traffic_type = 1, TRUE)),
tr_dropped AS (SELECT * FROM tr WHERE NOT coalesce(traffic_type = 1, TRUE)),
buy AS (SELECT id, id % 6 AS r FROM c),
buy_kept AS (SELECT id FROM buy WHERE r NOT IN (0, 1)),
buy_dropped AS (SELECT id FROM buy WHERE r IN (0, 1)),
restructured AS (
  -- id%3==0: legacy exec pair backfills the NULL response;
  -- id%3==1: response kept as-is; id%3==2: EMPTY response backfilled
  SELECT id, 'x' || CAST(id AS VARCHAR) AS insertion_id FROM c WHERE id % 3 = 0
  UNION ALL
  SELECT id, 'y' || CAST(id AS VARCHAR) FROM c WHERE id % 3 = 0
  UNION ALL
  SELECT id, 'r' || CAST(id AS VARCHAR) FROM c WHERE id % 3 = 1
  UNION ALL
  SELECT id, 'z' || CAST(id AS VARCHAR) FROM c WHERE id % 3 = 2
),
cmap AS (
  SELECT id, CAST({_H_STORE} AS INT) AS k,
         's' || CAST(id % 9 AS VARCHAR) AS v FROM c
  UNION ALL
  SELECT id, CAST({_H_PROMO} AS INT),
         'p' || CAST(id % 4 AS VARCHAR) FROM c WHERE id % 2 = 0
)
{stage(1, 'bots_dropped', 'bots',
       "concat_ws('|', CAST(id AS VARCHAR), coalesce(user_agent, '-'))")}
UNION ALL
{stage(2, 'traffic_kept', 'tr_kept',
       "concat_ws('|', CAST(id AS VARCHAR), coalesce(CAST(traffic_type AS VARCHAR), '-'))")}
UNION ALL
{stage(3, 'traffic_dropped', 'tr_dropped',
       "concat_ws('|', CAST(id AS VARCHAR), CAST(traffic_type AS VARCHAR), 'non_production_traffic')")}
UNION ALL
{stage(4, 'buyers_kept', 'buy_kept', "CAST(id AS VARCHAR)")}
UNION ALL
{stage(5, 'non_buyers_dropped', 'buy_dropped',
       "concat_ws('|', CAST(id AS VARCHAR), 'non_buyer')")}
UNION ALL
{stage(6, 'restructured_insertions', 'restructured',
       "concat_ws('|', CAST(id AS VARCHAR), insertion_id)")}
UNION ALL
{stage(7, 'pii_preserved', 'c',
       "concat_ws('|', CAST(id AS VARCHAR), log_user_id, CAST(id % 7 AS VARCHAR))")}
UNION ALL
SELECT CAST(8 AS BIGINT), 'pii_leaked', CAST(0 AS BIGINT), CAST(0 AS BIGINT)
UNION ALL
{stage(9, 'other_content_ids', 'cmap',
       "concat_ws('|', CAST(id AS VARCHAR), CAST(k AS VARCHAR), v)")}
"""


@register("flat_ops_gates", oracle=_oracle(), tags=("bfj", "validate"))
def flat_ops_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateless flat-output operator gates, as one manifest (see
    module docstring). 100 TB: every stage is a narrow per-row
    projection/filter (the bot rlike is one compiled automaton per
    task, the buyer check an arrays_overlap against a literal, the
    PII strip a recursive column rewrite) — no shuffles beyond the
    manifest's own count aggregates."""
    parts = _run(spark, sf_dir)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
