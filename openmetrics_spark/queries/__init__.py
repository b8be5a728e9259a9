"""Query registry — the correctness + bench surface of the engine.

Every operator from SURVEY.md §2 that is implemented gets a named
query here: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus
(wherever SQL can express it) an equivalent ANSI-SQL oracle that
DuckDB runs on the same parquet tables. The driver executes both and
hash-compares values; tests/test_queries_oracle.py does the same
locally at sf0.001.

Conventions:
- every computed column is aliased identically in Spark and SQL;
- timestamps leave queries as epoch-millis longs (``unix_millis`` /
  ``epoch_ms``) or DATEs — never raw timestamps — so the two engines
  hash identical values;
- double aggregates are ``round(x, 2..6)`` in BOTH engines;
- counts that pass through a second SUM are cast back to BIGINT in
  SQL (DuckDB widens SUM(BIGINT) to HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    headline: bool = False  # included in bench.py
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
):
    def deco(fn):
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            headline=headline,
            tags=tags,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # import side-effect registration
    from openmetrics_spark.queries import (  # noqa: F401
        bfj_q,
        corpus_q,
        counter_q,
        docs_q,
        sql_surface_q,
        streaming_q,
        events_q,
        media_q,
        tpch,
        tpch_ext,
        corpus_mix_q,
        upsert_q,
        users_q,
    )

    return REGISTRY
