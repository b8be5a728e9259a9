"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in openmetrics_spark/queries/ — this module just
re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from openmetrics_spark.queries import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: hourly unified-event metrics (the
    reference's content-metrics job shape)."""
    return all_queries()["hourly_event_metrics"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Each callable releases the PREVIOUS query's pinned caches before
    running: the driver executes many queries in one session, and the
    heavier manifests each pin several intermediates — accumulated
    pins OOM a default-memory driver JVM partway through the window
    (measured: 3 heavy queries + the 22-stage manifest on local[8]
    defaults). Releasing at the query boundary is safe — the prior
    result has been collected by the time the next callable runs, and
    an unpersisted frame would only recompute, never corrupt."""
    from openmetrics_spark.tables import release_caches

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            release_caches()
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
