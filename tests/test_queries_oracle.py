"""The local mirror of the driver's correctness gate: every registered
query with an oracle must match DuckDB on sf0.001 (row count, columns,
order-insensitive values)."""

from __future__ import annotations

import pytest

from openmetrics_spark.oracle import check_query
from openmetrics_spark.queries import all_queries

QUERY_NAMES = sorted(all_queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    errs = check_query(spark, sf_dir, name)
    assert not errs, f"{name}: {errs}"


def test_every_query_has_unique_name():
    assert len(QUERY_NAMES) == len(set(QUERY_NAMES))


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
