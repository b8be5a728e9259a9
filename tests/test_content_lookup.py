"""Streaming-path content lookup: per-worker cached client parity
with the broadcast join (reference: ContentApiSegment.java:81-180).
"""

from __future__ import annotations

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openmetrics_spark.operators.content_lookup import (
    CachedContentClient,
    DictContentLoader,
    lookup_enrich,
)
from openmetrics_spark.tables import table

_CATALOG = {k: {"lang": ["en", "de", "fr"][k % 3], "source": f"s{k % 5}"} for k in range(100)}

# library-defined loader: executors unpickle it by module reference
# (a test-module function would not be importable on workers)
_fetch_from_catalog = DictContentLoader(_CATALOG)


_FAIL_COUNT = {"n": 0}


def _flaky_fetch(ids):
    _FAIL_COUNT["n"] += 1
    if _FAIL_COUNT["n"] % 2 == 1:
        raise ConnectionError("transient")
    return _fetch_from_catalog(ids)


def test_lookup_enrich_matches_broadcast_join(spark, sf_dir, tmp_path):
    """The cached-client map enrichment must produce the same rows as
    the broadcast-join batch strategy over the same catalog."""
    ev = table(spark, sf_dir, "events").select(
        F.get_json_object("props", "$.k").cast("int").alias("k"), "value"
    )
    stats = str(tmp_path / "lookup_stats")
    os.makedirs(stats, exist_ok=True)
    enriched = lookup_enrich(
        ev.repartition(4),
        "k",
        [("lang", T.StringType()), ("source", T.StringType())],
        _fetch_from_catalog,
        cache_key=f"test_parity_{os.getpid()}",
        stats_dir=stats,
    )
    got = (
        enriched.filter(F.col("lang").isNotNull())
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("v"))
    )
    dim = spark.createDataFrame(
        [(k, v["lang"], v["source"]) for k, v in _CATALOG.items()],
        "k INT, lang STRING, source STRING",
    )
    want = (
        ev.join(F.broadcast(dim), "k")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("v"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # cache effectiveness: far fewer ids fetched than rows scanned —
    # each worker fetches each distinct id at most once
    n_rows = ev.count()
    fetched = sum(
        int(line)
        for path in glob.glob(os.path.join(stats, "fetch_*.log"))
        for line in open(path)
    )
    assert 0 < fetched < n_rows / 2, (fetched, n_rows)


def test_cached_client_dedupes_and_retries(tmp_path):
    stats = str(tmp_path / "lookup_unit")
    os.makedirs(stats, exist_ok=True)
    c = CachedContentClient(_fetch_from_catalog, max_size=8, stats_dir=stats)
    out = c.get_many([1, 2, 1, 3, 999])
    assert out[1] == _CATALOG[1] and out[999] is None
    assert c.n_fetch_calls == 1 and c.n_fetched_ids == 4
    # second round: all hits (999's negative result is cached too)
    c.get_many([1, 2, 3, 999])
    assert c.n_fetch_calls == 1 and c.n_cache_hits >= 4
    # LRU bound: flood past max_size evicts the oldest
    c.get_many(list(range(10, 20)))
    assert len(c._cache) <= 8

    # retry loop: first attempt raises, second succeeds
    _FAIL_COUNT["n"] = 0
    flaky = CachedContentClient(_flaky_fetch, max_attempts=3)
    assert flaky.get_many([5])[5] == _CATALOG[5]

    # exhausted attempts propagate
    def always_down(ids):
        raise ConnectionError("down")

    dead = CachedContentClient(always_down, max_attempts=2)
    with pytest.raises(ConnectionError):
        dead.get_many([1])


def test_lookup_enrich_plan_is_narrow(spark, sf_dir):
    """No shuffle: the enrichment is a map — the plan must contain no
    Exchange beyond the input's own and no join."""
    ev = table(spark, sf_dir, "events").select(
        F.get_json_object("props", "$.k").cast("int").alias("k"), "value"
    )
    enriched = lookup_enrich(
        ev,
        "k",
        [("lang", T.StringType())],
        _fetch_from_catalog,
        cache_key=f"test_plan_{os.getpid()}",
    )
    plan = enriched._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
