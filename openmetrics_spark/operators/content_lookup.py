"""Content API lookup enrichment — the streaming/external-service path.

The reference enriches each TinyEvent with content-catalog dimensions
through an async HTTP client fronted by a bounded cache (reference:
pipeline/.../common/job/ContentApiSegment.java:81-180 —
AsyncDataStream.unorderedWait + contentCacheMaxSize=50k,
contentCacheExpiration=P1D, contentApiMaxAttempts=3).

Two Spark-side strategies cover the same operator:

- BATCH: broadcast-join the catalog dimension
  (queries/events_q.py::content_lookup_enrich) — right whenever the
  catalog is shippable, which is the common analytics case.
- STREAMING / huge-catalog: this module. ``lookup_enrich`` runs the
  fact stream through Arrow-batched ``mapInPandas``; each PYTHON
  WORKER holds one long-lived :class:`CachedContentClient` (created on
  first use, reused across batches and micro-batches — the analog of
  Flink's per-operator async client), which answers from its bounded
  LRU cache and fetches only the misses in one batched call per Arrow
  batch. Works identically under ``df.mapInPandas`` in a batch job and
  on a streaming DataFrame (mapInPandas is streaming-compatible), so
  the streaming jobs reuse it unchanged.

Scale shape: no shuffle at all — enrichment is a narrow map; the
external service sees one batched request per Arrow batch per miss
set, capped by the cache. Hot content ids (the Zipf head that would
skew a join) are exactly the ones the cache absorbs.

The sandbox has no HTTP stack, so the transport is injected as a
picklable ``fetch_many(ids) -> {id: {field: value}}`` callable; the
retry loop mirrors contentApiMaxAttempts. Tests inject a dict-backed
fake that records its calls on disk, asserting both row parity with
the broadcast join and that the cache actually deduplicates fetches.
"""

from __future__ import annotations

import os
import time
from collections import OrderedDict
from collections.abc import Callable, Iterable, Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# One client per (python worker, cache_key): mapInPandas runs inside
# long-lived worker processes (spark.python.worker.reuse defaults on),
# so module state survives across Arrow batches, tasks, and streaming
# micro-batches — the per-operator client the reference builds in
# open().
_WORKER_CLIENTS: dict[str, "CachedContentClient"] = {}


class CachedContentClient:
    """Bounded LRU + TTL cache in front of a batched fetch callable.

    Mirrors ContentApiSegment's client config: ``max_size`` ↔
    contentCacheMaxSize, ``ttl_s`` ↔ contentCacheExpiration,
    ``max_attempts`` ↔ contentApiMaxAttempts. Negative results (id
    unknown to the service) are cached as None so a missing id is not
    re-fetched every batch.
    """

    def __init__(
        self,
        fetch_many: Callable[[list], dict],
        max_size: int = 50_000,
        ttl_s: float = 86_400.0,
        max_attempts: int = 3,
        stats_dir: str | None = None,
    ) -> None:
        self._fetch_many = fetch_many
        self._max_size = max_size
        self._ttl_s = ttl_s
        self._max_attempts = max_attempts
        self._cache: OrderedDict[object, tuple[float, dict | None]] = OrderedDict()
        self._stats_dir = stats_dir
        self.n_fetch_calls = 0
        self.n_fetched_ids = 0
        self.n_cache_hits = 0

    def _fetch_with_retry(self, ids: list) -> dict:
        last: Exception | None = None
        for _ in range(self._max_attempts):
            try:
                return self._fetch_many(ids)
            except Exception as e:  # noqa: BLE001 — transport errors retry
                last = e
        raise last  # type: ignore[misc]

    def get_many(self, ids: Iterable) -> dict:
        """Resolve ids to content rows ({} for unknown), fetching only
        cache misses in ONE batched transport call."""
        now = time.time()
        out: dict = {}
        misses: list = []
        for cid in dict.fromkeys(ids):  # unique, order-preserving
            hit = self._cache.get(cid)
            if hit is not None and now - hit[0] <= self._ttl_s:
                self._cache.move_to_end(cid)
                out[cid] = hit[1]
                self.n_cache_hits += 1
            else:
                misses.append(cid)
        if misses:
            fetched = self._fetch_with_retry(misses)
            self.n_fetch_calls += 1
            self.n_fetched_ids += len(misses)
            if self._stats_dir is not None:
                path = os.path.join(self._stats_dir, f"fetch_{os.getpid()}.log")
                with open(path, "a") as fh:
                    fh.write(f"{len(misses)}\n")
            for cid in misses:
                row = fetched.get(cid)
                out[cid] = row
                self._cache[cid] = (now, row)
                self._cache.move_to_end(cid)
        while len(self._cache) > self._max_size:
            self._cache.popitem(last=False)
        return out


class DictContentLoader:
    """Picklable dict-backed transport — the offline stand-in for the
    HTTP loader (the reference ships the same seam as
    ``enableDummyContentApiLoader`` / NoContentDataStreamLookup,
    ContentApiSegment.java:117-126). Lives in the library (not test
    code) so executors can unpickle it by module reference."""

    def __init__(self, catalog: dict) -> None:
        self.catalog = catalog

    def __call__(self, ids: list) -> dict:
        return {cid: self.catalog[cid] for cid in ids if cid in self.catalog}


def worker_client(cache_key: str, **kwargs) -> CachedContentClient:
    """Get-or-create the per-worker client for ``cache_key``."""
    client = _WORKER_CLIENTS.get(cache_key)
    if client is None:
        client = CachedContentClient(**kwargs)
        _WORKER_CLIENTS[cache_key] = client
    return client


def lookup_enrich(
    df: DataFrame,
    id_col: str,
    fields: Sequence[tuple[str, T.DataType]],
    fetch_many: Callable[[list], dict],
    cache_key: str,
    max_size: int = 50_000,
    ttl_s: float = 86_400.0,
    max_attempts: int = 3,
    stats_dir: str | None = None,
) -> DataFrame:
    """Enrich ``df`` with ``fields`` looked up by ``id_col`` through a
    per-worker cached client — Arrow-batched mapInPandas, no shuffle.

    ``fetch_many`` must be picklable (top-level function / partial).
    ``cache_key`` scopes the worker-singleton cache; two enrichments
    with different transports must use different keys.
    """
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(name, dtype, True) for name, dtype in fields]
    )
    field_names = [name for name, _ in fields]

    def enrich(batches: Iterator) -> Iterator:
        client = worker_client(
            cache_key,
            fetch_many=fetch_many,
            max_size=max_size,
            ttl_s=ttl_s,
            max_attempts=max_attempts,
            stats_dir=stats_dir,
        )
        for pdf in batches:
            resolved = client.get_many(pdf[id_col].tolist())
            for name in field_names:
                pdf[name] = [
                    (resolved.get(cid) or {}).get(name)
                    for cid in pdf[id_col].tolist()
                ]
            yield pdf

    return df.mapInPandas(enrich, schema)
