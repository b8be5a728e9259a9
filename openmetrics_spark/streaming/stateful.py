"""Custom stateful streaming operators.

These are the ops Spark's built-in windows/joins can't express — the
reference implements them as keyed ProcessFunctions with RocksDB state
+ event-time timers (SURVEY §2.7). Two Spark surfaces exist:

- ``applyInPandasWithState`` (used here): keyed pandas UDF with an
  explicit GroupState — available everywhere.
- ``transformWithStateInPandas`` (Spark 4 native successor with
  value/list/map state handles and timers): its state protocol needs
  the ``protobuf`` Python package at runtime; ``HAS_TWS`` gates it so
  environments without protobuf fall back to the GroupState path.

The reference mandates RocksDB for the same class of ops
(common/functions/TemporalJoinFunction.java:77-87); on Spark set
``spark.sql.streaming.stateStore.providerClass`` to RocksDB for
large keyspaces — state per key here is O(horizon/bucket), so the
100 TB sizing concern is number of keys, not per-key growth.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

try:  # transformWithStateInPandas needs google.protobuf at runtime
    import google.protobuf  # noqa: F401

    HAS_TWS = True
except ImportError:
    HAS_TWS = False


def stream_last_time_and_count(
    sdf: DataFrame,
    key_col: str,
    ts_col: str,
    bucket_ms: int,
    horizon_ms: int,
    delay_ms: int = 1000,
) -> DataFrame:
    """Streaming LastTimeAndCount — per key, latest event time +
    trailing-horizon count kept in bucket-granular substate (reference:
    common/functions/LastTimeAndCount.java:36-299 — last timestamp +
    trailing 90 d count in per-day substate, TTL cleanup).

    Emits ``(key, last_ms, n_horizon)`` on every update of a key.
    ``n_horizon`` counts events in buckets whose start lies in
    ``(last_ms - horizon_ms, last_ms]`` — day-granular in the
    reference, ``bucket_ms``-granular here.

    State per key: last_ms + {bucket → count}, buckets outside the
    horizon evicted on every update, so state is bounded at
    O(keys × horizon/bucket) regardless of event volume — the same
    bound as the reference's per-day substate + timers."""
    key_type = sdf.schema[key_col].dataType
    out_schema = StructType(
        [
            StructField("key", key_type),
            StructField("last_ms", LongType()),
            StructField("n_horizon", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("last_ms", LongType()),
            StructField("buckets_json", StringType()),
        ]
    )

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.exists:
            last_ms, buckets_json = state.get
            buckets = {int(k): v for k, v in json.loads(buckets_json).items()}
        else:
            last_ms, buckets = None, {}
        for pdf in pdf_iter:
            ms = pdf["__ms"].astype("int64")
            mx = int(ms.max())
            last_ms = mx if last_ms is None else max(last_ms, mx)
            for b, n in (ms // bucket_ms * bucket_ms).value_counts().items():
                buckets[int(b)] = buckets.get(int(b), 0) + int(n)
        floor = last_ms - horizon_ms
        buckets = {b: n for b, n in buckets.items() if b > floor - bucket_ms}
        total = sum(n for b, n in buckets.items() if b > floor)
        state.update((last_ms, json.dumps(buckets)))
        yield pd.DataFrame(
            {"key": [key[0]], "last_ms": [last_ms], "n_horizon": [total]}
        )

    prepared = sdf.withWatermark(ts_col, f"{delay_ms} milliseconds").select(
        F.col(key_col).alias("key"), F.unix_millis(ts_col).alias("__ms")
    )
    return prepared.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
