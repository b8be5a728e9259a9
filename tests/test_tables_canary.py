"""Timestamp-shape canary: ``tables.table()`` must normalize every
parquet encoding of ``ts`` that the test-data generator has shipped
(or could ship) to a Spark ``TimestampType`` with the right epoch.

Round-3 postmortem: the generator silently switched events.ts from
``timestamp[ns]`` to tz-naive ``timestamp[us]``; Spark 4 read the new
files as TIMESTAMP_NTZ and every ``unix_millis("ts")`` call site blew
up. This test writes one tiny parquet file per encoding and asserts the
loader yields identical epoch-millis for all of them, so a future shape
change fails here first — not in the driver's correctness gate.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openmetrics_spark import tables

# 2024-03-01T12:34:56.789Z and one second later, as epoch micros
MICROS = [1709296496789000, 1709296497789000]
EXPECTED_MS = [m // 1000 for m in MICROS]


def _write(tmpdir: str, name: str, arrow_type: pa.DataType) -> str:
    sf_dir = f"{tmpdir}/{name}"
    # int64 → timestamp cast interprets the ints in the target unit
    scale = {"ns": 1000, "us": 1, "ms": 1}[arrow_type.unit]
    div = 1000 if arrow_type.unit == "ms" else 1
    ints = [m * scale // div for m in MICROS]
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": pa.array(ints, type=pa.int64()).cast(arrow_type),
        }
    )
    import os

    os.makedirs(sf_dir, exist_ok=True)
    pq.write_table(tbl, f"{sf_dir}/events.parquet")
    return sf_dir


@pytest.mark.parametrize(
    "label,arrow_type",
    [
        ("ns", pa.timestamp("ns")),
        ("us_naive", pa.timestamp("us")),
        ("us_utc", pa.timestamp("us", tz="UTC")),
        ("ms_naive", pa.timestamp("ms")),
    ],
)
def test_ts_shape_normalized(spark, tmp_path, label, arrow_type):
    sf_dir = _write(str(tmp_path), label, arrow_type)
    df = tables.table(spark, sf_dir, "events")
    ts_type = df.schema["ts"].dataType
    assert isinstance(ts_type, T.TimestampType), f"{label}: got {ts_type}"
    rows = (
        df.select("event_id", F.unix_millis("ts").alias("ms"))
        .orderBy("event_id")
        .collect()
    )
    assert [r.ms for r in rows] == EXPECTED_MS, label


# ---------------------------------------------------------------------------
# Whole-testdata schema canary: every table the queries read, at every
# SF the driver uses, must load through tables.table() with the columns
# the query surface depends on. A regenerated testdata directory that
# drops/renames/retypes a load-bearing column fails here first.
# ---------------------------------------------------------------------------

EXPECTED_COLS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size"},
    "orders": {"o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"},
    "lineitem": {
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate", "l_returnflag",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


def test_all_tables_load_with_expected_columns(spark):
    import os

    from pyspark.sql import types as T

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        if not os.path.isdir(sf_dir):
            continue
        for name, want in EXPECTED_COLS.items():
            df = tables.table(spark, sf_dir, name)
            have = set(df.columns)
            missing = want - have
            assert not missing, f"{sf}/{name} missing columns: {missing}"
        ev = tables.table(spark, sf_dir, "events")
        assert isinstance(ev.schema["ts"].dataType, T.TimestampType), (
            sf, ev.schema["ts"].dataType,
        )
        emb = tables.table(spark, sf_dir, "embeddings")
        assert isinstance(emb.schema["embedding"].dataType, T.ArrayType), (
            sf, emb.schema["embedding"].dataType,
        )
