"""Local mirror of the driver's correctness gate: run a registered
query on Spark AND its ANSI-SQL oracle on DuckDB over the same parquet
tables, then compare row count, column set, and (order-insensitively)
values.

Used by tests/test_queries_oracle.py and the ``python -m
openmetrics_spark.oracle`` CLI.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

from openmetrics_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )
    return df


def _dtype_kind(series: pd.Series) -> str:
    """Coarse dtype kind used for the strictness gate: the driver's
    compare hashes raw values, so an integer column on one side and a
    float column on the other (e.g. DuckDB SUM(BIGINT) → HUGEINT →
    float64 vs Spark bigint) hash-mismatches even when every value is
    numerically equal.  This is exactly how the round-4
    ``doc_repetition_stats`` red row escaped the old rtol-only local
    comparator, so kind mismatches fail *before* any value compare."""
    if pd.api.types.is_bool_dtype(series):
        return "bool"
    if pd.api.types.is_integer_dtype(series):
        return "int"
    if pd.api.types.is_float_dtype(series):
        return "float"
    return "object"


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, rtol=1e-6) -> list[str]:
    """Return a list of mismatch descriptions (empty == match).

    Driver-strict: dtype-kind mismatches (int vs float, bool vs int,
    numeric vs string) are errors in their own right; integers, bools
    and strings compare exactly; only float-vs-float gets the rtol
    branch (the registry convention rounds doubles identically in both
    engines, so this is belt-and-braces for fp summation order)."""
    errs: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        errs.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols = sorted(spark_pdf.columns)
    o_cols = sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        errs.append(f"columns: spark={s_cols} oracle={o_cols}")
    if errs:
        return errs
    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    # Empty frames carry no hashable values, and pandas assigns them
    # engine-specific placeholder dtypes — skip the kind gate there.
    for c in s.columns if len(s) else []:
        sk, ok = _dtype_kind(s[c]), _dtype_kind(o[c])
        if sk != ok:
            errs.append(
                f"col {c}: dtype kind mismatch: spark={s[c].dtype} ({sk}) "
                f"oracle={o[c].dtype} ({ok}) — would hash-mismatch at the driver"
            )
    if errs:
        return errs
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(ov):
            sv_f = pd.to_numeric(sv, errors="coerce")
            ov_f = pd.to_numeric(ov, errors="coerce")
            bad = ~(
                (sv_f.isna() & ov_f.isna())
                | (abs(sv_f - ov_f) <= rtol * (1 + abs(ov_f)))
            )
            if bad.any():
                i = bad.idxmax()
                errs.append(f"col {c}: first diff at row {i}: {sv_f[i]} vs {ov_f[i]}")
        else:
            sv_n = sv.map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else v)
            ov_n = ov.map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else v)
            neq = ~(sv_n.astype(str).eq(ov_n.astype(str)) | (sv_n.isna() & ov_n.isna()))
            if neq.any():
                i = neq.idxmax()
                errs.append(f"col {c}: first diff at row {i}: {sv_n[i]!r} vs {ov_n[i]!r}")
    return errs


def check_query(spark, sf_dir: str, name: str) -> list[str]:
    from openmetrics_spark.queries import all_queries

    from openmetrics_spark.tables import release_caches

    spec = all_queries()[name]
    try:
        sdf = spec.fn(spark, sf_dir).toPandas()
    finally:
        release_caches()
    if spec.oracle is None:
        return [] if len(sdf) >= 0 else ["spark query failed"]
    con = duck_connection(sf_dir)
    odf = con.execute(spec.oracle).df()
    return compare(sdf, odf)


def main() -> int:  # pragma: no cover
    from openmetrics_spark.queries import all_queries
    from openmetrics_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:] or list(all_queries())
    spark = get_spark("oracle-check")
    failed = 0
    for name in only:
        try:
            errs = check_query(spark, sf_dir, name)
        except Exception as e:  # noqa: BLE001
            errs = [f"exception: {type(e).__name__}: {e}"]
        status = "OK " if not errs else "FAIL"
        if errs:
            failed += 1
        print(f"{status} {name}" + ("" if not errs else f"  {'; '.join(errs)}"))
    return 1 if failed else 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
