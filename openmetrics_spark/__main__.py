"""CLI: run any registered query, list the inventory, or verify
against the DuckDB oracles.

    python -m openmetrics_spark list [--tag llm]
    python -m openmetrics_spark run <query> [--sf-dir DIR] [--limit N]
                                   [--format json|csv|table] [--out PATH]
    python -m openmetrics_spark verify [<query> ...] [--sf-dir DIR]
    python -m openmetrics_spark sql "<statement>" [--sf-dir DIR] [--out PATH]

`run` executes distributed and only collects the (limited) result for
display; `--out` writes the full result as parquet without any
driver-side collect.
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m openmetrics_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ls = sub.add_parser("list", help="list registered queries")
    ls.add_argument("--tag", help="filter by tag")

    run = sub.add_parser("run", help="run one query")
    run.add_argument("query")
    run.add_argument("--sf-dir", default=None)
    run.add_argument("--limit", type=int, default=20)
    run.add_argument("--format", choices=("table", "json", "csv"), default="table")
    run.add_argument("--out", help="write full result as parquet to this path")

    ver = sub.add_parser("verify", help="compare queries vs DuckDB oracles")
    ver.add_argument("queries", nargs="*")
    ver.add_argument("--sf-dir", default=None)

    sql = sub.add_parser(
        "sql", help="run ad-hoc Spark SQL with every testdata table as a view"
    )
    sql.add_argument("statement")
    sql.add_argument("--sf-dir", default=None)
    sql.add_argument("--limit", type=int, default=20)
    sql.add_argument("--format", choices=("table", "json", "csv"), default="table")
    sql.add_argument("--out", help="write full result as parquet to this path")
    return p


def main(argv: list[str] | None = None) -> int:
    from openmetrics_spark.queries import all_queries
    from openmetrics_spark.tables import DEFAULT_SF_DIR

    args = _build_parser().parse_args(argv)
    registry = all_queries()

    if args.cmd == "list":
        for name, spec in sorted(registry.items()):
            if args.tag and args.tag not in spec.tags:
                continue
            mark = "*" if spec.headline else " "
            oracle = "sql" if spec.oracle else "rows"
            print(f"{mark} {name:32s} [{oracle}] {','.join(spec.tags)}")
        return 0

    if args.cmd == "run":
        if args.query not in registry:
            print(f"unknown query: {args.query}", file=sys.stderr)
            return 2
        from openmetrics_spark.session import get_spark

        spark = get_spark(f"run-{args.query}")
        df = registry[args.query].fn(spark, args.sf_dir or DEFAULT_SF_DIR)
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
            return 0
        if args.format == "table":
            df.show(args.limit, truncate=False)
        else:
            rows = df.limit(args.limit).toPandas()
            if args.format == "json":
                print(rows.to_json(orient="records"))
            else:
                print(rows.to_csv(index=False), end="")
        return 0

    if args.cmd == "sql":
        from openmetrics_spark.session import get_spark
        from openmetrics_spark.tables import TABLE_NAMES, table

        spark = get_spark("sql")
        sf_dir = args.sf_dir or DEFAULT_SF_DIR
        for name in TABLE_NAMES:
            table(spark, sf_dir, name).createOrReplaceTempView(name)
        df = spark.sql(args.statement)
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.out}")
            return 0
        if args.format == "table":
            df.show(args.limit, truncate=False)
        else:
            rows = df.limit(args.limit).toPandas()
            if args.format == "json":
                print(rows.to_json(orient="records"))
            else:
                print(rows.to_csv(index=False), end="")
        return 0

    # verify
    from openmetrics_spark.oracle import check_query
    from openmetrics_spark.session import get_spark

    sf_dir = args.sf_dir or DEFAULT_SF_DIR
    names = args.queries or sorted(registry)
    spark = get_spark("verify")
    failed = 0
    for name in names:
        try:
            errs = check_query(spark, sf_dir, name)
        except Exception as e:  # noqa: BLE001
            errs = [f"exception: {type(e).__name__}: {e}"]
        if errs:
            failed += 1
        print(("FAIL" if errs else "OK  ") + f" {name}"
              + ("" if not errs else f"  {'; '.join(errs)}"))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
