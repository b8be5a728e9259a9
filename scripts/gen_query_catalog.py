"""Regenerate docs/QUERIES.md from the query registry."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmetrics_spark.queries import all_queries  # noqa: E402


def main() -> None:
    qs = all_queries()
    by_tag: dict = {}
    for name, s in sorted(qs.items()):
        key = s.tags[0] if s.tags else "general"
        by_tag.setdefault(key, []).append((name, s))

    lines = [
        "# Query catalog",
        "",
        "Generated from the query registry (`openmetrics_spark/queries/`).",
        f"{len(qs)} queries; every one with an `oracle` runs against a DuckDB",
        "ANSI-SQL oracle in the driver's correctness gate and in",
        "`tests/test_queries_oracle.py`. Regenerate with:",
        "`python scripts/gen_query_catalog.py`.",
        "",
    ]
    for tag in sorted(by_tag):
        lines.append(f"## {tag}")
        lines.append("")
        lines.append("| query | headline | oracle | summary |")
        lines.append("|---|---|---|---|")
        for name, s in by_tag[tag]:
            doc = (s.doc or "").split("\n\n")[0].replace("\n", " ").strip()
            doc = " ".join(doc.split())
            if len(doc) > 220:
                doc = doc[:217] + "..."
            doc = doc.replace("|", "\\|")
            lines.append(
                f"| `{name}` | {'yes' if s.headline else ''} | "
                f"{'sql' if s.oracle else 'rows-only'} | {doc} |"
            )
        lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "QUERIES.md")
    open(out, "w").write("\n".join(lines))
    print(f"wrote {out} ({len(qs)} queries)")


if __name__ == "__main__":
    main()
