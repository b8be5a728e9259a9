"""Regenerate docs/QUERIES.md from the query registry, including the
per-round driver-verification history parsed from CORRECTNESS_r*.json
— the record that drives the 50-query driver-window rotation in
openmetrics_spark/queries/__init__.py (_WINDOW_PRIORITY)."""

import glob
import json
import os
import re
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from openmetrics_spark.queries import all_queries  # noqa: E402


def driver_history() -> tuple[list[int], dict[str, dict[int, str]]]:
    """{query: {round: 'green'|'red'|'rows'|'err'}} per CORRECTNESS file."""
    rounds: list[int] = []
    hist: dict[str, dict[int, str]] = {}
    for path in sorted(glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        for name, row in json.load(open(path)).items():
            if row.get("hash_match"):
                mark = "green"
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                mark = "rows"
            elif row.get("err"):
                mark = "err"
            else:
                mark = "red"
            hist.setdefault(name, {})[rnd] = mark
    return rounds, hist


_MARK = {"green": "G", "rows": "r", "red": "X", "err": "E"}


def main() -> None:
    qs = all_queries()
    rounds, hist = driver_history()
    by_tag: dict = {}
    for name, s in sorted(qs.items()):
        key = s.tags[0] if s.tags else "general"
        by_tag.setdefault(key, []).append((name, s))

    n_verified = sum(
        1 for n in qs if any(v == "green" for v in hist.get(n, {}).values())
    )
    lines = [
        "# Query catalog",
        "",
        "Generated from the query registry (`openmetrics_spark/queries/`).",
        f"{len(qs)} queries; every one with an `oracle` runs against a DuckDB",
        "ANSI-SQL oracle in the driver's correctness gate and in",
        "`tests/test_queries_oracle.py`. Regenerate with:",
        "`python scripts/gen_query_catalog.py`.",
        "",
        "The `driver` column is the per-round external-driver history",
        f"(rounds {', '.join(map(str, rounds))}): `G` hash-matched, `r`",
        "rows-only check (no SQL oracle), `X` hash mismatch, `E` errored,",
        "`.` not inside that round's 50-query window. "
        f"{n_verified}/{len(qs)} queries hold at least one green driver row;",
        "the window rotation in `queries/__init__.py::_WINDOW_PRIORITY`",
        "exists to drive the remainder to green.",
        "",
    ]
    for tag in sorted(by_tag):
        lines.append(f"## {tag}")
        lines.append("")
        lines.append("| query | headline | oracle | driver | summary |")
        lines.append("|---|---|---|---|---|")
        for name, s in by_tag[tag]:
            doc = (s.doc or "").split("\n\n")[0].replace("\n", " ").strip()
            doc = " ".join(doc.split())
            if len(doc) > 220:
                doc = doc[:217] + "..."
            doc = doc.replace("|", "\\|")
            h = hist.get(name, {})
            marks = "".join(_MARK.get(h.get(r, "."), ".") if r in h else "." for r in rounds)
            lines.append(
                f"| `{name}` | {'yes' if s.headline else ''} | "
                f"{'sql' if s.oracle else 'rows-only'} | `{marks or '-'}` | {doc} |"
            )
        lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "QUERIES.md")
    open(out, "w").write("\n".join(lines))
    print(f"wrote {out} ({len(qs)} queries)")


if __name__ == "__main__":
    main()
