"""Generate OPERATORS.md from the queries() registry.

Usage: ``python tools/gen_catalog.py > OPERATORS.md`` (no Ray session
needed — only the registry module is imported). One row per catalog
operator: name, correctness mode (exact DuckDB oracle vs documented
rows-only), and the first sentence of the callable's docstring.
"""

from __future__ import annotations

import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def first_sentence(doc: str) -> str:
    doc = " ".join(doc.split())
    m = re.search(r"\.(\s|$)", doc)
    out = doc[: m.end()].strip() if m else doc
    return out.replace("|", "\\|")


def main() -> None:
    from mhray.pipelines.queries import ORACLE_SQL, QUERIES

    n_oracle = sum(1 for k in QUERIES if k in ORACLE_SQL)
    lines = [
        "# Operator catalog",
        "",
        "Auto-generated from the `queries()` registry by",
        "`python tools/gen_catalog.py > OPERATORS.md`. One row per",
        "catalog operator: the key is the `queries()` / `oracle_sql()`",
        "entry name; correctness is `oracle` (exact DuckDB SQL",
        "hash-compare, run by the driver and `bench.py --correctness`)",
        "or `rows-only` (documented non-SQL-expressible semantics with",
        "a pytest substitute; see the rationale block in",
        "`mhray/pipelines/queries.py`).",
        "",
        "| # | operator | correctness | description |",
        "|---|---|---|---|",
    ]
    for i, (name, fn) in enumerate(QUERIES.items(), 1):
        desc = first_sentence(inspect.getdoc(fn) or "")
        status = "oracle" if name in ORACLE_SQL else "rows-only"
        lines.append(f"| {i} | `{name}` | {status} | {desc} |")
    lines += [
        "",
        f"Total: {len(QUERIES)} operators, {n_oracle} with exact "
        f"DuckDB oracles, {len(QUERIES) - n_oracle} rows-only.",
        "",
    ]
    print("\n".join(lines))


if __name__ == "__main__":
    main()
