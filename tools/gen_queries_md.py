#!/usr/bin/env python3
"""Regenerate QUERIES.md from the declared-query registry.

Run after adding/removing declared queries so the doc can never drift from
``load_all_modules()`` (VERDICT r03 flagged exactly that drift). The
dialect column comes from tests/test_sql_dialect.py's pinned lists — the
same source the dialect tests execute — so it can't drift either.
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

from pixels_spark.queries import load_all_modules  # noqa: E402


def render() -> str:
    """Render QUERIES.md from the live registry (used by the generator AND
    the freshness gate in tests/test_queries_md.py)."""
    reg = load_all_modules()
    from test_sql_dialect import DIALECT_SHARED, TPCH  # noqa: E402

    shared = set(DIALECT_SHARED) | set(TPCH)
    n = len(reg)
    n_oracle = sum(1 for q in reg.values() if q.sql is not None)
    n_shared = sum(1 for name in reg if name in shared)
    lines = [
        "# QUERIES — declared query index (auto-generated from the registry)",
        "",
        f"{n} queries; {n_oracle} with a DuckDB",
        "oracle (value-hash checked at sf0.01 by the driver), the rest rows-only",
        "(hash-based ops whose semantics aren't SQL-expressible; property-tested",
        f"in tests/). {n_shared} oracle texts are DIALECT-SHARED: the identical",
        "SQL runs verbatim on the engine's own spark.sql path with results equal",
        "to the DataFrame implementation (tests/test_sql_dialect.py).",
        "Source modules: `pixels_spark/queries/*.py`.",
        "",
        "Regenerate with `python tools/gen_queries_md.py`.",
        "",
        "| query | oracle | shared SQL | tags | summary |",
        "|---|---|---|---|---|",
    ]
    for name in sorted(reg):
        q = reg[name]
        oracle = "✅" if q.sql is not None else "rows-only"
        dia = "✅" if name in shared else ""
        # first paragraph, joined — docstrings may hard-wrap mid-sentence
        doc = " ".join(
            ln.strip() for ln in (q.doc or "").split("\n\n")[0].split("\n")
        ).strip()
        lines.append(
            f"| `{name}` | {oracle} | {dia} | {', '.join(q.tags)} | {doc} |"
        )
    return "\n".join(lines) + "\n"


def main() -> None:
    out = os.path.join(_ROOT, "QUERIES.md")
    text = render()
    with open(out, "w") as f:
        f.write(text)
    n = text.count("\n| `")
    print(f"wrote {out}: {n} query rows")


if __name__ == "__main__":
    main()
