"""QUERIES.md freshness gate: the committed file must equal what
``tools/gen_queries_md.py`` renders from the live registry — a new or
changed declared query without a regenerated QUERIES.md fails here
(VERDICT r03 flagged exactly this drift; r6 asked for a standing gate)."""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_queries_md_matches_registry():
    tools_dir = os.path.join(_ROOT, "tools")
    sys.path.insert(0, tools_dir)
    try:
        from gen_queries_md import render
    finally:
        sys.path.remove(tools_dir)
    with open(os.path.join(_ROOT, "QUERIES.md")) as f:
        committed = f.read()
    fresh = render()
    assert committed == fresh, (
        "QUERIES.md is stale — run `python tools/gen_queries_md.py` "
        "and commit the result"
    )
