"""BENCHLOG.md freshness gate (VERDICT r7 task #4): the committed
per-query bench record must cover EXACTLY bench.HEADLINE — a headline
query added (or removed) without a bench re-run fails here, the same
render-diff discipline as QUERIES.md. Timings themselves are not gated
(they are machine-dependent); coverage and format are."""

from __future__ import annotations

import os
import re

import bench

_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCHLOG.md")


def test_benchlog_md_covers_headline_exactly():
    assert os.path.exists(_PATH), "BENCHLOG.md missing — run `python bench.py`"
    with open(_PATH) as f:
        text = f.read()
    rows = re.findall(r"^\| ([a-z0-9_]+) \| (\d+\.\d{3}) \|", text, re.M)
    names = {n for n, _ in rows}
    missing = set(bench.HEADLINE) - names
    extra = names - set(bench.HEADLINE)
    assert not missing, f"BENCHLOG.md stale — missing {sorted(missing)}; run `python bench.py`"
    assert not extra, f"BENCHLOG.md stale — extra {sorted(extra)}; run `python bench.py`"
    # every row carries a positive best-of-3 time and three pass columns
    assert all(float(t) >= 0 for _, t in rows)
    passes = re.findall(r"^\| [a-z0-9_]+ \| \d+\.\d{3} \| (\d+\.\d{3}) \| (\d+\.\d{3}) \| (\d+\.\d{3}) \|", text, re.M)
    assert len(passes) == len(rows), "each query row needs its 3 per-pass times"
