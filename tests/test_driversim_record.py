"""DRIVERSIM_r{N}.json freshness gate (VERDICT r8 task #8): the committed
full-surface sweep record for the CURRENT round must exist and cover
exactly the declared-query registry — the judge can audit full-surface
correctness from the file instead of a 4-minute re-run (the driver's own
CORRECTNESS sample covers ~50 of the declared queries). Regenerate with
`python tools/driver_sim.py --all`. Pass/fail values are not re-checked
here (machine state); coverage, round-freshness and the absence of
recorded FAILs are."""

from __future__ import annotations

import json
import os

import bench
from pixels_spark.queries import load_all_modules

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_driversim_record_fresh_and_green():
    n = bench._next_round_no(_ROOT)
    path = os.path.join(_ROOT, f"DRIVERSIM_r{n}.json")
    assert os.path.exists(path), (
        f"{os.path.basename(path)} missing — run "
        "`python tools/driver_sim.py --all`"
    )
    with open(path) as f:
        rec = json.load(f)
    reg = load_all_modules()
    missing = set(reg) - set(rec)
    extra = set(rec) - set(reg)
    assert not missing, f"sweep record stale — missing {sorted(missing)[:10]}"
    assert not extra, f"sweep record stale — extra {sorted(extra)[:10]}"
    bad = {k: v for k, v in rec.items() if v.startswith("FAIL")}
    assert not bad, f"sweep record has failures: {bad}"
    # every oracled query shows a value compare; rows-only entries match
    # the registry's sql=None set exactly
    rows_only = {k for k, v in rec.items() if v.startswith("rows-only")}
    assert rows_only == {k for k in reg if reg[k].sql is None}
