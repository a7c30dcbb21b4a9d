#!/usr/bin/env python3
"""Standalone per-query timing: fresh tuned session, staged bench layout,
one warmup query, then N noop-sink passes per named query (per-pass and
best printed). Mirrors bench.py methodology so numbers are comparable.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/ab_time.py [-n3] q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pixels_spark.queries import load_all_modules
from pixels_spark.session import local_session


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0].startswith("-n"):
        n = int(args[0][2:])
        args = args[1:]
    reg = load_all_modules()
    spark = local_session()
    spark.sparkContext.setLogLevel("ERROR")
    staged, *_ = bench.prepare(
        spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    bench._consume(reg["tpch_q6"].fn(spark, staged))
    for name in args:
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            bench._consume(reg[name].fn(spark, staged))
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        print(f"{name}: best={min(runs)} runs={runs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
