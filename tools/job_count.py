#!/usr/bin/env python3
"""Per-query Spark job/stage/task counts (the fixed-cost profile).

Runs each named query once (noop sink, staged layout — bench methodology)
and diffs the UI REST API's job list before/after, printing how many jobs,
stages and tasks the query submitted plus wall seconds. At sf0.1 most
headline queries are scheduling-bound (tools/bench_overhead.py r11), so
job count is the denominator that explains per-query fixed cost.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/job_count.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pixels_spark.queries import load_all_modules
from pixels_spark.session import local_session


def _jobs(base: str, app: str) -> list[dict]:
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs") as r:
        return json.loads(r.read())


def main() -> None:
    names = sys.argv[1:]
    reg = load_all_modules()
    spark = local_session()
    spark.sparkContext.setLogLevel("ERROR")
    staged, *_ = bench.prepare(
        spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    bench._consume(reg["tpch_q6"].fn(spark, staged))
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    for name in names:
        before = {j["jobId"] for j in _jobs(base, app)}
        t0 = time.perf_counter()
        bench._consume(reg[name].fn(spark, staged))
        dt = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        new = [j for j in _jobs(base, app) if j["jobId"] not in before]
        njobs = len(new)
        nstages = sum(len(j.get("stageIds", [])) for j in new)
        ntasks = sum(j.get("numTasks", 0) for j in new)
        print(
            f"{name}: {dt}s jobs={njobs} stages={nstages} tasks={ntasks}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
