#!/usr/bin/env python3
"""Bench fixed-cost attribution (VERDICT r10 task #5).

The like-for-like headline total drifted +3.3% r9→r10 while every
individual plan held — the suspicion is per-query session overhead
(noop-sink job launch, planning, listener/state accumulation as the
session ages) rather than compute. This probe measures it directly:

1. A MARKER query — ``spark.range(2)`` through the same noop sink the
   bench uses — whose compute is microseconds, so its wall time IS the
   fixed per-query cost (planning + job scheduling + sink commit).
2. One full headline pass at $SPARK_GRAFT_SF_DIR with the marker re-run
   every 10 queries, recording marker time vs session age (queries
   executed so far).

Output: a markdown table of marker-time checkpoints, the linear-fit
growth per executed query, and the fraction of the suite total that is
fixed cost (marker median × query count) — the attribution paragraph in
BENCHLOG.md's header quotes these numbers.

Usage: python tools/bench_overhead.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import bench  # noqa: E402
from pixels_spark import config  # noqa: E402
from pixels_spark.queries import load_all_modules  # noqa: E402
from pixels_spark.session import local_session  # noqa: E402


def _marker(spark) -> float:
    t0 = time.perf_counter()
    bench._consume(spark.range(2).selectExpr("id", "id * 2 AS v"))
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", config.DEFAULT_SF_DIR)
    registry = load_all_modules()
    spark = local_session()
    spark.sparkContext.setLogLevel("ERROR")
    staged_dir, *_ = bench.prepare(spark, sf_dir)
    bench._consume(registry["tpch_q6"].fn(spark, staged_dir))  # warm

    fresh = [_marker(spark) for _ in range(20)]
    fresh_med = statistics.median(fresh)
    print(f"fresh marker median: {fresh_med * 1000:.1f} ms "
          f"(min {min(fresh) * 1000:.1f}, max {max(fresh) * 1000:.1f})",
          flush=True)

    checkpoints: list[tuple[int, float]] = [(0, fresh_med)]
    qtimes: dict[str, float] = {}
    for i, name in enumerate(bench.HEADLINE, 1):
        t0 = time.perf_counter()
        bench._consume(registry[name].fn(spark, staged_dir))
        qtimes[name] = time.perf_counter() - t0
        spark.catalog.clearCache()
        if i % 10 == 0 or i == len(bench.HEADLINE):
            m = statistics.median(_marker(spark) for _ in range(5))
            checkpoints.append((i, m))
            print(f"  after {i} queries: marker {m * 1000:.1f} ms", flush=True)

    total = sum(qtimes.values())
    n = len(qtimes)
    # least-squares slope of marker time vs executed-query count
    xs = [c[0] for c in checkpoints]
    ys = [c[1] for c in checkpoints]
    xbar, ybar = sum(xs) / len(xs), sum(ys) / len(ys)
    slope = sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / max(
        1e-12, sum((x - xbar) ** 2 for x in xs)
    )
    end_med = checkpoints[-1][1]
    sub_sec = [v for v in qtimes.values() if v < 1.0]

    print("\n| session age (queries) | marker ms |")
    print("|---|---|")
    for x, y in checkpoints:
        print(f"| {x} | {y * 1000:.1f} |")
    print(f"\nsingle-pass total: {total:.1f} s over {n} queries")
    print(f"fixed cost per query: fresh {fresh_med * 1000:.1f} ms -> "
          f"end-of-suite {end_med * 1000:.1f} ms "
          f"(growth {slope * 1e6:.1f} us/query)")
    print(f"fixed-cost share of total: fresh {fresh_med * n / total:.1%}, "
          f"end-of-suite {end_med * n / total:.1%}")
    print(f"sub-second queries: {len(sub_sec)} totalling {sum(sub_sec):.1f} s; "
          f"fixed cost is {end_med * len(sub_sec) / max(1e-9, sum(sub_sec)):.1%} "
          "of their time")
    spark.stop()


if __name__ == "__main__":
    main()
