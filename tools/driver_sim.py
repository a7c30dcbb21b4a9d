#!/usr/bin/env python3
"""Simulate the driver's verify pass in one command (the /verify recipe).

Runs entry(), checks the queries()/oracle_sql() contract, and DuckDB-
compares a set of queries at sf0.01. Usage:

    python tools/driver_sim.py                 # entry + contract + 8 spot queries
    python tools/driver_sim.py q1 q2 ...       # specific queries
    python tools/driver_sim.py --all           # every oracled query (slow)
    python tools/driver_sim.py --sample 50 --seed 11 [--exclude F.json]
        # rotated random N-query audit (VERDICT r10 task #1): seeded
        # sample of the declared registry, optionally excluding the keys
        # of a prior CORRECTNESS_r{N}.json so the rotation targets
        # queries the driver has never checked; writes
        # DRIVERSIM_rotated_r{N}_seed{S}.json
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

SF = os.environ.get("PIXELS_SPARK_TEST_SF_DIR", "/root/testdata/sf0.01")
SPOT = [
    "tpch_q1", "cb_daily", "win_sessionize", "asof_attribution",
    "dedup_exact", "vec_knn", "txt_train_split", "stream_dedup",
    # round-6 session-3 families
    "graph_pagerank", "txt_bloom_decontaminate", "sql_dml_lifecycle",
    "vec_batch_knn",
]


def main() -> int:
    import __spark_entry__ as E
    from pyspark.sql import SparkSession

    from oracle import compare

    spark = (
        SparkSession.builder.master("local[8]").appName("driver-sim")
        .config("spark.ui.enabled", "false")
        # the REAL driver checks <=50 queries per session and its 1g
        # default heap is fine; this tool's --all sweep runs 349 in ONE
        # JVM, and even with periodic clearCache + System.gc() the
        # session residue (codegen caches, listener state, broadcast
        # cleanup lag) starved vec_mmr's broadcast build three times at
        # ~query 290 — give the SWEEP session headroom. Per-query
        # results are identical either way; only the ceiling moves.
        .config("spark.driver.memory", "3g")
        .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    )
    df = E.entry(spark)
    print("entry rows:", len(df.collect()))
    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs), "oracle_sql keys must be a subset of queries"
    print(f"{len(qs)} queries; {len(osql)} oracles; contract OK")

    args = sys.argv[1:]
    sweep = args == ["--all"]
    sample_n = seed = None
    exclude: set[str] = set()
    if "--sample" in args:
        import json
        import random

        i = args.index("--sample")
        sample_n = int(args[i + 1])
        seed = int(args[args.index("--seed") + 1]) if "--seed" in args else 0
        if "--exclude" in args:
            with open(args[args.index("--exclude") + 1]) as f:
                exclude = set(json.load(f))
        pool = sorted(set(qs) - exclude)
        names = random.Random(seed).sample(pool, min(sample_n, len(pool)))
        print(
            f"rotated sample: {len(names)} of {len(pool)} "
            f"(seed={seed}, excluded={len(exclude)})"
        )
    else:
        names = list(qs) if sweep else (args or SPOT)
    failed = []
    results: dict[str, str] = {}
    partial = _sweep_path() + ".partial"
    if sweep and os.path.exists(partial):
        import json

        with open(partial) as f:
            results = {
                k: v for k, v in json.load(f).items() if k in set(names)
            }
        print(f"resuming sweep: {len(results)} done")
    from pixels_spark.queries import load_all_modules

    reg = load_all_modules()
    for qi, name in enumerate(names):
        if name in results and not results[name].startswith("FAIL"):
            continue
        if qi and qi % 25 == 0:
            # long sweeps accumulate persisted frames + broadcast state in
            # the 1g driver heap (r12: the 336-query sweep died at ~280
            # with a broadcast OOM, and the 346-sweep again at 291 eleven
            # queries after a 40-interval drop — 25 keeps the worst-case
            # accretion window under what vec_mmr's broadcast needs);
            # periodic cache drops don't touch per-query results
            spark.catalog.clearCache()
            # ContextCleaner frees dead broadcasts only after a DRIVER
            # GC; in a 340+-query session the 1g heap fills with
            # unreclaimed broadcast refs faster than young-gen GCs run
            # (vec_mmr's broadcast build OOMed at ~290 twice, 11 and 18
            # queries past a cache drop) — force a full JVM GC with the
            # cache drop so the cleaner actually runs
            spark.sparkContext._jvm.System.gc()
        if reg[name].sql is None:
            n = reg[name].fn(spark, SF).count()
            results[name] = f"rows-only:{n}"
            print(f"{name}: rows-only, {n} rows", flush=True)
        else:
            problems = compare(spark, SF, reg[name].fn, reg[name].sql)
            results[name] = "OK" if not problems else f"FAIL:{problems}"
            print(f"{name}: {'OK' if not problems else problems}", flush=True)
            if problems:
                failed.append(name)
        if sweep:
            import json

            with open(partial, "w") as f:
                json.dump(results, f)
    spark.stop()
    if sweep:
        _write_sweep_record(results)
        if os.path.exists(partial):
            os.remove(partial)
    elif sample_n is not None:
        import json

        import bench

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(
            root,
            f"DRIVERSIM_rotated_r{bench._next_round_no(root)}_seed{seed}.json",
        )
        with open(path, "w") as f:
            json.dump(dict(sorted(results.items())), f, indent=1)
        print(f"wrote {path}: {len(results)} queries")
    if failed:
        print("FAILED:", failed)
        return 1
    print("all green")
    return 0


def _write_sweep_record(results: dict[str, str]) -> None:
    """Commit-able full-surface sweep record (VERDICT r8 task #8): the
    driver samples ~50 of the declared queries per round; this file
    records name → OK / rows-only:N / FAIL for EVERY declared query at
    the driver's sf0.01, written on each ``--all`` run as
    DRIVERSIM_r{N}.json (N = current round, inferred like bench.py's
    BENCHLOG snapshots). tests/test_driversim_record.py gates coverage
    against the live registry, the QUERIES.md render-diff discipline."""
    import json

    path = _sweep_path()
    with open(path, "w") as f:
        json.dump(dict(sorted(results.items())), f, indent=1)
    print(f"wrote {path}: {len(results)} queries")


def _sweep_path() -> str:
    import bench

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(root, f"DRIVERSIM_r{bench._next_round_no(root)}.json")


if __name__ == "__main__":
    raise SystemExit(main())
