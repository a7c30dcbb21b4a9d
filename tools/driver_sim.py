#!/usr/bin/env python3
"""Simulate the driver's verify pass in one command (the /verify recipe).

Runs entry(), checks the queries()/oracle_sql() contract, and DuckDB-
compares a set of queries at sf0.01. Usage:

    python tools/driver_sim.py                 # entry + contract + 8 spot queries
    python tools/driver_sim.py q1 q2 ...       # specific queries
    python tools/driver_sim.py --all           # every oracled query (slow)
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
        .config("spark.sql.shuffle.partitions", "8").getOrCreate()
    )
    df = E.entry(spark)
    print("entry rows:", len(df.collect()))
    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs), "oracle_sql keys must be a subset of queries"
    print(f"{len(qs)} queries; {len(osql)} oracles; contract OK")

    args = sys.argv[1:]
    names = list(osql) if args == ["--all"] else (args or SPOT)
    failed = []
    from pixels_spark.queries import load_all_modules

    reg = load_all_modules()
    for name in names:
        if reg[name].sql is None:
            n = reg[name].fn(spark, SF).count()
            print(f"{name}: rows-only, {n} rows")
            continue
        problems = compare(spark, SF, reg[name].fn, reg[name].sql)
        print(f"{name}: {'OK' if not problems else problems}")
        if problems:
            failed.append(name)
    spark.stop()
    if failed:
        print("FAILED:", failed)
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
