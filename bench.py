#!/usr/bin/env python3
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"tpch_q1": sec, ...}, "sf": 0.1}

Execution is forced with the noop sink (full pipeline runs, nothing
collected) except for LIMIT queries where collect() is the natural sink.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pixels_spark import config
from pixels_spark.queries import load_all_modules
from pixels_spark.session import local_session

# Headline set: one per operator family (scan/filter-agg, chain join,
# semi/anti join, distinct agg, top-k, window, sessionize, JSON, text dedup,
# minhash-LSH, vector knn + near-dup).
HEADLINE = (
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q9",
    "tpch_q13",
    "tpch_q18",
    "tpch_q21",
    "cb_daily",
    "cb_top_users",
    "cb_json_props",
    "win_topn_per_customer",
    "win_sessionize",
    "setop_except",
    "txt_quality",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "vec_knn",
    "vec_near_dup",
)


def _consume(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", config.DEFAULT_SF_DIR)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    registry = load_all_modules()

    spark = local_session()
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/catalyst once on a cheap query so per-query times measure
    # execution, not first-call JIT/planning setup
    _consume(registry["tpch_q6"].fn(spark, sf_dir))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry[name].fn
        t0 = time.perf_counter()
        _consume(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
