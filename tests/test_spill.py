"""Spill-safety: operators must produce identical results when forced to
spill (SURVEY §7 M6 — the reference's native kernels have no spill path at
all, so surviving memory pressure is a parity-plus property we get from
Spark as long as nothing in our operator shapes breaks it).

A dedicated session pins the spill thresholds to tiny values so every
window buffer, sort, and hash aggregate spills; the answers must match the
normally-configured session bit-for-bit.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pixels_spark.queries import load_all_modules

SPILLY = [
    "win_running_sum",     # window buffers
    "win_sessionize",      # window + group
    "tpch_q1",             # hash aggregate
    "cb_scan_order_limit", # sort / top-k
    "asof_attribution",    # union + window asof
]


@pytest.fixture(scope="module")
def spill_spark(spark, sf_dir):
    """Same master, pathological spill thresholds. Built AFTER the shared
    session is torn down? No — Spark allows one context; use newSession()
    with runtime-settable confs instead, and set the static ones via the
    SQLConf that accepts runtime changes.

    The threshold scales with the fixture size so the spill-FILE count per
    partition stays bounded: every spill file costs a 1 MB
    UnsafeSorterSpillReader buffer when the partition is read back, so a
    fixed threshold of 4 at sf0.01 (15k-row global window partitions →
    ~4000 files → ~4 GB of read buffers) OOMs the driver JVM. rows/256
    still forces hundreds of spills at every SF — the spill path is
    exercised — while capping read-back memory at ~256 MB."""
    from pixels_spark.catalog import load_table

    n = load_table(spark, sf_dir, "orders").count()
    thr = str(max(4, n // 256))
    s = spark.newSession()
    for k, v in {
        "spark.sql.windowExec.buffer.in.memory.threshold": thr,
        "spark.sql.windowExec.buffer.spill.threshold": thr,
        "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold": thr,
        "spark.sql.sortMergeJoinExec.buffer.spill.threshold": thr,
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold": thr,
    }.items():
        s.conf.set(k, v)
    return s


def test_operators_survive_forced_spill(spark, spill_spark, sf_dir):
    reg = load_all_modules()
    for name in SPILLY:
        fn = reg[name].fn
        normal = [tuple(r) for r in fn(spark, sf_dir).collect()]
        spilled = [tuple(r) for r in fn(spill_spark, sf_dir).collect()]
        assert normal == spilled, f"{name} changed under spill pressure"
        assert normal, f"{name} returned no rows"
