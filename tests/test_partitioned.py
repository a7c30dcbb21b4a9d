"""Partitioned/bucketed storage tests: pruning + shuffle-free joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pixels_spark.catalog import load_table
from pixels_spark.plans.pushdown import explain_str
from pixels_spark.storage.partitioned import (
    read_partitioned,
    write_bucketed,
    write_partitioned_by,
)


def test_partition_pruning(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    dest = str(tmp_path / "events_by_type")
    write_partitioned_by(events, dest, "event_type")
    back = read_partitioned(spark, dest)
    assert back.count() == events.count()
    pruned = back.filter(F.col("event_type") == "click")
    plan = explain_str(pruned)
    # the partition filter appears as PartitionFilters on the scan, and the
    # row count matches the unpartitioned filter
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    assert pruned.count() == events.filter(F.col("event_type") == "click").count()


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    # bucketBy needs saveAsTable → managed tables in the session warehouse
    # (spark.sql.warehouse.dir is static conf; default ./spark-warehouse,
    # gitignored). Tables are dropped in the finally block.
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=8)
    write_bucketed(lineitem, "b_lineitem", ["o_orderkey"], num_buckets=8)
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    # disable broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl.hint("merge"), "o_orderkey")
        plan = explain_str(joined)
        assert "Exchange" not in plan, "bucketed join should not shuffle"
        assert joined.count() == load_table(spark, sf_dir, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "67108864")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
