"""Explain-plan assertions: pushdown, pruning, broadcast, codegen.

≈ the reference's scan-time guarantees (PixelsRecordReaderImpl skipping,
includeCols projection) verified at the Spark plan level — the properties
that decide whether a 100 TB scan touches 100 TB or two columns of one split.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from pixels_spark.catalog import load_table
from pixels_spark.plans import pushed_filters, read_schema_columns
from pixels_spark.plans.pushdown import (
    codegen_stage_count,
    has_broadcast_join,
)
from pixels_spark.queries import load_all_modules

REGISTRY = load_all_modules()


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    df = REGISTRY["tpch_q6"].fn(spark, sf_dir)
    pf = " ".join(pushed_filters(df))
    assert "l_shipdate" in pf
    assert "l_discount" in pf
    assert "l_quantity" in pf


def test_q6_column_pruning(spark, sf_dir):
    df = REGISTRY["tpch_q6"].fn(spark, sf_dir)
    cols = set(read_schema_columns(df))
    # only the 4 referenced columns are read, not all 11
    assert cols == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_projection_prunes_to_selected_columns(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    assert set(read_schema_columns(df)) == {"l_orderkey", "l_quantity"}


def test_q5_uses_broadcast_joins(spark, sf_dir):
    df = REGISTRY["tpch_q5"].fn(spark, sf_dir)
    assert has_broadcast_join(df)


def test_q1_wholestage_codegen(spark, sf_dir):
    df = REGISTRY["tpch_q1"].fn(spark, sf_dir)
    assert codegen_stage_count(df, execute=True) >= 2  # scan+partial, final agg


def test_in_filter_pushdown(spark, sf_dir):
    df = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(1, 4, 7)
    ).select("p_partkey")
    pf = " ".join(pushed_filters(df))
    assert "p_size" in pf


def test_null_domain_pushdown(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isNotNull()
    ).select("o_orderkey")
    pf = " ".join(pushed_filters(df))
    assert "IsNotNull" in pf
