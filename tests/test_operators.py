"""Unit tests for the explicit operator API (filters/joins/aggregates/sort).

Mirrors the reference's executor tests (TestPredicate, TestAggregator,
TestSortedJoiner, pixels-executor/src/test) on the fixture tables.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pixels_spark.catalog import load_table, table_path
from pixels_spark.operators import (
    Aggregator,
    Bound,
    BoundType,
    ColumnFilter,
    FunctionType,
    JoinAlgorithm,
    JoinType,
    Range,
    TableScanFilter,
    choose_join_algorithm,
    equi_join,
)
from pixels_spark.operators.aggregates import AggSpec
from pixels_spark.operators.joins import chain_join, partitioned_join
from pixels_spark.operators.scan import scan
from pixels_spark.operators.sort import top_k
from pixels_spark.plans.pushdown import explain_str, pushed_filters


def _li(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


# -- filters ---------------------------------------------------------------


def test_range_filter_matches_between(spark, sf_dir):
    li = _li(spark, sf_dir)
    cf = ColumnFilter(
        column="l_quantity",
        ranges=[
            Range(
                Bound(BoundType.INCLUDED, 10.0),
                Bound(BoundType.EXCLUDED, 20.0),
            )
        ],
    )
    got = li.filter(cf.to_column()).count()
    expect = li.filter((F.col("l_quantity") >= 10) & (F.col("l_quantity") < 20)).count()
    assert got == expect > 0


def test_multi_range_union(spark, sf_dir):
    li = _li(spark, sf_dir)
    cf = ColumnFilter(
        column="l_quantity",
        ranges=[
            Range(upper=Bound(BoundType.INCLUDED, 5.0)),
            Range(lower=Bound(BoundType.INCLUDED, 45.0)),
        ],
    )
    got = li.filter(cf.to_column()).count()
    expect = li.filter((F.col("l_quantity") <= 5) | (F.col("l_quantity") >= 45)).count()
    assert got == expect > 0


def test_discrete_in_and_not_in(spark, sf_dir):
    li = _li(spark, sf_dir)
    cf = ColumnFilter(column="l_returnflag", include_values=["A", "R"])
    got = li.filter(cf.to_column()).count()
    assert got == li.filter(F.col("l_returnflag").isin("A", "R")).count()
    ncf = ColumnFilter(column="l_returnflag", is_all=True, exclude_values=["N"])
    assert li.filter(ncf.to_column()).count() == li.filter(
        F.col("l_returnflag") != "N"
    ).count()


def test_null_domains(spark):
    from pyspark.sql import Row

    sp = spark.createDataFrame(
        [Row(x=1), Row(x=None), Row(x=3)]
    )
    only_null = ColumnFilter(column="x", only_null=True)
    assert sp.filter(only_null.to_column()).count() == 1
    with_null = ColumnFilter(
        column="x",
        ranges=[Range(lower=Bound(BoundType.INCLUDED, 2))],
        allow_null=True,
    )
    assert sp.filter(with_null.to_column()).count() == 2
    none_f = ColumnFilter(column="x", is_none=True)
    assert sp.filter(none_f.to_column()).count() == 0


def test_table_scan_filter_conjunction_and_pushdown(spark, sf_dir):
    tsf = TableScanFilter(
        filters=[
            ColumnFilter(
                column="l_quantity",
                ranges=[Range(upper=Bound(BoundType.EXCLUDED, 24.0))],
            ),
            ColumnFilter(column="l_returnflag", include_values=["R"]),
        ]
    )
    df = scan(
        spark,
        table_path(sf_dir, "lineitem"),
        include_cols=["l_orderkey", "l_quantity"],
        scan_filter=tsf,
    )
    li = _li(spark, sf_dir)
    expect = li.filter(
        (F.col("l_quantity") < 24) & (F.col("l_returnflag") == "R")
    ).count()
    assert df.count() == expect
    pf = " ".join(pushed_filters(df))
    assert "l_quantity" in pf and "l_returnflag" in pf


def test_column_filter_json_roundtrip():
    cf = ColumnFilter(
        column="l_quantity",
        ranges=[Range(Bound(BoundType.INCLUDED, 1.0), Bound(BoundType.EXCLUDED, 2.0))],
        include_values=[5.0],
        allow_null=True,
    )
    back = ColumnFilter.from_json(cf.to_json())
    assert back == cf


# -- joins -----------------------------------------------------------------


def test_choose_join_algorithm_thresholds():
    assert choose_join_algorithm(1 << 20, 1000) == JoinAlgorithm.BROADCAST
    assert choose_join_algorithm(512 << 20, 1000) == JoinAlgorithm.PARTITIONED
    assert choose_join_algorithm(1 << 20, 30_000_000) == JoinAlgorithm.PARTITIONED


@pytest.mark.parametrize(
    "algorithm,marker",
    [
        (JoinAlgorithm.BROADCAST, "BroadcastHashJoin"),
        (JoinAlgorithm.PARTITIONED, "ShuffledHashJoin"),
        (JoinAlgorithm.SORTED, "SortMergeJoin"),
    ],
)
def test_join_algorithm_hints_reach_plan(spark, sf_dir, algorithm, marker):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    df = equi_join(o, c, ["o_custkey"], JoinType.EQUI_INNER, algorithm)
    assert marker in explain_str(df), f"{algorithm} did not produce {marker}"


def test_join_types_row_counts(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 900).select(
        F.col("c_custkey").alias("o_custkey")
    )
    inner = equi_join(o, c, ["o_custkey"], JoinType.EQUI_INNER).count()
    left = equi_join(o, c, ["o_custkey"], JoinType.EQUI_LEFT).count()
    right = equi_join(o, c, ["o_custkey"], JoinType.EQUI_RIGHT).count()
    full = equi_join(o, c, ["o_custkey"], JoinType.EQUI_FULL).count()
    assert left == o.count()
    assert right == c.count()
    assert full == left + right - inner
    semi = equi_join(o, c, ["o_custkey"], JoinType.SEMI).count()
    anti = equi_join(o, c, ["o_custkey"], JoinType.ANTI).count()
    assert semi + anti == o.count()
    assert semi == inner  # o side is distinct


def test_null_keys_never_match(spark):
    from pyspark.sql import Row

    a = spark.createDataFrame([Row(k=1, v="a"), Row(k=None, v="b")])
    b = spark.createDataFrame([Row(k=1, w="x"), Row(k=None, w="y")])
    inner = equi_join(a, b, a["k"] == b["k"], JoinType.EQUI_INNER)
    assert inner.count() == 1  # ≈ Joiner.java:45-46 null keys don't match
    full = equi_join(a, b, a["k"] == b["k"], JoinType.EQUI_FULL)
    assert full.count() == 3  # 1 match + 2 unmatched null-key rows


def test_chain_join_matches_q5_shape(spark, sf_dir):
    l = _li(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    df = chain_join(
        l,
        [
            (s, l["l_suppkey"] == s["s_suppkey"]),
            (n, s["s_nationkey"] == n["n_nationkey"]),
        ],
    )
    assert df.count() == l.count()  # FK chain preserves cardinality
    plan = explain_str(df)
    assert plan.count("BroadcastHashJoin") >= 2


def test_partitioned_join(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    l = _li(spark, sf_dir).withColumnRenamed("l_orderkey", "o_orderkey")
    df = partitioned_join(o, l, ["o_orderkey"], num_partitions=8)
    assert df.count() == _li(spark, sf_dir).count()
    assert "ShuffledHashJoin" in explain_str(df)


# -- aggregates ------------------------------------------------------------


def test_aggregator_functions(spark, sf_dir):
    li = _li(spark, sf_dir)
    agg = Aggregator(
        group_keys=["l_returnflag"],
        specs=[
            AggSpec(FunctionType.SUM, "l_quantity", "s"),
            AggSpec(FunctionType.MIN, "l_quantity", "mn"),
            AggSpec(FunctionType.MAX, "l_quantity", "mx"),
            AggSpec(FunctionType.COUNT, "l_quantity", "c"),
            AggSpec(FunctionType.AVG, "l_quantity", "a"),
            AggSpec(FunctionType.COUNT_DISTINCT, "l_suppkey", "d"),
        ],
    )
    got = {r.l_returnflag: r for r in agg.aggregate(li).collect()}
    expect = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("s"),
            F.min("l_quantity").alias("mn"),
            F.max("l_quantity").alias("mx"),
            F.count("l_quantity").alias("c"),
            F.avg("l_quantity").alias("a"),
            F.count_distinct("l_suppkey").alias("d"),
        )
        .collect()
    }
    assert got.keys() == expect.keys()
    for k in got:
        for f in ("s", "mn", "mx", "c", "a", "d"):
            assert getattr(got[k], f) == getattr(expect[k], f)


def test_aggregator_two_phase_plan(spark, sf_dir):
    li = _li(spark, sf_dir)
    agg = Aggregator(
        group_keys=["l_returnflag"],
        specs=[AggSpec(FunctionType.SUM, "l_quantity", "s")],
    )
    plan = explain_str(agg.aggregate(li))
    assert "partial_sum" in plan  # map-side partial ≈ scan-worker partial agg


def test_global_agg_without_keys(spark, sf_dir):
    li = _li(spark, sf_dir)
    agg = Aggregator(group_keys=[], specs=[AggSpec(FunctionType.COUNT, "l_orderkey", "c")])
    assert agg.aggregate(li).first().c == li.count()


# -- sort / top-k ----------------------------------------------------------


def test_top_k_matches_sorted_head(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    got = [r.o_orderkey for r in top_k(o, 5, F.col("o_totalprice").desc(), F.col("o_orderkey")).collect()]
    expect = [
        r.o_orderkey
        for r in o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(5)
        .collect()
    ]
    assert got == expect
    plan = explain_str(top_k(o, 5, F.col("o_totalprice").desc()))
    assert "TakeOrderedAndProject" in plan


def test_salted_join_equals_plain_join(spark, sf_dir):
    from pixels_spark.operators.joins import salted_join

    l = _li(spark, sf_dir).select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = l.join(o, "l_orderkey")
    salted = salted_join(l, o, "l_orderkey", salt_buckets=8)
    assert salted.count() == plain.count()
    # value-level equality
    diff = salted.exceptAll(plain).count() + plain.exceptAll(salted).count()
    assert diff == 0


def test_salted_join_rejects_outer_types(spark, sf_dir):
    """Right/full outer over a salted small side would emit a null-padded
    row per unmatched (key, salt) replica — must be rejected up front."""
    import pytest

    from pixels_spark.operators.joins import JoinType, salted_join

    l = _li(spark, sf_dir).select("l_orderkey", "l_quantity").limit(10)
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    ).limit(10)
    for how in (JoinType.EQUI_RIGHT, JoinType.EQUI_FULL):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(l, o, "l_orderkey", how=how)
    # left outer remains exact
    plain = l.join(o, "l_orderkey", "left_outer")
    salted = salted_join(l, o, "l_orderkey", how=JoinType.EQUI_LEFT)
    assert salted.exceptAll(plain).count() + plain.exceptAll(salted).count() == 0
