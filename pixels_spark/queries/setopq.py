"""Set-operation queries (SURVEY.md §2.6).

Reference: no in-tree kernels; Calcite Enumerable rules
(ENUMERABLE_{UNION,INTERSECT,MINUS}_RULE, ``PixelsParser.java:297-299``)
delegate to the host engine. Spark natively: union/intersect/except.

Scale notes: UNION ALL is a zero-shuffle concatenation; UNION/INTERSECT/
EXCEPT add a distinct-style shuffle on the full row — at 100 TB prefer
pre-projecting to the minimal column set (done here) so the shuffle carries
only the compared columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import declare


@declare(
    "setop_union",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 900
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    ORDER BY nationkey
    """,
    tags=("set_op",),
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) across two dimension projections."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 900)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct().orderBy("nationkey")


@declare(
    "setop_union_all",
    sql="""
    SELECT nationkey, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT c_nationkey AS nationkey FROM customer
          UNION ALL
          SELECT s_nationkey AS nationkey FROM supplier) u
    GROUP BY nationkey ORDER BY nationkey
    """,
    tags=("set_op", "aggregation"),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL preserving duplicates, then aggregated."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return (
        c.union(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("nationkey")
    )


@declare(
    "setop_intersect",
    sql="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
    INTERSECT
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 500
    ORDER BY custkey
    """,
    tags=("set_op",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics in both engines)."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 500)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return o.intersect(c).orderBy("custkey")


@declare(
    "setop_except",
    sql="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
    ORDER BY custkey
    """,
    tags=("set_op",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — customers with no high-value order."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.subtract(o).orderBy("custkey")


@declare(
    "setop_intersect_all",
    sql="""
    SELECT custkey, CAST(count(*) AS BIGINT) AS cnt FROM (
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
      INTERSECT ALL
      SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority LIKE '1%'
    ) t GROUP BY custkey ORDER BY custkey
    """,
    tags=("set_op", "bag_semantics"),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — each custkey kept min(m, n) times,
    unlike INTERSECT's distinct): completes the set-op family. Output is
    folded through a count so the multiplicity itself is what the oracle
    checks."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderpriority").like("1%")).select(
        F.col("o_custkey").alias("custkey")
    )
    return (
        a.intersectAll(b)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("custkey")
    )


@declare(
    "setop_except_all",
    sql="""
    SELECT custkey, CAST(count(*) AS BIGINT) AS cnt FROM (
      SELECT o_custkey AS custkey FROM orders
      EXCEPT ALL
      SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
    ) t GROUP BY custkey ORDER BY custkey
    """,
    tags=("set_op", "bag_semantics"),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — each custkey kept max(m - n, 0) times):
    the multiplicity-preserving difference, checked through per-key
    counts."""
    o = load_table(spark, sf_dir, "orders")
    a = o.select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("custkey")
    )
    return (
        a.exceptAll(b)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("custkey")
    )
