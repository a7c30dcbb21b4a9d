"""Join-type parity queries (SURVEY.md §2.3).

The reference kernel supports exactly EQUI_INNER / EQUI_LEFT / EQUI_RIGHT /
EQUI_FULL (``pixels-executor/.../join/JoinType.java:28-34``); semi/anti are
SQL-surface only (``Joiner.java:44-45``) and are covered by the TPC-H
analogs. This module pins the outer-join family explicitly, including the
null-key convention (null join keys never match — ``Joiner.java:45-46``,
standard SQL in both Spark and DuckDB) via the orders↔customer mismatch
produced by filtering.

Algorithm coverage: Catalyst/AQE picks broadcast-hash vs shuffle-hash vs
sort-merge (≈ JoinAlgorithm.java:26-35 BROADCAST/PARTITIONED/SORTED); the
explicit hint variants are exercised in tests/test_join_strategies.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import declare


@declare(
    "join_full_outer",
    sql="""
    SELECT COALESCE(c_custkey, o_custkey) AS custkey,
           max(c_name) AS c_name,
           CAST(count(o_orderkey) AS BIGINT) AS order_cnt
    FROM (SELECT * FROM customer WHERE c_acctbal > 950) c
    FULL OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
      ON c_custkey = o_custkey
    GROUP BY COALESCE(c_custkey, o_custkey)
    ORDER BY custkey
    """,
    tags=("outer_join", "aggregation"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER equi-join with unmatched rows on both sides."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 950)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "full_outer")
        .groupBy(F.coalesce(c["c_custkey"], o["o_custkey"]).alias("custkey"))
        .agg(
            F.max("c_name").alias("c_name"),
            F.count("o_orderkey").alias("order_cnt"),
        )
        .orderBy("custkey")
    )


@declare(
    "join_right_outer",
    sql="""
    SELECT o_orderkey, o_custkey, c_name
    FROM (SELECT * FROM customer WHERE c_mktsegment = 'MACHINERY') c
    RIGHT OUTER JOIN (SELECT * FROM orders WHERE o_totalprice > 490000) o
      ON c_custkey = o_custkey
    ORDER BY o_orderkey
    """,
    tags=("outer_join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join (EQUI_RIGHT)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 490000)
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "right_outer")
        .select("o_orderkey", "o_custkey", "c_name")
        .orderBy("o_orderkey")
    )


@declare(
    "join_left_null_filter",
    sql="""
    SELECT s_suppkey, s_name, l_orderkey
    FROM supplier LEFT OUTER JOIN
         (SELECT * FROM lineitem WHERE l_quantity >= 49.5) l
      ON s_suppkey = l_suppkey
    WHERE l_orderkey IS NULL OR l_orderkey % 2 = 0
    ORDER BY s_suppkey, l_orderkey
    """,
    tags=("outer_join", "null_filter"),
)
def join_left_null_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER with null-producing right side, then null-sensitive filter (IS
    NULL domain ≈ Filter.allowNull/onlyNull, pixels-executor/.../predicate/
    Filter.java:42-148).
    """
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49.5)
    return (
        s.join(l, s["s_suppkey"] == l["l_suppkey"], "left_outer")
        .filter(F.col("l_orderkey").isNull() | (F.col("l_orderkey") % 2 == 0))
        .select("s_suppkey", "s_name", "l_orderkey")
        .orderBy("s_suppkey", "l_orderkey")
    )


@declare(
    "join_cross_theta",
    sql="""
    SELECT r1.r_regionkey AS rk1, r2.r_regionkey AS rk2
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey < r2.r_regionkey
    ORDER BY rk1, rk2
    """,
    tags=("cross_join",),
)
def join_cross_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS join (small × small) + inequality filter — theta-style join surface."""
    r1 = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("rk1")
    )
    r2 = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("rk2")
    )
    return (
        r1.crossJoin(r2).filter(F.col("rk1") < F.col("rk2")).orderBy("rk1", "rk2")
    )


@declare(
    "join_fuzzy_match",
    sql="""
    WITH probe AS (
      SELECT p_partkey AS probe_key,
             concat(substr(p_name, 1,
                           CAST(p_partkey % length(p_name) AS INTEGER)),
                    substr(p_name,
                           CAST(p_partkey % length(p_name) AS INTEGER) + 2))
                 AS pname
      FROM part),
    matches AS (
      SELECT probe_key, p.p_partkey AS match_key,
             CAST(levenshtein(pname, p.p_name) AS INTEGER) AS dist
      FROM probe JOIN part p
        ON abs(length(pname) - length(p.p_name)) <= 2
      WHERE levenshtein(pname, p.p_name) <= 2)
    SELECT probe_key, match_key, dist
    FROM matches
    ORDER BY probe_key, match_key
    """,
    tags=("join", "fuzzy", "entity-resolution"),
)
def join_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fuzzy (entity-resolution) join: part names with one deterministic
    char dropped matched back against the catalog at levenshtein <= 2 —
    length-blocked equi join (sound: ed k implies len diff <= k), never a
    cross join; both engines agree on edit-distance values exactly."""
    from ..operators.joins import fuzzy_join

    p = load_table(spark, sf_dir, "part")
    probe = p.select(
        F.col("p_partkey").alias("probe_key"),
        F.concat(
            F.expr("substr(p_name, 1, cast(p_partkey % length(p_name) as int))"),
            F.expr("substr(p_name, cast(p_partkey % length(p_name) as int) + 2)"),
        ).alias("pname"),
    )
    out = fuzzy_join(
        probe, p.select("p_partkey", "p_name"), "pname", "p_name", max_dist=2
    )
    return (
        out.select(
            "probe_key",
            F.col("p_partkey").alias("match_key"),
            F.col("_dist").cast("int").alias("dist"),
        )
        .orderBy("probe_key", "match_key")
    )


@declare(
    "join_skew_salted",
    sql="""
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM (SELECT o_totalprice,
                 CASE WHEN o_orderkey % 4 <> 0 THEN 0
                      ELSE o_orderkey % 25 END AS skew_key
          FROM orders) o
    JOIN nation ON skew_key = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
    tags=("join", "skew", "salted"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKEWED fact-to-dim join through the explicit salting path: 3/4 of
    all orders land on skew_key=0 (a single hot key that a plain shuffle
    join would send to ONE reducer), joined to nation via salted_join —
    the large side's key is salted across 16 buckets, the 25-row dim is
    replicated per salt, and the result provably equals the unsalted
    join (the oracle states the plain join). This is the pre-planned
    remedy for skew AQE can't split (e.g. under a window); AQE skew-join
    handles the rest at runtime (session.py)."""
    from ..operators.joins import salted_join

    o = load_table(spark, sf_dir, "orders").select(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 4 != 0, F.lit(0))
        .otherwise(F.col("o_orderkey") % 25)
        .alias("skew_key"),
    )
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("skew_key"), "n_name"
    )
    joined = salted_join(o, n, "skew_key", salt_buckets=16)
    return (
        joined.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("n_name")
    )


@declare(
    "join_bloom_semi",
    sql="""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY year(o.o_orderdate) ORDER BY order_year
    """,
    tags=("join", "bloom", "runtime-filter", "beyond-parity"),
)
def join_bloom_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom RUNTIME-FILTERED shuffle join: urgent orders (~20% of the
    dim) join lineitem, but before the fact side pays its exchange, a
    128 KiB Bloom bitset built over the dim's join keys drops
    non-matching fact rows AT THE SCAN (map-side, Arrow-batched). The
    exact join then removes the bitset's false positives, so the result
    provably equals the plain join — the oracle states the plain join.

    This is the explicit form of the runtime row-filter big engines inject
    for selective dim joins: at 100 TB the dim can be far past broadcast
    thresholds while its bitset stays 128 KiB, and the fact shuffle
    carries ~20% of the rows instead of 100%. The join itself is forced
    to sort-merge (``hint("merge")``) — the scenario where the pre-filter
    pays; a broadcast-able dim wouldn't need it. tests/test_bloom.py pins
    superset-then-exact semantics and the pre-shuffle row reduction.
    """
    from ..functions.bloom import bloom_filter_keys, build_key_bitset

    dim = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderdate")
    )
    bitset = build_key_bitset(dim, "o_orderkey")
    fact = bloom_filter_keys(
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        ),
        "l_orderkey",
        bitset,
    )
    return (
        fact.join(
            dim.hint("merge"), fact["l_orderkey"] == dim["o_orderkey"]
        )
        .groupBy(F.year("o_orderdate").cast("bigint").alias("order_year"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("order_year")
    )
