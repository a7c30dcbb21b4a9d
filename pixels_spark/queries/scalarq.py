"""Scalar-expression surface queries (SURVEY.md §2.8).

The reference evaluates scalar expressions in the host engine (Trino/DuckDB)
via Calcite's ``SqlStdOperatorTable`` (``PixelsParser.java:94``); the corpus
exercises arithmetic, CASE, LIKE, IN, BETWEEN, substring, extract, date ±
interval. This module packs that surface into dedicated projection queries
so each scalar family is value-checked against the oracle, independent of
the TPC-H aggregates that also use them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import declare


@declare(
    "scalar_strings",
    sql="""
    SELECT p_partkey,
           upper(p_name)                       AS uname,
           lower(p_brand)                      AS lbrand,
           CAST(length(p_name) AS BIGINT)      AS name_len,
           substring(p_name, 1, 5)             AS name5,
           concat(p_brand, ':', p_type)        AS brand_type,
           replace(p_name, ' ', '_')           AS snake,
           CASE WHEN p_name LIKE '%bolt%' THEN 'bolt' ELSE 'other' END AS kind
    FROM part WHERE p_size <= 10
    ORDER BY p_partkey
    """,
    tags=("scalar", "string"),
)
def scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string functions: substring/upper/lower/length/concat/trim/replace/like"""
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 10)
        .select(
            "p_partkey",
            F.upper("p_name").alias("uname"),
            F.lower("p_brand").alias("lbrand"),
            F.length("p_name").cast("bigint").alias("name_len"),
            F.substring("p_name", 1, 5).alias("name5"),
            F.concat_ws(":", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
            F.when(F.col("p_name").like("%bolt%"), "bolt").otherwise("other").alias("kind"),
        )
        .orderBy("p_partkey")
    )


@declare(
    "scalar_dates",
    sql="""
    SELECT o_orderkey,
           CAST(EXTRACT(year  FROM o_orderdate) AS BIGINT) AS y,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
           CAST(EXTRACT(day   FROM o_orderdate) AS BIGINT) AS d,
           o_orderdate + INTERVAL 108 DAY   AS plus_days,
           o_orderdate + INTERVAL 3 MONTH   AS plus_months,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
    FROM orders WHERE o_orderkey < 200
    ORDER BY o_orderkey
    """,
    tags=("scalar", "date"),
)
def scalar_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date/time functions: extract family + date ± interval + date_trunc"""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 200)
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("bigint").alias("y"),
            F.month("o_orderdate").cast("bigint").alias("m"),
            F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
            F.expr("o_orderdate + INTERVAL 108 DAY").alias("plus_days"),
            F.expr("o_orderdate + INTERVAL 3 MONTH").alias("plus_months"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        )
        .orderBy("o_orderkey")
    )


@declare(
    "scalar_math",
    sql="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 50000.0)        AS abs_dev,
           round(l_extendedprice, 1)             AS rounded,
           CAST(floor(l_quantity) AS BIGINT)     AS fl,
           CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct,
           sqrt(l_extendedprice)                 AS root,
           ln(l_extendedprice)                   AS logp,
           power(l_quantity, 2.0)                AS qty_sq,
           CAST(l_orderkey % 7 AS BIGINT)        AS mod7
    FROM lineitem WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scalar", "math"),
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """math functions: abs/round/floor/ceil/sqrt/ln/power/mod"""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.abs(F.col("l_extendedprice") - 50000.0).alias("abs_dev"),
            F.round(F.col("l_extendedprice"), 1).alias("rounded"),
            F.floor(F.col("l_quantity")).alias("fl"),
            F.ceil(F.col("l_discount") * 100).alias("disc_pct"),
            F.sqrt(F.col("l_extendedprice")).alias("root"),
            F.log(F.col("l_extendedprice")).alias("logp"),
            F.pow(F.col("l_quantity"), 2.0).alias("qty_sq"),
            (F.col("l_orderkey") % 7).cast("bigint").alias("mod7"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@declare(
    "scalar_conditionals",
    sql="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 500 THEN 'low'
                ELSE 'high' END                         AS bal_class,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
           CASE WHEN c_nationkey % 2 = 0 THEN c_acctbal ELSE -c_acctbal END
               AS signed_bal
    FROM customer WHERE c_custkey < 300
    ORDER BY c_custkey
    """,
    tags=("scalar", "case_when", "null_handling"),
)
def scalar_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """conditional + null handling: CASE/coalesce/nullif/if"""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 300)
        .select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, "neg")
            .when(F.col("c_acctbal") < 500, "low")
            .otherwise("high")
            .alias("bal_class"),
            F.coalesce(
                F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
            ).alias("seg"),
            F.when(F.col("c_nationkey") % 2 == 0, F.col("c_acctbal"))
            .otherwise(-F.col("c_acctbal"))
            .alias("signed_bal"),
        )
        .orderBy("c_custkey")
    )


@declare(
    "scalar_regex",
    sql="""
    SELECT doc_id,
           CAST(regexp_matches(text, '^[a-z]+ ') AS BOOLEAN) AS starts_word,
           CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
               AS no_vowel_len,
           split_part(text, ' ', 1) AS first_word
    FROM documents WHERE doc_id < 100
    ORDER BY doc_id
    """,
    tags=("scalar", "regex", "string"),
)
def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regex + split-based string ops (ClickBench-style string matching)."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.col("text").rlike("^[a-z]+ ").alias("starts_word"),
            F.length(F.regexp_replace(F.col("text"), "[aeiou]", ""))
            .cast("bigint")
            .alias("no_vowel_len"),
            F.split(F.col("text"), " ").getItem(0).alias("first_word"),
        )
        .orderBy("doc_id")
    )


@declare(
    "scalar_time_of_day",
    sql="""
    WITH t AS (
      SELECT (epoch_us(ts) % 86400000000) // 1000 AS tod_ms FROM events
    ), g AS (
      SELECT CAST(tod_ms // 3600000 AS BIGINT) AS hour,
             CAST(count(*) AS BIGINT)          AS cnt,
             CAST(min(tod_ms) AS BIGINT)       AS min_ms,
             CAST(max(tod_ms) AS BIGINT)       AS max_ms
      FROM t WHERE tod_ms >= 32400000 AND tod_ms < 61200000
      GROUP BY 1
    )
    SELECT hour, cnt, min_ms, max_ms,
           lpad(CAST(min_ms // 3600000 AS VARCHAR), 2, '0') || ':' ||
           lpad(CAST((min_ms % 3600000) // 60000 AS VARCHAR), 2, '0') || ':' ||
           lpad(CAST((min_ms % 60000) // 1000 AS VARCHAR), 2, '0') || '.' ||
           lpad(CAST(min_ms % 1000 AS VARCHAR), 3, '0') AS min_time
    FROM g ORDER BY hour
    """,
    tags=("scalar", "time_type"),
)
def scalar_time_of_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME type surface (SURVEY §1.2): millis-of-day int convention
    (TypeDescription.java:192-218 TIME / TimeColumnVector). Extraction, range
    filter, bucketing, and display formatting all as integer arithmetic —
    order-preserving, pushdown-friendly.
    """
    from ..types import _idiv, time_from_timestamp, time_to_string

    tod = time_from_timestamp(F.col("ts"))
    return (
        load_table(spark, sf_dir, "events")
        .select(tod.alias("tod_ms"))
        .filter((F.col("tod_ms") >= 32_400_000) & (F.col("tod_ms") < 61_200_000))
        .groupBy(_idiv(F.col("tod_ms"), 3_600_000).alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("tod_ms").cast("bigint").alias("min_ms"),
            F.max("tod_ms").cast("bigint").alias("max_ms"),
        )
        .withColumn("min_time", time_to_string(F.col("min_ms")))
        .orderBy("hour")
    )


@declare(
    "scalar_winsorize",
    sql="""
    WITH tot AS (SELECT count(*) AS n FROM events),
    ranked AS (SELECT value AS v,
                      row_number() OVER (ORDER BY value) AS rn
               FROM events),
    th AS (SELECT min(CASE WHEN rn = CAST(ceil(0.01 * n) AS BIGINT)
                           THEN v END) AS lo,
                  min(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                           THEN v END) AS hi
           FROM ranked, tot)
    SELECT event_type,
           CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped_low,
           CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped_high,
           CAST(sum(CAST(greatest(least(value, hi), lo) AS DECIMAL(18,6)))
               AS DOUBLE) AS sum_winsorized
    FROM events, th
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("scalar", "quality", "winsorize", "window"),
)
def scalar_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT winsorization (outlier clipping for reward/feature columns):
    thresholds are the ceil(q*n)-th order statistics — deterministic
    under ties, unlike interpolated percentiles — cross-broadcast to clip
    events.value to [p01, p99]; per-type clip counts + decimal-exact sum
    of the winsorized column."""
    from ..operators.aggregates import winsorize_bounds

    e = load_table(spark, sf_dir, "events")
    th = winsorize_bounds(e, "value", 0.01, 0.99)
    clipped = F.greatest(F.least(F.col("value"), F.col("hi")), F.col("lo"))
    return (
        e.crossJoin(F.broadcast(th))
        .groupBy("event_type")
        .agg(
            F.sum((F.col("value") < F.col("lo")).cast("long")).alias("n_clipped_low"),
            F.sum((F.col("value") > F.col("hi")).cast("long")).alias("n_clipped_high"),
            F.sum(clipped.cast("decimal(18,6)")).cast("double").alias("sum_winsorized"),
        )
        .orderBy("event_type")
    )


@declare(
    "scalar_array_hof",
    sql="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(len(list_filter(string_split(text, ' '),
                                w -> length(w) > 4)) AS BIGINT) AS n_long,
           CAST(list_sum(list_transform(string_split(text, ' '),
                                        w -> length(w))) AS BIGINT)
               AS total_chars,
           list_sort(string_split(text, ' '))[1]  AS first_sorted,
           list_sort(string_split(text, ' '))[-1] AS last_sorted,
           list_contains(string_split(text, ' '), 'data') AS has_data
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
    tags=("scalar", "array", "hof"),
)
def scalar_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY type + higher-order functions: split -> size / filter /
    aggregate / sort_array / array_contains, each verified against DuckDB's
    list_* family. HOFs run interpreted (outside codegen) — fine for a
    projection surface; hot paths use explode+agg instead (ROUND_NOTES
    round-1 perf facts).

    ≈ the reference ARRAY child type (TypeDescription.java:170-183 vector
    children) queried through the SQL frontend."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    words = F.split(F.col("text"), " ")
    sorted_words = F.sort_array(words)
    return (
        d.select(
            "doc_id",
            F.size(words).cast("bigint").alias("n_words"),
            F.size(F.filter(words, lambda w: F.length(w) > 4))
            .cast("bigint")
            .alias("n_long"),
            F.aggregate(
                words,
                F.lit(0).cast("bigint"),
                lambda acc, w: acc + F.length(w),
            ).alias("total_chars"),
            F.element_at(sorted_words, 1).alias("first_sorted"),
            F.element_at(sorted_words, -1).alias("last_sorted"),
            F.array_contains(words, "data").alias("has_data"),
        )
        .orderBy("doc_id")
    )
