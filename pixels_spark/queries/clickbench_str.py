"""ClickBench string/URL/regex tail (Q20-Q42 analogs).

Reference corpus: ``pixels-parser/src/test/.../ClickbenchQuery.java:26-47``
— the string-heavy back half of the 40-query suite: point filters (Q20),
LIKE funnels over URL/title (Q21-Q23), scan+ORDER BY over strings
(Q24-Q27), constant/expression group keys (Q35-Q36), date-range funnels
with OFFSET pagination (Q37-Q42). The fixture analogs: ``events`` for
point/date/expression shapes, ``documents`` (text/lang/source) for the
URL/phrase string surface.

Scale notes: every query is one scan + one hash aggregation (map-side
partials) or a TakeOrderedAndProject — no joins, no windows. LIKE and
regexp run inside whole-stage codegen; substring/CASE group keys are
evaluated pre-shuffle so the exchange carries only (key, partial) pairs.
Orderings carry full tie-break keys so results are deterministic for the
oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import declare


@declare(
    "cb_user_point_scan",
    sql="""
    SELECT event_id, user_id FROM events WHERE user_id = 7
    ORDER BY event_id
    """,
    tags=("filter", "scan"),
)
def cb_user_point_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CB Q20: point filter on a numeric column, no aggregation."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") == 7)
        .select("event_id", "user_id")
        .orderBy("event_id")
    )


@declare(
    "cb_like_count",
    sql="SELECT CAST(count(*) AS BIGINT) AS cnt FROM documents WHERE text LIKE '%scan%'",
    tags=("filter", "strings"),
)
def cb_like_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CB Q21: COUNT(*) over a LIKE predicate ('%google%' over url)."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").like("%scan%"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@declare(
    "cb_like_min_group",
    sql="""
    SELECT source, min(text) AS min_text, CAST(count(*) AS BIGINT) AS c
    FROM documents WHERE text LIKE '%scan%' AND lang <> ''
    GROUP BY source ORDER BY c DESC, source LIMIT 10
    """,
    tags=("filter", "strings", "aggregation", "topk"),
)
def cb_like_min_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CB Q22: LIKE + empty-phrase funnel, MIN(url) + top-k by count."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").like("%scan%") & (F.col("lang") != ""))
        .groupBy("source")
        .agg(F.min("text").alias("min_text"), F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "source")
        .limit(10)
    )


@declare(
    "cb_like_notlike",
    sql="""
    SELECT source, min(text) AS min_text, CAST(count(*) AS BIGINT) AS c,
           CAST(count(DISTINCT lang) AS BIGINT) AS langs
    FROM documents WHERE text LIKE '%join%' AND text NOT LIKE '%merge%'
    GROUP BY source ORDER BY c DESC, source LIMIT 10
    """,
    tags=("filter", "strings", "distinct_agg", "topk"),
)
def cb_like_notlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CB Q23: LIKE + NOT LIKE + distinct-count per group."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").like("%join%") & ~F.col("text").like("%merge%"))
        .groupBy("source")
        .agg(
            F.min("text").alias("min_text"),
            F.count(F.lit(1)).alias("c"),
            F.count_distinct(F.col("lang")).alias("langs"),
        )
        .orderBy(F.col("c").desc(), "source")
        .limit(10)
    )


@declare(
    "cb_phrase_order_scan",
    sql="""
    SELECT doc_id, text FROM documents WHERE lang = 'en'
    ORDER BY n_chars, doc_id LIMIT 10
    """,
    tags=("scan", "topk", "strings"),
)
def cb_phrase_order_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CB Q25: phrase scan ordered by a non-string key."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang") == "en")
        .select("doc_id", "text")
        .orderBy("n_chars", "doc_id")
        .limit(10)
    )


@declare(
    "cb_order_by_string",
    sql="SELECT doc_id, text FROM documents ORDER BY text, doc_id LIMIT 10",
    tags=("scan", "topk", "strings"),
)
def cb_order_by_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CB Q26: ORDER BY a string column (binary collation on both engines)."""
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("text", "doc_id")
        .limit(10)
    )


@declare(
    "cb_group_const_expr",
    sql="""
    SELECT CAST(1 AS INTEGER) AS one, event_type, CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY one, event_type ORDER BY c DESC, event_type LIMIT 10
    """,
    tags=("aggregation", "topk"),
)
def cb_group_const_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CB Q35: constant + string group keys."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(F.lit(1).alias("one"), "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "event_type")
        .limit(10)
    )


@declare(
    "cb_group_adjacent_exprs",
    sql="""
    SELECT user_id, user_id - 1 AS um1, user_id - 2 AS um2, user_id - 3 AS um3,
           CAST(count(*) AS BIGINT) AS c
    FROM events
    GROUP BY user_id, user_id - 1, user_id - 2, user_id - 3
    ORDER BY c DESC, user_id LIMIT 10
    """,
    tags=("aggregation", "scalar", "topk"),
)
def cb_group_adjacent_exprs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CB Q36: adjacent arithmetic expressions as group keys."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id",
            (F.col("user_id") - 1).alias("um1"),
            (F.col("user_id") - 2).alias("um2"),
            (F.col("user_id") - 3).alias("um3"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "user_id")
        .limit(10)
    )


@declare(
    "cb_daterange_funnel",
    sql="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS pageviews
    FROM events
    WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-08 00:00:00'
      AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15 00:00:00'
      AND value > 10 AND event_type <> ''
    GROUP BY event_type ORDER BY pageviews DESC, event_type LIMIT 10
    """,
    tags=("filter", "aggregation", "topk"),
)
def cb_daterange_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CB Q37: date-range + multi-predicate funnel, top pageviews."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("ts") >= "2024-01-08")
            & (F.col("ts") < "2024-01-15")
            & (F.col("value") > 10)
            & (F.col("event_type") != "")
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("pageviews"))
        .orderBy(F.col("pageviews").desc(), "event_type")
        .limit(10)
    )


@declare(
    "cb_offset_group_string",
    sql="""
    SELECT source, CAST(count(*) AS BIGINT) AS pageviews
    FROM documents WHERE lang <> ''
    GROUP BY source ORDER BY pageviews DESC, source
    OFFSET 5 ROWS FETCH NEXT 10 ROWS ONLY
    """,
    tags=("aggregation", "offset", "strings"),
)
def cb_offset_group_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CB Q39: grouped pageviews with OFFSET pagination over a string key."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang") != "")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("pageviews"))
        .orderBy(F.col("pageviews").desc(), "source")
        .offset(5)
        .limit(10)
    )


@declare(
    "cb_case_src_group",
    sql="""
    SELECT lang,
           CASE WHEN lang IN ('en', 'es') THEN source ELSE '' END AS src,
           CAST(count(*) AS BIGINT) AS pageviews
    FROM documents
    GROUP BY lang, CASE WHEN lang IN ('en', 'es') THEN source ELSE '' END
    ORDER BY pageviews DESC, lang, src LIMIT 10
    """,
    tags=("aggregation", "scalar", "topk"),
)
def cb_case_src_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CB Q40: CASE expression as both output column and group key."""
    src = (
        F.when(F.col("lang").isin("en", "es"), F.col("source")).otherwise(F.lit(""))
    ).alias("src")
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang", src)
        .agg(F.count(F.lit(1)).alias("pageviews"))
        .orderBy(F.col("pageviews").desc(), "lang", "src")
        .limit(10)
    )


@declare(
    "cb_regex_trim_group",
    sql="""
    SELECT regexp_replace(source, '[0-9]+$', '') AS src_base,
           CAST(count(*) AS BIGINT) AS c,
           CAST(count(DISTINCT source) AS BIGINT) AS variants
    FROM documents GROUP BY src_base ORDER BY c DESC, src_base
    """,
    tags=("strings", "regex", "aggregation"),
)
def cb_regex_trim_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-path-style trim: regexp_replace group key (CB's URL normalizations)."""
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy(
            F.regexp_replace(F.col("source"), "[0-9]+$", "").alias("src_base")
        )
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.count_distinct(F.col("source")).alias("variants"),
        )
        .orderBy(F.col("c").desc(), "src_base")
    )


@declare(
    "cb_substr_prefix_group",
    sql="""
    SELECT substring(text, 1, 8) AS prefix, CAST(count(*) AS BIGINT) AS c
    FROM documents GROUP BY prefix ORDER BY c DESC, prefix LIMIT 10
    """,
    tags=("strings", "aggregation", "topk"),
)
def cb_substr_prefix_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """substring(...) as group key (CB substring group-bys)."""
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy(F.substring(F.col("text"), 1, 8).alias("prefix"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "prefix")
        .limit(10)
    )


@declare(
    "cb_phrase_funnel",
    sql="""
    SELECT lang, CAST(count(*) AS BIGINT) AS c,
           CAST(count(DISTINCT source) AS BIGINT) AS src_cnt
    FROM documents WHERE text <> '' AND text LIKE '%the%'
    GROUP BY lang ORDER BY c DESC, lang LIMIT 10
    """,
    tags=("strings", "distinct_agg", "topk"),
)
def cb_phrase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CB Q13/Q14-style empty-phrase funnel with per-group distinct counts."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("text") != "") & F.col("text").like("%the%"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.count_distinct(F.col("source")).alias("src_cnt"),
        )
        .orderBy(F.col("c").desc(), "lang")
        .limit(10)
    )


@declare(
    "cb_hash_day_group",
    sql="""
    SELECT substr(md5(props), 1, 8) AS h, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events
    WHERE substr(md5(props), 1, 1) = 'a'
    GROUP BY substr(md5(props), 1, 8), CAST(ts AS DATE)
    ORDER BY cnt DESC, h, day
    LIMIT 10
    """,
    tags=("aggregation", "strings", "topk"),
)
def cb_hash_day_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CB Q41: selective equality on a computed hash + (hash, day) group-by —
    urlhash/refererhash analog is an md5 prefix of props (md5 exists in both
    engines, so the hash key is oracle-stable).
    """
    h = F.substring(F.md5(F.col("props")), 1, 8)
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.substring(F.md5(F.col("props")), 1, 1) == "a")
        .groupBy(h.alias("h"), F.to_date(F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "h", "day")
        .limit(10)
    )


@declare(
    "cb_dims_point_group",
    sql="""
    SELECT CAST(floor(value * 10) AS BIGINT) AS w, event_id % 7 AS h,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events
    WHERE event_type = 'click' AND user_id % 100 = 3
    GROUP BY floor(value * 10), event_id % 7
    ORDER BY cnt DESC, w, h
    LIMIT 10
    """,
    tags=("aggregation", "filter", "topk"),
)
def cb_dims_point_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CB Q42: highly-selective conjunctive filter + two derived dimension keys."""
    return (
        load_table(spark, sf_dir, "events")
        .filter((F.col("event_type") == "click") & (F.pmod(F.col("user_id"), F.lit(100)) == 3))
        .groupBy(
            F.floor(F.col("value") * 10).cast("bigint").alias("w"),
            F.pmod(F.col("event_id"), F.lit(7)).alias("h"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "w", "h")
        .limit(10)
    )
