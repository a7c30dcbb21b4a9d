"""Declared queries running through the SQL entry point (``spark.sql``).

These prove the full SQL surface (parser → Catalyst → execution) end-to-end:
the Spark side executes the *same* dialect-shared SQL text that DuckDB
verifies, covering subqueries/HAVING/CTE forms as text rather than
DataFrame compositions (≈ the reference's Calcite-validated corpus,
``pixels-parser/src/test/.../TpchQuery.java``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sql import sql
from .registry import declare

# Q6 as shared-dialect SQL text (runs verbatim on both engines).
_Q6 = """
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE)
           AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@declare("sql_tpch_q6", sql=_Q6, tags=("sql_frontend", "scan", "filter"))
def sql_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 run as verbatim SQL text through the engine frontend."""
    return sql(spark, sf_dir, _Q6)


# correlated EXISTS subquery as SQL text (Catalyst decorrelates it the way
# Calcite's SUBQUERY_REMOVE_RULES + RelDecorrelator do for the reference).
_Q4 = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@declare("sql_tpch_q4", sql=_Q4, tags=("sql_frontend", "subquery"))
def sql_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 as SQL text: correlated EXISTS subquery, Catalyst-decorrelated."""
    return sql(spark, sf_dir, _Q4)


# CTE + HAVING + scalar subquery as SQL text.
_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
              AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@declare("sql_tpch_q15", sql=_Q15, tags=("sql_frontend", "cte", "scalar_subquery"))
def sql_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 as SQL text: CTE revenue view + scalar MAX subquery."""
    return sql(spark, sf_dir, _Q15)


# window function as SQL text.
_WIN = """
SELECT o_custkey, o_orderkey,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey)
            AS BIGINT) AS rn
FROM orders
WHERE o_orderkey < 500
ORDER BY o_custkey, rn
"""


@declare("sql_window", sql=_WIN, tags=("sql_frontend", "window"))
def sql_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function (rank over partition) as verbatim SQL text."""
    return sql(spark, sf_dir, _WIN)


# query THROUGH a cataloged view: the view SQL is persisted in the metadata
# catalog (≈ MetadataService.createView:453 viewData) and registered the way
# PixelsSparkEngine.sql_register replays catalog views into the session.
_VIEW_SQL = """
SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY event_type, date_trunc('day', ts)
"""


@declare(
    "sql_cataloged_view",
    sql=f"SELECT event_type, day, cnt FROM ({_VIEW_SQL}) v "
    "WHERE cnt > 0 ORDER BY event_type, day",
    tags=("sql_frontend", "view", "metadata"),
)
def sql_cataloged_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query THROUGH a view persisted in the metadata catalog and replayed
    into the session (MetadataService.createView analog)."""
    import tempfile

    from ..catalog import register_views
    from ..storage.metadata import MetadataStore

    register_views(spark, sf_dir)
    store = MetadataStore(tempfile.mkdtemp(prefix="pixels_view_cat_"))
    store.create_schema("analytics")
    store.create_view("analytics", "v_event_daily", _VIEW_SQL, update_if_exists=True)
    # registration reads the SQL text back out of the persisted catalog
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW v_event_daily AS "
        + store.get_view("analytics", "v_event_daily")
    )
    return spark.sql(
        "SELECT event_type, day, cnt FROM v_event_daily "
        "WHERE cnt > 0 ORDER BY event_type, day"
    )
