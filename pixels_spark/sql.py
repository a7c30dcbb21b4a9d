"""SQL entry point over the registered catalog.

Reference: the Calcite frontend (``pixels-parser/.../PixelsParser.java`` —
parse → validate over PixelsSchema → RelNode → Volcano optimization) and the
Trino delegation path (SURVEY.md §3.1-3.2). Spark mapping: register the
catalog tables as views and hand the text to ``spark.sql`` — Catalyst is the
parser/validator/optimizer the reference assembles from Calcite + host
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import TABLES, register_views


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run SQL text against the fixture tables (views auto-registered)."""
    register_views(spark, sf_dir, TABLES)
    return spark.sql(query)
