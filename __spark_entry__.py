"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``pixels_spark.queries.*`` and are registered via the
``@declare`` decorator (see ``pixels_spark/queries/registry.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pixels_spark.queries import load_all_modules

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 analog) on /root/testdata/sf0.001."""
    registry = load_all_modules()
    return registry["tpch_q1"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all_modules().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per declared query (omitted → rows-only check)."""
    return {
        name: q.sql for name, q in load_all_modules().items() if q.sql is not None
    }
