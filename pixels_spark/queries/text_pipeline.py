"""Text-analysis + dedup queries over ``documents`` (beyond-parity north star).

Built on pixels_spark.functions.{text,dedup}; SQL-expressible variants carry a
DuckDB oracle, hash-dependent ones (MinHash/SimHash) get rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import declare
