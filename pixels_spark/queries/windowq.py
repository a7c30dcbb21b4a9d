"""Window-function queries (SURVEY.md §2.7).

The reference has no in-tree window kernel — Calcite can plan them
(ENUMERABLE_WINDOW_RULE, ``pixels-parser/.../PixelsParser.java:302``) and the
host engine executes. Declared here as first-class Spark window queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import declare
