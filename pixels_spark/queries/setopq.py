"""Set-operation queries (SURVEY.md §2.6).

Reference: no in-tree kernels; Calcite Enumerable rules
(ENUMERABLE_{UNION,INTERSECT,MINUS}_RULE, ``PixelsParser.java:297-299``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import declare
