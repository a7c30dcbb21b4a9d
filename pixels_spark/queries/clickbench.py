"""ClickBench-style aggregation queries over the ``events`` table.

Reference corpus: ``pixels-parser/src/test/.../ClickbenchQuery.java`` (40
queries over the `hits` table: counts, distincts, group-by-top-k, string
matching). The fixture analog is `events`; the JSON ``props`` column covers
the scalar-JSON surface (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import declare
