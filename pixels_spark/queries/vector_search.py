"""Vector similarity-search queries over ``embeddings``.

The embedding column maps the reference's VECTOR type
(``pixels-core/.../TypeDescription.java:218``, ``VectorColumnVector.java``).
Built on pixels_spark.functions.vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import declare
