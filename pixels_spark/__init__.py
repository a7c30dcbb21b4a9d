"""pixels_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of pixelsdb/pixels.

Architecture: idiomatic Spark DataFrame/SQL over Parquet storage. The
reference's vectorized kernels, serverless exchange, and C++ SIMD filters are
*replaced* by Catalyst + Tungsten + Spark shuffle, not re-implemented. See
SURVEY.md for the full capability mapping.

Subpackages
-----------
- ``session``   : tuned SparkSession builder (AQE, pushdown, zstd parquet).
- ``catalog``   : table schemas + registration (≈ pixels-common metadata).
- ``operators`` : scan/filter/join/aggregate/sort/setop/window building blocks
                  (≈ pixels-executor kernels, expressed as DataFrame ops).
- ``functions`` : text analysis, dedup, vector similarity, multimodal
                  (beyond-parity LLM-pipeline operators).
- ``storage``   : LOAD/COMPACT/STAT/IMPORT jobs + layout metadata
                  (≈ pixels-cli + pixels-core compactor).
- ``mvcc``      : hidden commit-ts column, snapshot reads, row-level deletes
                  (≈ pixels-retina MVCC).
- ``streaming`` : Structured Streaming ingestion + event-time windows.
- ``queries``   : declared query registry checked against the DuckDB oracle.
"""

__version__ = "0.1.0"
