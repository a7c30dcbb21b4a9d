"""Storage engine layer: table lifecycle jobs + metadata.

Reference analogs:
- ``metadata``  ≈ pixels-common MetadataService (Schema→Table→Layout→Path
  hierarchy) as a JSON-file-backed catalog.
- ``load``      ≈ pixels-cli LOAD (text → columnar with row-group sizing,
  ``pixels-cli/.../executor/LoadExecutor.java``).
- ``compact``   ≈ pixels-cli COMPACT + pixels-core compactor
  (``compact.factor`` row groups per file).
- ``stats``     ≈ pixels-cli STAT + StatsRecorder (column min/max/ndv/nulls
  feeding selectivity, ``pixels-core/.../stats/``).

Storage format is Parquet (≈ PixelsFile: row groups + footer stats); paths
are plain directories — S3/GCS/HDFS come free via Hadoop FileSystem schemes
(≈ pixels-storage connectors, ``pixels-common/.../physical/Storage.java:41-52``).
"""
