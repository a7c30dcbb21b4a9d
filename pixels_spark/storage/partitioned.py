"""Partitioned table writes + partition pruning.

Reference analog: hash-partitioned writer output
(``PixelsWriterImpl`` partitioned mode, pixels-core/.../PixelsWriterImpl.java:
102-171 — one file set per hash partition, consumed by partitioned joins)
and the layout/splits system that routes scans to relevant files.

Spark mapping: two complementary layouts —
- ``write_partitioned_by``: hive-style directory partitioning on a column →
  partition *pruning* (a filtered scan lists only matching directories; at
  100 TB a date/tenant filter skips almost all IO). Asserted in
  tests/test_partitioned.py via the plan's PartitionFilters.
- ``write_bucketed``: hash bucketing on join keys persisted via
  ``bucketBy`` → co-located, shuffle-free joins between tables bucketed the
  same way (the exact analog of the reference's partitioned-join inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_by(
    df: DataFrame, dest: str, *partition_cols: str, mode: str = "overwrite"
) -> None:
    """Directory-partitioned parquet (value-based pruning on reads)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(dest)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.option("basePath", path).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed managed table (``bucketBy`` requires saveAsTable).

    Two tables bucketed on the same keys with the same bucket count join
    with NO shuffle on either side (≈ the reference pre-partitioning both
    join inputs with Partitioner.java and joining partition-by-partition).
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table_name)
