"""COMPACT: merge many small files into few large ones (≈ pixels-cli COMPACT).

Reference: ``pixels-cli/.../Main.java:266`` + ``pixels-core/.../compactor/``
— concatenates ``compact.factor=32`` row groups per file without re-encoding
(pixels.properties:104), producing the *compact* path set of a new layout
version while the *ordered* paths stay readable.

Spark mapping: read the ordered path → coalesce to ceil(files/compact_factor)
— coalesce, not repartition: no shuffle, each output file concatenates whole
input partitions, which is the closest analog to the reference's no-re-encode
concatenation — → write compact dir → register a new layout version carrying
both path sets. Readers (``MetadataStore.reader_path``) prefer compact.

Scale notes: at 100 TB compaction is the same job per table-partition;
because coalesce is shuffle-free the cost is one read+write pass, and
independent partitions compact in parallel.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from .. import config
from .metadata import MetadataStore


def compact_path(
    spark: SparkSession,
    source: str,
    dest: str,
    compact_factor: int = config.COMPACT_FACTOR,
) -> DataFrame:
    """Merge the parquet files under ``source`` into ceil(n/compact_factor)
    files at ``dest``."""
    df = spark.read.parquet(source)
    n_files = df.rdd.getNumPartitions()
    target = max(1, math.ceil(n_files / compact_factor))
    df.coalesce(target).write.mode("overwrite").parquet(dest)
    return spark.read.parquet(dest)


def compact_and_register(
    spark: SparkSession,
    store: MetadataStore,
    schema_name: str,
    table: str,
    dest: str,
    compact_factor: int = config.COMPACT_FACTOR,
) -> DataFrame:
    """COMPACT the latest ordered layout into ``dest`` and register a new
    layout version with both path sets (≈ Layout versioning, Layout.java:31)."""
    layout = store.latest_layout(schema_name, table)
    if not layout["ordered_paths"]:
        raise KeyError(f"{schema_name}.{table} latest layout has no ordered paths")
    source = layout["ordered_paths"][0]
    df = compact_path(spark, source, dest, compact_factor)
    store.add_layout(
        schema_name,
        table,
        ordered_paths=layout["ordered_paths"],
        compact_paths=[dest],
    )
    return df
