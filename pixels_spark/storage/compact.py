"""COMPACT: merge many small files into few large ones (≈ pixels-cli COMPACT).

Reference: ``pixels-cli/.../Main.java:266`` + ``pixels-core/.../compactor/``
— concatenates ``compact.factor=32`` row groups per file without re-encoding
(pixels.properties:104), producing the *compact* path set of a new layout
version while the *ordered* paths stay readable.

Two implementations:
- default: read ordered path → coalesce to ceil(files/compact_factor) →
  write — shuffle-free, but decodes and re-encodes pages;
- ``no_reencode=True``: byte-level row-group concatenation via parquet-mr's
  ``ParquetFileWriter.appendFile`` — the reference's actual mechanism:
  serialized row groups are copied verbatim (encodings, compressed pages,
  stats untouched), proven by per-chunk compressed-size equality in
  ``test_compact_no_reencode_is_byte_level``.
Either way a new layout version carries both path sets and readers
(``MetadataStore.reader_path``) prefer compact.

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
    no_reencode: bool = False,
) -> DataFrame:
    """Merge the parquet files under ``source`` into ceil(n/compact_factor)
    files at ``dest``.

    ``no_reencode=True`` concatenates serialized row groups byte-level via
    parquet-mr's ``ParquetFileWriter.appendFile`` (shipped in Spark's JVM) —
    the exact mechanism of the reference's compactor
    (``pixels-core/.../compactor/``): no decode, no re-encode, encodings and
    compressed pages preserved bit-for-bit. Default (False) is the
    shuffle-free coalesce rewrite, which also merges row groups."""
    if no_reencode:
        return _concat_row_groups(spark, source, dest, compact_factor)
    df = spark.read.parquet(source)
    n_files = df.rdd.getNumPartitions()
    target = max(1, math.ceil(n_files / compact_factor))
    df.coalesce(target).write.mode("overwrite").parquet(dest)
    return spark.read.parquet(dest)


def _concat_row_groups(
    spark: SparkSession, source: str, dest: str, compact_factor: int
) -> DataFrame:
    """Byte-level row-group concatenation: every ``compact_factor`` source
    files become one output file whose row groups are the inputs' serialized
    row groups, copied verbatim (parquet-mr ``appendFile``).

    Runs on the driver (a byte-copy pipe, no compute) — same shape as the
    reference's single-node compactor; at 100 TB each table-partition's
    compact is an independent byte-copy job, parallelized across partitions,
    and the copy streams at storage bandwidth because nothing is decoded.
    All inputs must share one schema (same constraint as the reference).
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    JPath = jvm.org.apache.hadoop.fs.Path
    HadoopInputFile = jvm.org.apache.parquet.hadoop.util.HadoopInputFile
    HadoopOutputFile = jvm.org.apache.parquet.hadoop.util.HadoopOutputFile
    ParquetFileWriter = jvm.org.apache.parquet.hadoop.ParquetFileWriter
    ParquetFileReader = jvm.org.apache.parquet.hadoop.ParquetFileReader

    fs = JPath(source).getFileSystem(conf)
    files = sorted(
        str(st.getPath())
        for st in fs.listStatus(JPath(source))
        if st.getPath().getName().endswith(".parquet")
    )
    if not files:
        raise FileNotFoundError(f"no parquet files under {source}")

    rdr = ParquetFileReader.open(HadoopInputFile.fromPath(JPath(files[0]), conf))
    schema = rdr.getFooter().getFileMetaData().getSchema()
    rdr.close()

    dest_fs = JPath(dest).getFileSystem(conf)
    dest_fs.mkdirs(JPath(dest))
    mode = jvm.org.apache.parquet.hadoop.ParquetFileWriter.Mode.OVERWRITE
    n_out = max(1, math.ceil(len(files) / compact_factor))
    for i in range(n_out):
        group = files[i * compact_factor : (i + 1) * compact_factor]
        out_path = JPath(dest, f"part-{i:05d}.parquet")
        # row-group size arg only guides padding for appended groups; the
        # appended row groups keep their original byte size (no re-chunking)
        w = ParquetFileWriter(
            HadoopOutputFile.fromPath(out_path, conf),
            schema,
            mode,
            int(config.MAX_PARTITION_BYTES),
            0,
        )
        w.start()
        for f in group:
            w.appendFile(HadoopInputFile.fromPath(JPath(f), conf))
        w.end(jvm.java.util.HashMap())
    return spark.read.parquet(dest)


def compact_and_register(
    spark: SparkSession,
    store: MetadataStore,
    schema_name: str,
    table: str,
    dest: str,
    compact_factor: int = config.COMPACT_FACTOR,
    no_reencode: bool = False,
) -> DataFrame:
    """COMPACT the latest ordered layout into ``dest`` and register a new
    layout version with both path sets (≈ Layout versioning, Layout.java:31)."""
    layout = store.latest_layout(schema_name, table)
    if not layout["ordered_paths"]:
        raise KeyError(f"{schema_name}.{table} latest layout has no ordered paths")
    source = layout["ordered_paths"][0]
    df = compact_path(spark, source, dest, compact_factor, no_reencode=no_reencode)
    store.add_layout(
        schema_name,
        table,
        ordered_paths=layout["ordered_paths"],
        compact_paths=[dest],
    )
    return df
