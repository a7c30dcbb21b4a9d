"""IMPORT / COPY / FILE_META — remaining ETL verbs (≈ pixels-cli).

Reference: ``pixels-cli/.../Main.java`` — IMPORT (register existing files
into the metadata service, :336), COPY (replicate files to another path,
:228), FILE_META (dump a file's footer, :369). Spark/parquet mapping:
metadata registration over an existing parquet dir, a distributed
read→write replica, and a pyarrow footer dump (parquet footer ≈ PixelsFile
FileTail/Footer, proto/pixels.proto:40-96).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .metadata import MetadataStore


def import_table(
    spark: SparkSession,
    store: MetadataStore,
    schema_name: str,
    table: str,
    path: str,
) -> DataFrame:
    """Register an existing parquet directory as a table (≈ IMPORT,
    Main.java:336 — files exist, metadata is created around them)."""
    df = spark.read.parquet(path)
    cols = [{"name": f.name, "type": f.dataType.simpleString()} for f in df.schema.fields]
    if schema_name not in store.get_schemas():
        store.create_schema(schema_name)
    if table not in store.get_tables(schema_name):
        store.create_table(schema_name, table, cols)
    store.add_layout(schema_name, table, ordered_paths=[path])
    store.update_row_count(schema_name, table, df.count())
    return df


def copy_table(spark: SparkSession, source: str, dest: str) -> int:
    """Replicate a table's files (≈ COPY, Main.java:228). Distributed
    read→write (survives executor-local source at scale, unlike a driver
    file copy); returns the row count copied."""
    df = spark.read.parquet(source)
    df.write.mode("overwrite").parquet(dest)
    return spark.read.parquet(dest).count()


def file_meta(path: str) -> dict[str, Any]:
    """Dump a parquet file's footer (≈ FILE_META, Main.java:369 — the
    reference prints FileTail/Footer; parquet's footer carries the same
    row-group + column-chunk statistics)."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    schema = pq.read_schema(path)
    out: dict[str, Any] = {
        "path": os.path.abspath(path),
        "num_rows": md.num_rows,
        "num_row_groups": md.num_row_groups,
        "created_by": md.created_by,
        "columns": [
            {"name": f.name, "type": str(f.type)} for f in schema
        ],
        "row_groups": [],
    }
    for i in range(md.num_row_groups):
        rg = md.row_group(i)
        cols = []
        for j in range(rg.num_columns):
            c = rg.column(j)
            stats = c.statistics
            cols.append(
                {
                    "path_in_schema": c.path_in_schema,
                    "compression": c.compression,
                    "total_compressed_size": c.total_compressed_size,
                    "min": None if stats is None else stats.min,
                    "max": None if stats is None else stats.max,
                    "null_count": None if stats is None else stats.null_count,
                }
            )
        out["row_groups"].append(
            {"num_rows": rg.num_rows, "total_byte_size": rg.total_byte_size, "columns": cols}
        )
    return out


def materialize_projection(
    spark: SparkSession,
    store: MetadataStore,
    schema_name: str,
    table: str,
    cols: list[str],
    dest: str,
) -> None:
    """Materialize a column-subset copy of ``table`` and register it as a
    projection pattern on the latest layout (≈ the write side of
    ``Projections.java`` patterns consumed by InvertedProjectionsIndex).

    The narrow copy is a plain distributed select→write — at 100 TB it costs
    one scan of the projected columns only (parquet is columnar, untouched
    columns are never read) and zero shuffles. Reads whose column set fits
    then scan this path instead of the full-width table via
    ``MetadataStore.reader_path(columns=...)``."""
    src = store.reader_path(schema_name, table)
    spark.read.parquet(src).select(*cols).write.mode("overwrite").parquet(dest)
    store.add_projection(schema_name, table, cols, dest)


def read_routed(
    spark: SparkSession,
    store: MetadataStore,
    schema_name: str,
    table: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Read ``table`` through projection-pattern routing: the scan is bound
    to the narrowest materialized path covering ``columns`` (falling back
    to the table's compact/ordered path)."""
    path = store.reader_path(schema_name, table, columns=columns)
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df
