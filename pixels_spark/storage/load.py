"""LOAD: delimited text → columnar table (≈ pixels-cli LOAD).

Reference: ``pixels-cli/.../Main.java:137-191`` (options: source dir, schema,
row-group row count, delimiter, parallelism, encoding level) +
``executor/LoadExecutor.java``. Spark mapping: ``spark.read.csv`` with an
explicit schema → repartition to target file count → parquet write with
row-group sizing, then register an *ordered* layout (many writer-parallel
files ≈ the reference's ordered paths) in the metadata store.

Encoding levels (``pixels-core/.../encoding/EncodingLevel.java:33`` EL0-EL2)
map onto parquet writer knobs: EL0 = no dictionary, EL2 = dictionary+RLE
(parquet default).

Scale notes: the CSV parse is executor-parallel (one task per input split);
the only shuffle is the optional repartition that controls output file count
— at 100 TB set ``files_per_load`` so each output file lands near the
256 MB row-group target (``row.group.size``, pixels.properties:84).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .. import config
from .metadata import MetadataStore


def load_table(
    spark: SparkSession,
    source: str,
    dest: str,
    schema: StructType,
    delimiter: str = "|",
    header: bool = False,
    files_per_load: int | None = None,
    encoding_level: int = 2,
    row_group_bytes: int | None = None,
) -> DataFrame:
    """Parse delimited text at ``source`` and write a columnar table at
    ``dest``. Returns the written DataFrame (re-read from dest)."""
    reader = (
        spark.read.option("delimiter", delimiter)
        .option("header", str(header).lower())
        .schema(schema)
    )
    df = reader.csv(source)
    writer = df if files_per_load is None else df.repartition(files_per_load)
    opts = {
        # ≈ row.group.size=256MB (pixels.properties:84)
        "parquet.block.size": str(row_group_bytes or int(config.MAX_PARTITION_BYTES)),
        # EL0 disables dictionary (≈ EncodingLevel EL0); EL1+ keep it
        "parquet.enable.dictionary": "false" if encoding_level == 0 else "true",
    }
    w = writer.write.mode("overwrite")
    for k, v in opts.items():
        w = w.option(k, v)
    w.parquet(dest)
    return spark.read.parquet(dest)


def load_and_register(
    spark: SparkSession,
    store: MetadataStore,
    schema_name: str,
    table: str,
    source: str,
    dest: str,
    schema: StructType,
    **load_kwargs,
) -> DataFrame:
    """LOAD + metadata registration (≈ LOAD's metadata insert + addFiles,
    MetadataService.java:1342)."""
    df = load_table(spark, source, dest, schema, **load_kwargs)
    cols = [{"name": f.name, "type": f.dataType.simpleString()} for f in schema.fields]
    if schema_name not in store.get_schemas():
        store.create_schema(schema_name)
    if table not in store.get_tables(schema_name):
        store.create_table(schema_name, table, cols)
    store.add_layout(schema_name, table, ordered_paths=[dest])
    store.update_row_count(schema_name, table, df.count())
    return df
