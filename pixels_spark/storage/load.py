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
    pixels_types: dict[str, str] | None = None,
    source_format: str = "csv",
) -> DataFrame:
    """Parse ``source`` and write a columnar table at ``dest``. Returns
    the written DataFrame (re-read from dest).

    ``source_format``: ``csv`` (the reference's LOAD surface —
    pixels-cli Main.java:137-191 takes delimited text only), or
    beyond-parity ``json`` (NDJSON, one object per line — the usual
    LLM-corpus interchange format) / ``parquet`` (re-layout an existing
    columnar dataset through the same row-group sizing + truncation
    path). All formats parse executor-parallel with the explicit schema
    (no inference pass over 100 TB).

    ``pixels_types`` (column → Pixels type string) enables writer-side
    CHAR/VARCHAR/BINARY length truncation per the reference writer's
    convention (see ``truncate_to_lengths``); use ``truncation_counts``
    for the numTruncated audit."""
    if source_format == "csv":
        df = (
            spark.read.option("delimiter", delimiter)
            .option("header", str(header).lower())
            .schema(schema)
            .csv(source)
        )
    elif source_format == "json":
        df = spark.read.schema(schema).json(source)
    elif source_format == "parquet":
        df = spark.read.schema(schema).parquet(source)
    else:
        raise ValueError(f"unsupported source_format {source_format!r}")
    if pixels_types:
        df = truncate_to_lengths(df, pixels_types)
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
    MetadataService.java:1342). When ``pixels_types`` is passed (length
    truncation), the cataloged column types keep the declared Pixels type
    strings — char/varchar lengths survive into the metadata store the way
    ``TypeDescription`` records maxLength in the file footer."""
    df = load_table(spark, source, dest, schema, **load_kwargs)
    pixels_types = load_kwargs.get("pixels_types") or {}
    cols = [
        {"name": f.name, "type": pixels_types.get(f.name, f.dataType.simpleString())}
        for f in schema.fields
    ]
    if schema_name not in store.get_schemas():
        store.create_schema(schema_name)
    if table not in store.get_tables(schema_name):
        store.create_table(schema_name, table, cols)
    store.add_layout(schema_name, table, ordered_paths=[dest])
    store.update_row_count(schema_name, table, df.count())
    return df


def truncate_to_lengths(df: DataFrame, pixels_types: dict[str, str]) -> DataFrame:
    """Writer-side CHAR(n)/VARCHAR(n)/(VAR)BINARY(n) length enforcement:
    overlong values are TRUNCATED to the declared max length, never
    rejected — exactly the reference writer's convention
    (``pixels-core/.../writer/VarcharColumnWriter.java:57-63`` caps
    ``vLens[i]`` at ``maxLength``; CharColumnWriter inherits it).

    ``pixels_types`` maps column name → Pixels type string (e.g.
    ``{"name": "varchar(25)"}``); non-length-typed columns pass through.
    Pure ``substring`` projection — map-side, codegen, no shuffle.
    """
    from pyspark.sql import functions as F

    from ..types import type_max_length

    out = df
    for col, tname in pixels_types.items():
        n = type_max_length(tname)
        if n is not None and col in out.columns:
            out = out.withColumn(col, F.substring(F.col(col), 1, n))
    return out


def truncation_counts(df: DataFrame, pixels_types: dict[str, str]) -> dict[str, int]:
    """Per-column count of values that exceed the declared length — the
    reference's ``numTruncated`` warning counter
    (``VarcharColumnWriter.java:77-84``), as one aggregate job over the
    pre-truncation data."""
    from pyspark.sql import functions as F

    from ..types import type_max_length

    aggs = []
    for col, tname in pixels_types.items():
        n = type_max_length(tname)
        if n is not None and col in df.columns:
            aggs.append(
                F.sum((F.length(F.col(col)) > n).cast("long")).alias(col)
            )
    if not aggs:
        return {}
    row = df.agg(*aggs).collect()[0]
    return {c: int(row[c] or 0) for c in row.asDict()}
