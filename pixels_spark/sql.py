"""SQL entry point over the registered catalog.

Reference: the Calcite frontend (``pixels-parser/.../PixelsParser.java`` —
parse → validate over PixelsSchema → RelNode → Volcano optimization) and the
Trino delegation path (SURVEY.md §3.1-3.2). Spark mapping: register the
catalog tables as views and hand the text to ``spark.sql`` — Catalyst is the
parser/validator/optimizer the reference assembles from Calcite + host
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import TABLES, register_views


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run SQL text against the fixture tables (views auto-registered)."""
    register_views(spark, sf_dir, TABLES)
    return spark.sql(query)


def ctas(
    spark: SparkSession,
    sf_dir: str,
    store,
    schema_name: str,
    table_name: str,
    query: str,
    dest: str,
    files: int | None = None,
) -> DataFrame:
    """CREATE TABLE AS SELECT: run ``query`` over the catalog, write the
    result as a columnar table at ``dest``, and register it (columns, row
    count, ordered layout) in the metadata store — the DDL lifecycle the
    reference drives through Trino/Calcite (CreateTable in
    ``pixels-parser``; metadata_schema.sql tables/layouts), completed on
    the Spark side in one call.

    The write is the query's own distributed output (optionally
    repartitioned to ``files``); registration reuses the MetadataStore
    conventions every other surface reads (``spark_schema``,
    ``reader_path``). Returns the re-read table."""
    df = sql(spark, sf_dir, query)
    out = df if files is None else df.repartition(files)
    out.write.mode("overwrite").parquet(dest)
    written = spark.read.parquet(dest)
    if schema_name not in store.get_schemas():
        store.create_schema(schema_name)
    store.create_table(
        schema_name,
        table_name,
        [{"name": f.name, "type": f.dataType.simpleString()} for f in written.schema.fields],
    )
    store.update_row_count(schema_name, table_name, written.count())
    store.add_layout(schema_name, table_name, ordered_paths=[dest])
    return written
