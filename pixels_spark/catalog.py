"""Table catalog: fixture schemas + registration.

Reference analog: the Schema→Table→Column metadata hierarchy served by
``pixels-common/.../metadata/MetadataService.java`` (createSchema:131,
createTable:256, getColumns:581). Here the catalog is (a) explicit StructTypes
per fixture table — the engine never relies on inference in production paths —
and (b) helpers registering them as temp views for ``spark.sql``.

Schemas follow FIXTURES.md / TESTDATA.md exactly; the type mapping is
SURVEY.md §1.2 (Pixels Category → Spark SQL type,
``pixels-core/.../TypeDescription.java:192-218``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_S = StructType
_F = StructField

SCHEMAS: dict[str, StructType] = {
    "region": _S([_F("r_regionkey", IntegerType()), _F("r_name", StringType())]),
    "nation": _S(
        [
            _F("n_nationkey", IntegerType()),
            _F("n_name", StringType()),
            _F("n_regionkey", IntegerType()),
        ]
    ),
    "customer": _S(
        [
            _F("c_custkey", LongType()),
            _F("c_name", StringType()),
            _F("c_nationkey", IntegerType()),
            _F("c_acctbal", DoubleType()),
            _F("c_mktsegment", StringType()),
        ]
    ),
    "supplier": _S(
        [
            _F("s_suppkey", LongType()),
            _F("s_name", StringType()),
            _F("s_nationkey", IntegerType()),
            _F("s_acctbal", DoubleType()),
        ]
    ),
    "part": _S(
        [
            _F("p_partkey", LongType()),
            _F("p_name", StringType()),
            _F("p_brand", StringType()),
            _F("p_type", StringType()),
            _F("p_size", IntegerType()),
            _F("p_retailprice", DoubleType()),
        ]
    ),
    "orders": _S(
        [
            _F("o_orderkey", LongType()),
            _F("o_custkey", LongType()),
            _F("o_orderstatus", StringType()),
            _F("o_totalprice", DoubleType()),
            _F("o_orderdate", TimestampType()),
            _F("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": _S(
        [
            _F("l_orderkey", LongType()),
            _F("l_partkey", LongType()),
            _F("l_suppkey", LongType()),
            _F("l_linenumber", IntegerType()),
            _F("l_quantity", DoubleType()),
            _F("l_extendedprice", DoubleType()),
            _F("l_discount", DoubleType()),
            _F("l_tax", DoubleType()),
            _F("l_returnflag", StringType()),
            _F("l_linestatus", StringType()),
            _F("l_shipdate", TimestampType()),
        ]
    ),
    "events": _S(
        [
            _F("event_id", LongType()),
            _F("ts", TimestampType()),
            _F("user_id", LongType()),
            _F("event_type", StringType()),
            _F("value", DoubleType()),
            _F("props", StringType()),
        ]
    ),
    "documents": _S(
        [
            _F("doc_id", LongType()),
            _F("text", StringType()),
            _F("lang", StringType()),
            _F("source", StringType()),
            _F("n_chars", LongType()),
        ]
    ),
    # ≈ Pixels VECTOR type (TypeDescription.java:218) — fixed-dim float array.
    "embeddings": _S(
        [
            _F("vec_id", LongType()),
            _F("embedding", ArrayType(FloatType())),
            _F("label", IntegerType()),
        ]
    ),
}


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table.

    We read with parquet's own footer schema (≈ Pixels footer types,
    proto/pixels.proto:83-96) — not an imposed schema — so timestamp
    physical precision (ms/ns) converts losslessly, then we align to the
    declared catalog types where they differ only in nullability.
    """
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; catalog has {sorted(SCHEMAS)}")
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    # Fixture timestamps are parquet timestamp[us] with isAdjustedToUTC=false
    # (naive wall-clock), which Spark 4 reads as TIMESTAMP_NTZ; older fixture
    # generations used INT64 TIMESTAMP(NANOS), which Spark rejects outright
    # unless read as a raw long (nanosAsLong). Either way the catalog contract
    # is the declared TimestampType (µs, session-TZ). Pin the session TZ to
    # UTC *before* any cast so NTZ→TIMESTAMP is value-preserving and
    # date_trunc/window boundaries match the DuckDB oracle's naive-µs
    # semantics. ≈ Pixels TIMESTAMP precision 0-6 (proto/pixels.proto:125).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # legacy ns fixture: ns→µs with integer division (`div`, not double
        # `/` — ns epochs exceed 2^53 and a double round-trip would round)
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def load_table_tolerant(
    spark: SparkSession, sf_dir: str, name: str, schema: StructType | None = None
) -> DataFrame:
    """Tolerant schema-evolution read: project the declared schema over
    whatever the files contain — columns missing from the files come back
    as typed nulls, extra file columns are dropped.

    ≈ the reference's tolerant read (missing columns → null vectors,
    ``pixels-core/.../reader/PixelsReaderOption.java:34,126`` /
    PixelsRecordReaderImpl), which is how old files stay readable after
    ADD COLUMN without rewrite.
    """
    from pyspark.sql import functions as F

    target = schema or SCHEMAS[name]
    df = load_table(spark, sf_dir, name)
    present = {f.name for f in df.schema.fields}
    cols = [
        F.col(f.name).cast(f.dataType).alias(f.name)
        if f.name in present
        else F.lit(None).cast(f.dataType).alias(f.name)
        for f in target.fields
    ]
    return df.select(*cols)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so ``spark.sql`` works over the fixtures
    (≈ PixelsSchema/PixelsTable exposing metadata tables to Calcite,
    pixels-parser/.../PixelsSchema.java)."""
    for t in names:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
