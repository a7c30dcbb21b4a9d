"""Pixels type-name → Spark type mapping + TIME helpers (pixels_spark/types.py).

Pins the §1.2 table (TypeDescription.java:192-218 aliases) including the
parameterized grammar and the two convention types (TIME → Integer millis,
VECTOR → array<double>), and round-trips the TIME helper Columns.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pixels_spark.types import (
    parse_type,
    time_from_string,
    time_from_timestamp,
    time_to_string,
    to_struct,
)


@pytest.mark.parametrize(
    "name,expected",
    [
        ("boolean", T.BooleanType()),
        ("tinyint", T.ByteType()),
        ("SHORT", T.ShortType()),
        ("integer", T.IntegerType()),
        ("bigint", T.LongType()),
        ("real", T.FloatType()),
        ("double", T.DoubleType()),
        ("decimal(15,2)", T.DecimalType(15, 2)),
        ("decimal(9)", T.DecimalType(9, 0)),
        ("string", T.StringType()),
        ("char(10)", T.StringType()),
        ("varchar(255)", T.StringType()),
        ("binary(16)", T.BinaryType()),
        ("varbinary(64)", T.BinaryType()),
        ("date", T.DateType()),
        ("time", T.IntegerType()),
        ("timestamp", T.TimestampType()),
        ("timestamp(3)", T.TimestampType()),
        ("vector(64)", T.ArrayType(T.DoubleType())),
        (
            "struct<a:int,b:struct<c:string,d:decimal(5,2)>>",
            T.StructType(
                [
                    T.StructField("a", T.IntegerType()),
                    T.StructField(
                        "b",
                        T.StructType(
                            [
                                T.StructField("c", T.StringType()),
                                T.StructField("d", T.DecimalType(5, 2)),
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ],
)
def test_parse_type(name, expected):
    assert parse_type(name) == expected


def test_parse_type_rejects_unknown():
    with pytest.raises(ValueError):
        parse_type("map<string,int>")
    with pytest.raises(ValueError):
        parse_type("timestamp(9)")


def test_to_struct_matches_metadata_columns():
    cols = [
        {"name": "id", "type": "bigint"},
        {"name": "t", "type": "time"},
        {"name": "emb", "type": "vector(8)"},
    ]
    st = to_struct(cols)
    assert [f.name for f in st.fields] == ["id", "t", "emb"]
    assert st["t"].dataType == T.IntegerType()
    assert st["emb"].dataType == T.ArrayType(T.DoubleType())


def test_metadata_store_spark_schema(tmp_path):
    from pixels_spark.storage.metadata import MetadataStore

    ms = MetadataStore(str(tmp_path / "meta.json"))
    ms.create_schema("s")
    ms.create_table(
        "s",
        "t",
        [{"name": "k", "type": "int"}, {"name": "open_at", "type": "time"}],
    )
    st = ms.spark_schema("s", "t")
    assert st == T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("open_at", T.IntegerType()),
        ]
    )


def test_time_helpers_roundtrip(spark):
    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 3, 1, 0, 0, 0, 0), "00:00:00"),
            (dt.datetime(2024, 3, 1, 9, 30, 15, 250000), "09:30:15.250"),
            (dt.datetime(2024, 3, 1, 23, 59, 59, 999000), "23:59:59.999"),
        ],
        "ts timestamp, s string",
    )
    rows = df.select(
        time_from_timestamp(F.col("ts")).alias("ms"),
        time_from_string(F.col("s")).alias("ms2"),
        time_to_string(time_from_timestamp(F.col("ts"))).alias("disp"),
    ).collect()
    assert [r["ms"] for r in rows] == [0, 34_215_250, 86_399_999]
    assert [r["ms"] for r in rows] == [r["ms2"] for r in rows]
    assert [r["disp"] for r in rows] == ["00:00:00.000", "09:30:15.250", "23:59:59.999"]


def test_time_from_string_rejects_malformed(spark):
    df = spark.createDataFrame(
        [("25:00:00",), ("9:61:00",), ("garbage",), ("12:00:00",)], "s string"
    )
    got = [r[0] for r in df.select(time_from_string(F.col("s"))).collect()]
    assert got == [None, None, None, 43_200_000]
