"""Fixture-drift regression guard: the catalog must always deliver its
declared types regardless of the parquet physical encoding.

The test fixtures have been regenerated across rounds with different
timestamp encodings (INT64 TIMESTAMP(NANOS), then timestamp[us]
isAdjustedToUTC=false → Spark TIMESTAMP_NTZ). Either way
``catalog.load_table`` must hand back the declared ``TimestampType`` —
an NTZ column leaking through breaks every ``unix_micros``/window call
site downstream (this cost a full round once; see VERDICT r03).
"""

from __future__ import annotations

from pyspark.sql.types import TimestampNTZType, TimestampType

from pixels_spark import catalog


def test_no_ntz_in_any_fixture_table(spark, sf_dir):
    for t in catalog.TABLES:
        df = catalog.load_table(spark, sf_dir, t)
        for f in df.schema.fields:
            assert not isinstance(f.dataType, TimestampNTZType), (
                f"{t}.{f.name} leaked TIMESTAMP_NTZ through the catalog"
            )


def test_declared_timestamp_columns_are_timestamp(spark, sf_dir):
    for t, schema in catalog.SCHEMAS.items():
        df = catalog.load_table(spark, sf_dir, t)
        got = {f.name: f.dataType for f in df.schema.fields}
        for f in schema.fields:
            if isinstance(f.dataType, TimestampType):
                assert isinstance(got[f.name], TimestampType), (
                    f"{t}.{f.name}: declared TimestampType, got {got[f.name]}"
                )


def test_unix_micros_works_on_events_ts(spark, sf_dir):
    from pyspark.sql import functions as F

    df = catalog.load_table(spark, sf_dir, "events")
    n = df.select(F.unix_micros("ts").alias("us")).where("us IS NOT NULL").count()
    assert n > 0
