"""IMPORT/COPY/FILE_META, tolerant schema reads, MVCC vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from pixels_spark.catalog import load_table, load_table_tolerant, table_path
from pixels_spark.mvcc import MvccTable
from pixels_spark.storage import etl
from pixels_spark.storage.metadata import MetadataStore


def test_import_existing_parquet(spark, sf_dir, tmp_path):
    store = MetadataStore(str(tmp_path / "wh"))
    df = etl.import_table(spark, store, "tpch", "region", table_path(sf_dir, "region"))
    assert df.count() == 5
    assert store.get_table("tpch", "region")["row_count"] == 5
    assert store.reader_path("tpch", "region") == table_path(sf_dir, "region")


def test_copy_table(spark, sf_dir, tmp_path):
    dest = str(tmp_path / "copy")
    n = etl.copy_table(spark, table_path(sf_dir, "nation"), dest)
    assert n == 25
    a = {tuple(r) for r in load_table(spark, sf_dir, "nation").collect()}
    b = {tuple(r) for r in spark.read.parquet(dest).collect()}
    assert a == b


def test_file_meta_footer_dump(sf_dir):
    meta = etl.file_meta(table_path(sf_dir, "region"))
    assert meta["num_rows"] == 5
    assert meta["num_row_groups"] >= 1
    names = [c["name"] for c in meta["columns"]]
    assert names == ["r_regionkey", "r_name"]
    rg0 = meta["row_groups"][0]
    stats = {c["path_in_schema"]: c for c in rg0["columns"]}
    assert stats["r_regionkey"]["min"] == 0
    assert stats["r_regionkey"]["max"] == 4


def test_tolerant_read_fills_missing_columns(spark, sf_dir):
    # declared schema with an extra column the files don't have
    widened = StructType(
        [
            StructField("r_regionkey", LongType()),  # also widened int->long
            StructField("r_name", StringType()),
            StructField("r_comment", StringType()),  # absent in files
        ]
    )
    df = load_table_tolerant(spark, sf_dir, "region", widened)
    assert [f.name for f in df.schema.fields] == ["r_regionkey", "r_name", "r_comment"]
    assert dict(df.dtypes)["r_regionkey"] == "bigint"
    rows = df.collect()
    assert len(rows) == 5
    assert all(r.r_comment is None for r in rows)


def test_vacuum_removes_fully_deleted_commits(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").limit(40).cache()
    t = MvccTable(spark, str(tmp_path / "t"), key_col="event_id")
    first = events.limit(20)
    rest = events.subtract(first)
    t1 = t.insert(first)
    t2 = t.insert(rest)
    # delete ALL keys of commit t1, none of t2
    t3 = t.delete([r.event_id for r in first.collect()])
    assert t.read(t3).count() == events.count() - 20
    removed = t.vacuum(retain_ts=t3)
    assert removed == [t1]
    # current snapshot unchanged, commit dir gone
    assert t.read(t3).count() == events.count() - 20
    assert not os.path.isdir(os.path.join(str(tmp_path / "t"), "data", f"_commit={t1}"))
    # partially-deleted commits are never removed
    t4 = t.delete([r.event_id for r in rest.limit(5).collect()])
    assert t.vacuum(retain_ts=t4) == []


def test_vacuum_all_commits_leaves_readable_empty_table(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").limit(10)
    t = MvccTable(spark, str(tmp_path / "t2"), key_col="event_id")
    t1 = t.insert(events)
    t2 = t.delete([r.event_id for r in events.collect()])
    assert t.vacuum(retain_ts=t2) == [t1]
    # table fully vacuumed -> still readable, zero rows, schema preserved
    out = t.read(t2)
    assert out.count() == 0
    assert "event_id" in out.columns and "_commit_ts" in out.columns
