"""Workload-aware split sizing (CostBasedSplitsIndex analog).

The advice inverts the projected byte fraction so a task decodes ~target
bytes of the accessed columns; the engine applies it at scan-build time
and the scan's actual partitioning must respond.
"""

from __future__ import annotations

import pytest

from pixels_spark.engine import PixelsSparkEngine
from pixels_spark.storage.splits import (
    MAX_SPLIT_BYTES,
    MIN_SPLIT_BYTES,
    advise_max_partition_bytes,
    column_chunk_bytes,
)


def test_column_chunk_bytes_covers_the_file(sf_dir):
    import os

    cb = column_chunk_bytes(f"{sf_dir}/lineitem.parquet")
    assert set(cb) >= {"l_orderkey", "l_extendedprice", "l_shipdate"}
    total = sum(cb.values())
    fsize = os.path.getsize(f"{sf_dir}/lineitem.parquet")
    # compressed chunks account for most of the file (rest is footer/headers)
    assert 0.5 * fsize < total <= fsize


def test_advise_inverts_projected_fraction():
    cb = {"a": 80, "b": 20}
    t = 1000
    assert advise_max_partition_bytes(cb, None, t) == max(MIN_SPLIT_BYTES, t)
    # narrow workload (20% of bytes) → 5× larger splits
    narrow = advise_max_partition_bytes(cb, ["b"], t)
    full = advise_max_partition_bytes(cb, ["a", "b"], t)
    assert narrow == max(MIN_SPLIT_BYTES, 5 * t)
    assert full == max(MIN_SPLIT_BYTES, t)
    # unknown/typo'd columns: conservative = the plain target (the scan
    # still decodes whatever the query really touches), never the ceiling
    assert advise_max_partition_bytes(cb, ["nope"], t) == max(MIN_SPLIT_BYTES, t)
    assert (
        advise_max_partition_bytes({"a": 1}, ["a"], 10 * MAX_SPLIT_BYTES)
        == MAX_SPLIT_BYTES
    )


@pytest.fixture()
def eng(spark, tmp_path, sf_dir):
    eng = PixelsSparkEngine(spark, str(tmp_path / "wh"))
    eng.import_table("tpch", "lineitem", f"{sf_dir}/lineitem.parquet")
    return eng


def test_split_advice_requires_index(eng):
    assert eng.split_advice("tpch", "lineitem", ["l_orderkey"]) is None
    cb = eng.build_splits_index("tpch", "lineitem")
    assert cb["l_extendedprice"] > 0
    narrow = eng.split_advice("tpch", "lineitem", ["l_orderkey"])
    wide = eng.split_advice("tpch", "lineitem", None)
    assert narrow > wide  # fewer projected bytes → larger splits


def test_workload_cols_change_actual_scan_partitioning(eng, spark):
    """The advised size must reach the physical scan: with the byte weights
    scaled to this small fixture, a narrow projection yields FEWER input
    partitions than a full-width scan of the same files."""
    from pixels_spark.storage import splits as S

    eng.build_splits_index("tpch", "lineitem")
    # shrink the target so the fixture file splits at all, via the module's
    # own advice path (monkeypatch-free: call advise directly + conf set)
    cb = S.stored_col_bytes(eng.meta, "tpch", "lineitem")
    old_min, S.MIN_SPLIT_BYTES = S.MIN_SPLIT_BYTES, 4096
    try:
        t = 64 * 1024
        narrow_bytes = S.advise_max_partition_bytes(cb, ["l_orderkey"], t)
        wide_bytes = S.advise_max_partition_bytes(cb, None, t)
        assert narrow_bytes > wide_bytes
        path = eng.meta.reader_path("tpch", "lineitem")
        before = spark.conf.get("spark.sql.files.maxPartitionBytes")
        try:
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(wide_bytes))
            n_wide = spark.read.parquet(path).rdd.getNumPartitions()
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(narrow_bytes))
            n_narrow = spark.read.parquet(path).rdd.getNumPartitions()
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", before)
        assert n_narrow < n_wide, (n_narrow, n_wide)
    finally:
        S.MIN_SPLIT_BYTES = old_min


def test_engine_table_applies_advice_to_session(eng, spark):
    eng.build_splits_index("tpch", "lineitem")
    before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        eng.table("tpch", "lineitem", workload_cols=["l_orderkey"])
        applied = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
        assert applied == eng.split_advice("tpch", "lineitem", ["l_orderkey"])
        assert applied > int(before)  # narrow scan → larger than global default
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", before)


def test_full_width_read_resets_narrow_advice(eng, spark):
    """A full-width engine.table() after a narrow one must not inherit the
    narrow scan's larger split size — every indexed read re-advises."""
    from pixels_spark import config

    eng.build_splits_index("tpch", "lineitem")
    before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        eng.table("tpch", "lineitem", workload_cols=["l_orderkey"])
        narrow = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
        eng.table("tpch", "lineitem")  # full row
        full = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
        assert narrow > full
        assert full == int(config.MAX_PARTITION_BYTES)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", before)
