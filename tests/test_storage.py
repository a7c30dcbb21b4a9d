"""Storage layer tests: LOAD → COMPACT → STAT lifecycle + metadata."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pixels_spark.catalog import SCHEMAS, load_table
from pixels_spark.storage import compact, load, stats
from pixels_spark.storage.metadata import MetadataStore


@pytest.fixture()
def store(tmp_path):
    return MetadataStore(str(tmp_path / "warehouse"))


def test_metadata_hierarchy(store):
    store.create_schema("tpch")
    store.create_table("tpch", "lineitem", [{"name": "l_orderkey", "type": "bigint"}])
    assert store.get_tables("tpch") == ["lineitem"]
    assert store.get_columns("tpch", "lineitem")[0]["name"] == "l_orderkey"
    store.add_layout("tpch", "lineitem", ordered_paths=["/data/ordered"])
    store.add_layout(
        "tpch", "lineitem", ordered_paths=["/data/ordered"], compact_paths=["/data/compact"]
    )
    layouts = store.get_layouts("tpch", "lineitem")
    assert [l["version"] for l in layouts] == [0, 1]
    assert store.reader_path("tpch", "lineitem") == "/data/compact"
    # persistence round-trip
    store2 = MetadataStore(store.root)
    assert store2.reader_path("tpch", "lineitem") == "/data/compact"


def test_load_csv_roundtrip(spark, sf_dir, store, tmp_path):
    # produce a delimited source from the fixture, then LOAD it back
    src_df = load_table(spark, sf_dir, "supplier")
    csv_dir = str(tmp_path / "src")
    src_df.write.option("delimiter", "|").mode("overwrite").csv(csv_dir)
    dest = str(tmp_path / "tables" / "supplier")
    out = load.load_and_register(
        spark, store, "tpch", "supplier", csv_dir, dest, SCHEMAS["supplier"],
        delimiter="|", files_per_load=4,
    )
    assert out.count() == src_df.count()
    assert [f.name for f in out.schema.fields] == [f.name for f in src_df.schema.fields]
    assert store.get_table("tpch", "supplier")["row_count"] == src_df.count()
    # values survive the text round-trip
    a = {tuple(r) for r in src_df.collect()}
    b = {tuple(r) for r in out.collect()}
    assert a == b


def test_load_encoding_level_0_disables_dictionary(spark, sf_dir, store, tmp_path):
    src_df = load_table(spark, sf_dir, "region")
    csv_dir = str(tmp_path / "src")
    src_df.write.option("delimiter", "|").mode("overwrite").csv(csv_dir)
    dest = str(tmp_path / "el0")
    out = load.load_table(
        spark, csv_dir, dest, SCHEMAS["region"], delimiter="|", encoding_level=0
    )
    assert out.count() == 5


def test_compact_reduces_files_and_preserves_rows(spark, sf_dir, store, tmp_path):
    # write an intentionally fragmented ordered layout (many small files
    # ≈ single-row-group LOAD output), then COMPACT at factor 8
    ordered = str(tmp_path / "ordered")
    li = load_table(spark, sf_dir, "lineitem")
    li.repartition(32).write.mode("overwrite").parquet(ordered)
    store.create_schema("tpch")
    store.create_table("tpch", "lineitem", [])
    store.add_layout("tpch", "lineitem", ordered_paths=[ordered])

    compacted = str(tmp_path / "compact")
    out = compact.compact_and_register(
        spark, store, "tpch", "lineitem", compacted, compact_factor=8
    )
    assert out.count() == li.count()
    n_files = len(
        [f for f in os.listdir(compacted) if f.endswith(".parquet")]
    )
    assert n_files <= 32 / 8 + 1
    assert store.reader_path("tpch", "lineitem") == compacted
    # both layouts remain readable (ordered + compact ≈ Layout dual paths)
    assert spark.read.parquet(ordered).count() == li.count()


def test_stats_and_selectivity(spark, sf_dir, store):
    li = load_table(spark, sf_dir, "lineitem")
    store.create_schema("tpch")
    store.create_table("tpch", "lineitem", [])
    s = stats.stat_and_register(li, store, "tpch", "lineitem")
    assert s["l_quantity"].min_value == 1.0
    assert s["l_quantity"].max_value == 50.0
    assert s["l_orderkey"].n_nulls == 0
    assert s["l_returnflag"].n_distinct == 3
    # range selectivity: quantity < 24 over [1, 50] ≈ 23/49
    sel = stats.estimate_range_selectivity(s["l_quantity"], None, 24.0)
    assert sel == pytest.approx((24 - 1) / 49, abs=0.01)
    eq = stats.estimate_equality_selectivity(s["l_returnflag"])
    assert eq == pytest.approx(1 / 3)
    # persisted on the table metadata
    assert "stats" in store.get_table("tpch", "lineitem")["properties"]


def test_encoding_levels_change_parquet_encodings(spark, sf_dir, tmp_path):
    """EL0 vs EL2 must materially change the written parquet encodings
    (≈ EncodingLevel.java EL0 = no dictionary, EL2 = dictionary+RLE)."""
    import pyarrow.parquet as pq

    src_df = load_table(spark, sf_dir, "lineitem").limit(2000)
    csv_dir = str(tmp_path / "src")
    src_df.write.option("delimiter", "|").mode("overwrite").csv(csv_dir)

    def encodings(dest):
        files = [f for f in os.listdir(dest) if f.endswith(".parquet")]
        md = pq.read_metadata(os.path.join(dest, files[0]))
        encs = set()
        rg = md.row_group(0)
        for j in range(rg.num_columns):
            c = rg.column(j)
            if c.path_in_schema == "l_returnflag":
                encs.update(c.encodings)
        return encs

    el2 = str(tmp_path / "el2")
    load.load_table(spark, csv_dir, el2, SCHEMAS["lineitem"], delimiter="|", encoding_level=2)
    el0 = str(tmp_path / "el0")
    load.load_table(spark, csv_dir, el0, SCHEMAS["lineitem"], delimiter="|", encoding_level=0)
    e2, e0 = encodings(el2), encodings(el0)
    assert any("DICTIONARY" in e for e in e2), e2
    assert not any("DICTIONARY" in e for e in e0), e0


def test_projection_pattern_routing(spark, sf_dir, store, tmp_path):
    """A query's column set must route to the NARROWEST covering
    materialized projection (≈ InvertedProjectionsIndex.search), falling
    back to the base path when not covered — asserted via the files the
    scan actually reads."""
    from pixels_spark.storage.etl import (
        import_table,
        materialize_projection,
        read_routed,
    )

    base = str(tmp_path / "li_base")
    load_table(spark, sf_dir, "lineitem").write.mode("overwrite").parquet(base)
    store.create_schema("tpch")
    import_table(spark, store, "tpch", "lineitem", base)

    wide = str(tmp_path / "proj_wide")
    narrow = str(tmp_path / "proj_narrow")
    materialize_projection(
        spark, store, "tpch", "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"],
        wide,
    )
    materialize_projection(
        spark, store, "tpch", "lineitem", ["l_orderkey", "l_quantity"], narrow
    )

    # 2-col read routes to the 2-col projection
    assert store.reader_path("tpch", "lineitem", ["l_quantity", "l_orderkey"]) == narrow
    # 3-col read is only covered by the 5-col projection
    got3 = store.reader_path("tpch", "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    assert got3 == wide
    # uncovered column set falls back to the base path
    assert store.reader_path("tpch", "lineitem", ["l_orderkey", "l_comment"]) == base
    assert store.reader_path("tpch", "lineitem") == base

    routed = read_routed(spark, store, "tpch", "lineitem", ["l_orderkey", "l_quantity"])
    files = {
        r.file_path
        for r in routed.select(
            F.input_file_name().alias("file_path")
        ).distinct().collect()
    }
    assert files and all("proj_narrow" in f for f in files), files
    # values identical to the base table
    expect = (
        spark.read.parquet(base)
        .agg(F.sum("l_orderkey"), F.sum("l_quantity"))
        .first()
    )
    assert tuple(routed.agg(F.sum("l_orderkey"), F.sum("l_quantity")).first()) == tuple(expect)


def test_view_crud_and_persistence(store):
    store.create_schema("analytics")
    store.create_view("analytics", "v1", "SELECT 1 AS one")
    assert store.get_views("analytics") == ["v1"]
    assert store.get_view("analytics", "v1") == "SELECT 1 AS one"
    with pytest.raises(ValueError):
        store.create_view("analytics", "v1", "SELECT 2 AS one")
    store.create_view("analytics", "v1", "SELECT 2 AS two", update_if_exists=True)
    assert store.get_view("analytics", "v1") == "SELECT 2 AS two"
    # persistence round-trip
    store2 = MetadataStore(store.root)
    assert store2.get_view("analytics", "v1") == "SELECT 2 AS two"
    store2.drop_view("analytics", "v1")
    assert store2.get_views("analytics") == []


def test_compact_no_reencode_is_byte_level(spark, sf_dir, tmp_path):
    """The no-re-encode compactor must concatenate serialized row groups
    verbatim (≈ pixels-core compactor): same total row groups, and every
    column chunk's compressed size identical to its source — proof nothing
    was decoded/re-encoded."""
    import glob

    import pyarrow.parquet as pq

    from pixels_spark.catalog import load_table
    from pixels_spark.storage.compact import compact_path

    src = str(tmp_path / "ord")
    load_table(spark, sf_dir, "orders").repartition(6).write.mode(
        "overwrite"
    ).parquet(src)
    dest = str(tmp_path / "cmp")
    out = compact_path(spark, src, dest, compact_factor=3, no_reencode=True)

    src_files = sorted(glob.glob(f"{src}/part-*.parquet"))
    dst_files = sorted(glob.glob(f"{dest}/part-*.parquet"))
    assert len(dst_files) == 2  # 6 files / factor 3

    def chunk_sizes(paths):
        out = []
        for p in paths:
            md = pq.read_metadata(p)
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                out.append(
                    tuple(
                        (g.column(c).path_in_schema, g.column(c).total_compressed_size)
                        for c in range(g.num_columns)
                    )
                )
        return out

    # every source row group appears in the output with identical
    # per-column compressed byte sizes (order may interleave across files)
    assert sorted(chunk_sizes(src_files)) == sorted(chunk_sizes(dst_files))

    # and the data reads back identically
    src_df = spark.read.parquet(src)
    assert out.count() == src_df.count()
    assert out.exceptAll(src_df).count() == 0


def test_footer_min_max_count_matches_scan(spark, sf_dir):
    """Stat-covered aggregates answered from footers alone must equal the
    full-scan aggregation (no Spark job is run for the footer path)."""
    from pyspark.sql import functions as F

    from pixels_spark.storage.stats import footer_min_max_count

    path = f"{sf_dir}/lineitem.parquet"
    got = footer_min_max_count(path, ["l_quantity", "l_orderkey"])
    row = (
        spark.read.parquet(path)
        .agg(
            F.min("l_quantity"), F.max("l_quantity"),
            F.min("l_orderkey"), F.max("l_orderkey"),
            F.count(F.lit(1)),
        )
        .first()
    )
    assert got["l_quantity"]["min"] == row[0]
    assert got["l_quantity"]["max"] == row[1]
    assert got["l_orderkey"]["min"] == row[2]
    assert got["l_orderkey"]["max"] == row[3]
    assert got["l_quantity"]["count"] == row[4]


def test_load_json_and_parquet_sources(spark, sf_dir, tmp_path):
    """Beyond-parity LOAD formats: NDJSON (the LLM-corpus interchange
    format) and parquet re-layout run through the same schema'd parse +
    row-group-sized write path as CSV."""
    src_df = load_table(spark, sf_dir, "supplier")
    want = {tuple(r) for r in src_df.collect()}

    json_dir = str(tmp_path / "src_json")
    src_df.write.mode("overwrite").json(json_dir)
    out_j = load.load_table(
        spark, json_dir, str(tmp_path / "t_json"), SCHEMAS["supplier"],
        source_format="json", files_per_load=2,
    )
    assert {tuple(r) for r in out_j.collect()} == want

    pq_dir = str(tmp_path / "src_pq")
    src_df.write.mode("overwrite").parquet(pq_dir)
    out_p = load.load_table(
        spark, pq_dir, str(tmp_path / "t_pq"), SCHEMAS["supplier"],
        source_format="parquet",
    )
    assert {tuple(r) for r in out_p.collect()} == want

    import pytest

    with pytest.raises(ValueError, match="source_format"):
        load.load_table(
            spark, pq_dir, str(tmp_path / "t_x"), SCHEMAS["supplier"],
            source_format="avro",
        )


def test_ctas_registers_table(spark, sf_dir, store, tmp_path):
    """CREATE TABLE AS SELECT: query result written columnar + registered
    (columns, row count, ordered layout) in one call; re-readable through
    the catalog conventions."""
    from pixels_spark.sql import ctas

    dest = str(tmp_path / "tables" / "region_counts")
    out = ctas(
        spark, sf_dir, store, "analytics", "region_counts",
        """SELECT n_regionkey AS regionkey, CAST(count(*) AS BIGINT) AS n
           FROM nation GROUP BY n_regionkey""",
        dest, files=2,
    )
    assert out.count() == 5
    meta = store.get_table("analytics", "region_counts")
    assert meta["row_count"] == 5
    cols = {c["name"]: c["type"] for c in store.get_columns("analytics", "region_counts")}
    assert cols == {"regionkey": "int", "n": "bigint"}
    assert store.reader_path("analytics", "region_counts") == dest
    back = spark.read.parquet(store.reader_path("analytics", "region_counts"))
    assert {(r["regionkey"], r["n"]) for r in back.collect()} == \
           {(r["regionkey"], r["n"]) for r in out.collect()}
