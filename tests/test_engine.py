"""End-to-end engine facade test: the 'switch from the reference' story."""

from __future__ import annotations

from pyspark.sql import functions as F

from pixels_spark.catalog import SCHEMAS, load_table
from pixels_spark.engine import PixelsSparkEngine


def test_engine_lifecycle(spark, sf_dir, tmp_path):
    eng = PixelsSparkEngine(spark, str(tmp_path / "wh"))

    # LOAD from delimited text
    src = load_table(spark, sf_dir, "orders")
    csv = str(tmp_path / "csv")
    src.write.option("delimiter", "|").mode("overwrite").csv(csv)
    df = eng.load("tpch", "orders", csv, SCHEMAS["orders"], delimiter="|", files_per_load=8)
    assert df.count() == src.count()

    # COMPACT → reader flips to compact layout
    eng.compact("tpch", "orders", compact_factor=4)
    assert "_compact" in eng.meta.reader_path("tpch", "orders")
    assert eng.table("tpch", "orders").count() == src.count()

    # STAT
    s = eng.stat("tpch", "orders")
    assert s["o_orderkey"].n_nulls == 0

    # IMPORT an existing table + SQL over registered views
    eng.import_table("tpch", "customer", f"{sf_dir}/customer.parquet")
    eng.sql_register("tpch")
    out = eng.sql(
        """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt
           FROM customer JOIN orders ON c_custkey = o_custkey
           GROUP BY c_mktsegment ORDER BY c_mktsegment"""
    )
    assert out.count() == 5

    # cataloged views: persisted in metadata, registered for SQL, and
    # replayed by sql_register in a fresh engine over the same warehouse
    eng.create_view(
        "tpch",
        "big_orders",
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100000",
    )
    n_big = eng.sql("SELECT count(*) AS c FROM big_orders").first().c
    assert n_big == src.filter(F.col("o_totalprice") > 100000).count()
    eng2 = PixelsSparkEngine(spark, str(tmp_path / "wh"))
    assert eng2.meta.get_views("tpch") == ["big_orders"]
    spark.catalog.dropTempView("big_orders")
    eng2.sql_register("tpch")  # replays the cataloged view
    assert eng2.sql("SELECT count(*) AS c FROM big_orders").first().c == n_big
    eng2.drop_view("tpch", "big_orders")
    assert eng2.meta.get_views("tpch") == []

    # MVCC table sharing the engine's transaction domain
    mv = eng.mvcc_table("orders_live", key_col="o_orderkey")
    t1 = mv.insert(src.limit(10))
    mv.delete([src.first().o_orderkey])
    assert mv.read(t1).count() == 10
    assert mv.read().count() == 9
    # same ts oracle as the engine
    assert eng.trans.high_watermark >= t1


def test_view_on_view_registers_regardless_of_catalog_order(spark, sf_dir, tmp_path):
    """A view referencing another view must register even when the catalog
    iterates the dependent first (sql_register retries to a fixpoint)."""
    import pytest

    eng = PixelsSparkEngine(spark, str(tmp_path / "wh2"))
    eng.import_table("tpch", "orders", f"{sf_dir}/orders.parquet")
    eng.sql_register("tpch")
    # catalog order: the DEPENDENT view first ("a_top" sorts/inserts before
    # its base "z_base"), so a single-pass registration would fail
    eng.meta.create_view("tpch", "a_top",
                         "SELECT max(tp) AS mx FROM z_base")
    eng.meta.create_view("tpch", "z_base",
                         "SELECT o_totalprice AS tp FROM orders")
    assert eng.meta.get_views("tpch") == ["a_top", "z_base"]
    for v in ("a_top", "z_base"):
        spark.catalog.dropTempView(v)
    eng.sql_register("tpch")
    assert eng.sql("SELECT mx FROM a_top").count() == 1

    # a view with a truly unresolvable reference surfaces its own error
    eng.meta.create_view("tpch", "broken", "SELECT * FROM no_such_table")
    with pytest.raises(Exception, match="no_such_table|TABLE_OR_VIEW_NOT_FOUND"):
        eng.sql_register("tpch")

    # when SEVERAL views are unresolvable, the error names every one of
    # them (not just whichever failed last in catalog order)
    eng.meta.create_view("tpch", "broken2", "SELECT * FROM also_missing")
    with pytest.raises(RuntimeError, match="broken") as ei:
        eng.sql_register("tpch")
    assert "broken2" in str(ei.value) and "'broken'" in str(ei.value)
    eng.meta.drop_view("tpch", "broken")
    eng.meta.drop_view("tpch", "broken2")


def test_engine_exposes_round5_subsystems(spark, tmp_path):
    from pixels_spark.engine import PixelsSparkEngine

    eng = PixelsSparkEngine(spark, str(tmp_path / "wh"))
    t = eng.mvcc_table("facts", key_col="k")
    t.insert(spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], ["k", "g", "v"]))
    mv = eng.materialized_rollup("facts_by_g", t, ["g"], ["v"])
    mv.full_refresh()
    assert mv.read().count() == 2
    idx = eng.secondary_index(t, "g")
    idx.build()
    assert [r["k"] for r in idx.lookup("b").collect()] == [2]
    reg = eng.dedup_registry("corpus")
    kept = reg.add_batch_exact(
        spark.createDataFrame([(1, "x"), (2, "x")], ["doc_id", "text"])
    )
    assert kept.count() == 1
