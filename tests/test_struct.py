"""STRUCT stored surface: physical nesting, nested-field schema pruning,
and nested predicate pushdown.

Reference parity: TypeDescription STRUCT with named children
(TypeDescription.java:170-183) prunes per-child at the reader; Spark's
analog is nestedSchemaPruning (ReadSchema keeps only touched leaves) and
nestedPredicatePushdown (filters on leaves reach the parquet scan).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType

from pixels_spark.queries.structq import ev_struct_path, load_ev_struct


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_ev_struct_is_physically_nested(spark, sf_dir):
    """The parquet FOOTER stores a two-level group type — the nesting
    survives storage, it is not re-parsed from JSON at read time."""
    path = ev_struct_path(spark, sf_dir)
    piece = next(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    t = pq.read_schema(piece).field("meta").type
    names = {t.field(i).name for i in range(t.num_fields)}
    assert names == {"k", "etype", "val"}
    inner = t.field(t.get_field_index("val")).type
    inner_names = {inner.field(i).name for i in range(inner.num_fields)}
    assert inner_names == {"raw", "cents"}
    # and Spark reads the nested shape back from the footer alone
    df = load_ev_struct(spark, sf_dir)
    meta = df.schema["meta"].dataType
    assert isinstance(meta, StructType)
    assert isinstance(meta["val"].dataType, StructType)
    assert meta["val"].dataType["cents"].dataType == LongType()


def test_nested_schema_pruning(spark, sf_dir):
    """A query touching only meta.k must scan a one-leaf struct: ReadSchema
    shows meta.k and neither val.raw nor val.cents nor etype."""
    s = load_ev_struct(spark, sf_dir)
    plan = _explain(s.select(F.col("meta.k")).groupBy().max("k"))
    read_schema = next(
        ln for ln in plan.splitlines() if "ReadSchema" in ln
    )
    assert "k:bigint" in read_schema
    for leaf in ("raw", "cents", "etype", "event_id", "ts"):
        assert leaf not in read_schema, f"{leaf} not pruned: {read_schema}"


def test_nested_predicate_pushdown(spark, sf_dir):
    """Filters on nested leaves reach the parquet scan as PushedFilters
    on the dotted column path."""
    s = load_ev_struct(spark, sf_dir)
    plan = _explain(
        s.filter(F.col("meta.val.cents") >= 9000).select("event_id")
    )
    pushed = next(ln for ln in plan.splitlines() if "PushedFilters" in ln)
    assert "meta.val.cents" in pushed, pushed


def test_struct_table_matches_json_source(spark, sf_dir):
    """Stored struct leaves must agree row-for-row with re-deriving from
    the raw events JSON (guards the build against drift)."""
    s = load_ev_struct(spark, sf_dir).select(
        "event_id", F.col("meta.k").alias("k"), F.col("meta.val.cents").alias("c")
    )
    e = (
        load_ev_struct.__globals__["load_table"](spark, sf_dir, "events")
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
            F.floor(F.col("value") * 100).cast("bigint").alias("c"),
        )
    )
    assert s.exceptAll(e).count() == 0 and e.exceptAll(s).count() == 0


def test_ev_props_map_is_physically_a_map(spark, sf_dir):
    """The stored map table's FOOTER carries a parquet map logical type —
    Spark reads MapType from storage, no parse at read time — and element
    access agrees with the raw-events derivation."""
    from pyspark.sql.types import MapType, StringType

    from pixels_spark.queries.structq import load_ev_props_map

    m = load_ev_props_map(spark, sf_dir)
    ftype = m.schema["pm"].dataType
    assert isinstance(ftype, MapType)
    assert isinstance(ftype.keyType, StringType)
    assert isinstance(ftype.valueType, StringType)
    got = dict(
        m.select("event_id", F.element_at("pm", F.lit("etype")).alias("e"))
        .filter(F.col("event_id") < 5).collect()
    )
    from pixels_spark.catalog import load_table
    want = dict(
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 5)
        .select("event_id", "event_type").collect()
    )
    assert got == want
