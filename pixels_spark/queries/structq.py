"""STRUCT as a stored, queried type — the ev_struct table.

The reference defines STRUCT as a first-class category with named children
(``pixels-core/.../TypeDescription.java:170-183``; SURVEY.md §1.2 maps it
to Spark ``StructType``). Until round 5 the repo's structs were internal
plumbing only; this gives them a stored surface: ``events.props`` (JSON
text) plus typed event columns are materialized into a parquet table with
a TWO-LEVEL struct column

    meta STRUCT<k: BIGINT, etype: STRING,
                val: STRUCT<raw: DOUBLE, cents: BIGINT>>

(storage/derived.py build-once cache), and declared queries aggregate and
filter THROUGH the nested fields. Outputs are leaf scalars — engines
disagree on whole-struct rendering, so structs are traversed, not emitted.

Cross-engine determinism: ``cents = floor(value·100)`` — floor over the
identically-computed double is bit-deterministic in both engines, unlike
round(), which splits on half-even vs half-up at exact .5 doubles.

Scale notes (the point of structs at 100 TB): nested-field SCHEMA PRUNING
means a query touching only ``meta.k`` reads one leaf column off disk, not
the whole struct subtree — asserted on the physical plan's ReadSchema in
tests/test_struct.py, exactly the column-pruning story the reference runs
per-child for STRUCT columns. Nested predicate pushdown
(``spark.sql.optimizer.nestedPredicatePushdown``) sends ``meta.val.cents``
filters to the parquet reader the same way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, table_path
from ..storage.derived import ensure_derived
from .registry import declare

# the derivation, restated in the oracle from raw events (DuckDB reads the
# same fixture; our stored table must agree with this by construction)
_EV_ORACLE_CTE = """
WITH ev AS (
  SELECT event_id,
         CAST(ts AS TIMESTAMP) AS ts,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         event_type AS etype,
         value AS raw,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events)
"""


def _build_ev_struct(spark: SparkSession, sf_dir: str, dest: str) -> None:
    e = load_table(spark, sf_dir, "events")
    nested = e.select(
        "event_id",
        "ts",
        F.struct(
            F.get_json_object(F.col("props"), "$.k").cast("bigint").alias("k"),
            F.col("event_type").alias("etype"),
            F.struct(
                F.col("value").alias("raw"),
                F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
            ).alias("val"),
        ).alias("meta"),
    )
    nested.repartition(8, "event_id").write.mode("overwrite").parquet(
        os.path.join(dest, "ev_struct.parquet")
    )


def ev_struct_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) and return the stored STRUCT-typed events table."""
    dest = ensure_derived(
        spark,
        sf_dir,
        name="ev_struct",
        source_paths=[table_path(sf_dir, "events")],
        build=lambda sp, tmp: _build_ev_struct(sp, sf_dir, tmp),
        params="v1",
    )
    return os.path.join(dest, "ev_struct.parquet")


def load_ev_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the STORED struct table — the nested shape comes from the
    parquet footer (parquet group type), not from a parse at read time."""
    return spark.read.parquet(ev_struct_path(spark, sf_dir))


@declare(
    "struct_field_rollup",
    sql=_EV_ORACLE_CTE
    + """
    SELECT etype,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(max(k) AS BIGINT) AS max_k
    FROM ev GROUP BY etype ORDER BY etype
    """,
    tags=("struct", "aggregation"),
)
def struct_field_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation THROUGH two struct levels: group on meta.etype, sum the
    inner meta.val.cents — the scan reads only the three touched leaves
    (nested schema pruning, plan-asserted in tests)."""
    s = load_ev_struct(spark, sf_dir)
    return (
        s.groupBy(F.col("meta.etype").alias("etype"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("meta.val.cents").cast("bigint").alias("sum_cents"),
            F.max("meta.k").cast("bigint").alias("max_k"),
        )
        .orderBy("etype")
    )


@declare(
    "struct_nested_filter",
    sql=_EV_ORACLE_CTE
    + """
    SELECT event_id, CAST(k AS BIGINT) AS k, raw
    FROM ev
    WHERE cents >= 9000 AND k BETWEEN 10 AND 60
    ORDER BY event_id
    """,
    tags=("struct", "filter"),
)
def struct_nested_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective predicate ON NESTED FIELDS (meta.val.cents, meta.k) —
    nested predicate pushdown carries both to the parquet reader; the
    projection keeps only two leaves of the struct."""
    s = load_ev_struct(spark, sf_dir)
    return (
        s.filter(
            (F.col("meta.val.cents") >= 9000) & F.col("meta.k").between(10, 60)
        )
        .select(
            "event_id",
            F.col("meta.k").cast("bigint").alias("k"),
            F.col("meta.val.raw").alias("raw"),
        )
        .orderBy("event_id")
    )


@declare(
    "struct_reassembled_json",
    sql=_EV_ORACLE_CTE
    + """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(count(DISTINCT k) AS BIGINT) AS distinct_k,
           CAST(min(cents) AS BIGINT) AS min_cents
    FROM ev
    WHERE etype IN ('click', 'view')
    GROUP BY day ORDER BY day
    """,
    tags=("struct", "aggregation", "time_series"),
)
def struct_reassembled_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct leaves joined with a top-level column (ts) in one plan:
    daily distinct-k over filtered etype — mixing nested and flat access
    paths in the same scan."""
    s = load_ev_struct(spark, sf_dir)
    return (
        s.filter(F.col("meta.etype").isin("click", "view"))
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count_distinct(F.col("meta.k")).alias("distinct_k"),
            F.min("meta.val.cents").cast("bigint").alias("min_cents"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# MAP as a stored, queried type — the ev_props_map table.
# The reference's MAP category carries (key, value) child types
# (TypeDescription MAP with two children; SURVEY §1.2 → Spark MapType).
# events.props is re-keyed into a stored MAP<STRING,STRING> column with
# three entries (k from the JSON, etype, a derived value band), written as
# a real parquet map group — reads get MapType from the footer. The oracle
# restates the derivation from raw events (DuckDB never parses the map
# parquet), the structq convention.
# ---------------------------------------------------------------------------

_PM_ORACLE_CTE = """
WITH pm AS (
  SELECT event_id,
         json_extract_string(props, '$.k') AS k_str,
         event_type AS etype,
         CAST(CAST(floor(value / 50) AS BIGINT) AS STRING) AS band
  FROM events)
"""


def _build_ev_props_map(spark: SparkSession, sf_dir: str, dest: str) -> None:
    e = load_table(spark, sf_dir, "events")
    mapped = e.select(
        "event_id",
        F.create_map(
            F.lit("k"), F.get_json_object(F.col("props"), "$.k"),
            F.lit("etype"), F.col("event_type"),
            F.lit("band"),
            F.floor(F.col("value") / 50).cast("bigint").cast("string"),
        ).alias("pm"),
    )
    mapped.repartition(8, "event_id").write.mode("overwrite").parquet(
        os.path.join(dest, "ev_props_map.parquet")
    )


def load_ev_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the STORED map table — MapType comes from the parquet footer's
    map logical type, not from a parse at read time."""
    dest = ensure_derived(
        spark,
        sf_dir,
        name="ev_props_map",
        source_paths=[table_path(sf_dir, "events")],
        build=lambda sp, tmp: _build_ev_props_map(sp, sf_dir, tmp),
        params="v1",
    )
    return spark.read.parquet(os.path.join(dest, "ev_props_map.parquet"))


@declare(
    "map_stored_lookup",
    sql=_PM_ORACLE_CTE
    + """
    SELECT event_id,
           CAST(k_str AS BIGINT) AS k,
           band,
           CAST(3 AS BIGINT) AS n_entries
    FROM pm
    WHERE event_id < 200
    ORDER BY event_id
    """,
    tags=("map", "scalar"),
)
def map_stored_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP element access on the stored map column: element_at by key +
    map cardinality, straight off the parquet map group."""
    m = load_ev_props_map(spark, sf_dir)
    return (
        m.filter(F.col("event_id") < 200)
        .select(
            "event_id",
            F.element_at("pm", F.lit("k")).cast("bigint").alias("k"),
            F.element_at("pm", F.lit("band")).alias("band"),
            F.size("pm").cast("bigint").alias("n_entries"),
        )
        .orderBy("event_id")
    )


@declare(
    "map_explode_rollup",
    sql=_PM_ORACLE_CTE
    + """
    SELECT key, val, CAST(count(*) AS BIGINT) AS cnt
    FROM (
      SELECT 'etype' AS key, etype AS val FROM pm
      UNION ALL
      SELECT 'band' AS key, band AS val FROM pm
    )
    GROUP BY key, val
    ORDER BY key, val
    """,
    tags=("map", "aggregation"),
)
def map_explode_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP entry explosion: explode(map) -> (key, value) rows, aggregated
    per entry (the JSON-ish 'count values per property' shape) — one
    map-side explode feeding a two-phase aggregate."""
    m = load_ev_props_map(spark, sf_dir)
    return (
        m.select(F.explode("pm").alias("key", "val"))
        .filter(F.col("key") != "k")
        .groupBy("key", "val")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("key", "val")
    )
