"""Local replica of the driver's DuckDB-oracle comparison (t2).

Runs a declared Spark query and its oracle SQL side-by-side and compares:
row count, sorted column names, and an order-insensitive canonical value
form (floats rounded to 9 significant digits, timestamps at µs precision —
FIXTURES.md §Oracle-comparison). Used by tests at sf0.001/sf0.01 so
mismatches surface before the driver runs.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

from pixels_spark.catalog import TABLES, table_path

_SIG_DIGITS = 9


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.{_SIG_DIGITS}g}"
    if isinstance(v, datetime):
        # compare at µs precision (fixture ns vs Spark µs)
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def _canon_rows(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[str]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    canon = sorted("|".join(_canon_value(r[i]) for i in order) for r in rows)
    return cols, canon


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        # engine-written (staged / scaled) fixtures are parquet DIRECTORIES
        # of part files; driver fixtures are single files — glob for dirs
        if os.path.isdir(p):
            p = os.path.join(p, "*.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
    return con


# canonical type buckets for cross-engine schema comparison
_SPARK_CANON = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
    "string": "string",
    "boolean": "bool",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "date": "date",
}
_DUCK_CANON = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "HUGEINT": "int",
    "FLOAT": "float",
    "DOUBLE": "float",
    "VARCHAR": "string",
    "BOOLEAN": "bool",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP_NS": "timestamp",
    "DATE": "date",
}


def _spark_canon_types(sdf) -> dict[str, str]:
    # decimal(p,s) falls through both canon dicts; compare it precision-exact
    # but case-insensitive (Spark prints lowercase, DuckDB uppercase)
    return {
        name: _SPARK_CANON.get(dt.split("(")[0], dt.lower())
        for name, dt in sdf.dtypes
    }


def compare(spark, sf_dir: str, fn, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    sdf = fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    try:
        rel = con.sql(sql)
        d_cols = list(rel.columns)
        d_types = {
            c: _DUCK_CANON.get(str(t), str(t).lower())
            for c, t in zip(rel.columns, rel.types)
        }
        d_rows = rel.fetchall()
    finally:
        con.close()

    problems: list[str] = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    s_types = _spark_canon_types(sdf)
    type_diffs = {
        c: (s_types[c], d_types[c])
        for c in s_cols
        if s_types.get(c) != d_types.get(c)
    }
    if type_diffs:
        problems.append(f"dtypes differ: {type_diffs}")
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    sc, s_canon = _canon_rows(s_cols, s_rows)
    dc, d_canon = _canon_rows(d_cols, d_rows)
    if s_canon != d_canon:
        diff_s = [r for r in s_canon if r not in set(d_canon)][:5]
        diff_d = [r for r in d_canon if r not in set(s_canon)][:5]
        problems.append(
            f"values differ (cols {sc}); spark-only={diff_s} duckdb-only={diff_d}"
        )
    return problems
