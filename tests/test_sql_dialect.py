"""Dialect-shared SQL: the TPC-H oracle texts run verbatim on spark.sql.

The oracle SQL strings for the TPC-H analogs are written in the shared
ANSI subset (standard joins/subqueries/CASE/BETWEEN/TIMESTAMP literals/
DECIMAL casts), so the same text must execute on the engine's own SQL
frontend (`pixels_spark.sql`) and produce exactly what the DataFrame
implementation produces. This is the "full SQL surface" parity claim made
concrete: a reference user's SQL runs unchanged.

(Queries whose oracles use DuckDB-specific functions — list_*, string_
split_regex, json_extract_string, time_bucket, quantile_cont, unnest — are
out of scope here by construction; they're covered by their DataFrame
implementations + DuckDB oracle.)
"""

from __future__ import annotations

import pytest

from pixels_spark.queries import load_all_modules
from pixels_spark.sql import sql as run_sql

REGISTRY = load_all_modules()
TPCH = sorted(n for n in REGISTRY if n.startswith("tpch_"))


def _canon(df):
    cols = sorted(df.columns)
    rows = sorted(
        tuple(str(r[c]) for c in cols) for r in df.collect()
    )
    return cols, rows


@pytest.mark.parametrize("name", TPCH)
def test_tpch_oracle_sql_runs_on_spark_sql(spark, sf_dir, name):
    q = REGISTRY[name]
    via_sql = run_sql(spark, sf_dir, q.sql)
    via_df = q.fn(spark, sf_dir)
    sc, sr = _canon(via_sql)
    dc, dr = _canon(via_df)
    assert sc == dc, f"{name}: column mismatch {sc} vs {dc}"
    if sr != dr:
        first = next(((a, b) for a, b in zip(sr, dr) if a != b), ("<len>", "<len>"))
        pytest.fail(f"{name}: value mismatch, first diff: {first}")
