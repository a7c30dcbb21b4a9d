"""Property-style randomized funnel testing against DuckDB.

The round-6 funnel rewrites (single-scan stacked-window cascades in
queries/funnelq.py) claim equivalence to their 3-subquery / EXISTS-chain
oracles; the equivalence proof leans on strict-inequality tie handling
(the range frame's ``-1`` upper bound excludes same-microsecond rows
exactly like the oracles' strict ``<``). Hypothesis generates small event
sets with HEAVY timestamp collisions — same user, multiple types at one
instant — and the Spark plans must match DuckDB row-for-row.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pixels_spark.queries import load_all_modules

BASE = dt.datetime(2024, 1, 1)
REG = load_all_modules()

# (user 0-2, ts offset seconds 0-50 — small range forces ties, type 0-2)
events = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 3)),
    min_size=0,
    max_size=30,
)

_TYPES = ["signup", "click", "purchase", "view"]


def _frame(rows):
    return pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [BASE + dt.timedelta(seconds=o) for _u, o, _t in rows],
            "user_id": [u for u, _o, _t in rows],
            "event_type": [_TYPES[t] for _u, _o, t in rows],
            "value": [float(i) for i in range(len(rows))],
            "props": ["{}"] * len(rows),
        }
    )


def _oracle(sql: str, pdf: pd.DataFrame):
    con = duckdb.connect()
    try:
        con.register("events", pdf)
        rel = con.sql(sql)
        cols = list(rel.columns)
        return sorted(
            tuple(str(v) for v in row) for row in rel.fetchall()
        ), sorted(cols)
    finally:
        con.close()


def _spark_rows(spark, fn, pdf, tmp_path, tag):
    # the declared fns read parquet from a dir with events.parquet
    sf = tmp_path / f"sf_{tag}"
    sf.mkdir(exist_ok=True)
    _typed(spark, pdf).write.mode("overwrite").parquet(
        str(sf / "events.parquet")
    )
    df = fn(spark, str(sf))
    order = sorted(df.columns)
    return sorted(
        tuple(str(r[c]) for c in order) for r in df.collect()
    ), order


def _typed(spark, pdf):
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    return spark.createDataFrame(pdf, schema)


def _canon_oracle(rows, cols, target_cols):
    # reorder oracle tuples into sorted-column order to match spark side
    idx = [cols.index(c) for c in sorted(cols)]
    return sorted(tuple(r[i] for i in idx) for r in rows), sorted(cols)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events)
def test_funnel_matches_oracle_under_ties(spark, tmp_path, rows):
    q = REG["funnel_signup_click_purchase"]
    pdf = _frame(rows)
    got, gcols = _spark_rows(spark, q.fn, pdf, tmp_path, "f")
    con = duckdb.connect()
    try:
        con.register("events", pdf)
        rel = con.sql(q.sql)
        ocols = list(rel.columns)
        orows = rel.fetchall()
    finally:
        con.close()
    want, wcols = _canon_oracle(
        [tuple(str(v) for v in r) for r in orows], ocols, gcols
    )
    assert gcols == wcols
    assert got == want


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=events)
def test_window_funnel_matches_oracle_under_ties(spark, tmp_path, rows):
    q = REG["cb_window_funnel"]
    pdf = _frame(rows)
    got, gcols = _spark_rows(spark, q.fn, pdf, tmp_path, "wf")
    con = duckdb.connect()
    try:
        con.register("events", pdf)
        rel = con.sql(q.sql)
        ocols = list(rel.columns)
        orows = rel.fetchall()
    finally:
        con.close()
    want, wcols = _canon_oracle(
        [tuple(str(v) for v in r) for r in orows], ocols, gcols
    )
    assert gcols == wcols
    assert got == want
