"""Property-style randomized predicate testing against DuckDB.

SURVEY.md §5: "property-style randomized predicates over lineitem compared
to DuckDB". Hypothesis generates random domain filters (ranges / IN lists /
null policies over mixed columns); each is compiled both to a Spark
ColumnFilter expression and to equivalent SQL, and row counts + key sums
must agree. Catches operator-translation bugs the fixed corpus misses
(boundary inclusivity, null handling, empty domains).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pixels_spark.catalog import table_path
from pixels_spark.operators import (
    Bound,
    BoundType,
    ColumnFilter,
    Range,
    TableScanFilter,
)

NUMERIC_COLS = {
    "l_quantity": (1.0, 50.0),
    "l_discount": (0.0, 0.1),
    "l_extendedprice": (900.0, 105000.0),
    "l_orderkey": (0, 6000),
}
STRING_COLS = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["O", "F"],
}


def _sql_literal(v):
    return repr(v) if isinstance(v, str) else str(v)


def _range_sql(col: str, r: Range) -> str:
    parts = []
    if r.lower.type == BoundType.INCLUDED:
        parts.append(f"{col} >= {_sql_literal(r.lower.value)}")
    elif r.lower.type == BoundType.EXCLUDED:
        parts.append(f"{col} > {_sql_literal(r.lower.value)}")
    if r.upper.type == BoundType.INCLUDED:
        parts.append(f"{col} <= {_sql_literal(r.upper.value)}")
    elif r.upper.type == BoundType.EXCLUDED:
        parts.append(f"{col} < {_sql_literal(r.upper.value)}")
    return "(" + " AND ".join(parts) + ")" if parts else "TRUE"


def _filter_sql(cf: ColumnFilter) -> str:
    col = cf.column
    disjuncts = [_range_sql(col, r) for r in cf.ranges]
    if cf.include_values:
        vals = ", ".join(_sql_literal(v) for v in cf.include_values)
        disjuncts.append(f"{col} IN ({vals})")
    body = "(" + " OR ".join(disjuncts) + ")" if disjuncts else "TRUE"
    clauses = [body, f"{col} IS NOT NULL"]
    return "(" + " AND ".join(clauses) + ")"


@st.composite
def numeric_filter(draw):
    col, (lo, hi) = draw(st.sampled_from(sorted(NUMERIC_COLS.items())))
    n_ranges = draw(st.integers(1, 3))
    ranges = []
    for _ in range(n_ranges):
        a = draw(st.floats(lo, hi, allow_nan=False))
        b = draw(st.floats(lo, hi, allow_nan=False))
        a, b = (a, b) if a <= b else (b, a)
        lb = draw(st.sampled_from([BoundType.INCLUDED, BoundType.EXCLUDED, BoundType.UNBOUNDED]))
        ub = draw(st.sampled_from([BoundType.INCLUDED, BoundType.EXCLUDED, BoundType.UNBOUNDED]))
        ranges.append(
            Range(
                Bound(lb, None if lb == BoundType.UNBOUNDED else round(a, 3)),
                Bound(ub, None if ub == BoundType.UNBOUNDED else round(b, 3)),
            )
        )
    return ColumnFilter(column=col, ranges=ranges)


@st.composite
def string_filter(draw):
    col, domain = draw(st.sampled_from(sorted(STRING_COLS.items())))
    vals = draw(st.lists(st.sampled_from(domain), min_size=1, max_size=len(domain), unique=True))
    return ColumnFilter(column=col, include_values=vals)


@st.composite
def scan_filter(draw):
    filters = draw(
        st.lists(st.one_of(numeric_filter(), string_filter()), min_size=1, max_size=3)
    )
    # one filter per column max (conjunctive model, like the reference)
    seen, uniq = set(), []
    for f in filters:
        if f.column not in seen:
            seen.add(f.column)
            uniq.append(f)
    return TableScanFilter(filters=uniq)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{table_path(sf_dir, 'lineitem')}')"
    )
    yield con
    con.close()


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    from pixels_spark.catalog import load_table

    return load_table(spark, sf_dir, "lineitem").cache()


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tsf=scan_filter())
def test_random_domain_filters_match_duckdb(spark, duck, lineitem, tsf):
    got = lineitem.filter(tsf.to_column())
    n_spark = got.count()
    where = " AND ".join(_filter_sql(f) for f in tsf.filters)
    n_duck, key_sum = duck.execute(
        f"SELECT count(*), coalesce(sum(l_orderkey), 0) FROM lineitem WHERE {where}"
    ).fetchone()
    assert n_spark == n_duck, f"count mismatch for {where}"
    if n_spark:
        s_sum = got.groupBy().sum("l_orderkey").first()[0]
        assert s_sum == key_sum, f"key-sum mismatch for {where}"
