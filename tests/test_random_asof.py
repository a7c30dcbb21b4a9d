"""Property-style randomized as-of join testing against DuckDB's native
ASOF JOIN (operators/temporal.asof_join).

Hypothesis generates small random trade/quote tables (shared and disjoint
keys, duplicate left timestamps, exact ts ties between sides, empty
sides) plus direction and how; the union+window implementation must match
DuckDB row-for-row. Right-side (key, ts) pairs are kept unique so the
match is well-defined in both engines.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pixels_spark.operators.temporal import asof_join

BASE = dt.datetime(2024, 1, 1)


def _ts(offset_s: int) -> dt.datetime:
    return BASE + dt.timedelta(seconds=offset_s)


rows_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100)),  # (key, ts offset)
    min_size=0,
    max_size=25,
)
rows_right = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 100), st.integers(-50, 50)),
    min_size=0,
    max_size=25,
    unique_by=lambda r: (r[0], r[1]),  # unique (key, ts) -> unique match
)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=rows_left,
    right=rows_right,
    direction=st.sampled_from(["backward", "forward"]),
    how=st.sampled_from(["left", "inner"]),
)
def test_asof_matches_duckdb(spark, left, right, direction, how):
    l_rows = [(i, k, _ts(o)) for i, (k, o) in enumerate(left)]
    r_rows = [(k, _ts(o), float(px)) for k, o, px in right]
    ldf = spark.createDataFrame(
        l_rows or [], "lid long, k long, lts timestamp"
    )
    rdf = spark.createDataFrame(
        r_rows or [], "k long, rts timestamp, px double"
    )
    got = sorted(
        (r["lid"], r["r_px"])
        for r in asof_join(
            ldf, rdf, by=["k"], left_ts="lts", right_ts="rts",
            direction=direction, how=how,
        ).collect()
    )

    con = duckdb.connect()
    lpd = pd.DataFrame(l_rows, columns=["lid", "k", "lts"]).astype(
        {"lid": "int64", "k": "int64", "lts": "datetime64[us]"}
    )
    rpd = pd.DataFrame(r_rows, columns=["k", "rts", "px"]).astype(
        {"k": "int64", "rts": "datetime64[us]", "px": "float64"}
    )
    con.register("l", lpd)
    con.register("r", rpd)
    op = ">=" if direction == "backward" else "<="
    join_kw = "ASOF LEFT JOIN" if how == "left" else "ASOF JOIN"
    want = sorted(
        (lid, px)
        for lid, px in con.execute(
            f"SELECT l.lid, r.px FROM l {join_kw} r"
            f" ON l.k = r.k AND l.lts {op} r.rts"
        ).fetchall()
    )
    con.close()
    assert got == want
