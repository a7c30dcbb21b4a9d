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
    bucket=st.sampled_from([None, 3_000_000, 45_000_000]),
)
def test_asof_matches_duckdb(spark, left, right, direction, how, bucket):
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
            direction=direction, how=how, skew_bucket_us=bucket,
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


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=rows_left,
    right=rows_right,
    how=st.sampled_from(["left", "inner"]),
    tol=st.sampled_from([None, 10_000_000]),
)
def test_asof_nearest_matches_duckdb_composition(spark, left, right, how, tol):
    """The one-pass nearest kernel vs the same backward+forward ASOF
    composition the declared asof_nearest oracle uses (ties → backward,
    tolerance nulls both sides past the gap). Right (key, ts) stays
    unique so the match is well-defined in both engines."""
    l_rows = [(i, k, _ts(o)) for i, (k, o) in enumerate(left)]
    r_rows = [(k, _ts(o), float(px)) for k, o, px in right]
    ldf = spark.createDataFrame(
        l_rows or [], "lid long, k long, lts timestamp"
    )
    rdf = spark.createDataFrame(
        r_rows or [], "k long, rts timestamp, px double"
    )
    from pyspark.sql import functions as F

    kw = {} if tol is None else {"tolerance": F.lit(tol)}
    got = sorted(
        (r["lid"], r["r_px"])
        for r in asof_join(
            ldf, rdf, by=["k"], left_ts="lts", right_ts="rts",
            direction="nearest", how=how, **kw,
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
    tol_b = (
        "TRUE"
        if tol is None
        else f"epoch_us(lts) - epoch_us(rts) <= {tol}"
    )
    tol_f = (
        "TRUE"
        if tol is None
        else f"epoch_us(rts) - epoch_us(lts) <= {tol}"
    )
    sql = f"""
    WITH b0 AS (SELECT l.lid, l.lts, rb.rts, rb.px
                FROM l ASOF LEFT JOIN r rb
                  ON l.k = rb.k AND l.lts >= rb.rts),
    f0 AS (SELECT l.lid, l.lts, rf.rts, rf.px
           FROM l ASOF LEFT JOIN r rf
             ON l.k = rf.k AND l.lts <= rf.rts),
    b AS (SELECT lid, lts,
                 CASE WHEN rts IS NOT NULL AND {tol_b} THEN rts END AS rts,
                 CASE WHEN rts IS NOT NULL AND {tol_b} THEN px END AS px
          FROM b0),
    f AS (SELECT lid, lts,
                 CASE WHEN rts IS NOT NULL AND {tol_f} THEN rts END AS rts,
                 CASE WHEN rts IS NOT NULL AND {tol_f} THEN px END AS px
          FROM f0)
    SELECT b.lid,
           CASE WHEN f.rts IS NULL
                     OR (b.rts IS NOT NULL
                         AND epoch_us(b.lts) - epoch_us(b.rts)
                             <= epoch_us(f.rts) - epoch_us(b.lts))
                THEN b.px ELSE f.px END AS px
    FROM b JOIN f USING (lid)
    """
    want_rows = con.execute(sql).fetchall()
    con.close()
    want = sorted((lid, px) for lid, px in want_rows)
    if how == "inner":
        want = [(lid, px) for lid, px in want if px is not None]
    assert got == want


rows_points = st.lists(
    st.tuples(st.integers(0, 2), st.integers(-20, 120)),  # (key, point)
    min_size=0, max_size=20,
)
rows_intervals = st.lists(
    st.tuples(st.integers(0, 3), st.integers(-20, 100), st.integers(0, 40)),
    min_size=0, max_size=12,  # (key, lo, span)
)


@settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=rows_points,
    intervals=rows_intervals,
    closed=st.sampled_from(["both", "left", "right", "neither"]),
    width=st.sampled_from([7, 16, 64]),
    keyed=st.booleans(),
)
def test_range_join_matches_duckdb(spark, points, intervals, closed, width, keyed):
    from pixels_spark.operators.temporal import range_join

    p_rows = [(i, k, float(x)) for i, (k, x) in enumerate(points)]
    iv_rows = [(j, k, float(lo), float(lo + span)) for j, (k, lo, span) in enumerate(intervals)]
    pdf_ = spark.createDataFrame(p_rows or [], "pid long, k long, x double")
    ivdf = spark.createDataFrame(iv_rows or [], "iid long, k long, lo double, hi double")
    on = ["k"] if keyed else []
    if not keyed:
        pdf_ = pdf_.drop("k")
        ivdf = ivdf.drop("k")
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            pdf_, ivdf, "x", "lo", "hi", bucket_width=width, on=on, closed=closed
        ).collect()
    )

    lo_op = ">=" if closed in ("both", "left") else ">"
    hi_op = "<=" if closed in ("both", "right") else "<"
    key_cond = " AND p.k = iv.k" if keyed else ""
    con = duckdb.connect()
    con.register("p", pd.DataFrame(p_rows, columns=["pid", "k", "x"]).astype(
        {"pid": "int64", "k": "int64", "x": "float64"}))
    con.register("iv", pd.DataFrame(iv_rows, columns=["iid", "k", "lo", "hi"]).astype(
        {"iid": "int64", "k": "int64", "lo": "float64", "hi": "float64"}))
    want = sorted(
        (pid, iid)
        for pid, iid in con.execute(
            f"SELECT p.pid, iv.iid FROM p JOIN iv"
            f" ON p.x {lo_op} iv.lo AND p.x {hi_op} iv.hi{key_cond}"
        ).fetchall()
    )
    con.close()
    assert got == want
