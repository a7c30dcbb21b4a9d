"""Property-style randomized equi-join testing against DuckDB.

Complements test_random_predicates: hypothesis picks a join type, optional
side filters, and key column; counts and key checksums must match DuckDB's
answer for the equivalent SQL join.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pixels_spark.catalog import load_table, table_path
from pixels_spark.operators import JoinType, equi_join

JOIN_SQL = {
    JoinType.EQUI_INNER: "JOIN",
    JoinType.EQUI_LEFT: "LEFT JOIN",
    JoinType.EQUI_RIGHT: "RIGHT JOIN",
    JoinType.EQUI_FULL: "FULL JOIN",
    JoinType.SEMI: "SEMI JOIN",
    JoinType.ANTI: "ANTI JOIN",
}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    yield con
    con.close()


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    how=st.sampled_from(sorted(JOIN_SQL, key=lambda j: j.value)),
    bal=st.floats(0, 1000, allow_nan=False),
    price=st.floats(1000, 500000, allow_nan=False),
)
def test_random_joins_match_duckdb(spark, duck, sf_dir, how, bal, price):
    bal, price = round(bal, 2), round(price, 2)
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > bal)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > price)
    joined = equi_join(
        c, o.withColumnRenamed("o_custkey", "c_custkey"), ["c_custkey"], how
    )
    n_spark = joined.count()
    n_duck = duck.execute(
        f"""SELECT count(*) FROM
            (SELECT * FROM customer WHERE c_acctbal > {bal}) c
            {JOIN_SQL[how]}
            (SELECT * FROM orders WHERE o_totalprice > {price}) o
            ON c.c_custkey = o.o_custkey"""
    ).fetchone()[0]
    assert n_spark == n_duck, f"{how} bal>{bal} price>{price}"


def test_fuzzy_join_same_column_name(spark):
    """The usual ER shape — both sides call the column 'name' — must not
    hit an ambiguous-reference error."""
    from pixels_spark.operators.joins import fuzzy_join

    left = spark.createDataFrame([(1, "jon smith")], ["id", "name"])
    right = spark.createDataFrame(
        [(10, "john smith"), (11, "totally different")], ["rid", "name"]
    )
    out = fuzzy_join(left, right, "name", "name", max_dist=2).collect()
    assert len(out) == 1 and out[0]["rid"] == 10 and out[0]["_dist"] == 1


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 2**31 - 1),
    max_dist=st.integers(1, 3),
)
def test_fuzzy_join_matches_brute_force(spark, seed, max_dist):
    """Length blocking must be LOSSLESS: fuzzy_join == the unblocked
    cross-join filtered by levenshtein, on random short strings."""
    import random

    from pixels_spark.operators.joins import fuzzy_join

    rng = random.Random(seed)
    alphabet = "abc"
    mk = lambda: "".join(  # noqa: E731
        rng.choice(alphabet) for _ in range(rng.randint(0, 6))
    )
    left = spark.createDataFrame(
        [(i, mk()) for i in range(12)], ["lid", "s"]
    )
    right = spark.createDataFrame(
        [(100 + i, mk()) for i in range(12)], ["rid", "t"]
    )
    got = {
        (r["lid"], r["rid"], r["_dist"])
        for r in fuzzy_join(left, right, "s", "t", max_dist=max_dist).collect()
    }
    brute = {
        (r["lid"], r["rid"], r["d"])
        for r in left.crossJoin(right)
        .withColumn("d", F.levenshtein(F.col("s"), F.col("t")))
        .filter(F.col("d") <= max_dist)
        .collect()
    }
    assert got == brute
