"""DML router: grammar coverage, loud errors, transactional equivalence."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from pixels_spark.mvcc.table import MvccTable
from pixels_spark.sql import _split_top_level, dml


@pytest.fixture()
def table(spark, tmp_path):
    return MvccTable(spark, str(tmp_path / "tbl"), key_col="event_id")


def test_split_top_level_respects_parens_and_quotes():
    assert _split_top_level("a = greatest(x, y), b = 'v,w', c=1") == [
        "a = greatest(x, y)",
        "b = 'v,w'",
        "c=1",
    ]


def test_dml_insert_update_delete_roundtrip(spark, sf_dir, table):
    t = {"t": table}
    dml(spark, sf_dir, t,
        "INSERT INTO t SELECT event_id, event_type, value FROM events "
        "WHERE event_id < 40")
    n0 = table.read_latest_version().count()
    assert n0 == 40
    dml(spark, sf_dir, t, "UPDATE t SET value = value + 100 WHERE event_id < 10")
    snap = table.read_latest_version()
    assert snap.filter((F.col("event_id") < 10) & (F.col("value") < 100)).count() == 0
    assert snap.count() == n0  # update rewrites, never grows
    dml(spark, sf_dir, t, "DELETE FROM t WHERE event_id >= 30")
    assert table.read_latest_version().count() == 30


def test_dml_update_without_where_touches_every_row(spark, sf_dir, table):
    t = {"t": table}
    dml(spark, sf_dir, t,
        "INSERT INTO t SELECT event_id, value FROM events WHERE event_id < 5")
    dml(spark, sf_dir, t, "UPDATE t SET value = 0")
    vals = {r["value"] for r in table.read_latest_version().collect()}
    assert vals == {0.0}


def test_dml_errors_are_loud(spark, sf_dir, table):
    t = {"t": table}
    with pytest.raises(ValueError, match="never been written"):
        dml(spark, sf_dir, t, "DELETE FROM t WHERE event_id = 1")
    with pytest.raises(ValueError, match="MvccTable.merge"):
        dml(spark, sf_dir, t, "MERGE INTO t USING s ON t.k = s.k")
    with pytest.raises(ValueError, match="unsupported DML"):
        dml(spark, sf_dir, t, "TRUNCATE TABLE t")
    dml(spark, sf_dir, t,
        "INSERT INTO t SELECT event_id, value FROM events WHERE event_id < 3")
    with pytest.raises(ValueError, match="unknown column"):
        dml(spark, sf_dir, t, "UPDATE t SET nope = 1")
    with pytest.raises(KeyError):
        dml(spark, sf_dir, t, "DELETE FROM other WHERE 1=1")


def test_dml_statements_see_other_mvcc_tables(spark, sf_dir, tmp_path):
    """An INSERT's SELECT can read another MVCC table's current snapshot."""
    a = MvccTable(spark, str(tmp_path / "a"), key_col="event_id")
    b = MvccTable(spark, str(tmp_path / "b"), key_col="event_id")
    t = {"a": a, "b": b}
    dml(spark, sf_dir, t,
        "INSERT INTO a SELECT event_id, value FROM events WHERE event_id < 8")
    dml(spark, sf_dir, t, "INSERT INTO b SELECT event_id, value FROM a")
    assert b.read_latest_version().count() == 8


def test_query_at_time_travel(spark, sf_dir, tmp_path):
    """FOR TIMESTAMP AS OF resolves each MVCC table to its snapshot at
    the given commit ts; un-suffixed names resolve to the current
    snapshot; both spellings work; unknown tables raise KeyError."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from pixels_spark.mvcc.table import MvccTable
    from pixels_spark.sql import query_at

    t = MvccTable(spark, str(tmp_path / "t"), key_col="k")
    ts1 = t.insert(
        spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    )
    t.update(
        t.read_latest_version()
        .filter(F.col("k") < 3)
        .drop("_commit_ts")
        .withColumn("v", F.col("v") + 1000)
    )
    # AS-OF side sees v1; bare name sees current
    rows = query_at(
        spark,
        sf_dir,
        {"t": t},
        f"""SELECT a.k, a.v AS v1, b.v AS v2
            FROM t FOR TIMESTAMP AS OF {ts1} AS a
            JOIN t AS b ON a.k = b.k ORDER BY a.k""",
    ).collect()
    assert len(rows) == 10
    assert all(r.v1 == r.k * 2 for r in rows)
    assert all(r.v2 == (r.k * 2 + 1000 if r.k < 3 else r.k * 2) for r in rows)
    # SQL:2011 spelling
    n = query_at(
        spark, sf_dir, {"t": t},
        f"SELECT count(*) AS n FROM t FOR SYSTEM_TIME AS OF {ts1}",
    ).first()["n"]
    assert n == 10
    # composes with fixture views
    j = query_at(
        spark, sf_dir, {"t": t},
        f"""SELECT count(*) AS n FROM t FOR TIMESTAMP AS OF {ts1} s
            JOIN region r ON s.k = r.r_regionkey""",
    ).first()["n"]
    assert j == 5
    with _pt.raises(KeyError):
        query_at(spark, sf_dir, {"t": t},
                 f"SELECT * FROM nope FOR TIMESTAMP AS OF {ts1}")
    # unsupported spellings (date literals) fail with a CLEAR error
    # instead of leaking a half-rewritten query into Spark's parser
    with _pt.raises(ValueError, match="INTEGER commit"):
        query_at(spark, sf_dir, {"t": t},
                 "SELECT * FROM t FOR TIMESTAMP AS OF DATE '2024-01-01'")
