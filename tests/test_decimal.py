"""DECIMAL stored surface: physical storage, Int128 reality, and the
cross-engine cast/arithmetic semantics the decimalq oracles rely on.

Reference parity: Pixels stores short decimal in 64 bits and long decimal
in Int128 (DecimalColumnVector / LongDecimalColumnVector,
proto/pixels.proto:167-173); here the same split is parquet DECIMAL
annotation over int64 vs fixed-len bytes, and Spark's Decimal128 agg state.
"""

from __future__ import annotations

import decimal
import os

import duckdb
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from pixels_spark.queries.decimalq import load_money, money_path


def test_money_table_is_physically_decimal(spark, sf_dir):
    """The stored table's parquet FOOTER carries the decimal annotation —
    the type survives storage, it is not re-cast at read time."""
    path = money_path(spark, sf_dir)
    piece = next(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    schema = pq.read_schema(piece)
    assert str(schema.field("m_price").type) == "decimal128(15, 2)"
    assert str(schema.field("m_fine").type) == "decimal128(38, 10)"
    # and Spark reads them back as DecimalType from the footer alone
    df = load_money(spark, sf_dir)
    assert df.schema["m_price"].dataType == DecimalType(15, 2)
    assert df.schema["m_fine"].dataType == DecimalType(38, 10)


def test_money_build_is_cached(spark, sf_dir):
    p1 = money_path(spark, sf_dir)
    marker = os.path.join(os.path.dirname(p1), "_BUILT")
    mtime = os.path.getmtime(marker)
    p2 = money_path(spark, sf_dir)
    assert p1 == p2
    assert os.path.getmtime(marker) == mtime  # no rebuild


def test_long_decimal_values_exceed_64bit_unscaled(spark, sf_dir):
    """EVERY m_fine value's unscaled form exceeds 64 bits (orderkey·10^10
    at scale 10 ⇒ unscaled ≥ 10^20) — each row individually needs
    Int128-class storage, not just the aggregate."""
    row = (
        load_money(spark, sf_dir)
        .agg(
            F.min("m_fine").alias("lo"),
            F.sum("m_fine").cast("decimal(38,10)").alias("t"),
        )
        .collect()[0]
    )
    assert isinstance(row["t"], decimal.Decimal)
    assert int(row["lo"].scaleb(10)) > 2**63 - 1  # even the smallest value
    assert int(row["t"].scaleb(10)) > 2**63 - 1


@pytest.mark.parametrize(
    "expr_spark, expr_duck",
    [
        # double → decimal cast (the derivation itself)
        (
            lambda c: c.cast("decimal(15,2)"),
            "CAST(l_extendedprice AS DECIMAL(15,2))",
        ),
        # exact multiply, scale 2+2
        (
            lambda c: (c.cast("decimal(15,2)") * c.cast("decimal(15,2)")).cast(
                "decimal(38,4)"
            ),
            "CAST(CAST(l_extendedprice AS DECIMAL(15,2))"
            " * CAST(l_extendedprice AS DECIMAL(15,2)) AS DECIMAL(38,4))",
        ),
    ],
)
def test_cast_semantics_pinned_vs_duckdb(spark, sf_dir, expr_spark, expr_duck):
    """Every (value, engine) pair produces the identical decimal string —
    the property all decimalq oracles depend on. Fixture doubles derive
    from 2-dp values, so no row sits on a rounding tie."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = {
        (r[0], r[1]): str(r[2])
        for r in li.select(
            "l_orderkey", "l_linenumber", expr_spark(F.col("l_extendedprice"))
        ).collect()
    }
    con = duckdb.connect()
    d = {
        (r[0], r[1]): str(r[2])
        for r in con.execute(
            f"SELECT l_orderkey, l_linenumber, {expr_duck} "
            f"FROM read_parquet('{sf_dir}/lineitem.parquet')"
        ).fetchall()
    }
    con.close()
    assert s == d


def test_decimal_division_diverges_hence_double_avgs(spark, sf_dir):
    """Documents WHY averages are DOUBLE in decimalq: DuckDB's decimal/int
    division returns DOUBLE while Spark returns DECIMAL(38,x) — there is
    no shared decimal division semantics to pin."""
    con = duckdb.connect()
    (t,) = con.execute(
        "SELECT typeof(CAST(1 AS DECIMAL(15,2)) / 3)"
    ).fetchone()
    con.close()
    assert t == "DOUBLE"
    sdf = spark.range(1).select(
        (F.lit(1).cast("decimal(15,2)") / F.lit(3)).alias("x")
    )
    assert sdf.schema["x"].dataType.typeName() == "decimal"
