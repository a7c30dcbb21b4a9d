"""DECIMAL as a stored, queried type — the money table.

The reference treats decimal as first-class storage: short decimal packs
into 64 bits, long decimal into Int128
(``pixels-core/.../vector/DecimalColumnVector.java``,
``LongDecimalColumnVector.java``; ``proto/pixels.proto:167-173``
Integer128Statistic), and SURVEY.md §1.2 maps Pixels DECIMAL(p,s) →
Spark ``DecimalType(p,s)``. Until round 5 the engine used DECIMAL only
*internally* (exact sum accumulation); this module gives it a stored
surface: a derived ``money`` table with DECIMAL(15,2) money columns (the
64-bit short-decimal shape) and one DECIMAL(38,10) column (the Int128
long-decimal shape), materialized once per fixture (storage/derived.py)
and queried through sum/min/max, multiplication, group-by-decimal-key and
decimal-equi-join declared queries — every output column decimal-typed.

Cross-engine exactness (pinned empirically, tests/test_decimal.py):
- double → DECIMAL(15,2) casts identically in Spark and DuckDB on the
  fixture values (2-dp-derived doubles are never at a rounding tie);
- decimal +, -, * are exact (result scale = s1+s2 ≤ 4 here, no rounding),
  so sums pinned to a common CAST(... AS DECIMAL(38,s)) match bit-for-bit;
- division diverges structurally (DuckDB decimal/int → DOUBLE, Spark →
  DECIMAL(38,15)), so averages are surfaced as DOUBLE on both sides.

Output-boundary contract (FIXTURES.md §Decimal-hashing): every FINAL
decimal column is surfaced as a STRING on both engines — the SQL text
says ``CAST(x AS STRING)``, which DuckDB aliases to VARCHAR and Spark SQL
accepts natively (bare ``VARCHAR`` is Spark-invalid, which matters since
these oracle texts are dialect-shared) — because the driver's
value hasher canonicalizes decimals asymmetrically — a value with
trailing fractional zeros (e.g. DECIMAL(38,4) ``1003322369.8990``)
hashes differently per engine even when bit-identical (diagnosed
VERDICT r5 §What's-wrong #1). Both engines render a decimal string at
full declared scale, so strings hash verbatim. All internal math stays
decimal; only the final select changes type.

Scale notes: the build is a one-off distributed write (like LOAD); queries
are single-pass scan + hash-agg on the stored table. Decimal group-by and
join keys hash-shuffle exactly like longs (Decimal128 state, Tungsten);
nothing here changes shape at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table, table_path
from ..storage.derived import ensure_derived
from .registry import declare

# One derivation, stated once for Spark (builder) and once for the oracle.
# m_fine = (orderkey+1)·10^10 + discount at scale 10 (+1: the fixture's min
# orderkey is 0): EVERY row's unscaled value
# is ≥ 10^20 > 2^63, so each value individually requires Int128 storage
# (≈ LongDecimalColumnVector), asserted in tests/test_decimal.py. The
# intermediate widths are pinned ((16,0)·(11,0)→(27,0), +(12,10)→(38,10))
# because DuckDB hard-errors past width 38 where Spark would silently cap.
_MONEY_ORACLE_CTE = """
WITH money AS (
  SELECT l_orderkey AS m_orderkey,
         l_linenumber AS m_linenumber,
         l_returnflag AS m_flag,
         CAST(l_quantity AS DECIMAL(15,2)) AS m_qty,
         CAST(l_extendedprice AS DECIMAL(15,2)) AS m_price,
         CAST(l_discount AS DECIMAL(15,2)) AS m_discount,
         CAST(l_tax AS DECIMAL(15,2)) AS m_tax,
         CAST(CAST(CAST(l_orderkey + 1 AS DECIMAL(16,0))
                   * CAST(10000000000 AS DECIMAL(11,0)) AS DECIMAL(27,0))
              + CAST(l_discount AS DECIMAL(12,10)) AS DECIMAL(38,10)) AS m_fine
  FROM lineitem)
"""


def _build_money(spark: SparkSession, sf_dir: str, dest: str) -> None:
    li = load_table(spark, sf_dir, "lineitem")
    money = li.select(
        F.col("l_orderkey").alias("m_orderkey"),
        F.col("l_linenumber").alias("m_linenumber"),
        F.col("l_returnflag").alias("m_flag"),
        F.col("l_quantity").cast("decimal(15,2)").alias("m_qty"),
        F.col("l_extendedprice").cast("decimal(15,2)").alias("m_price"),
        F.col("l_discount").cast("decimal(15,2)").alias("m_discount"),
        F.col("l_tax").cast("decimal(15,2)").alias("m_tax"),
        (
            (
                (F.col("l_orderkey") + 1).cast("decimal(16,0)")
                * F.lit(10_000_000_000).cast("decimal(11,0)")
            ).cast("decimal(27,0)")
            + F.col("l_discount").cast("decimal(12,10)")
        )
        .cast("decimal(38,10)")
        .alias("m_fine"),
    )
    # writer-parallel layout like LOAD; at 100 TB size this to the
    # row-group target instead of a fixed file count
    money.repartition(8, "m_orderkey").write.mode("overwrite").parquet(
        os.path.join(dest, "money.parquet")
    )


def money_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) and return the stored DECIMAL-typed money table."""
    dest = ensure_derived(
        spark,
        sf_dir,
        name="money",
        source_paths=[table_path(sf_dir, "lineitem")],
        build=lambda sp, tmp: _build_money(sp, sf_dir, tmp),
        params="v3",
    )
    return os.path.join(dest, "money.parquet")


def load_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the STORED money table — decimal types come from the parquet
    footer (physical DECIMAL annotation), not from a cast at read time."""
    return spark.read.parquet(money_path(spark, sf_dir))


@declare(
    "dec_money_rollup",
    sql=_MONEY_ORACLE_CTE
    + """
    SELECT m_flag,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(CAST(sum(m_price) AS DECIMAL(38,2)) AS STRING) AS sum_price,
           CAST(min(m_price) AS STRING) AS min_price,
           CAST(max(m_price) AS STRING) AS max_price,
           CAST(CAST(sum(m_price) AS DOUBLE) / count(*) AS DOUBLE) AS avg_price
    FROM money GROUP BY m_flag ORDER BY m_flag
    """,
    tags=("decimal", "aggregation"),
)
def dec_money_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact money rollup over the stored DECIMAL(15,2) table: sum/min/max
    stay decimal-typed end-to-end (avg is DOUBLE — decimal division
    diverges across engines by design)."""
    m = load_money(spark, sf_dir)
    cnt = F.count(F.lit(1))
    return (
        m.groupBy("m_flag")
        .agg(
            cnt.alias("cnt"),
            F.sum("m_price").cast("decimal(38,2)").cast("string").alias("sum_price"),
            F.min("m_price").cast("string").alias("min_price"),
            F.max("m_price").cast("string").alias("max_price"),
            (F.sum("m_price").cast("double") / cnt).cast("double").alias("avg_price"),
        )
        .orderBy("m_flag")
    )


@declare(
    "dec_net_revenue",
    sql=_MONEY_ORACLE_CTE
    + """
    SELECT m_flag,
           CAST(CAST(sum(m_price * (CAST(1 AS DECIMAL(3,2)) - m_discount))
                     AS DECIMAL(38,4)) AS STRING) AS net_revenue
    FROM money GROUP BY m_flag ORDER BY m_flag
    """,
    tags=("decimal", "aggregation", "scalar"),
)
def dec_net_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal multiplication surface: price * (1 - discount) is EXACT in
    decimal (result scale 4 = 2+2, no rounding), so the pinned
    DECIMAL(38,4) sums match DuckDB bit-for-bit — the computation TPC-H
    runs on money columns, done in the type money deserves."""
    m = load_money(spark, sf_dir)
    one = F.lit(1).cast("decimal(3,2)")
    return (
        m.groupBy("m_flag")
        .agg(
            F.sum(F.col("m_price") * (one - F.col("m_discount")))
            .cast("decimal(38,4)")
            .cast("string")
            .alias("net_revenue")
        )
        .orderBy("m_flag")
    )


@declare(
    "dec_qty_bands",
    sql=_MONEY_ORACLE_CTE
    + """
    , bands AS (
      SELECT DISTINCT m_qty,
             CASE WHEN m_qty < CAST(10 AS DECIMAL(15,2)) THEN 'low'
                  WHEN m_qty < CAST(30 AS DECIMAL(15,2)) THEN 'mid'
                  ELSE 'high' END AS band
      FROM money)
    SELECT b.band,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(CAST(sum(m.m_price) AS DECIMAL(38,2)) AS STRING) AS sum_price
    FROM money m JOIN bands b ON m.m_qty = b.m_qty
    GROUP BY b.band ORDER BY b.band
    """,
    tags=("decimal", "join", "aggregation"),
)
def dec_qty_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join ON A DECIMAL KEY: a distinct-quantity dim (≤50 rows,
    broadcast) joins back to the fact on DECIMAL(15,2) equality — decimal
    hash-partitioning and comparison exercised through a real join."""
    m = load_money(spark, sf_dir)
    bands = (
        m.select("m_qty")
        .distinct()
        .withColumn(
            "band",
            F.when(F.col("m_qty") < F.lit(10).cast("decimal(15,2)"), "low")
            .when(F.col("m_qty") < F.lit(30).cast("decimal(15,2)"), "mid")
            .otherwise("high"),
        )
    )
    return (
        m.join(F.broadcast(bands), "m_qty")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("m_price").cast("decimal(38,2)").cast("string").alias("sum_price"),
        )
        .orderBy("band")
    )


@declare(
    "dec_fine_precision",
    sql=_MONEY_ORACLE_CTE
    + """
    SELECT m_flag,
           CAST(CAST(sum(m_fine) AS DECIMAL(38,10)) AS STRING) AS sum_fine,
           CAST(min(m_fine) AS STRING) AS min_fine,
           CAST(max(m_fine) AS STRING) AS max_fine
    FROM money GROUP BY m_flag ORDER BY m_flag
    """,
    tags=("decimal", "aggregation", "long_decimal"),
)
def dec_fine_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LONG decimal path (Int128 ≈ LongDecimalColumnVector /
    Integer128Statistic): DECIMAL(38,10) values aggregate exactly — sums
    exceed 64-bit unscaled range, so this provably runs on 128-bit state."""
    m = load_money(spark, sf_dir)
    return (
        m.groupBy("m_flag")
        .agg(
            F.sum("m_fine").cast("decimal(38,10)").cast("string").alias("sum_fine"),
            F.min("m_fine").cast("string").alias("min_fine"),
            F.max("m_fine").cast("string").alias("max_fine"),
        )
        .orderBy("m_flag")
    )
