"""AQE runtime skew-join splitting — the claim in SCALE.md made concrete.

The engine's skew story is two-tier: pre-planned salting for skew known
ahead of time (operators/joins.salted_join, `join_skew_salted`), and AQE's
OptimizeSkewedJoin for skew discovered at runtime (session.py enables it).
This test proves the second tier actually fires: a 90%-hot-key probe side
with an incompressible payload makes one shuffle partition dwarf the
median, and the executed adaptive plan must show the skew split
(SortMergeJoin(skew=true) reading from a skewed AQEShuffleRead) while the
result stays correct.

Gotcha pinned here deliberately: if the query drops the wide payload before
the shuffle (column pruning), the hot partition compresses to nothing and
no skew exists to split — which is itself correct behavior. The aggregate
therefore consumes the payload to keep it live through the join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4MB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2MB",
}


def test_aqe_splits_runtime_skewed_join(spark):
    saved = {k: spark.conf.get(k, None) for k in _CONF}
    try:
        for k, v in _CONF.items():
            spark.conf.set(k, v)
        big = spark.range(1_000_000).select(
            F.when(F.col("id") < 900_000, 0).otherwise(F.col("id") % 100).alias("k"),
            F.md5(F.col("id").cast("string")).alias("v"),
        )
        small = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        jc = (
            big.join(small, "k")
            .groupBy()
            .agg(F.sum(F.length("v")).alias("lv"), F.sum("w").alias("s"))
        )
        [row] = jc.collect()
        # correctness: every big row joins exactly one small row
        assert row["lv"] == 32 * 1_000_000  # md5 hex length × rows
        # ids >= 900k spread uniformly: 1000 rows per residue 0..99
        exp_s = sum(2 * k * 1_000 for k in range(100))
        assert row["s"] == exp_s

        plan = jc._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the skewed partition"
        assert "skewed" in plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
