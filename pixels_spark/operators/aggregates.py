"""Aggregation operator (≈ pixels-executor Aggregator).

Reference: ``pixels-executor/.../aggregation/FunctionType.java:30-36``
(SUM/MIN/MAX/COUNT — AVG is rewritten by Calcite into sum/count,
``PixelsParser.java:271``), ``FunctionFactory.java:75`` per-type kernels,
``Aggregator.java`` (striped hash tables, partial aggregation with optional
hash-partitioned output for the two-phase plan, ctor :76-120, aggregate:163).

Spark mapping: ``groupBy().agg()`` — partial (map-side) + final aggregation
is automatic (the two phases the reference wires by hand through
BaseScanWorker partials + BaseAggregationWorker finals). The ``partition``
option mirrors the reference's partitioned aggregation output: the result
is hash-repartitioned on the group keys so a downstream consumer reuses the
partitioning without another shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class FunctionType(str, Enum):
    """≈ FunctionType.java:30-36 + the SQL-surface AVG/COUNT_DISTINCT the
    reference delegates (SURVEY.md §2.4)."""

    SUM = "sum"
    MIN = "min"
    MAX = "max"
    COUNT = "count"
    AVG = "avg"
    COUNT_DISTINCT = "count_distinct"


_FUNCS = {
    FunctionType.SUM: F.sum,
    FunctionType.MIN: F.min,
    FunctionType.MAX: F.max,
    FunctionType.COUNT: F.count,
    FunctionType.AVG: F.avg,
    FunctionType.COUNT_DISTINCT: F.count_distinct,
}


@dataclass
class AggSpec:
    func: FunctionType
    column: str
    alias: str


class Aggregator:
    """Declarative group-by aggregation (≈ Aggregator.java ctor :76-120:
    group-key columns + result columns + function types + optional
    partition/numPartition)."""

    def __init__(
        self,
        group_keys: list[str],
        specs: list[AggSpec],
        partition: bool = False,
        num_partitions: int | None = None,
    ):
        self.group_keys = group_keys
        self.specs = specs
        self.partition = partition
        self.num_partitions = num_partitions

    def _exprs(self) -> list[Column]:
        return [_FUNCS[s.func](F.col(s.column)).alias(s.alias) for s in self.specs]

    def aggregate(self, df: DataFrame) -> DataFrame:
        """≈ Aggregator.aggregate:163 + writeAggrOutput:193. Partial+final
        two-phase happens automatically in the physical plan."""
        out = (
            df.groupBy(*self.group_keys).agg(*self._exprs())
            if self.group_keys
            else df.agg(*self._exprs())
        )
        if self.partition and self.group_keys:
            # ≈ partitioned aggregation output for downstream co-location
            n = self.num_partitions
            out = (
                out.repartition(n, *self.group_keys)
                if n
                else out.repartition(*self.group_keys)
            )
        return out


def winsorize_bounds(df, col: str, lo_q: float = 0.01, hi_q: float = 0.99):
    """EXACT winsorization thresholds: the ceil(q·n)-th smallest values of
    ``col`` — order statistics, so the result is deterministic and
    engine-independent even with ties (unlike interpolated percentiles,
    whose semantics differ between engines). Returns a 1-row DataFrame
    (lo, hi) for cross-broadcast; clipping outliers to [lo, hi] is the
    standard cleaning pass for reward/feature columns before training.

    Cost: one global sort of the single column (row_number window). At
    100 TB sample first or use approx_percentile — this exact form exists
    for oracle-equality and for bounded-size columns.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.orderBy(col)
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    ranked = (
        df.select(F.col(col).alias("_v"))
        .select("_v", F.row_number().over(w.orderBy("_v")).alias("_rn"))
        .crossJoin(F.broadcast(total))
    )
    pick = lambda q: F.min(  # noqa: E731
        F.when(
            F.col("_rn") == F.ceil(F.lit(q) * F.col("_n")).cast("bigint"),
            F.col("_v"),
        )
    )
    return ranked.agg(pick(lo_q).alias("lo"), pick(hi_q).alias("hi"))
