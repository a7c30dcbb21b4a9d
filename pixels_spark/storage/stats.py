"""STAT: column statistics collection + selectivity estimation.

Reference: pixels-cli STAT (``Main.java:302``, ``executor/StatExecutor.java``)
collects per-column stats via SQL; ``pixels-core/.../stats/StatsRecorder.java``
and ``RangeStats.getSelectivity`` feed the cost-based planner
(``PlanOptimizer.getTableSelectivity:364``,
``ColumnFilter.java:146-220`` range/discrete selectivity).

Spark mapping: one aggregation pass computing min/max/count/nulls/ndv
(exact at test scale; ``approx_count_distinct`` is the 100 TB switch) per
column, persisted into the metadata store; ``estimate_selectivity`` replays
the reference's range-fraction logic for numeric/timestamp predicates.
Spark's own CBO gets the same numbers via ANALYZE TABLE in sql() flows.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .metadata import MetadataStore


@dataclass
class ColumnStats:
    """≈ proto/pixels.proto:161-220 per-type statistics (min/max/counts)."""

    column: str
    dtype: str
    n_rows: int
    n_nulls: int
    n_distinct: int
    min_value: object
    max_value: object


def collect_stats(df: DataFrame, approx: bool = False) -> dict[str, ColumnStats]:
    """Single-pass per-column stats. ``approx=True`` switches ndv to HLL
    (approx_count_distinct) — the only sane option at 100 TB."""
    n_rows = df.count()
    aggs = []
    for f in df.schema.fields:
        c = F.col(f.name)
        ndv = (
            F.approx_count_distinct(c) if approx else F.count_distinct(c)
        ).alias(f"{f.name}__ndv")
        aggs += [
            F.count(F.when(c.isNull(), 1)).alias(f"{f.name}__nulls"),
            ndv,
        ]
        if not f.dataType.simpleString().startswith(("array", "map", "struct")):
            aggs += [F.min(c).alias(f"{f.name}__min"), F.max(c).alias(f"{f.name}__max")]
    row = df.agg(*aggs).first().asDict()
    out: dict[str, ColumnStats] = {}
    for f in df.schema.fields:
        out[f.name] = ColumnStats(
            column=f.name,
            dtype=f.dataType.simpleString(),
            n_rows=n_rows,
            n_nulls=row[f"{f.name}__nulls"],
            n_distinct=row[f"{f.name}__ndv"],
            min_value=row.get(f"{f.name}__min"),
            max_value=row.get(f"{f.name}__max"),
        )
    return out


def stat_and_register(
    df: DataFrame,
    store: MetadataStore,
    schema_name: str,
    table: str,
    approx: bool = False,
) -> dict[str, ColumnStats]:
    """Collect stats and persist them on the table's metadata
    (≈ STAT writing to the metadata service)."""
    stats = collect_stats(df, approx=approx)
    t = store.get_table(schema_name, table)
    t["properties"]["stats"] = {
        k: {**asdict(v), "min_value": str(v.min_value), "max_value": str(v.max_value)}
        for k, v in stats.items()
    }
    store.update_row_count(schema_name, table, df.count())
    return stats


def estimate_range_selectivity(
    stats: ColumnStats, lower: float | None, upper: float | None
) -> float:
    """Range-fraction selectivity over numeric stats
    (≈ RangeStats.getSelectivity / ColumnFilter.java:146-220)."""
    try:
        lo = float(stats.min_value)  # type: ignore[arg-type]
        hi = float(stats.max_value)  # type: ignore[arg-type]
    except (TypeError, ValueError):
        return 1.0
    if hi <= lo:
        return 1.0
    span = hi - lo
    a = lo if lower is None else max(lo, lower)
    b = hi if upper is None else min(hi, upper)
    if b <= a:
        return 0.0
    return (b - a) / span


def estimate_equality_selectivity(stats: ColumnStats) -> float:
    """1/ndv point-predicate selectivity (≈ discrete-value cardinality
    ratio in ColumnFilter)."""
    return 1.0 / max(1, stats.n_distinct)


def footer_min_max_count(path: str, columns: list[str]) -> dict[str, dict]:
    """Answer MIN/MAX/COUNT for ``columns`` straight from the parquet
    footers — zero data read, no Spark job (≈ the reference answering
    stat-covered aggregates from RowGroupStatistic / StatsRecorder instead
    of scanning; Spark's own equivalent, parquet aggregatePushdown, only
    engages on the DSv2 read path).

    Returns ``{col: {"min": v, "max": v, "count": n, "null_count": n}}``.
    Raises if any row group lacks statistics for a requested column (a
    stats-free file cannot answer from footers — fall back to a scan).
    """
    import os

    import pyarrow.parquet as pq

    files = []
    if os.path.isdir(path):
        for r, _d, fs in os.walk(path):
            files += [os.path.join(r, f) for f in fs if f.endswith(".parquet")]
    else:
        files = [path]
    out = {c: {"min": None, "max": None, "count": 0, "null_count": 0} for c in columns}
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).path: i for i in range(md.num_columns)}
        for c in columns:
            if c not in names:
                raise KeyError(f"column {c!r} not in {f}")
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for c in columns:
                col = g.column(names[c])
                st = col.statistics
                if st is None or not st.has_min_max:
                    raise ValueError(f"row group {rg} of {f} lacks stats for {c!r}")
                o = out[c]
                o["count"] += g.num_rows
                o["null_count"] += st.null_count or 0
                if o["min"] is None or st.min < o["min"]:
                    o["min"] = st.min
                if o["max"] is None or st.max > o["max"]:
                    o["max"] = st.max
    return out
