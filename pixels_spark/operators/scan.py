"""Scan operator: projection + domain filter over a table path.

Reference: the reader option surface (``PixelsReaderOption.includeCols/
predicate/rgRange/transTimestamp``, pixels-core/.../reader/
PixelsReaderOption.java:45-143) + the scan kernel
(``Scanner.filterAndProject``, pixels-executor/.../scan/Scanner.java:83) +
the scan worker's scan→filter→project→(partial agg) stage
(``BaseScanWorker.java:72-119``).

Spark mapping: ``read.parquet → filter → select`` — Catalyst pushes the
domain conjuncts into the scan (row-group/page skipping ≈ the reference's
stat-based skipping in PixelsRecordReaderImpl.java:345-451) and prunes
columns to the projection. tests/test_pushdown.py asserts both actually
happen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .filters import TableScanFilter


def scan(
    spark: SparkSession,
    path: str,
    include_cols: list[str] | None = None,
    scan_filter: TableScanFilter | None = None,
) -> DataFrame:
    """Projected, filtered scan. ``include_cols=None`` reads all columns
    (≈ includeCols); filters are applied pre-projection like
    Scanner.filterAndProject so filter columns need not be projected."""
    df = spark.read.parquet(path)
    if scan_filter is not None:
        df = scan_filter.apply(df)
    if include_cols is not None:
        df = df.select(*include_cols)
    return df
