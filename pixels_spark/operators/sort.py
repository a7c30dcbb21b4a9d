"""Sort / top-k operators.

Reference: ``pixels-turbo/.../BaseSortWorker.java`` (per-split scan+filter →
in-memory sort :241 → k-way priority-queue merge of sorted runs
:260-276 → sorted output); no in-tree top-k/limit kernel (SURVEY.md §2.5 —
ORDER BY/LIMIT run in the host engine).

Spark mapping: ``sortWithinPartitions`` is exactly the per-split sort
(sorted runs, no exchange); ``orderBy`` adds the range-partitioned global
merge; ``orderBy().limit()`` compiles to TakeOrderedAndProject — a
per-partition heap top-k + driver merge, which is the plan you want at
100 TB (k rows per partition move, not the dataset).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def sort_within_partitions(df: DataFrame, *keys: str | Column) -> DataFrame:
    """Per-partition sorted runs (≈ BaseSortWorker.sortFile:184 — each
    worker emits sorted output without a global exchange). Pass
    ``F.col(x).desc()`` for descending keys — mixing an ``ascending`` flag
    with SortOrder expressions breaks codegen."""
    return df.sortWithinPartitions(*keys)


def global_sort(df: DataFrame, *keys: str | Column) -> DataFrame:
    """Total order: range-partition exchange + per-partition sort
    (≈ the sorted-run merge, distributed instead of single-consumer)."""
    return df.orderBy(*keys)


def top_k(df: DataFrame, k: int, *keys: str | Column) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (per-partition heaps, k-row
    merge). The host-engine LIMIT the reference delegates, done engine-side."""
    return df.orderBy(*keys).limit(k)
