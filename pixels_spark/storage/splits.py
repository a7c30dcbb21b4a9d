"""Workload-aware split sizing — the CostBasedSplitsIndex analog.

The reference picks a scan split size PER WORKLOAD COLUMN SET: its
CostBasedSplitsIndex (``pixels-common/.../layout/SplitsIndex.java:24-27``,
``CostBasedSplitsIndex.java``) sizes splits from the footer byte weights of
the accessed columns, so a task always decodes roughly the same number of
bytes whether the query touches 2 columns or 20. Spark's equivalent knob is
``spark.sql.files.maxPartitionBytes`` — but Spark counts the WHOLE file
bytes of a split while column pruning means the task only decodes the
projected columns' share. A fixed global value therefore over-splits narrow
scans (tiny tasks, scheduling overhead) and under-splits wide ones.

This module closes that gap:

- ``column_chunk_bytes`` reads per-column compressed byte totals from the
  parquet footers (one cheap metadata pass, no data read);
- ``register_splits_index`` persists them on the table's latest layout in
  the MetadataStore (the ``Layout.splits`` slot mirrors the reference's
  SplitsIndex-on-Layout placement);
- ``advise_max_partition_bytes`` inverts the projected fraction: with
  target task bytes T and a workload touching fraction f of the row's
  bytes, the advised split is clamp(T / f) — narrow projections get
  proportionally larger splits so each task still decodes ~T bytes.

The engine applies the advice at scan time (``engine.table(...,
workload_cols=[...])``) by setting the session conf before building the
scan — Spark has no per-read split knob (verified: the read option is
ignored), and that is faithful to the reference anyway: a split size is a
per-workload choice, exactly one per scan there too.

At 100 TB this is the difference between 800k tasks of 3 useful MB each
and 100k tasks of 25 useful MB each on a 10%-projection scan.
"""

from __future__ import annotations

import os
from collections import defaultdict

from .metadata import MetadataStore

# advised splits stay inside sane bounds regardless of how extreme the
# projected fraction is: floor avoids file-per-task storms on ~0-byte
# projections; ceiling keeps a single task's input re-tryable
MIN_SPLIT_BYTES = 16 * 1024 * 1024
MAX_SPLIT_BYTES = 1024 * 1024 * 1024


def column_chunk_bytes(path: str) -> dict[str, int]:
    """Per-top-level-column total compressed bytes across all row groups
    of all files under ``path`` — straight from the parquet footers.

    Nested leaves (``meta.val.cents``) are rolled up into their top-level
    column, matching how projections are expressed at the API surface.
    """
    import pyarrow.parquet as pq

    files = []
    if os.path.isdir(path):
        for r, _d, fs in os.walk(path):
            files += [os.path.join(r, f) for f in fs if f.endswith(".parquet")]
    else:
        files = [path]
    out: dict[str, int] = defaultdict(int)
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                top = col.path_in_schema.split(".")[0]
                out[top] += col.total_compressed_size
    return dict(out)


def advise_max_partition_bytes(
    col_bytes: dict[str, int],
    workload_cols: list[str] | None,
    target_task_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Split size such that a task decodes ~``target_task_bytes`` of the
    PROJECTED columns. ``workload_cols=None`` means a full-row scan."""
    total = sum(col_bytes.values())
    if total <= 0:
        return target_task_bytes
    if workload_cols is None:
        projected = total
    else:
        projected = sum(col_bytes.get(c, 0) for c in workload_cols)
        if projected <= 0:
            # unknown/typo'd columns: the scan will still decode whatever
            # the query really touches, so the safe answer is the plain
            # target, not the ceiling (which would hand tasks 4-8x bytes)
            return max(MIN_SPLIT_BYTES, min(MAX_SPLIT_BYTES, target_task_bytes))
    advised = int(target_task_bytes * total / projected)
    return max(MIN_SPLIT_BYTES, min(MAX_SPLIT_BYTES, advised))


def register_splits_index(
    store: MetadataStore, schema_name: str, table: str, path: str
) -> dict[str, int]:
    """Compute the footer byte weights for ``path`` and persist them on the
    table's latest layout (≈ SplitsIndex attached to Layout)."""
    col_bytes = column_chunk_bytes(path)
    store.set_layout_splits(
        schema_name,
        table,
        {"col_bytes": col_bytes, "total_bytes": sum(col_bytes.values())},
    )
    return col_bytes


def stored_col_bytes(
    store: MetadataStore, schema_name: str, table: str
) -> dict[str, int] | None:
    """The persisted byte weights, or None if no splits index was built."""
    try:
        layout = store.latest_layout(schema_name, table)
    except (KeyError, IndexError):
        return None
    splits = layout.get("splits") or {}
    cb = splits.get("col_bytes")
    return {k: int(v) for k, v in cb.items()} if cb else None
