"""Secondary (non-unique) point index over an MvccTable column.

Reference analog: the reference's ``SinglePointIndex`` supports secondary
indexes whose lookups return a LIST of row ids
(``pixels-common/.../index/SinglePointIndex.java:100`` ``isUnique``,
``:116`` ``getRowIds``) which are then resolved to row locations through
the main index. This mirrors that two-step shape at file granularity:

1. the secondary manifest maps the indexed column's per-file [min, max]
   to files — a lookup scans ONLY covering files and yields candidate
   PRIMARY KEYS (≈ getRowIds);
2. the candidates resolve through the table's PRIMARY manifest to the
   files holding every version of those keys, where MVCC visibility +
   latest-version rules apply, and the secondary predicate is re-checked
   against the LATEST version (a key whose newest version no longer
   matches the value must not surface — the classic stale-secondary trap).

Selectivity caveat (honest, documented): the reference's KV index is
row-granular and clustering-independent; a file-range index only prunes
when the layout clusters the indexed column (primary-key clustering when
values correlate, else Z-order — ``storage/layout_opt.py``). Lookups are
correct regardless; ``candidate_files()`` exposes the pruning achieved.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .table import COMMIT_TS, DELETED_TS, _MANIFEST_BACKENDS, MvccTable


class SecondaryIndex:
    def __init__(self, table: MvccTable, col: str, backend: str = "json"):
        if col == table.key_col:
            raise ValueError("use the primary index for the key column")
        self.table = table
        self.col = col
        root = os.path.join(table.root, f"sidx_{col}")
        os.makedirs(root, exist_ok=True)
        self.manifest = _MANIFEST_BACKENDS[backend](root)

    # -- maintenance -------------------------------------------------------
    def index_commit(self, ts: int) -> None:
        """Record (file, min, max) of the indexed column for one commit
        (call after each insert — ≈ putSecondaryEntries at file grain)."""
        import pyarrow.parquet as pq

        commit_dir = os.path.join(self.table.data_dir, f"_commit={ts}")
        entries = []
        for fname in sorted(os.listdir(commit_dir)):
            if not fname.endswith(".parquet"):
                continue
            fpath = os.path.join(commit_dir, fname)
            md = pq.read_metadata(fpath)
            mn = mx = None
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                for j in range(rg.num_columns):
                    c = rg.column(j)
                    if c.path_in_schema == self.col and c.statistics:
                        s = c.statistics
                        mn = s.min if mn is None else min(mn, s.min)
                        mx = s.max if mx is None else max(mx, s.max)
            if mn is not None:
                entries.append(
                    {"path": fpath, "commit_ts": ts, "min": mn, "max": mx}
                )
        self.manifest.append(entries)

    def build(self) -> None:
        """Index every commit currently on disk (backfill)."""
        indexed = {e["commit_ts"] for e in self.manifest.load()}
        dd = self.table.data_dir
        for entry in sorted(os.listdir(dd)) if os.path.isdir(dd) else []:
            if entry.startswith("_commit="):
                ts = int(entry.split("=", 1)[1])
                if ts not in indexed:
                    self.index_commit(ts)

    # -- lookup ------------------------------------------------------------
    def _covered(self, snapshot_ts: int) -> bool:
        indexed = {e["commit_ts"] for e in self.manifest.load()}
        dd = self.table.data_dir
        on_disk = {
            int(e.split("=", 1)[1])
            for e in os.listdir(dd)
            if e.startswith("_commit=")
        } if os.path.isdir(dd) else set()
        return {t for t in on_disk if t <= snapshot_ts} <= indexed

    def candidate_files(self, value, snapshot_ts: int | None = None) -> list[str]:
        if snapshot_ts is None:
            snapshot_ts = self.table.trans.high_watermark
        return [
            e["path"]
            for e in self.manifest.load()
            if e["commit_ts"] <= snapshot_ts and e["min"] <= value <= e["max"]
        ]

    def lookup(self, value, snapshot_ts: int | None = None) -> DataFrame:
        """Latest visible rows whose LATEST version has ``col == value``
        (≈ secondary getRowIds → main-index resolution → visibility)."""
        t = self.table
        if snapshot_ts is None:
            snapshot_ts = t.trans.high_watermark
        if not self._covered(snapshot_ts):
            # unindexed commits present → correct-but-unpruned fallback
            return t.read_latest_version(snapshot_ts).filter(
                F.col(self.col) == value
            )
        cands = self.candidate_files(value, snapshot_ts)
        empty = (
            t.read_latest_version(snapshot_ts)
            .filter(F.col(self.col) == value)
            .limit(0)
        )
        if not cands:
            return empty
        # step 1: candidate primary keys (bounded — this is a point lookup;
        # the driver-side list mirrors the reference's List<rowId> return)
        keys = [
            r[0]
            for r in self.table.spark.read.parquet(*cands)
            .filter(
                (F.col(COMMIT_TS) <= snapshot_ts) & (F.col(self.col) == value)
            )
            .select(t.key_col)
            .distinct()
            .collect()
        ]
        if not keys:
            return empty
        # step 2: resolve ALL versions of those keys through the primary
        # manifest (covering files only, when the table is indexed)
        if t.indexed and t.manifest.exists():
            files = sorted(
                {
                    e["path"]
                    for e in t.manifest.load()
                    if e["commit_ts"] <= snapshot_ts
                    and any(e["min"] <= k <= e["max"] for k in keys)
                }
            )
            if not files:
                return empty
            visible = (
                t.spark.read.parquet(*files)
                .filter(F.col(COMMIT_TS) <= snapshot_ts)
                .filter(F.col(t.key_col).isin(keys))
            )
        else:
            visible = t.read(snapshot_ts).filter(F.col(t.key_col).isin(keys))
            # read() already applied delete visibility; skip re-applying
            return (
                self._latest(visible)
                .filter(F.col(self.col) == value)
            )
        dels = t._deletes()
        if dels is not None:
            d = (
                dels.filter(F.col("_commit") <= snapshot_ts)
                .drop("_commit")
                .filter(
                    (F.col(DELETED_TS) <= snapshot_ts)
                    & (F.col(t.key_col).isin(keys))
                )
                .groupBy(t.key_col)
                .agg(F.max(DELETED_TS).alias("_del_ts"))
                .withColumnRenamed(t.key_col, "_del_key")
            )
            visible = visible.join(
                d,
                (visible[t.key_col] == F.col("_del_key"))
                & (visible[COMMIT_TS] < F.col("_del_ts")),
                "left_anti",
            )
        # step 3: latest version per key, THEN re-check the secondary
        # predicate — a newer version that changed the value wins
        return self._latest(visible).filter(F.col(self.col) == value)

    def _latest(self, visible: DataFrame) -> DataFrame:
        t = self.table
        w_cols = [c for c in visible.columns if c != COMMIT_TS]
        latest = visible.groupBy(t.key_col).agg(F.max(COMMIT_TS).alias("_max_ts"))
        return (
            visible.join(
                latest.withColumnRenamed(t.key_col, "_lk"),
                (visible[t.key_col] == F.col("_lk"))
                & (visible[COMMIT_TS] == F.col("_max_ts")),
                "left_semi",
            )
            .select(*w_cols, COMMIT_TS)
        )
