"""Incremental materialized-rollup maintenance over an MvccTable (batch IVM).

Reference tie-in: the reference catalogs views logically
(``pixels-common/.../metadata/MetadataService.java`` view CRUD) but keeps
them fresh only by re-query; Retina's commit-timestamped ingestion
(``pixels-retina/``) provides exactly the delta boundary this module needs.
This is the batch counterpart of ``streaming/rollup.py``: ``refresh()``
folds ONLY the commits since the last refresh into the stored aggregate.

Algorithm (differential maintenance over latest-version semantics):

    touched = keys inserted or tombstoned in (last_ts, now]
    Δ       = agg(latest-version rows of touched @ now)
            - agg(latest-version rows of touched @ last_ts)
    rollup' = rollup ⊎ Δ        (groups whose n_rows nets 0 drop out)

implemented as ONE aggregation over a signed union (prev ∪ new ∪ −old) —
no multi-way outer join. Sums accumulate in DECIMAL(18,6), so delta
arithmetic is exact and ``refresh()`` equals a from-scratch
``full_refresh()`` BYTE-FOR-BYTE, regardless of how many increments ran
(proven in tests/test_ivm.py and by the ``mvcc_ivm_rollup`` driver oracle).

Scale design (100 TB): refresh cost tracks DELTA size, not table size —
touched-key discovery reads only the new ``_commit=<ts>`` directories
(path-level partition pruning), and the old/new snapshot reads are
semi-joined down to touched keys before aggregating (on an ``indexed``
table the per-file key-range manifest prunes that scan too). The merge
shuffles only rollup-cardinality rows. A full re-aggregation of a 100 TB
fact table per refresh is exactly what this avoids.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .table import MvccTable

_SUM_DEC = "decimal(18,6)"


class MaterializedRollup:
    """A stored group-by rollup (count + decimal sums) over an MvccTable,
    maintained incrementally from the table's commit history."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        table: MvccTable,
        group_cols: list[str],
        sum_cols: list[str],
    ):
        self.spark = spark
        self.path = path
        self.table = table
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.state_path = os.path.join(path, "_ivm_state.json")
        os.makedirs(path, exist_ok=True)

    # -- state -------------------------------------------------------------
    def _state(self) -> dict | None:
        if not os.path.exists(self.state_path):
            return None
        with open(self.state_path) as f:
            return json.load(f)

    def _write(self, rollup: DataFrame, ts: int) -> None:
        """Persist the rollup for ``ts`` and atomically swing the state
        pointer (write-new, rename state, drop old — a reader holding the
        previous state keeps a consistent directory)."""
        data_dir = os.path.join(self.path, f"rollup_ts={ts}")
        out = rollup.select(
            *self.group_cols,
            F.col("n_rows").cast("long").alias("n_rows"),
            *[F.col(f"sum_{c}").cast(_SUM_DEC).alias(f"sum_{c}") for c in self.sum_cols],
        )
        out.write.mode("overwrite").parquet(data_dir)
        prev = self._state()
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_ts": ts, "data": data_dir}, f)
        os.replace(tmp, self.state_path)
        if prev and prev["data"] != data_dir and os.path.isdir(prev["data"]):
            shutil.rmtree(prev["data"], ignore_errors=True)

    # -- aggregation kernel ------------------------------------------------
    def _agg(self, df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
        for c in self.sum_cols:
            aggs.append(F.sum(F.col(c).cast(_SUM_DEC)).alias(f"sum_{c}"))
        return df.groupBy(*self.group_cols).agg(*aggs)

    def _touched_keys(self, last_ts: int, cur_ts: int) -> DataFrame:
        """Distinct keys written or tombstoned in (last_ts, cur_ts] — reads
        ONLY the delta commit directories via `_commit` partition pruning."""
        k = self.table.key_col
        parts: list[DataFrame] = []
        dd = self.table.data_dir
        if os.path.isdir(dd) and any(e.startswith("_commit=") for e in os.listdir(dd)):
            d = self.spark.read.option("basePath", dd).parquet(dd)
            parts.append(
                d.filter((F.col("_commit") > last_ts) & (F.col("_commit") <= cur_ts))
                .select(k)
            )
        dels = self.table._deletes()
        if dels is not None:
            parts.append(
                dels.filter(
                    (F.col("_commit") > last_ts) & (F.col("_commit") <= cur_ts)
                ).select(k)
            )
        if not parts:
            return self.spark.createDataFrame([], f"{k} long")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.distinct()

    # -- refresh -----------------------------------------------------------
    def full_refresh(self) -> int:
        """Rebuild the rollup from scratch at the current high watermark."""
        ts = self.table.trans.high_watermark
        self._write(self._agg(self.table.read_latest_version(ts)), ts)
        return ts

    def refresh(self) -> int:
        """Incrementally fold the commits since the last refresh into the
        stored rollup. No-op (no scan at all) when nothing committed."""
        state = self._state()
        if state is None:
            return self.full_refresh()
        last, cur = state["last_ts"], self.table.trans.high_watermark
        if cur <= last:
            return last
        k = self.table.key_col
        touched = self._touched_keys(last, cur)
        old = self.table.read_latest_version(last).join(touched, k, "left_semi")
        new = self.table.read_latest_version(cur).join(touched, k, "left_semi")

        def signed(df: DataFrame, sign: int) -> DataFrame:
            return df.select(
                *self.group_cols,
                (F.col("n_rows") * sign).alias("n_rows"),
                *[
                    (F.col(f"sum_{c}") * sign).cast(_SUM_DEC).alias(f"sum_{c}")
                    for c in self.sum_cols
                ],
            )

        merged = (
            signed(self.read(), 1)
            .unionByName(signed(self._agg(new), 1))
            .unionByName(signed(self._agg(old), -1))
            .groupBy(*self.group_cols)
            .agg(
                F.sum("n_rows").cast("long").alias("n_rows"),
                *[
                    F.sum(f"sum_{c}").cast(_SUM_DEC).alias(f"sum_{c}")
                    for c in self.sum_cols
                ],
            )
            .filter(F.col("n_rows") != 0)
        )
        self._write(merged, cur)
        return cur

    def read(self) -> DataFrame:
        state = self._state()
        if state is None:
            raise ValueError("rollup never refreshed — call full_refresh()")
        return self.spark.read.parquet(state["data"])
