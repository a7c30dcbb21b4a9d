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

from .table import COMMIT_TS, MvccTable

_SUM_DEC = "decimal(18,6)"


def touched_keys(
    spark: SparkSession, table: MvccTable, last_ts: int, cur_ts: int
) -> DataFrame:
    """Distinct keys written or tombstoned in (last_ts, cur_ts] — reads
    ONLY the delta commit directories via `_commit` partition pruning."""
    k = table.key_col
    parts: list[DataFrame] = []
    dd = table.data_dir
    if os.path.isdir(dd) and any(e.startswith("_commit=") for e in os.listdir(dd)):
        d = spark.read.option("basePath", dd).parquet(dd)
        parts.append(
            d.filter((F.col("_commit") > last_ts) & (F.col("_commit") <= cur_ts))
            .select(k)
        )
    dels = table._deletes()
    if dels is not None:
        parts.append(
            dels.filter(
                (F.col("_commit") > last_ts) & (F.col("_commit") <= cur_ts)
            ).select(k)
        )
    if not parts:
        return spark.createDataFrame([], f"{k} long")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


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
        return touched_keys(self.spark, self.table, last_ts, cur_ts)

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
        touched = self._touched_keys(last, cur)
        # key restriction applied BELOW latest-only: the latest-version
        # shuffles carry only touched keys' rows, not the full history
        old = self.table.read_latest_version(last, keys=touched)
        new = self.table.read_latest_version(cur, keys=touched)

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


class MaterializedJoinRollup:
    """A stored group-by rollup (count + decimal sums) over ``fact ⋈ dim``
    — BOTH sides MVCC tables — maintained incrementally from both commit
    histories. The view-maintenance shape one table can't express: a dim
    UPDATE (say a customer changes segment) must re-attribute every joined
    fact row's mass to the new group without rescanning the fact table.

    Differential algebra (signed multisets, Δ = new latest − old latest):

        Δ(F ⋈ D) = ΔF ⋈ D_new  ∪  F_old ⋈ ΔD

    which telescopes exactly: ΔF⋈D_new = F_new⋈D_new − F_old⋈D_new and
    F_old⋈ΔD = F_old⋈D_new − F_old⋈D_old; their signed union is
    F_new⋈D_new − F_old⋈D_old. Signs multiply through the join and the
    aggregate; sums accumulate in DECIMAL, so ``refresh()`` equals a
    from-scratch ``full_refresh()`` byte-for-byte after ANY interleaving
    of inserts/updates/deletes on either side (fuzzed in
    tests/test_ivm.py).

    Scale (100 TB fact, large dim): term 1's left side is ΔF — its
    touched-key discovery is commit-dir pruned and its snapshot reads are
    key-restricted below the latest-only shuffles (delta-sized shuffles;
    the file scans are full-width absent a key index) — joining the dim,
    a plain key join AQE plans;
    term 2's fact side is F_old SEMI-JOINED down to ΔD's join keys before
    it ever joins or aggregates — cost tracks |fact rows of the touched
    dim keys|, not |fact|. Neither term rescans the full fact table; the
    rollup merge shuffles rollup-cardinality rows only.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        fact: MvccTable,
        dim: MvccTable,
        join_key: str,
        group_cols: list[str],
        sum_cols: list[str],
    ):
        if dim.key_col != join_key:
            raise ValueError(
                f"dim key {dim.key_col!r} must be the join key {join_key!r} "
                "(latest-version semantics make the dim side key-unique)"
            )
        self.spark = spark
        self.path = path
        self.fact = fact
        self.dim = dim
        self.join_key = join_key
        self.group_cols = list(group_cols)
        self.sum_cols = list(sum_cols)
        self.state_path = os.path.join(path, "_ivm_state.json")
        os.makedirs(path, exist_ok=True)

    # -- state (same atomic-pointer discipline as MaterializedRollup) ------
    def _state(self) -> dict | None:
        if not os.path.exists(self.state_path):
            return None
        with open(self.state_path) as f:
            return json.load(f)

    def _write(self, rollup: DataFrame, ts_f: int, ts_d: int) -> None:
        data_dir = os.path.join(self.path, f"rollup_ts={ts_f}_{ts_d}")
        out = rollup.select(
            *self.group_cols,
            F.col("n_rows").cast("long").alias("n_rows"),
            *[
                F.col(f"sum_{c}").cast(_SUM_DEC).alias(f"sum_{c}")
                for c in self.sum_cols
            ],
        )
        out.write.mode("overwrite").parquet(data_dir)
        prev = self._state()
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_f": ts_f, "last_d": ts_d, "data": data_dir}, f)
        os.replace(tmp, self.state_path)
        if prev and prev["data"] != data_dir and os.path.isdir(prev["data"]):
            shutil.rmtree(prev["data"], ignore_errors=True)

    # -- kernels -----------------------------------------------------------
    def _agg_signed(self, joined: DataFrame) -> DataFrame:
        aggs = [F.sum("_sign").cast("long").alias("n_rows")]
        for c in self.sum_cols:
            aggs.append(
                F.sum(F.col(c).cast(_SUM_DEC) * F.col("_sign")).alias(f"sum_{c}")
            )
        return joined.groupBy(*self.group_cols).agg(*aggs)

    def _signed_delta(self, table: MvccTable, last: int, cur: int) -> DataFrame:
        """Signed latest-version delta of ``table`` over (last, cur]:
        +1 rows of the new latest, −1 rows of the old latest. Touched-key
        DISCOVERY is commit-dir pruned (delta-sized); the two snapshot
        reads are key-restricted BELOW the latest-only computation, so
        their shuffles carry only touched keys' version rows — the file
        scan itself remains full-width absent a key index."""
        touched = touched_keys(self.spark, table, last, cur)
        new = table.read_latest_version(cur, keys=touched).withColumn(
            "_sign", F.lit(1)
        )
        old = table.read_latest_version(last, keys=touched).withColumn(
            "_sign", F.lit(-1)
        )
        return new.unionByName(old)

    def _join(self, f: DataFrame, d: DataFrame) -> DataFrame:
        # sign of a joined row = product of side signs (absent column = +1)
        fs = f if "_sign" in f.columns else f.withColumn("_sign", F.lit(1))
        ds = d.withColumnRenamed("_sign", "_dsign") if "_sign" in d.columns else d.withColumn("_dsign", F.lit(1))
        return (
            fs.join(ds, self.join_key)
            .withColumn("_sign", F.col("_sign") * F.col("_dsign"))
            .drop("_dsign")
        )

    # -- refresh -----------------------------------------------------------
    def full_refresh(self) -> tuple[int, int]:
        ts_f = self.fact.trans.high_watermark
        ts_d = self.dim.trans.high_watermark
        j = self._join(
            self.fact.read_latest_version(ts_f).drop(COMMIT_TS),
            self.dim.read_latest_version(ts_d).drop(COMMIT_TS),
        )
        self._write(self._agg_signed(j), ts_f, ts_d)
        return ts_f, ts_d

    def refresh(self) -> tuple[int, int]:
        """Fold both sides' commits since the last refresh into the stored
        rollup. No-op when neither table advanced."""
        state = self._state()
        if state is None:
            return self.full_refresh()
        last_f, last_d = state["last_f"], state["last_d"]
        cur_f = self.fact.trans.high_watermark
        cur_d = self.dim.trans.high_watermark
        if cur_f <= last_f and cur_d <= last_d:
            return last_f, last_d

        terms: list[DataFrame] = []
        d_new = self.dim.read_latest_version(cur_d).drop(COMMIT_TS)
        if cur_f > last_f:
            df_delta = self._signed_delta(self.fact, last_f, cur_f).drop(COMMIT_TS)
            terms.append(self._agg_signed(self._join(df_delta, d_new)))
        if cur_d > last_d:
            dd_delta = self._signed_delta(self.dim, last_d, cur_d).drop(COMMIT_TS)
            f_old = (
                self.fact.read_latest_version(last_f)
                .drop(COMMIT_TS)
                .join(
                    dd_delta.select(self.join_key).distinct(),
                    self.join_key,
                    "left_semi",
                )
            )
            terms.append(self._agg_signed(self._join(f_old, dd_delta)))

        merged = self.read().select(
            *self.group_cols,
            F.col("n_rows"),
            *[F.col(f"sum_{c}") for c in self.sum_cols],
        )
        for t in terms:
            merged = merged.unionByName(t)
        merged = (
            merged.groupBy(*self.group_cols)
            .agg(
                F.sum("n_rows").cast("long").alias("n_rows"),
                *[
                    F.sum(f"sum_{c}").cast(_SUM_DEC).alias(f"sum_{c}")
                    for c in self.sum_cols
                ],
            )
            .filter(F.col("n_rows") != 0)
        )
        self._write(merged, cur_f, cur_d)
        return cur_f, cur_d

    def read(self) -> DataFrame:
        state = self._state()
        if state is None:
            raise ValueError("rollup never refreshed — call full_refresh()")
        return self.spark.read.parquet(state["data"])
