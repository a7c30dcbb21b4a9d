"""PixelsSparkEngine — the single user-facing facade.

A user of the reference interacts with: a metadata service (schemas/tables/
layouts), ETL verbs (LOAD/COMPACT/STAT/IMPORT/COPY), SQL through a host
engine, programmatic reads with projection/predicate/snapshot options, and
Retina for mutable/streamed tables. This class packages the equivalent
surface of this repo behind one object, so "switching engines" is:

    eng = PixelsSparkEngine(spark, warehouse="/data/warehouse")
    eng.load("tpch", "lineitem", src_csv, schema=..., delimiter="|")
    eng.compact("tpch", "lineitem")
    eng.stat("tpch", "lineitem")
    df = eng.table("tpch", "lineitem")          # reads preferred layout
    eng.sql_register("tpch")                    # temp views for spark.sql
    out = eng.sql("SELECT ... FROM lineitem")
    mv  = eng.mvcc_table("events_live", key_col="event_id")

Every method delegates to the module-level operators (storage/, mvcc/,
sql.py) — the facade adds no logic, only coherence.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .mvcc import MvccTable, TransService
from .storage import compact as _compact
from .storage import etl as _etl
from .storage import load as _load
from .storage import splits as _splits
from .storage import stats as _stats
from .storage.metadata import MetadataStore


class PixelsSparkEngine:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        self.meta = MetadataStore(warehouse)
        self.trans = TransService(warehouse)
        # session conf value before the engine's first split-advice
        # override; restored when reading a table with no splits index
        self._pre_advice_split_bytes: str | None = None

    # -- paths -------------------------------------------------------------
    def _table_dir(self, schema: str, table: str, suffix: str = "") -> str:
        return os.path.join(self.warehouse, schema, table + suffix)

    # -- ETL (≈ pixels-cli verbs) -------------------------------------------
    def load(
        self,
        schema: str,
        table: str,
        source: str,
        table_schema: StructType,
        **kwargs,
    ) -> DataFrame:
        return _load.load_and_register(
            self.spark,
            self.meta,
            schema,
            table,
            source,
            self._table_dir(schema, table),
            table_schema,
            **kwargs,
        )

    def compact(self, schema: str, table: str, **kwargs) -> DataFrame:
        return _compact.compact_and_register(
            self.spark,
            self.meta,
            schema,
            table,
            self._table_dir(schema, table, "_compact"),
            **kwargs,
        )

    def stat(self, schema: str, table: str, approx: bool = False):
        return _stats.stat_and_register(
            self.table(schema, table), self.meta, schema, table, approx=approx
        )

    def import_table(self, schema: str, table: str, path: str) -> DataFrame:
        return _etl.import_table(self.spark, self.meta, schema, table, path)

    def copy(self, source: str, dest: str) -> int:
        return _etl.copy_table(self.spark, source, dest)

    def file_meta(self, path: str) -> dict:
        return _etl.file_meta(path)

    # -- reads --------------------------------------------------------------
    def build_splits_index(self, schema: str, table: str) -> dict[str, int]:
        """Persist the table's per-column footer byte weights on its latest
        layout (≈ CostBasedSplitsIndex built from footer stats,
        SplitsIndex.java:24-27). One metadata pass; feeds workload-aware
        split sizing in ``table(..., workload_cols=...)``."""
        return _splits.register_splits_index(
            self.meta, schema, table, self.meta.reader_path(schema, table)
        )

    def split_advice(
        self, schema: str, table: str, workload_cols: list[str] | None = None
    ) -> int | None:
        """Advised ``maxPartitionBytes`` for a scan of ``workload_cols``
        (None = full row), or None if no splits index was built."""
        from . import config

        cb = _splits.stored_col_bytes(self.meta, schema, table)
        if not cb:
            return None
        return _splits.advise_max_partition_bytes(
            cb, workload_cols, target_task_bytes=int(config.MAX_PARTITION_BYTES)
        )

    def table(
        self,
        schema: str,
        table: str,
        workload_cols: list[str] | None = None,
    ) -> DataFrame:
        """Read the table's preferred layout (compact if present).

        When a splits index exists (``build_splits_index``), the call sets
        the session's ``spark.sql.files.maxPartitionBytes`` to the advice
        for ``workload_cols`` (None = full row, which advises the global
        target); a read of a table WITHOUT an index restores whatever the
        session had before the engine's first override — so neither a
        full-width read nor an unindexed table ever inherits a previous
        narrow read's larger setting. Spark has no per-read split knob, so
        this is a session-conf set at scan-build time: one split choice
        per workload (the reference's CostBasedSplitsIndex granularity),
        and because the conf is read at EXECUTION time, build-then-execute
        interleavings of differently-advised DataFrames should execute
        each one right after building it.
        """
        conf_key = "spark.sql.files.maxPartitionBytes"
        advised = self.split_advice(schema, table, workload_cols)
        if advised is not None:
            if self._pre_advice_split_bytes is None:
                self._pre_advice_split_bytes = self.spark.conf.get(conf_key)
            self.spark.conf.set(conf_key, str(advised))
        elif self._pre_advice_split_bytes is not None:
            # un-indexed table after an advised read: restore the session's
            # own setting rather than leaking the last advice into it
            self.spark.conf.set(conf_key, self._pre_advice_split_bytes)
            self._pre_advice_split_bytes = None
        return self.spark.read.parquet(self.meta.reader_path(schema, table))

    def sql_register(self, schema: str) -> None:
        """Register every table AND cataloged view of a schema for
        spark.sql. Tables first (views reference them); view SQL comes from
        the metadata catalog (≈ MetadataService.createView:453 viewData).
        Views may reference other views, and the catalog doesn't store the
        dependency DAG — register to a fixpoint (a failing view is retried
        after the views it references land), so catalog iteration order
        never matters; a genuinely unresolvable view raises its own error."""
        for t in self.meta.get_tables(schema):
            self.table(schema, t).createOrReplaceTempView(t)
        pending = list(self.meta.get_views(schema))
        while pending:
            progressed, remaining, errs = False, [], {}
            for v in pending:
                try:
                    self.spark.sql(
                        f"CREATE OR REPLACE TEMPORARY VIEW {v} AS "
                        + self.meta.get_view(schema, v)
                    )
                    progressed = True
                except Exception as exc:  # unresolved reference: retry next pass
                    remaining.append(v)
                    errs[v] = exc
            if not progressed:
                # no view landed this pass: every remaining one is genuinely
                # unresolvable — report them all, not just the last
                detail = "; ".join(
                    f"{v}: {type(e).__name__}: {(str(e).splitlines() or [''])[0]}"
                    for v, e in errs.items()
                )
                raise RuntimeError(
                    f"unresolvable catalog views {sorted(errs)}: {detail}"
                ) from next(iter(errs.values()))
            pending = remaining

    def create_view(
        self, schema: str, view: str, view_sql: str, update_if_exists: bool = False
    ) -> None:
        """Catalog a view (persisted SQL text) and register it immediately
        (≈ MetadataService.createView:453)."""
        self.meta.create_view(schema, view, view_sql, update_if_exists)
        self.spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {view} AS {view_sql}")

    def drop_view(self, schema: str, view: str) -> None:
        self.meta.drop_view(schema, view)
        self.spark.catalog.dropTempView(view)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    # -- mutable tables (≈ Retina) ------------------------------------------
    def mvcc_table(self, name: str, key_col: str) -> MvccTable:
        """A mutable snapshot-isolated table sharing the engine's
        transaction service (one commit-ts domain per warehouse, like the
        reference's central timestamp oracle)."""
        return MvccTable(
            self.spark,
            os.path.join(self.warehouse, "_mvcc", name),
            key_col=key_col,
            trans=self.trans,
        )

    def secondary_index(self, table: MvccTable, col: str, **kwargs):
        """A non-unique secondary point index over an MVCC table column
        (≈ the reference's secondary SinglePointIndex; two-step lookup
        through the primary manifest — see mvcc/secondary.py)."""
        from .mvcc.secondary import SecondaryIndex

        return SecondaryIndex(table, col, **kwargs)

    def materialized_rollup(
        self, name: str, table: MvccTable, group_cols: list[str], sum_cols: list[str]
    ):
        """An incrementally-maintained count+sum rollup over an MVCC table
        (delta-only refresh — see mvcc/ivm.py); stored under the
        warehouse next to the table."""
        from .mvcc.ivm import MaterializedRollup

        return MaterializedRollup(
            self.spark,
            os.path.join(self.warehouse, "_mvcc_rollups", name),
            table,
            group_cols,
            sum_cols,
        )

    def dedup_registry(self, name: str):
        """A persisted incremental dedup registry (exact fingerprints +
        MinHash bands — see functions/dedup.DedupRegistry), stored under
        the warehouse."""
        from .functions.dedup import DedupRegistry

        return DedupRegistry(
            self.spark, os.path.join(self.warehouse, "_dedup_registry", name)
        )
