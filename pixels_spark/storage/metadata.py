"""JSON-file-backed metadata catalog.

Reference analog: the gRPC MetadataService + MySQL-backed domain model
(``pixels-common/src/main/java/io/pixelsdb/pixels/common/metadata/
MetadataService.java`` — createSchema:131, createTable:256, getLayouts:674,
addFiles:1342; domain classes ``Schema.java``/``Table.java``/
``Layout.java:31-57``/``Path.java``). We keep the same hierarchy —
Schema → Table → Layout (versioned, ordered/compact paths) → files — in a
single JSON document per warehouse, because Spark's own catalog has no home
for layout versions or dual-path storage.

Concurrency note: single-writer semantics (like the reference's central
daemon). At scale this file would live in a real store (Delta table, DynamoDB);
the API is what matters for parity.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Any

LAYOUT_ORDERED = "ordered"
LAYOUT_COMPACT = "compact"


@dataclass
class Layout:
    """≈ metadata.domain.Layout (Layout.java:31-57): versioned physical
    design with ordered + compact path sets."""

    version: int
    create_at: float
    ordered_paths: list[str] = field(default_factory=list)
    compact_paths: list[str] = field(default_factory=list)
    # ≈ splits/projections patterns (SplitsIndex/ProjectionsIndex) — stored
    # as free-form hints; consumed by storage.stats selectivity + readers
    splits: dict[str, Any] = field(default_factory=dict)
    projections: list[dict[str, Any]] = field(default_factory=list)


@dataclass
class TableMeta:
    name: str
    schema_name: str
    columns: list[dict[str, str]]  # [{name, type}]
    layouts: list[Layout] = field(default_factory=list)
    row_count: int = 0
    properties: dict[str, str] = field(default_factory=dict)


class MetadataStore:
    """CRUD over schemas/tables/layouts, persisted as one JSON file."""

    def __init__(self, root: str):
        self.root = root
        self.path = os.path.join(root, "_pixels_metadata.json")
        os.makedirs(root, exist_ok=True)
        self._data: dict[str, dict] = {"schemas": {}}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self._data = json.load(f)

    # -- persistence -------------------------------------------------------
    def _save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._data, f, indent=1, default=asdict)
        os.replace(tmp, self.path)

    # -- schema ops (≈ MetadataService.createSchema:131 / dropSchema) ------
    def create_schema(self, name: str) -> None:
        self._data["schemas"].setdefault(name, {"tables": {}})
        self._save()

    def get_schemas(self) -> list[str]:
        return sorted(self._data["schemas"])

    def drop_schema(self, name: str) -> None:
        self._data["schemas"].pop(name, None)
        self._save()

    # -- table ops (≈ createTable:256, getColumns:581, updateRowCount:428) -
    def create_table(
        self,
        schema_name: str,
        table: str,
        columns: list[dict[str, str]],
        properties: dict[str, str] | None = None,
    ) -> TableMeta:
        if schema_name not in self._data["schemas"]:
            raise KeyError(f"schema {schema_name!r} does not exist")
        meta = TableMeta(
            name=table,
            schema_name=schema_name,
            columns=columns,
            properties=properties or {},
        )
        self._data["schemas"][schema_name]["tables"][table] = asdict(meta)
        self._save()
        return meta

    def get_table(self, schema_name: str, table: str) -> dict:
        try:
            return self._data["schemas"][schema_name]["tables"][table]
        except KeyError:
            raise KeyError(f"table {schema_name}.{table} not found") from None

    def get_tables(self, schema_name: str) -> list[str]:
        return sorted(self._data["schemas"].get(schema_name, {}).get("tables", {}))

    def get_columns(self, schema_name: str, table: str) -> list[dict[str, str]]:
        return self.get_table(schema_name, table)["columns"]

    def update_row_count(self, schema_name: str, table: str, row_count: int) -> None:
        self.get_table(schema_name, table)["row_count"] = row_count
        self._save()

    # -- layout ops (≈ getLayouts:674, addLayout; Layout.java versioning) --
    def add_layout(
        self,
        schema_name: str,
        table: str,
        ordered_paths: list[str] | None = None,
        compact_paths: list[str] | None = None,
        splits: dict[str, Any] | None = None,
    ) -> Layout:
        t = self.get_table(schema_name, table)
        version = len(t["layouts"])
        layout = Layout(
            version=version,
            create_at=time.time(),
            ordered_paths=ordered_paths or [],
            compact_paths=compact_paths or [],
            splits=splits or {},
        )
        t["layouts"].append(asdict(layout))
        self._save()
        return layout

    def get_layouts(self, schema_name: str, table: str) -> list[dict]:
        return self.get_table(schema_name, table)["layouts"]

    def latest_layout(self, schema_name: str, table: str) -> dict:
        layouts = self.get_layouts(schema_name, table)
        if not layouts:
            raise KeyError(f"table {schema_name}.{table} has no layouts")
        return layouts[-1]

    def reader_path(self, schema_name: str, table: str) -> str:
        """Preferred read path: compact if present, else ordered — the same
        preference the reference's split index applies to compacted layouts."""
        layout = self.latest_layout(schema_name, table)
        paths = layout["compact_paths"] or layout["ordered_paths"]
        if not paths:
            raise KeyError(f"layout v{layout['version']} has no paths")
        return paths[0]
