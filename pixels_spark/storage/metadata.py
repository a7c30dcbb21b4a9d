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

    # -- view ops (≈ MetadataService.createView:453 / getViews / dropView:
    # viewData is the SQL text, persisted in the catalog — views here are
    # cataloged objects that survive sessions, unlike engine temp views) --
    def create_view(
        self,
        schema_name: str,
        view_name: str,
        view_sql: str,
        update_if_exists: bool = False,
    ) -> None:
        if schema_name not in self._data["schemas"]:
            raise KeyError(f"schema {schema_name!r} does not exist")
        views = self._data["schemas"][schema_name].setdefault("views", {})
        if view_name in views and not update_if_exists:
            raise ValueError(
                f"view {schema_name}.{view_name} exists (pass update_if_exists=True)"
            )
        views[view_name] = view_sql
        self._save()

    def get_views(self, schema_name: str) -> list[str]:
        return sorted(self._data["schemas"].get(schema_name, {}).get("views", {}))

    def get_view(self, schema_name: str, view_name: str) -> str:
        try:
            return self._data["schemas"][schema_name]["views"][view_name]
        except KeyError:
            raise KeyError(f"view {schema_name}.{view_name} not found") from None

    def drop_view(self, schema_name: str, view_name: str) -> None:
        self._data["schemas"].get(schema_name, {}).get("views", {}).pop(
            view_name, None
        )
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

    def spark_schema(self, schema_name: str, table: str):
        """Registered columns as a real StructType, via the §1.2 type
        mapping (TypeDescription.java aliases incl. decimal(p,s), TIME →
        Integer millis, vector(dim) → array<double>)."""
        from ..types import to_struct

        return to_struct(self.get_columns(schema_name, table))

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
        projections: list[dict[str, Any]] | None = None,
    ) -> Layout:
        """``projections``: materialized column-subset paths
        (≈ Projections.java / ProjectionPattern), each
        ``{"cols": [...], "path": str}`` — a physically narrower copy of the
        table that any query touching only those columns can read instead
        of the full-width path."""
        t = self.get_table(schema_name, table)
        version = len(t["layouts"])
        layout = Layout(
            version=version,
            create_at=time.time(),
            ordered_paths=ordered_paths or [],
            compact_paths=compact_paths or [],
            splits=splits or {},
            projections=projections or [],
        )
        t["layouts"].append(asdict(layout))
        self._save()
        return layout

    def add_projection(
        self, schema_name: str, table: str, cols: list[str], path: str
    ) -> None:
        """Register a materialized projection on the latest layout
        (≈ MetadataService.addLayout with a new projections pattern)."""
        layout = self.latest_layout(schema_name, table)
        layout["projections"].append({"cols": sorted(cols), "path": path})
        self._save()

    def set_layout_splits(
        self, schema_name: str, table: str, splits: dict[str, Any]
    ) -> None:
        """Attach a splits index to the latest layout (≈ SplitsIndex on
        Layout) and persist."""
        self.latest_layout(schema_name, table)["splits"] = splits
        self._save()

    def get_layouts(self, schema_name: str, table: str) -> list[dict]:
        return self.get_table(schema_name, table)["layouts"]

    def latest_layout(self, schema_name: str, table: str) -> dict:
        layouts = self.get_layouts(schema_name, table)
        if not layouts:
            raise KeyError(f"table {schema_name}.{table} has no layouts")
        return layouts[-1]

    def reader_path(
        self, schema_name: str, table: str, columns: list[str] | None = None
    ) -> str:
        """Preferred read path for a query touching ``columns``.

        Projection-pattern routing (≈ InvertedProjectionsIndex.search:
        ``pixels-common/.../layout/InvertedProjectionsIndex.java:63-99``,
        consumed per Layout.java:49-55): among the layout's materialized
        projections whose column set COVERS the query's columns, pick the
        narrowest (fewest physical columns — least bytes scanned). With no
        covering projection, or no ``columns`` given, fall back to compact
        if present else ordered — the same preference the reference's split
        index applies to compacted layouts."""
        layout = self.latest_layout(schema_name, table)
        if columns:
            need = set(columns)
            covering = [
                p
                for p in layout.get("projections", [])
                if need <= set(p["cols"])
            ]
            if covering:
                best = min(covering, key=lambda p: (len(p["cols"]), p["path"]))
                return best["path"]
        paths = layout["compact_paths"] or layout["ordered_paths"]
        if not paths:
            raise KeyError(f"layout v{layout['version']} has no paths")
        return paths[0]
