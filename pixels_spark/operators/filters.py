"""Predicate domain model → Catalyst expressions.

Reference: ``pixels-executor/src/main/java/io/pixelsdb/pixels/executor/
predicate/`` — ``Filter<T>`` (ranges + discrete values + null handling,
``Filter.java:42-148``), ``Bound.Type {UNBOUNDED, INCLUDED, EXCLUDED}``
(``Bound.java:37``), ``ColumnFilter`` (vectorized evaluation + selectivity,
``ColumnFilter.java:69-220``), ``TableScanFilter`` (conjunction over a
column→filter map evaluated to a row bitmap, ``TableScanFilter.java:40,105``).

Spark mapping: each domain compiles to a Column expression; the conjunction
becomes one ``df.filter`` whose conjuncts Catalyst pushes into the parquet
scan (≈ the reference evaluating domains against row-group stats before
decode). The same structure is JSON round-trippable, like the reference's
JSON-serialized filters in worker inputs.

The reference's domain model is deliberately conjunctive-only (no OR across
columns) — so is TableScanFilter here; arbitrary residuals stay plain
Column expressions, as they stay host-engine residuals in the reference.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class BoundType(str, Enum):
    """≈ Bound.Type (Bound.java:37)."""

    UNBOUNDED = "UNBOUNDED"
    INCLUDED = "INCLUDED"
    EXCLUDED = "EXCLUDED"


@dataclass
class Bound:
    type: BoundType = BoundType.UNBOUNDED
    value: Any = None


@dataclass
class Range:
    """One interval of a column domain (≈ Range.java)."""

    lower: Bound = field(default_factory=Bound)
    upper: Bound = field(default_factory=Bound)

    def to_column(self, c: Column) -> Column:
        conds = []
        if self.lower.type == BoundType.INCLUDED:
            conds.append(c >= F.lit(self.lower.value))
        elif self.lower.type == BoundType.EXCLUDED:
            conds.append(c > F.lit(self.lower.value))
        if self.upper.type == BoundType.INCLUDED:
            conds.append(c <= F.lit(self.upper.value))
        elif self.upper.type == BoundType.EXCLUDED:
            conds.append(c < F.lit(self.upper.value))
        if not conds:
            return F.lit(True)
        out = conds[0]
        for x in conds[1:]:
            out = out & x
        return out


@dataclass
class ColumnFilter:
    """Domain of one column: union of ranges + discrete IN/NOT-IN values +
    null policy (≈ Filter.java fields isAll/isNone/allowNull/onlyNull and
    ColumnFilter.java evaluation)."""

    column: str
    ranges: list[Range] = field(default_factory=list)
    include_values: list[Any] = field(default_factory=list)
    exclude_values: list[Any] = field(default_factory=list)
    allow_null: bool = False
    only_null: bool = False
    is_all: bool = False  # matches everything (≈ Filter.isAll)
    is_none: bool = False  # matches nothing (≈ Filter.isNone)

    def to_column(self) -> Column:
        c = F.col(self.column)
        if self.is_none:
            return F.lit(False)
        if self.only_null:
            return c.isNull()
        if self.is_all:
            return F.lit(True) if not self.exclude_values else ~c.isin(
                *self.exclude_values
            )
        disjuncts: list[Column] = [r.to_column(c) for r in self.ranges]
        if self.include_values:
            disjuncts.append(c.isin(*self.include_values))
        if disjuncts:
            cond = disjuncts[0]
            for d in disjuncts[1:]:
                cond = cond | d
        else:
            cond = F.lit(True)
        if self.exclude_values:
            cond = cond & ~c.isin(*self.exclude_values)
        if self.allow_null:
            cond = cond | c.isNull()
        else:
            # SQL three-valued logic already drops nulls for comparisons,
            # but an all-range-free filter must still exclude them explicitly
            cond = cond & c.isNotNull()
        return cond

    # -- JSON round-trip (≈ the reference's JSON-serialized worker filters) -
    def to_json(self) -> str:
        def enc(o):
            if isinstance(o, (Bound, Range, ColumnFilter)):
                d = dict(o.__dict__)
                return d
            if isinstance(o, BoundType):
                return o.value
            raise TypeError(str(type(o)))

        return json.dumps(self, default=enc)

    @classmethod
    def from_json(cls, s: str) -> "ColumnFilter":
        d = json.loads(s)

        def mk_bound(b: dict) -> Bound:
            return Bound(BoundType(b["type"]), b["value"])

        ranges = [
            Range(mk_bound(r["lower"]), mk_bound(r["upper"])) for r in d.pop("ranges")
        ]
        return cls(ranges=ranges, **d)


@dataclass
class TableScanFilter:
    """Conjunction of per-column domains (≈ TableScanFilter.java:40 —
    SortedMap<columnId, ColumnFilter>; doFilter:105 ANDs the bitmaps)."""

    filters: list[ColumnFilter] = field(default_factory=list)

    def to_column(self) -> Column:
        if not self.filters:
            return F.lit(True)
        cond = self.filters[0].to_column()
        for f in self.filters[1:]:
            cond = cond & f.to_column()
        return cond

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(self.to_column())
