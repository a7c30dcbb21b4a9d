"""Declared-query registry.

Every operator family from SURVEY.md §2 is exercised by at least one declared
query. A declared query is a (DataFrame callable, DuckDB oracle SQL) pair; the
driver runs both at sf0.01 and compares row count + schema + order-insensitive
value hash (see __spark_entry__.py). Queries without an SQL-expressible
semantics (custom stateful streaming, LSH bucketing with engine-specific
hashes) omit the oracle and get a rows-only check.

Conventions (FIXTURES.md §Oracle-comparison):
- every computed column is aliased identically in DataFrame code and SQL;
- integer-ish computed columns are cast to BIGINT on both sides (Spark's
  ``year()`` yields INT while DuckDB's yields BIGINT — pin one);
- doubles rely on the driver's 9-significant-digit rounding before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class DeclaredQuery:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle; None → driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, DeclaredQuery] = {}


def declare(name: str, sql: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query callable under ``name``."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate declared query {name!r}")
        REGISTRY[name] = DeclaredQuery(
            name=name, fn=fn, sql=sql, tags=tags, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return wrap


def load_all_modules() -> dict[str, DeclaredQuery]:
    """Import every query module (side effect: fills REGISTRY)."""
    from . import (  # noqa: F401
        clickbench,
        clickbench_str,
        decimalq,
        evalq,
        funnelq,
        graphq,
        joinq,
        reshapeq,
        scalarq,
        setopq,
        sqlq,
        statsq,
        streamq,
        streamq_stateful,
        structq,
        temporalq,
        text_pipeline,
        tpch,
        tpch_ps,
        vector_search,
        windowq,
    )

    return REGISTRY
