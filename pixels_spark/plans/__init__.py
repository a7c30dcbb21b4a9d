"""Plan introspection utilities (pushdown/pruning verification)."""

from .pushdown import explain_str, pushed_filters, read_schema_columns

__all__ = ["explain_str", "pushed_filters", "read_schema_columns"]
