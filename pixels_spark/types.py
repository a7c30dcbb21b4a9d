"""Pixels → Spark type mapping (SURVEY.md §1.2).

Reference analog: ``pixels-core/.../TypeDescription.java:192-218`` — the
``Category`` enum with SQL-name aliases, parsed from DDL-ish strings by the
metadata layer. This module is the Spark-side equivalent: a parser from
those type names (with parameters) to ``pyspark.sql.types`` objects, used
by the metadata catalog (``storage/metadata.py`` stores ``[{name, type}]``)
to produce real ``StructType`` schemas.

Two types need conventions rather than direct equivalents:

- TIME (millis-of-day int, ``TimeColumnVector``): Spark has no time-of-day
  type, so per SURVEY §1.2 it maps to ``IntegerType`` carrying
  milliseconds since midnight (0..86_399_999), with helper Columns below
  for conversion to/from timestamps and display strings. The integer form
  is order-preserving and arithmetic-friendly, so filters/group-bys on it
  push down and codegen like any int column.
- VECTOR(dim) (``proto/pixels.proto:127``): ``ArrayType(DoubleType)``;
  the dimension is metadata-level only (enforced by writers, not the type).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

MILLIS_PER_DAY = 86_400_000

_SIMPLE: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "byte": T.ByteType(),
    "tinyint": T.ByteType(),
    "short": T.ShortType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "real": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "date": T.DateType(),
    "time": T.IntegerType(),  # millis-of-day convention, see module doc
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
    "varbinary": T.BinaryType(),
}

_PARAM = re.compile(r"^\s*([a-z]+)\s*\(\s*([0-9]+)\s*(?:,\s*([0-9]+)\s*)?\)\s*$")


def parse_type(name: str) -> T.DataType:
    """Parse a Pixels SQL type name (TypeDescription.java aliases) to a
    Spark DataType. Parameters follow the reference's grammar:
    ``decimal(p,s)``, ``char(n)``/``varchar(n)``, ``binary(n)``/
    ``varbinary(n)``, ``timestamp(p)``, ``vector(dim)``,
    ``struct<f:type,...>``."""
    s = name.strip().lower()
    if s in _SIMPLE:
        return _SIMPLE[s]
    if s in ("char", "varchar"):
        return T.StringType()
    if s == "decimal":
        return T.DecimalType(38, 18)
    if s == "vector":
        return T.ArrayType(T.DoubleType())
    m = _PARAM.match(s)
    if m:
        base, p1, p2 = m.group(1), int(m.group(2)), m.group(3)
        if base == "decimal":
            return T.DecimalType(p1, int(p2) if p2 is not None else 0)
        if base in ("char", "varchar"):
            return T.StringType()  # length enforced by writers, not the type
        if base in ("binary", "varbinary"):
            return T.BinaryType()
        if base == "timestamp":  # precision 0-6; Spark is fixed micros
            if p1 > 6:
                raise ValueError(f"timestamp precision {p1} > 6: {name!r}")
            return T.TimestampType()
        if base == "vector":
            return T.ArrayType(T.DoubleType())
        raise ValueError(f"unknown parameterized type {name!r}")
    if s.startswith("struct<") and s.endswith(">"):
        fields = []
        for part in _split_top_level(s[len("struct<") : -1]):
            fname, _, ftype = part.partition(":")
            if not ftype:
                raise ValueError(f"bad struct field {part!r} in {name!r}")
            fields.append(T.StructField(fname.strip(), parse_type(ftype)))
        return T.StructType(fields)
    raise ValueError(f"unknown Pixels type {name!r}")


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside ``<>`` or ``()``."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def to_struct(columns: list[dict[str, str]]) -> T.StructType:
    """``[{name, type}]`` (the metadata store's column form) → StructType."""
    return T.StructType(
        [T.StructField(c["name"], parse_type(c["type"])) for c in columns]
    )


# ---------------------------------------------------------------------------
# TIME helpers (millis-of-day int convention)


def _idiv(a: Column, b: int) -> Column:
    """Integer division for non-negative values (exact: operands < 2^53)."""
    return F.floor(a / F.lit(b)).cast("long")


def time_from_timestamp(ts: Column) -> Column:
    """Millis-of-day (int) of a timestamp column — the TIME representation.

    Pure integer arithmetic on epoch micros (UTC), so it pushes down /
    codegens; no string round-trip."""
    return _idiv(F.pmod(F.unix_micros(ts), F.lit(86_400_000_000)), 1000).cast("int")


def time_from_string(s: Column) -> Column:
    """Parse ``HH:mm:ss[.SSS]`` to millis-of-day int (null if malformed)."""
    h = F.regexp_extract(s, r"^(\d{1,2}):(\d{2}):(\d{2})(?:\.(\d{1,3}))?$", 1)
    m = F.regexp_extract(s, r"^(\d{1,2}):(\d{2}):(\d{2})(?:\.(\d{1,3}))?$", 2)
    sec = F.regexp_extract(s, r"^(\d{1,2}):(\d{2}):(\d{2})(?:\.(\d{1,3}))?$", 3)
    ms = F.regexp_extract(s, r"^(\d{1,2}):(\d{2}):(\d{2})(?:\.(\d{1,3}))?$", 4)
    ok = h != ""
    millis = (
        h.cast("int") * 3_600_000
        + m.cast("int") * 60_000
        + sec.cast("int") * 1000
        + F.coalesce(F.rpad(ms, 3, "0").cast("int"), F.lit(0))
    )
    valid = (
        ok
        & (h.cast("int") < 24)
        & (m.cast("int") < 60)
        & (sec.cast("int") < 60)
    )
    return F.when(valid, millis).cast("int")


def time_to_string(millis: Column) -> Column:
    """Millis-of-day int → ``HH:mm:ss.SSS`` display string."""
    h = F.lpad(_idiv(millis, 3_600_000).cast("string"), 2, "0")
    m = F.lpad(_idiv(F.pmod(millis, F.lit(3_600_000)), 60_000).cast("string"), 2, "0")
    s = F.lpad(_idiv(F.pmod(millis, F.lit(60_000)), 1000).cast("string"), 2, "0")
    ms = F.lpad(F.pmod(millis, F.lit(1000)).cast("string"), 3, "0")
    return F.concat(h, F.lit(":"), m, F.lit(":"), s, F.lit("."), ms)


def type_max_length(name: str) -> int | None:
    """Max length for parameterized char/varchar/binary/varbinary Pixels
    types (``TypeDescription.getMaxLength``); None for every other type or
    an unparameterized string/binary."""
    m = _PARAM.match(name.strip().lower())
    if m and m.group(1) in ("char", "varchar", "binary", "varbinary"):
        return int(m.group(2))
    return None
