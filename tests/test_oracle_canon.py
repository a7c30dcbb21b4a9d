"""Oracle output-boundary canonicalization lint.

VERDICT r5 diagnosed the round's only driver-red rows: the driver's value
hasher canonicalizes DECIMAL outputs asymmetrically between engines (one
side drops trailing fractional zeros), so two bit-identical decimal
results can hash differently. The engine-side fix is to surface final
decimal columns as strings (queries/decimalq.py); THIS test makes the
class of failure structurally impossible to reintroduce: every oracled
query's DuckDB output schema must use only types the driver hasher is
known to canonicalize symmetrically (FIXTURES.md §Decimal-hashing).

The lint is type-based, not value-based, on purpose: a value-based check
("no decimal value with trailing zeros at sf0.001") passes or fails by
data luck — exactly how dec_money_rollup stayed green in r5 while
dec_net_revenue went red. A DECIMAL output column is a hazard at *some*
scale factor regardless of what sf0.001 happens to produce.

Planning the oracle SQL in DuckDB is enough (relation types come from the
bind phase, no execution), so the whole 168-query lint runs in seconds.
"""

from __future__ import annotations

import re

import pytest

from pixels_spark.queries import load_all_modules

from .oracle import duckdb_connection

# Types the driver hasher treats identically for both engines:
# integers (Spark has no int128, so HUGEINT would already fail the schema
# gate), floats (driver rounds to 9 significant digits on both sides),
# varchar (hashed verbatim), bool, date, timestamp (µs canonical), and
# lists/structs of the same. Everything else — DECIMAL (trailing-zero
# canonicalization, the r5 failure), TIME, INTERVAL, BLOB, UUID, ENUM —
# must be cast to a safe type at the output boundary on BOTH engines.
_SAFE = re.compile(
    r"^(TINYINT|SMALLINT|INTEGER|BIGINT|UTINYINT|USMALLINT|UINTEGER|UBIGINT"
    r"|FLOAT|DOUBLE|VARCHAR|BOOLEAN|DATE|TIMESTAMP|TIMESTAMP_NS|TIMESTAMP_MS)$"
)


def _leaf_types(t: str) -> list[str]:
    """Flatten a DuckDB type string to its leaf scalar type names."""
    t = t.strip()
    if t.endswith("[]"):
        return _leaf_types(t[:-2])
    m = re.match(r"^(STRUCT|MAP)\((.*)\)$", t)
    if m:
        # split the field list on top-level commas, drop field names
        body, leaves, depth, cur = m.group(2), [], 0, ""
        for ch in body:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                leaves.append(cur)
                cur = ""
            else:
                cur += ch
        leaves.append(cur)
        out = []
        for leaf in leaves:
            leaf = leaf.strip()
            # STRUCT fields are "name TYPE"; MAP entries are bare types
            parts = leaf.split(None, 1)
            out.extend(_leaf_types(parts[-1]))
        return out
    return [t]


@pytest.fixture(scope="module")
def oracle_types(sf_dir):
    reg = load_all_modules()
    con = duckdb_connection(sf_dir)
    try:
        out = {}
        for name, q in reg.items():
            if q.sql is None:
                continue
            rel = con.sql(q.sql)  # bind only — no execution
            out[name] = list(zip(rel.columns, (str(t) for t in rel.types)))
        return out
    finally:
        con.close()


def test_no_hash_unsafe_output_types(oracle_types):
    offenders = []
    for name, cols in oracle_types.items():
        for col, t in cols:
            for leaf in _leaf_types(t):
                if not _SAFE.match(leaf):
                    offenders.append(f"{name}.{col}: {t}")
    assert not offenders, (
        "oracled queries emit driver-hash-unsafe output types (cast to "
        "VARCHAR/DOUBLE/BIGINT at the boundary on BOTH engines — "
        "FIXTURES.md §Decimal-hashing):\n" + "\n".join(offenders)
    )


def test_lint_catches_decimal_regression(sf_dir):
    """Prove the lint would have caught the r5 failure: a DECIMAL output
    column (the pre-fix dec_net_revenue shape) must be flagged."""
    con = duckdb_connection(sf_dir)
    try:
        rel = con.sql(
            "SELECT CAST(sum(l_extendedprice * (1 - l_discount)) "
            "AS DECIMAL(38,4)) AS net_revenue FROM lineitem"
        )
        types = [str(t) for t in rel.types]
    finally:
        con.close()
    assert any(
        not _SAFE.match(leaf) for t in types for leaf in _leaf_types(t)
    ), "lint failed to flag a DECIMAL output column"
