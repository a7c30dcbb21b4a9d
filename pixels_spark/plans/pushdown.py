"""Explain-plan introspection: verify pushdown + pruning actually happen.

The reference's scan-time skipping (file/row-group predicate evaluation,
``pixels-core/.../reader/PixelsRecordReaderImpl.java:345-451``; projection
``PixelsReaderOption.includeCols``) maps to Parquet PushedFilters + ReadSchema
pruning in Spark. These helpers parse the formatted plan so tests can assert
that a query's filters reached the scan and only needed columns are read —
the difference between touching 100 TB and touching 2 columns of one
partition.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter expressions that reached the parquet scan."""
    plan = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters:\s*\[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (union over scans)."""
    plan = explain_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema:\s*struct<([^>]*)>", plan):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def scan_count(df: DataFrame) -> int:
    return explain_str(df).count("Scan parquet")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def codegen_stage_count(df: DataFrame, execute: bool = False) -> int:
    """Number of WholeStageCodegen spans — wider is better (more of the plan
    stays in generated JVM code). With AQE the annotations only appear once
    the plan is finalized, so pass ``execute=True`` (runs the query) to
    inspect the final plan. Spans show as ``WholeStageCodegen (n)`` in
    formatted mode and ``*(n)`` in simple mode."""
    if execute:
        # collect() (not a write/count wrapper — those build a *new* query
        # execution) finalizes this DataFrame's own AQE plan. Only use on
        # small results.
        df.collect()
    plan = explain_str(df, "simple") + explain_str(df, "formatted")
    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    ids |= set(re.findall(r"\*\((\d+)\)", plan))
    return len(ids)


ANTI_PATTERNS = {
    # CartesianProduct with no broadcast: O(n*m) row expansion
    "CartesianProduct": "unbroadcast cartesian product",
    # row-at-a-time Python UDF (BatchEvalPython); Arrow paths show as
    # ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas instead
    "BatchEvalPython": "row-wise Python UDF in the plan",
}


def _bracket_groups(s: str) -> list[str]:
    """Top-level ``[...]`` groups of a plan line (expressions nest
    brackets, so a depth counter, not a regex)."""
    groups: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window exec nodes with an EMPTY partition spec — a single task
    sorts and frames the whole input, the one shape that cannot scale
    out no matter how many executors exist. A ``Window`` plan line is
    ``Window [exprs], [partitionSpec], [orderSpec]``; when unpartitioned
    the middle group vanishes, leaving 2 groups whose second is the
    order spec (contains ASC/DESC) — or 1 group for an unordered global
    frame. Partitioned-but-unordered windows also print 2 groups, but
    their second group carries no sort direction, which disambiguates.
    ``WindowGroupLimit`` nodes (rank-pushdown, bounded by construction)
    are not flagged."""
    import re

    plan = explain_str(df, "simple")
    offenders = []
    for line in plan.split("\n"):
        if not re.search(r"\bWindow \[", line):
            continue
        groups = _bracket_groups(line)
        if len(groups) >= 3:
            continue  # explicit partition spec
        if len(groups) == 2 and not re.search(
            r"\b(ASC|DESC)\b", groups[1]
        ):
            continue  # partitioned, no order spec
        offenders.append(line.strip())
    return offenders


def plan_anti_patterns(df: DataFrame) -> list[str]:
    """Scan a physical plan for scale anti-patterns → list of findings
    (empty = clean). BroadcastNestedLoopJoin is reported only when the
    broadcast side is not an explicit tiny frame the operator chose to
    broadcast — we can't see intent in the plan string, so BNLJ is
    returned as its own finding and callers allowlist the queries whose
    BNLJ is a deliberate scalar/tiny broadcast (theta joins, scalar
    thresholds). Likewise an unpartitioned (global) Window is a finding
    unless the caller allowlists the query with the row bound that makes
    the single-task sort safe (a global window over ≤N rows is a scalar
    pattern, not a scale risk)."""
    plan = explain_str(df, "simple")
    found = [msg for pat, msg in ANTI_PATTERNS.items() if pat in plan]
    if "BroadcastNestedLoopJoin" in plan:
        found.append("broadcast nested-loop join (verify the broadcast side is tiny)")
    for line in unpartitioned_windows(df):
        found.append(f"unpartitioned global window: {line[:120]}")
    return found
