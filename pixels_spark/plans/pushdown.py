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


def plan_anti_patterns(df: DataFrame) -> list[str]:
    """Scan a physical plan for scale anti-patterns → list of findings
    (empty = clean). BroadcastNestedLoopJoin is reported only when the
    broadcast side is not an explicit tiny frame the operator chose to
    broadcast — we can't see intent in the plan string, so BNLJ is
    returned as its own finding and callers allowlist the queries whose
    BNLJ is a deliberate scalar/tiny broadcast (theta joins, scalar
    thresholds)."""
    plan = explain_str(df, "simple")
    found = [msg for pat, msg in ANTI_PATTERNS.items() if pat in plan]
    if "BroadcastNestedLoopJoin" in plan:
        found.append("broadcast nested-loop join (verify the broadcast side is tiny)")
    return found
