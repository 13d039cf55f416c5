"""Plan inspection helpers — the engine's "did Catalyst do what we meant"
layer (SURVEY §4).

Used by tests to assert the scale posture actually holds: filters pushed to
the parquet scan, projections pruned in ReadSchema, dim joins broadcast,
whole-stage codegen present. At 100 TB these assertions are the difference
between a scan of 2 columns and a scan of 11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def plan_has(df: DataFrame, needle: str) -> bool:
    return needle in formatted_plan(df)


def count_nodes(df: DataFrame, node_name: str) -> int:
    """Count physical-plan nodes by their detail headers ("(N) NodeName") —
    the formatted string shows each node twice (tree + detail), so a raw
    substring count double-counts."""
    import re

    return len(re.findall(rf"^\(\d+\) {re.escape(node_name)}\b", formatted_plan(df), re.M))


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = formatted_plan(df)
    if "PushedFilters: [" not in plan or fragment not in plan:
        raise AssertionError(f"expected pushed filter {fragment!r}; plan:\n{plan}")


def assert_read_schema_only(df: DataFrame, columns: list[str]) -> None:
    """Assert the parquet ReadSchema contains exactly these columns (column
    pruning reached the scan)."""
    plan = formatted_plan(df)
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if not schemas:
        raise AssertionError(f"no ReadSchema in plan:\n{plan}")
    read_cols = sorted(
        c.split(":")[0].strip() for s in schemas for c in s.split(",") if c.strip()
    )
    if read_cols != sorted(columns):
        raise AssertionError(f"ReadSchema {read_cols} != expected {sorted(columns)}")


def assert_broadcast_join(df: DataFrame) -> None:
    if not plan_has(df, "BroadcastHashJoin"):
        raise AssertionError(f"expected BroadcastHashJoin; plan:\n{formatted_plan(df)}")


def assert_no_cartesian(df: DataFrame) -> None:
    if plan_has(df, "CartesianProduct"):
        raise AssertionError(f"unexpected CartesianProduct; plan:\n{formatted_plan(df)}")


def _split_top_level(s: str) -> list[str]:
    """Split a physical-plan node argument string on top-level "], ["
    boundaries (bracket-depth tracked — window/order expressions nest
    brackets freely)."""
    parts, depth, cur = [], 0, []
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if depth == 0 and s.startswith("], [", i):
            cur.append("]")
            parts.append("".join(cur))
            cur = []
            i += 3
            depth += 1
        else:
            cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return parts


def unpartitioned_window_count(df: DataFrame) -> int:
    """Number of physical Window nodes with NO partition spec — each one
    is an Exchange SinglePartition funneling its whole input frame
    through one reducer. The scale lint (tests/test_plans.py) requires
    zero of these per registry entry unless the entry is allow-listed
    with a documented driver-scale frame bound (e.g. the ≤257-row bin
    offsets of windows.two_phase_rank / text.seeded_shuffle). Detected
    structurally from the node's top-level bracket groups: a fully
    specified Window prints three ([funcs], [partition], [order]) —
    fine; two groups is unpartitioned ONLY when the second is an ORDER
    spec (ASC/DESC markers; a partition-only window like
    ``Window.partitionBy(k)`` with a whole-partition frame also prints
    two groups and is NOT a funnel); one group ([funcs] alone, e.g.
    ``Window.partitionBy()``) is an unpartitioned whole-relation frame."""
    import re

    plan = df._jdf.queryExecution().sparkPlan().toString()  # noqa: SLF001
    n = 0
    for line in plan.splitlines():
        m = re.match(r"^[\s:+*\-()0-9]*Window\s+(\[.*)$", line)
        if not m:
            continue
        groups = _split_top_level(m.group(1))
        if len(groups) == 1 or (
            len(groups) == 2
            and re.search(r"\b(ASC|DESC) NULLS (FIRST|LAST)\b", groups[1])
        ):
            n += 1
    return n
