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
