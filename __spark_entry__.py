"""Driver contract for the spark-graft builder (PySpark target).

Backed by the ``datalake_brief_spark`` engine. ``queries()`` exposes one
entry per implemented SURVEY §2 operator; ``oracle_sql()`` the matching
DuckDB oracle (hash-family / approximate ops are intentionally oracle-free —
they're verified in tests/ against exact ground truth instead).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datalake_brief_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return _q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
