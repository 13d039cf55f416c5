"""Window / sort / limit / set operators (SURVEY §2.8 — extension band).

The reference's only ordering/limit surface is client-side ``head(3)``/
``show()`` (reference pyspark-1.ipynb:130,172). For a real engine we add the
standard analytic layer. Scale posture:

- top-k global: ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject,
  a per-partition heap + driver merge; no full sort, no full shuffle.
- top-k per group: window row_number over a hash-partitioned sort. One
  shuffle on the partition keys; ties broken deterministically by caller-
  supplied tiebreaker columns (oracle determinism requirement, SURVEY §7.4).
- sessionize: lag + cumulative-sum-of-gaps — the classic two-window
  formulation, both windows share one partitioning (single shuffle).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: Iterable[Column], k: int) -> DataFrame:
    """Global top-k: TakeOrderedAndProject (heap per partition, merge on
    driver) — never a total sort. Include a unique tiebreaker in order_by
    for deterministic results."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    partition_by: Iterable[str],
    order_by: Iterable[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number window. AQE coalesces the
    post-shuffle partitions; the filter on rank prunes before any
    downstream exchange."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def running_agg(
    df: DataFrame,
    partition_by: Iterable[str],
    order_by: Iterable[Column],
    agg_expr: Column,
    name: str,
) -> DataFrame:
    """Cumulative aggregate (rows unbounded-preceding..current) per group."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(name, agg_expr.over(w))


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the previous
    event of the same user exceeds ``gap_seconds``. Both windows partition on
    the user key, so Catalyst plans a single shuffle + single sort."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col))
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), F.lit(1)).otherwise(F.lit(0))
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def dedup_sorted(df: DataFrame, keys: Iterable[str], order_by: Iterable[Column]) -> DataFrame:
    """Keep exactly one deterministic row per key (first under ``order_by``).
    Unlike dropDuplicates — which keeps an arbitrary row — this is
    oracle-stable. One shuffle on the keys."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
