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


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: for each user, step k counts only if an
    event of that type occurred STRICTLY AFTER the user's completion time
    of step k-1 (the earliest qualifying time, so a user can't satisfy a
    later step with an event that preceded the earlier one). Returns one
    row per step: (step, step_order, n_users).

    Shape (and why it scales): one keyed aggregation per step, each
    shuffling on the SAME user key, and every intermediate is one row per
    surviving user (monotonically shrinking). Each stage's survivor set is
    lazily localCheckpoint-ed: stage k's subtree executes ONCE and both
    consumers (stage k+1's join and stage k's count) read the
    materialized rows — without this, Spark's DAG recomputes every prior
    stage per branch and the event scan count grows O(steps²). Each
    step's scan pushes its own event_type filter to the source. No
    windows over the full event stream, no per-user event collection —
    at 100 TB the cost is |steps| filtered scans + |steps| keyed aggs
    over tiny survivor sets (the same lineage-truncation pattern as the
    connected-components loop in operators/dedup.py)."""
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
        .localCheckpoint(eager=False)
    )
    stages = [(steps[0], 0, cur)]
    for i, s in enumerate(steps[1:], start=1):
        cur = (
            events.filter(F.col(type_col) == s)
            .join(cur.select(user_col, "__t"), user_col)
            .filter(F.col(ts_col) > F.col("__t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("__t"))
            .localCheckpoint(eager=False)
        )
        stages.append((s, i, cur))
    out = None
    for s, i, df in stages:
        row = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(s).alias("step"),
            F.lit(i).cast("long").alias("step_order"),
            F.col("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_weeks: int | None = None,
) -> DataFrame:
    """Weekly retention cohorts: users are grouped by the week of their
    FIRST event (cohort), and each (cohort_week, week_offset) cell counts
    the distinct users of that cohort active ``week_offset`` weeks later
    (offset 0 = the cohort week itself). Returns
    (cohort_week, week_offset, n_active).

    Shape: one keyed agg for first-seen (shuffle on user), one join back
    on the same key (partitioning reused), then a count-distinct keyed by
    the small (cohort, offset) grid — the classic two-shuffle cohort plan;
    nothing is proportional to users × weeks except the final grid."""
    first = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("__cohort")
    )
    j = events.select(user_col, ts_col).join(first, user_col)
    offset = (
        F.datediff(F.date_trunc("week", F.col(ts_col)), F.col("__cohort")) / 7
    ).cast("long")
    grid = (
        j.select(
            F.col("__cohort").cast("date").alias("cohort_week"),
            offset.alias("week_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_active"))
    )
    if max_offset_weeks is not None:
        grid = grid.filter(F.col("week_offset") <= max_offset_weeks)
    return grid
