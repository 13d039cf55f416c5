"""Join operators (SURVEY §2.7 — capability extension; the reference has no
joins, but its star-schema lake layout and the 100 TB mandate require them).

Strategy selection is Catalyst's job; this layer encodes the *posture*:

- ``join_dim``: explicit ``broadcast()`` hint for dimension tables. At 100 TB
  the fact side never shuffles for a dim join — each task streams its scan
  partition against an in-memory hash map of the dim.
- ``join_fact``: shuffle equi-join (sort-merge or shuffled-hash, AQE picks,
  and AQE skew-join splits oversized partitions at runtime). Callers can
  pre-repartition both sides on the key to reuse one exchange across stages.
- semi/anti joins for EXISTS / NOT EXISTS shapes — never a distinct+join.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join_dim(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Fact × dimension equi-join with an explicit broadcast hint."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def join_fact(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """Fact × fact equi-join: both sides shuffle on the key; AQE handles
    partition coalescing and skew splitting at runtime."""
    return left.join(right, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """EXISTS: rows of ``left`` with ≥1 match — right side never widens the row."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """NOT EXISTS: rows of ``left`` with no match."""
    return left.join(right, on=on, how="left_anti")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-mitigating equi-join: salt the (possibly skewed) left key and
    explode the right side across ``salt_buckets`` replicas.

    AQE's skew-join split handles most skew automatically; this explicit
    form remains for extreme hot keys (one key >> one executor's memory)
    where replicating the small side is cheaper than splitting.
    """
    salted_l = left.withColumn("__salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    salted_r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted_l.join(salted_r, on=[key, "__salt"]).drop("__salt")
