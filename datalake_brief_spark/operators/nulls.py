"""Null-handling operators — the reference's signature domain (SURVEY §2.6).

The reference exercises every DataFrameNaFunctions mode on a 9-row CSV
(na.drop how/thresh/subset at reference pyspark-2.ipynb:125-245, type-matched
na.fill at :277, ml.feature.Imputer mean-impute at :286-324). Here the same
semantics are wrapped for lake tables, plus a pure-DataFrame mean/median
impute that avoids pyspark.ml's eager fit when a declarative plan suffices.

Scale note: ``impute_stats`` computes per-column statistics with ONE global
aggregate (a few bytes to the driver-side plan as a broadcast-joined 1-row
frame) — never a collect of data rows.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_nulls(
    df: DataFrame,
    how: str = "any",
    thresh: int | None = None,
    subset: Iterable[str] | None = None,
) -> DataFrame:
    """N1-N5: row-drop by null pattern (reference pyspark-2.ipynb:125,154,
    186,216,245). `thresh` = minimum count of non-null cells to keep a row."""
    return df.na.drop(how=how, thresh=thresh, subset=list(subset) if subset else None)


def fill_nulls(df: DataFrame, value, subset: Iterable[str] | None = None) -> DataFrame:
    """N6: type-matched fill — a string value only fills string columns,
    numeric nulls stay (golden output reference pyspark-2.ipynb:258-269)."""
    return df.na.fill(value, subset=list(subset) if subset else None)


def impute_mean(df: DataFrame, cols: Iterable[str], suffix: str = "_imputed") -> DataFrame:
    """N7 as a declarative plan: per-column mean fill without pyspark.ml.

    Equivalent to ``Imputer(strategy='mean')`` (reference
    pyspark-2.ipynb:286-324) but expressed as one global aggregate
    cross-joined (broadcast, 1 row) back onto the data — Catalyst keeps the
    whole thing in two stages and the fill itself is codegen'd coalesce().
    The ml.feature.Imputer wrapper (eager fit, model reuse) is in mlops.
    """
    cols = list(cols)
    stats = df.agg(*[F.avg(F.col(c)).alias(f"__mean_{c}") for c in cols])
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        # Match Imputer semantics: cast the mean back to the source column
        # type (the reference's golden output shows int columns imputed with
        # truncated ints: age->28, Salary->25750, pyspark-2.ipynb:307-318).
        dtype = dict(df.dtypes)[c]
        out = out.withColumn(c + suffix, F.coalesce(F.col(c), F.col(f"__mean_{c}").cast(dtype)))
    return out.drop(*[f"__mean_{c}" for c in cols])


def impute_median(df: DataFrame, cols: Iterable[str], suffix: str = "_imputed") -> DataFrame:
    """Median impute as a declarative plan (the reference's Imputer comment
    names mean/median/mode as the strategies, pyspark-2.ipynb cell-10).

    Uses the exact interpolated percentile (== SQL quantile_cont) so the
    result is oracle-comparable; at 100 TB swap in percentile_approx —
    tests/test_sketches.py bounds that substitution's error.
    """
    cols = list(cols)
    stats = df.agg(
        *[F.percentile(F.col(c), F.lit(0.5)).alias(f"__med_{c}") for c in cols]
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        dtype = dict(df.dtypes)[c]
        out = out.withColumn(c + suffix, F.coalesce(F.col(c), F.col(f"__med_{c}").cast(dtype)))
    return out.drop(*[f"__med_{c}" for c in cols])


def impute_mode(df: DataFrame, col: str, suffix: str = "_imputed") -> DataFrame:
    """Mode impute (the third Imputer strategy): fill nulls with the most
    frequent non-null value, smallest value winning ties (pyspark.ml
    Imputer's documented tie rule — required for determinism).

    One groupBy+top-1 (TakeOrderedAndProject over the counts) broadcast
    back over the scan; works for any orderable type including strings,
    which mean/median can't impute.
    """
    mode_row = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .count()
        .orderBy(F.col("count").desc(), F.col(col))
        .limit(1)
        .select(F.col(col).alias("__mode"))
    )
    out = df.crossJoin(F.broadcast(mode_row))
    return out.withColumn(col + suffix, F.coalesce(F.col(col), F.col("__mode"))).drop("__mode")


def null_profile(df: DataFrame, cols: Iterable[str] | None = None) -> DataFrame:
    """Data-quality helper: per-column null counts in one aggregate pass."""
    cols = list(cols) if cols else df.columns
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}") for c in cols],
    )
