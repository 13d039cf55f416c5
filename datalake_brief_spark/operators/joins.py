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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_tiebreak: str | None = None,
    direction: str = "backward",
    tolerance: "float | None" = None,
) -> DataFrame:
    """As-of join: for each ``left`` row, attach the values of the nearest
    ``right`` row for the same key — ``direction="backward"`` (default)
    takes the most recent right row with ``right_ts <= left_ts``,
    ``"forward"`` the earliest with ``right_ts >= left_ts`` (the pandas
    merge_asof surface). ``tolerance`` (same units as the timestamp
    columns' seconds — e.g. 3600 for one hour) nulls the attached values
    when the matched right row is farther than that from ``left_ts``.

    Spark has no native as-of join; this is the scalable union-stream
    formulation: tag both sides, union, and carry the right side's values
    across with last/first(ignorenulls) over one (key, time)-ordered
    window — a SINGLE shuffle on the key, no per-group Python (contrast
    pd.merge_asof-in-applyInPandas, which pays Arrow transfer for all
    rows). Tolerance rides the same window: the matched right timestamp
    is carried as one more value column and compared after the carry —
    no second pass.

    ``direction="nearest"`` completes the merge_asof surface: both
    carries run over the SAME union and key partitioning (one exchange,
    two sorted windows) and each left row takes whichever side is
    closer in time; EQUAL distances prefer the backward match (so a
    same-instant right row — distance 0 both ways — resolves
    identically to the single-direction forms).

    Ties: a right row at exactly left_ts matches in both directions;
    among right rows with equal timestamps the one with the greatest
    ``right_tiebreak`` wins (required for deterministic output).
    """
    from pyspark.sql import Window

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    back = direction == "backward"
    lcols = [c for c in left.columns]
    carry = list(value_cols) + ["__mt"]
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
        F.lit(None).cast("double").alias("__v___mt"),
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(0)).cast("long").alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        F.col(right_ts).cast("double").alias("__v___mt"),
    )
    # Backward: right rows sort before left rows at equal timestamps
    # (__side 0 < 1) so same-instant right rows are visible to the left
    # row looking back; "last" + greatest-__tb picks deterministically.
    # Forward mirrors it: descending side puts right rows AFTER the left
    # row at equal timestamps, the frame flips to currentRow..following,
    # and "first" picks the earliest qualifying right row (descending
    # __tb keeps the greatest-tiebreak convention for equal timestamps).
    w_back = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__side").desc(), F.col("__tb").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    unioned = l.unionByName(r)
    if direction == "nearest":
        for c in carry:
            unioned = unioned.withColumn(
                f"__b_{c}", F.last(f"__v_{c}", ignorenulls=True).over(w_back)
            ).withColumn(
                f"__f_{c}", F.first(f"__v_{c}", ignorenulls=True).over(w_fwd)
            )
        t = F.col("__t").cast("double")
        d_back = F.abs(t - F.col("__b___mt"))
        d_fwd = F.abs(F.col("__f___mt") - t)
        use_back = F.col("__b___mt").isNotNull() & (
            F.col("__f___mt").isNull() | (d_back <= d_fwd)
        )
        for c in carry:
            unioned = unioned.withColumn(
                f"__v_{c}",
                F.when(use_back, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}")),
            ).drop(f"__b_{c}", f"__f_{c}")
    else:
        pick = (
            (lambda c: F.last(c, ignorenulls=True).over(w_back))
            if back
            else (lambda c: F.first(c, ignorenulls=True).over(w_fwd))
        )
        for c in carry:
            unioned = unioned.withColumn(f"__v_{c}", pick(f"__v_{c}"))
    out = unioned.filter(F.col("__side") == 1)
    if tolerance is not None:
        within = (
            F.abs(F.col("__t").cast("double") - F.col("__v___mt"))
            <= F.lit(float(tolerance))
        )
        for c in value_cols:
            out = out.withColumn(
                f"__v_{c}", F.when(within, F.col(f"__v_{c}"))
            )
    return out.select(
        *lcols, *[F.col(f"__v_{c}").alias(c) for c in value_cols]
    )


def range_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Range (band) join: fact rows matched to [lo, hi) intervals.

    For a small band dimension the right plan is broadcast + range predicate
    (BroadcastNestedLoopJoin: each task scans its fact partition against the
    in-memory band list — no shuffle). For large interval tables, bucketize
    both sides to an equi-join key first; this operator picks broadcast
    because band dims (histograms, SLA tiers, rate cards) are small by
    construction.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(bands), on=cond, how="left")


def semi_reduced_join(
    big: DataFrame,
    filtered: DataFrame,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join with an explicit semi-join reduction of the big probe
    side: broadcast the *distinct join keys* of the (already filtered,
    selective) build side and semi-join them into ``big`` BEFORE the real
    shuffle join.

    Why this exists at 100 TB: a fact×fact join shuffles both inputs on the
    key. When one side carries a selective predicate, most of the other
    side's shuffle is wasted — rows whose keys can never match are hashed,
    serialized, spilled, and then dropped by the join. Pre-filtering the
    probe side with the build side's key set moves that drop BEFORE the
    exchange, so shuffle volume tracks the match cardinality, not the table
    size. This is classic semi-join reduction (Bernstein & Chiu, JACM 1981)
    — the same idea Spark's runtime row-level filtering implements with a
    Bloom filter (``spark.sql.optimizer.runtime.bloomFilter.enabled``,
    SPARK-32268) when its size thresholds trigger; the explicit form here is
    deterministic, exact (no false positives), and plan-assertable at any
    scale.

    The key set must be broadcastable — i.e. the filtered side is selective.
    That's the precondition for the optimization to pay off at all; when the
    filter isn't selective, use a plain ``join_fact`` (the reduction would
    broadcast a huge key list for nothing).

    The reduction is exactly a ``left_semi`` equi-join, so Catalyst folds it
    into a BroadcastHashJoin(LeftSemi) on the scan side of the exchange —
    asserted in ``tests/test_plans.py``.
    """
    keys = filtered.select(key).distinct()
    reduced = big.join(F.broadcast(keys), on=key, how="left_semi")
    return reduced.join(filtered, on=key, how=how)


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


def interval_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    keys: list[str] | None = None,
    band_seconds: int = 3600,
) -> DataFrame:
    """Overlap join of two interval relations (a_start ≤ b_end AND
    b_start ≤ a_end, closed intervals), returning every a-row × b-row
    combination that overlaps, plus ``overlap_us`` (microseconds —
    unix_timestamp's whole-second floor would make sub-second overlaps
    engine-ambiguous).

    A naive non-equi join plans BroadcastNestedLoopJoin — quadratic and
    broadcast-bound. This operator BANDS time instead: each interval
    explodes to the ``band_seconds`` buckets it touches, candidates come
    from a hash-partitionable equi-join on (keys…, bucket), the exact
    overlap predicate filters, and a distinct collapses intervals that
    met in several buckets. That is the standard distributed range-join
    recipe (DuckDB/Spark range-join optimizations do the same binning
    internally where available). Cost is linear in Σ interval_len /
    band_seconds — pick a band near the typical interval length; at
    100 TB the bucket key shards the time axis across executors instead
    of funneling through one broadcast. Columns of ``a`` and ``b`` must
    be disjoint apart from ``keys``."""
    keys = keys or []
    sec = F.lit(band_seconds).cast("long")

    def banded(df, start, end):
        b0 = F.floor(F.unix_timestamp(F.col(start)) / sec).cast("long")
        b1 = F.floor(F.unix_timestamp(F.col(end)) / sec).cast("long")
        return df.withColumn("__bucket", F.explode(F.sequence(b0, b1)))

    ab = banded(a, a_start, a_end)
    bb = banded(b, b_start, b_end)
    cand = ab.join(bb, [*keys, "__bucket"]).drop("__bucket").distinct()
    overlap = cand.filter(
        (F.col(a_start) <= F.col(b_end)) & (F.col(b_start) <= F.col(a_end))
    )
    dur = F.least(
        F.unix_micros(F.col(a_end)), F.unix_micros(F.col(b_end))
    ) - F.greatest(
        F.unix_micros(F.col(a_start)), F.unix_micros(F.col(b_start))
    )
    return overlap.withColumn("overlap_us", dur.cast("long"))
