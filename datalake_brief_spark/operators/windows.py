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


def distribution_ranks(
    df: DataFrame,
    partition_by: Iterable[str],
    order_by: Iterable[Column],
    n_tiles: int = 10,
) -> DataFrame:
    """Distribution-position analytics per group: ntile(n) equi-depth
    bucket, percent_rank (rank-1)/(n-1), and cume_dist (rows ≤ current)/n
    over one shared window. All three are rank-family functions over the
    SAME (partition, sort) pair, so Catalyst plans a single exchange +
    single sort and evaluates the trio in one Window operator — adding
    the second and third function is free at 100 TB. Callers must include
    a unique tiebreaker in ``order_by``: percent_rank/cume_dist are
    tie-sensitive, and a nondeterministic tie order would flip the
    driver's value hash."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.select(
        *df.columns,
        F.ntile(n_tiles).over(w).alias("tile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_tiebreak: Iterable[Column] = (),
) -> DataFrame:
    """Effective-dated (SCD type-2 style) history: each record of a key
    becomes a validity interval [valid_from, valid_to) closed by the NEXT
    record's timestamp; the latest record per key has valid_to NULL and
    is_current true, and ``version`` numbers the key's history from 1.
    lead() and row_number() share one window, so the whole history build
    is a single shuffle+sort on the key — the standard way to turn an
    append-only CDC/event stream into a point-in-time-joinable dimension
    at any scale."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), *order_tiebreak)
    return df.select(
        *df.columns,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w).alias("valid_to"),
        F.lead(F.col(ts_col)).over(w).isNull().alias("is_current"),
        F.row_number().over(w).alias("version"),
    )


def islands(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Gaps-and-islands: collapse each maximal run of consecutive rows
    (ordered by ``ts_col`` within ``key_col``) sharing the same
    ``state_col`` value into one island row (key, state, island_start,
    island_end, n_events). Uses the classic two-row_number difference —
    rn over (key) minus rn over (key, state) is constant exactly within
    a run — so the whole operator is ONE shuffle on the key: both
    windows and the final groupBy share the key partitioning, and the
    island grouping key (key, state, rn_diff) is key-prefixed so the agg
    is partial-aggregated map-side. ``tiebreak_col`` must make the sort
    total (timestamp collisions would make runs nondeterministic)."""
    ob = [F.col(ts_col), F.col(tiebreak_col)]
    w_all = Window.partitionBy(key_col).orderBy(*ob)
    w_state = Window.partitionBy(key_col, state_col).orderBy(*ob)
    grp = (F.row_number().over(w_all) - F.row_number().over(w_state)).alias("__g")
    return (
        df.select(F.col(key_col), F.col(state_col), F.col(ts_col), grp)
        .groupBy(key_col, state_col, "__g")
        .agg(
            F.min(ts_col).alias("island_start"),
            F.max(ts_col).alias("island_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("__g")
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
    precision: int = 6,
) -> DataFrame:
    """First-order Markov transition statistics over per-key state
    sequences: count (prev_state → state) steps across all keys and
    derive P(next | prev) — the user-journey / crawl-frontier / token-
    stream model you fit before simulating or compressing sequences. One
    lag window per key (single shuffle), a partial-aggregated count on
    the tiny state×state grid, and the row-conditional probabilities
    derive from exact integer counts — engine-portable. The sort must be
    total (``tiebreak_col``), or collision rows would make transitions
    nondeterministic."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    steps = df.select(
        F.lag(F.col(state_col)).over(w).alias("prev_state"),
        F.col(state_col).alias("next_state"),
    ).filter(F.col("prev_state").isNotNull())
    counts = steps.groupBy("prev_state", "next_state").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = Window.partitionBy("prev_state")
    return counts.select(
        "prev_state",
        "next_state",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), precision).alias("prob"),
    )


def running_distinct(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    tiebreak_col: str,
    out_col: str = "n_distinct_so_far",
) -> DataFrame:
    """Cumulative distinct count per key: at each row, how many distinct
    ``value_col`` values the key has produced up to and including it —
    the vocabulary-growth / feature-discovery curve. COUNT(DISTINCT) is
    not a window function anywhere; the standard rewrite marks each
    value's FIRST occurrence with one row_number window and running-sums
    the flags with a second — two windows on key-prefixed partitionings,
    so the (key, value) exchange feeds the (key) window without a third
    shuffle of the fact."""
    ob = [F.col(ts_col), F.col(tiebreak_col)]
    w_first = Window.partitionBy(key_col, value_col).orderBy(*ob)
    w_run = (
        Window.partitionBy(key_col)
        .orderBy(*ob)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flag = (F.row_number().over(w_first) == 1).cast("long")
    return df.select(
        *df.columns, F.sum(flag).over(w_run).alias(out_col)
    )


def _order_binned(
    df: DataFrame, order_col, n_bins: int, materialize: bool = True
) -> tuple[DataFrame, Column]:
    """Tag every row with an order-preserving bin id for the two-phase
    global-window rewrites below: equal-width quantization of the numeric
    ``order_col`` over its [min, max] span, so bin ids are a monotone
    function of the sort key and per-bin results concatenate (by bin id)
    into the exact global order. NULL order keys bin to -1 (Spark's
    NULLS FIRST under ascending sort); a constant column collapses to one
    bin — never wrong, merely as serial as the naive global window.
    Returns (df + ``__bin``, the order Column).

    ``materialize`` (default on) lazily localCheckpoints the input: the
    two-phase shape consumes it THREE times (the [min,max] aggregate, the
    bin-count aggregate, the ranked frame itself), and because each
    consumer is a separate plan branch, CHAINED calls — e.g. ranking a
    frame on three dimensions — would otherwise re-derive the whole
    upstream pipeline per branch per level, a 3^depth plan explosion
    (measured on customer_rfm: 256 parquet scans / 390 exchanges unfused
    vs 3 scans materialized). One distributed materialization per call is
    exactly what a 100 TB plan wants for a thrice-read frame."""
    if materialize:
        df = df.localCheckpoint(eager=False)
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    mm = df.agg(
        F.min(oc.cast("double")).alias("__mn"),
        F.max(oc.cast("double")).alias("__mx"),
    )
    width = F.col("__mx") - F.col("__mn")
    bin_id = (
        F.when(oc.isNull(), F.lit(-1))
        .when(
            width > 0,
            F.least(
                F.floor((oc.cast("double") - F.col("__mn")) / width * n_bins),
                F.lit(n_bins - 1),
            ),
        )
        .otherwise(F.lit(0))
    ).cast("long")
    return (
        df.crossJoin(F.broadcast(mm))
        .withColumn("__bin", bin_id)
        .drop("__mn", "__mx"),
        oc,
    )


def _bin_offsets(counts: DataFrame, sum_cols: list[str]) -> DataFrame:
    """Exclusive cumulative sums of per-bin totals, ordered by bin id.
    This unpartitioned window is the one that emits Spark's "Moving all
    data to a single partition" warning — BENIGN by construction (same
    contract as text.seeded_shuffle): it runs over the ≤ n_bins+1-row
    bin-total aggregate, never over data-scale rows. Allow-listed in the
    registry-wide unpartitioned-WindowExec lint (tests/test_plans.py)."""
    w = Window.orderBy("__bin").rowsBetween(Window.unboundedPreceding, -1)
    return counts.select(
        "__bin",
        *[
            F.coalesce(F.sum(c).over(w), F.lit(0)).alias(f"__off_{c}")
            for c in sum_cols
        ],
    )


def two_phase_rank(
    df: DataFrame,
    order_col,
    tiebreak: Iterable,
    out: str = "rank",
    n_bins: int = 256,
    materialize: bool = True,
) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY order_col, *tiebreak)``
    without an Exchange SinglePartition — the scale-safe form of a global
    rank (a naive unpartitioned window funnels the whole relation through
    ONE reducer; dead at 100 TB). Generalizes text.seeded_shuffle's
    md5-prefix binning to any NUMERIC leading sort key: equal-width value
    bins (order-preserving, so ties never split across bins), per-bin
    local row_numbers in parallel after one hash shuffle on the bin id,
    bin row-counts cumsum into offsets (driver-scale, ≤ n_bins+1 rows)
    broadcast back; global = offset + local. ``tiebreak`` must make the
    total order unique or the rank (like any row_number) is
    tie-arbitrary. Descending order: pass a negated numeric expression
    (e.g. ``F.col("x") * -1``) plus ascending tiebreaks.
    ``materialize=False`` skips the input localCheckpoint (see
    _order_binned) when the caller already materialized."""
    b, oc = _order_binned(df, order_col, n_bins, materialize)
    local = F.row_number().over(
        Window.partitionBy("__bin").orderBy(oc, *[F.col(c) if isinstance(c, str) else c for c in tiebreak])
    )
    counts = b.groupBy("__bin").agg(F.count(F.lit(1)).cast("long").alias("__n"))
    offs = _bin_offsets(counts, ["__n"])
    return (
        b.withColumn("__local", local.cast("long"))
        .join(F.broadcast(offs), "__bin")
        .withColumn(out, (F.col("__off___n") + F.col("__local")).cast("long"))
        .drop("__bin", "__local", "__off___n")
    )


def binned_prefix_sums(
    df: DataFrame,
    order_col,
    values: dict,
    tiebreak: Iterable = (),
    n_bins: int = 256,
    materialize: bool = True,
) -> DataFrame:
    """Exact EXCLUSIVE running sums (``SUM(v) OVER (ORDER BY ... ROWS
    UNBOUNDED PRECEDING → -1)``) over a global ordering, two-phase like
    :func:`two_phase_rank`: per-bin partitioned prefix sums + the
    driver-scale bin-total cumsum broadcast back. ``values`` maps output
    column name → value Column to prefix-sum. The combined (order_col,
    *tiebreak) order must be unique per row (e.g. a distinct-key
    spectrum), otherwise within-tie prefix order is arbitrary."""
    b, oc = _order_binned(df, order_col, n_bins, materialize)
    vals = {k: (F.col(v) if isinstance(v, str) else v) for k, v in values.items()}
    w_local = (
        Window.partitionBy("__bin")
        .orderBy(oc, *[F.col(c) if isinstance(c, str) else c for c in tiebreak])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    for out, v in vals.items():
        b = b.withColumn(f"__loc_{out}", F.coalesce(F.sum(v).over(w_local), F.lit(0)))
    counts = b.groupBy("__bin").agg(
        *[F.sum(v).alias(f"__tot_{out}") for out, v in vals.items()]
    )
    offs = _bin_offsets(counts, [f"__tot_{out}" for out in vals])
    b = b.join(F.broadcast(offs), "__bin")
    for out in vals:
        b = b.withColumn(out, F.col(f"__off___tot_{out}") + F.col(f"__loc_{out}"))
        b = b.drop(f"__off___tot_{out}", f"__loc_{out}")
    return b.drop("__bin")
