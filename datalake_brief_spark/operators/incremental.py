"""Incremental materialized-aggregate maintenance over the txlog change feed.

A grouped SUM/COUNT aggregate over a 100 TB fact table costs a full scan to
recompute; after a commit that touched 0.1% of rows, 99.9% of that scan
re-derives what the previous result already knew. These operators maintain
the aggregate INCREMENTALLY: read only the change feed between the last
refreshed version and the current one (txlog.table_changes reads stored
``_change_data`` records where the commits carry them, falling back to the
file-list symmetric difference), turn it into signed deltas, and
fold the deltas into the stored aggregate — classic view-maintenance for the
distributive aggregates (COUNT, SUM; AVG derives as sum/count at read time).

The materialized state lives in its own txlog table, and each refresh is ONE
atomic commit that carries the reflected source version INSIDE the commit
file (txlog ``meta`` — the Delta ``txn``-action pattern): a reader always
sees a consistent (version, aggregate) pair, and a refresh that dies at any
point leaves either the old (state, version) or the new one — never state
that contains a change window the recorded version doesn't, so replay can
never double-count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_brief_spark.sources import txlog

_N = "__mv_count"
_SRC_V = "source_version"


def _read_refreshed_version(mv_path: str) -> int:
    v = txlog.latest_meta(mv_path, _SRC_V)
    return int(v) if v is not None else 0


def signed_deltas(
    changes: DataFrame, keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """Fold a change feed (rows with ``_change_type`` insert/delete) into
    per-key signed partial aggregates: inserts contribute +1/+value, deletes
    −1/−value. One keyed aggregation with map-side combine — output is
    |changed keys| rows."""
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    return changes.groupBy(*keys).agg(
        F.sum(sign).cast("long").alias(_N),
        *[F.sum(sign * F.col(c)).alias(c) for c in sum_cols],
    )


def apply_deltas(
    state: DataFrame, deltas: DataFrame, keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """Fold signed deltas into the aggregate state: union + re-aggregate
    (sums of sums — distributive), then drop keys whose live row count hit
    zero. Both sides are already per-key, so the shuffle carries |state| +
    |changed keys| rows, never the fact table."""
    return (
        state.select(*keys, _N, *sum_cols)
        .unionByName(deltas.select(*keys, _N, *sum_cols))
        .groupBy(*keys)
        .agg(
            F.sum(_N).cast("long").alias(_N),
            *[F.sum(c).alias(c) for c in sum_cols],
        )
        .filter(F.col(_N) > 0)
    )


def refresh(
    spark: SparkSession,
    source_path: str,
    mv_path: str,
    keys: list[str],
    sum_cols: list[str],
) -> int:
    """Bring the materialized aggregate up to the source's current version.

    First call (or after the state table is lost) runs the full aggregate
    once; every later call reads only ``table_changes(last_refreshed →
    current)``. Returns the source version now reflected. No-op (and no new
    commit) when the source hasn't moved."""
    src_v = txlog.current_version(source_path)
    last_v = _read_refreshed_version(mv_path)
    if src_v == last_v:
        return src_v
    if last_v == 0:
        full = txlog.read(spark, source_path, src_v)
        state = full.groupBy(*keys).agg(
            F.count(F.lit(1)).alias(_N),
            *[F.sum(c).alias(c) for c in sum_cols],
        )
    else:
        try:
            changes = txlog.table_changes(spark, source_path, last_v, src_v)
        except ValueError:
            # version moved but the visible FILE SET did not (e.g. a restore
            # back to the refreshed snapshot, or an empty-append commit):
            # the aggregate is already current — just re-assert it with the
            # new source version so refresh doesn't re-raise forever.
            state = txlog.read(spark, mv_path)
            txlog.overwrite(state, mv_path, meta={_SRC_V: src_v})
            return src_v
        deltas = signed_deltas(changes, keys, sum_cols)
        state = apply_deltas(txlog.read(spark, mv_path), deltas, keys, sum_cols)
    # One atomic commit: the new state and the source version it reflects
    # land in the same O_EXCL commit file — no window where state already
    # folded the deltas but the version still points at last_v.
    txlog.overwrite(state, mv_path, meta={_SRC_V: src_v})
    return src_v


def read_aggregate(
    spark: SparkSession, mv_path: str, sum_cols: list[str]
) -> DataFrame:
    """Read the materialized aggregate with user-facing column names:
    ``n`` (count) plus one sum column per measure; means derive as sum/n.
    Sums round only here, at the read edge — the stored state keeps full
    precision so repeated incremental folds don't compound rounding."""
    df = txlog.read(spark, mv_path)
    for c in sum_cols:
        df = df.withColumn(c, F.round(c, 6))
    return df.withColumnRenamed(_N, "n")
