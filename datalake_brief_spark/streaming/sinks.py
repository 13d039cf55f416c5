"""Streaming sinks onto the transactional (commit-log) table.

The reference's streaming story ends at files/console; a real lake needs the
stream to land in a table readers can trust mid-write. ``merge_stream_to_
txlog`` closes the loop: each micro-batch becomes ONE atomic latest-wins
MERGE commit on a sources.txlog table, so a concurrent reader sees the
pre-batch or post-batch snapshot — never a torn batch.

Effectively-once semantics without a two-phase commit: Structured Streaming
guarantees at-least-once foreachBatch delivery (an epoch can replay after a
crash between sink success and checkpoint write). Latest-wins MERGE keyed on
the business key is IDEMPOTENT — a replayed batch's rows are no longer
STRICTLY newer than the table's per-key ``order_col``, so the merge's
condition-aware pruning rewrites ZERO files and commits NOTHING: no new
version, no file churn, an empty change-feed window. At-least-once
delivery + idempotent apply = exactly-once observable state, the same
argument Delta's idempotent-write sink makes — here with the replay
costing metadata only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from datalake_brief_spark.sources import txlog


def apply_merge_batch(
    batch_df: DataFrame, path: str, keys: list[str], order_col: str
) -> None:
    """Apply ONE micro-batch as one atomic latest-wins MERGE commit — the
    foreachBatch body of ``merge_stream_to_txlog``, exposed so a batch-mode
    replay (e.g. the ``streaming_merge_replay`` registry query, or a backfill
    over a historical event log) drives the exact code the live sink runs.

    Reduces the batch to its per-key latest BEFORE merging: a batch
    (especially availableNow's single backlog batch) carries many rows per
    key, and merge's contract is "updates" — one assertion per key. This
    also shrinks the merge's window input to |keys in batch| rows."""
    if batch_df.isEmpty():
        return
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    latest = (
        batch_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    txlog.merge(batch_df.sparkSession, path, latest, keys, order_col)


def apply_append_batch(
    batch_df: DataFrame,
    path: str,
    txn_app_id: str,
    epoch_id: int,
    auto_compact: bool | None = None,
) -> bool:
    """Idempotently append ONE micro-batch: the commit carries
    ``txn:<app_id> = epoch_id`` in its meta, and a batch whose epoch is at
    or below the last committed epoch for that app id is SKIPPED — so
    foreachBatch's at-least-once replay (crash between sink success and
    checkpoint write) cannot double-append. This is the Delta
    txnAppId/txnVersion idempotent-writer contract for APPEND streams —
    the fact-table complement of the latest-wins MERGE sink (there
    idempotence comes from the merge itself; a plain append needs the
    epoch watermark).

    Single-writer-per-app-id (Structured Streaming's checkpoint guarantee);
    different app ids interleave freely — each key is tracked independently
    in the log. Returns True when the batch landed, False when skipped.

    ``auto_compact`` forwards to :func:`txlog.append`'s post-commit
    best-effort compaction — THE shape a per-few-seconds append stream
    needs, keeping its small-file count bounded without a separately
    scheduled OPTIMIZE; the default ``None`` defers to the table's
    ``autoCompact`` TBLPROPERTY, so the policy lives with the table, not
    the pipeline code. Replay safety is unaffected: the epoch watermark
    rides in the APPEND commit; the compaction commit is maintenance
    (dataChange=false) and invisible to downstream streams."""
    last = txlog.latest_meta(path, f"txn:{txn_app_id}")
    if last is not None and int(last) >= int(epoch_id):
        return False
    txlog.append(
        batch_df,
        path,
        meta={f"txn:{txn_app_id}": int(epoch_id)},
        auto_compact=auto_compact,
    )
    return True


def append_stream_to_txlog(
    stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    txn_app_id: str,
    available_now: bool = True,
    auto_compact: bool | None = None,
) -> StreamingQuery:
    """Exactly-once APPEND of a stream into a txlog table: each micro-batch
    is one atomic commit tagged with its epoch; replays are detected from
    the log and skipped (see apply_append_batch). The ever-growing-fact-
    table shape — ``auto_compact=True`` bounds the small-file count at
    write cadence; otherwise pair with txlog.optimize off the write
    path."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        apply_append_batch(
            batch_df, path, txn_app_id, epoch_id, auto_compact=auto_compact
        )

    writer = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merge_stream_to_txlog(
    stream: DataFrame,
    path: str,
    keys: list[str],
    order_col: str,
    checkpoint_dir: str,
    available_now: bool = True,
    output_mode: str = "update",
) -> StreamingQuery:
    """Land a stream into a txlog table via per-batch atomic MERGE.

    ``keys`` + ``order_col`` define latest-wins identity (same contract as
    txlog.merge). ``available_now=True`` drains the current backlog and
    stops — the incremental-batch pattern for file-landing pipelines;
    ``False`` runs continuously.

    ``output_mode="update"`` (default) matters when the stream is an
    AGGREGATION: append mode would hold every window back until the
    watermark passes it, so windows inside the final watermark never reach
    the sink before an availableNow drain ends. Update emits each window
    whenever its value grows, and the keyed merge collapses re-emissions —
    for a monotone measure (counts) latest-wins equals max-wins, giving the
    streaming-materialized-view shape with no extra operator. For
    stateless streams update and append behave identically.

    Scale shape: the per-batch merge is one window over (keys) on snapshot ⊎
    batch. Cost per batch tracks TABLE size, not batch size — acceptable for
    compact rollup/state tables (the materialized-aggregate use), wrong for
    an ever-growing fact table (there, append + periodic compaction is the
    shape; see txlog.append/optimize)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        apply_merge_batch(batch_df, path, keys, order_col)

    writer = (
        stream.writeStream.outputMode(output_mode)
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def neardup_stream_to_index(
    stream: DataFrame,
    index_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    txn_app_id: str = "neardup_stream",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming near-duplicate detection: each micro-batch of documents
    runs operators.dedup.incremental_dedup against the persisted LSH
    signature index (build_dedup_index), so a batch is checked against
    the ENTIRE corpus seen so far — earlier batches included — while only
    the batch itself is shingled and banded.

    Per batch: (1) pairs involving the batch land in ``pairs_path`` as a
    txlog APPEND tagged with the epoch — replays are detected from the
    commit log and skipped, so pair emission is exactly-once; (2) the
    batch's signatures append to the index (plain parquet, at-least-once
    — harmless: incremental_dedup canonicalizes and dedups pairs, so
    duplicate signatures from a replayed epoch change candidate count,
    never the verified pair set)."""
    from datalake_brief_spark.operators.dedup import incremental_dedup

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        pairs = incremental_dedup(
            batch_df.sparkSession,
            batch_df,
            index_path,
            text_col=text_col,
            id_col=id_col,
            k=k,
            threshold=threshold,
            update_index=True,
        )
        apply_append_batch(pairs, pairs_path, txn_app_id, epoch_id)

    writer = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
