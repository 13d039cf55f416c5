"""Stateful streaming operators beyond windowed counts (SURVEY §2.10 — the
reference has no streaming; this is the 100 TB-mandated extension surface).

Three tiers of state management, in order of preference:

- ``sessionize_stream``   — native ``session_window`` gap sessions: Catalyst
                            manages (merges/expires) session state, watermark
                            bounds it. Always prefer a built-in stateful op.
- ``enrich_stream``       — stream-static broadcast join: no state at all;
                            the static side re-plans per micro-batch.
- ``running_user_stats``  — ``applyInPandasWithState``: the escape hatch for
                            state machines the built-ins can't express.
                            State is per-key (not per-row), Arrow-batched,
                            and MUST be paired with a timeout so abandoned
                            keys expire — unbounded keyspace is the classic
                            streaming OOM.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def sessionize_stream(
    events: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "2 hours",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessions as a streaming aggregate: a session closes when a
    key is silent for ``gap``. ``session_window`` is the built-in stateful
    operator (state = open sessions per key, merged on overlap, expired by
    the watermark) — the streaming twin of operators.windows.sessionize.

    Works identically over a batch DataFrame (same expression), which is how
    the test pins streaming output == batch output.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col(key_col),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of operators.dedup
    .exact_dedup: first arrival per key survives, later duplicates drop.

    ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``) is the
    only state-safe form on an unbounded stream: per-key state expires once
    the watermark passes it, so memory is bounded by the de-dup horizon
    instead of growing with every key ever seen. The contract is therefore
    "no duplicate within ``watermark`` of the first arrival" — exactly the
    guarantee an at-least-once upstream (Kafka redelivery, retried file
    lands) needs; content-addressed keys (e.g. the text fingerprint from
    text.with_fingerprint) turn this into streaming content dedup.

    Rows emit immediately (the watermark only bounds state, it doesn't hold
    output), so the operator composes with downstream windowed aggregates.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def enrich_stream(stream: DataFrame, dim: DataFrame, on, how: str = "left") -> DataFrame:
    """Stream-static join: attach dimension attributes to a stream.

    The static side is broadcast per micro-batch (re-resolved each batch, so
    slowly-changing dims pick up updates on the next trigger); the stream
    side never shuffles for the join. This is stateless — no watermark
    required, unlike stream-stream joins.
    """
    return stream.join(F.broadcast(dim), on=on, how=how)


_RUNNING_STATS_SCHEMA = (
    "user_id long, n_events long, total_value double, mean_value double, is_anomaly boolean"
)
_STATE_SCHEMA = "n long, total double"


def _make_running_stats_fn(idle_timeout_ms: int | None):
    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        """Per-user running (count, sum); emits one row per key per
        micro-batch, flagging batches whose mean value drifts ≥3× above the
        running mean (toy anomaly rule — the point is the state machine
        shape)."""
        if state.hasTimedOut:
            # Abandoned key: emit nothing, release the state.
            state.remove()
            return
        (user_id,) = key
        n_prev, total_prev = state.get if state.exists else (0, 0.0)
        n_batch, total_batch = 0, 0.0
        for pdf in pdfs:
            n_batch += len(pdf)
            total_batch += float(pdf["value"].sum())
        n, total = n_prev + n_batch, total_prev + total_batch
        state.update((n, total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        mean = total / n if n else 0.0
        batch_mean = total_batch / n_batch if n_batch else 0.0
        prev_mean = total_prev / n_prev if n_prev else batch_mean
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "mean_value": [mean],
                "is_anomaly": [bool(n_prev > 0 and batch_mean > 3.0 * prev_mean)],
            }
        )

    return fn


def running_user_stats(events: DataFrame, idle_timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running totals + drift flag.

    Use this shape ONLY when built-ins can't express the logic: state lives
    per key (two numbers here — state size is O(distinct active users), not
    O(events)), batches arrive as Arrow frames. Everything expressible as
    window/session/aggregate should use those instead (Catalyst-managed
    state, no Python in the loop).

    ``idle_timeout_ms``: set it (e.g. 3600_000) on unbounded keyspaces so
    abandoned keys expire — that IS the production posture. Note that a
    processing-time timeout makes the engine schedule state-cleanup triggers
    even with no new data (continuous "cleaning up state" batches), which is
    correct in a long-lived job but keeps ``processAllAvailable``-style
    drain-and-stop harnesses from settling — hence the None default.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_running_stats_fn(idle_timeout_ms),
        outputStructType=_RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


_TRANSITION_SCHEMA = "user_id long, prev_state string, next_state string, n long"
_TRANSITION_STATE = "last string"


def _transitions_fn(key, pdfs, state: GroupState):
    """Per-key step extraction: carry the key's LAST state across
    micro-batches so the first event of a new batch still forms a step
    with the previous batch's tail — dropping the boundary step is the
    classic streaming-sequence bug. Emits per-batch (prev, next) step
    counts; a downstream (update-mode or batch) aggregate sums them into
    the global transition matrix."""
    if state.hasTimedOut:
        state.remove()
        return
    (user_id,) = key
    prev = state.get[0] if state.exists else None
    pdf = pd.concat(list(pdfs), ignore_index=True)
    if len(pdf) == 0:
        return
    pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
    counts: dict[tuple, int] = {}
    for s in pdf["event_type"]:
        if prev is not None:
            counts[(prev, s)] = counts.get((prev, s), 0) + 1
        prev = s
    state.update((prev,))
    if counts:
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "prev_state": [k[0] for k in counts],
                "next_state": [k[1] for k in counts],
                "n": list(counts.values()),
            }
        )


def transition_stream(events: DataFrame) -> DataFrame:
    """Continuous Markov-step extraction (the streaming twin of
    windows.transition_matrix): state per key is ONE string — the last
    seen event type — so memory is O(active keys) on an unbounded
    stream, and batch-boundary steps are never lost. Input needs
    (user_id, event_id, ts, event_type); output is per-batch per-user
    step counts, summed downstream. Stream==batch equality over the same
    slice is pinned in tests/test_streaming_ml.py (single- and
    multi-batch feeds)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _transitions_fn,
        outputStructType=_TRANSITION_SCHEMA,
        stateStructType=_TRANSITION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
