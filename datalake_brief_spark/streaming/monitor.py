"""Streaming distribution-drift monitor: continuous PSI vs a frozen
reference profile.

The batch op (operators.relational.distribution_drift) scores one snapshot
against another; this module is its continuous form — the observability
loop a production feature pipeline runs: freeze a reference histogram once,
then score every event-time window of the live stream against it and fire
when PSI crosses the industry thresholds (<0.1 stable, 0.1–0.25 drifting,
>0.25 shifted).

Scale posture: the ONLY streaming state is (window × bucket) counts — a few
dozen rows per window regardless of event volume (the same partial+final
windowed aggregate shape as streaming/alerts.py). The reference profile is
n_buckets numbers computed once and carried as plan literals; PSI itself is
arithmetic over one window's ≤ n_buckets+1 counts, done driver-side per
micro-batch over update-mode rows. Every binning and smoothing convention
(reference-anchored edges, degenerate-reference bucket 0, clamp to
[0, n_buckets−1], eps = 1e-6, greatest(total, 1)) mirrors
distribution_drift EXACTLY, so stream and batch agree bit-for-bit — pinned
in tests/test_streaming_ml.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_EPS = 1e-6


@dataclass(frozen=True)
class ReferenceProfile:
    """Frozen baseline: bucket edges + per-bucket reference counts."""

    mn: float | None
    mx: float | None
    counts: dict[int, int]  # bucket -> n_ref (observed buckets only)
    n_ref: int
    n_buckets: int


@dataclass
class DriftAlert:
    window_start: str
    window_end: str
    psi: float
    n_cur: int


def reference_profile(
    ref: DataFrame, value_col: str = "value", n_buckets: int = 10
) -> ReferenceProfile:
    """Build the frozen baseline in two driver-scale jobs: one 1-row
    aggregate for the edges, one ≤(n_buckets+1)-row bucket-count
    aggregate. Run once at deploy time; the stream never touches the
    reference again."""
    c = F.col(value_col).cast("double")
    row = ref.agg(F.min(c).alias("mn"), F.max(c).alias("mx")).collect()[0]
    mn, mx = row.mn, row.mx
    bucket = _bucket_expr(value_col, mn, mx, n_buckets)
    rows = ref.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    ).collect()
    counts = {int(r.bucket): int(r.n) for r in rows}
    return ReferenceProfile(
        mn=mn, mx=mx, counts=counts, n_ref=sum(counts.values()), n_buckets=n_buckets
    )


def _bucket_expr(value_col: str, mn, mx, n_buckets: int):
    """The distribution_drift bucket expression with the reference edges
    folded in as literals: degenerate reference (mx == mn, or an all-null
    reference where both are None) maps everything to bucket 0; otherwise
    floor((v − mn)·n/(mx − mn)) clamped to [0, n_buckets − 1]."""
    c = F.col(value_col).cast("double")
    if mn is None or mx is None or mx == mn:
        return F.lit(0).cast("long")
    return (
        F.least(
            F.greatest(
                F.floor((c - F.lit(float(mn))) * n_buckets / F.lit(float(mx - mn))),
                F.lit(0),
            ),
            F.lit(n_buckets - 1),
        )
        .cast("long")
    )


def windowed_bucket_counts(
    events: DataFrame,
    profile: ReferenceProfile,
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """The streaming half: watermarked tumbling-window × bucket counts —
    the complete drift state, thousands of keys at most."""
    bucket = _bucket_expr(value_col, profile.mn, profile.mx, profile.n_buckets)
    return (
        events.filter(F.col(value_col).isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), window).alias("w"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "bucket",
            "n",
        )
    )


def psi_from_counts(profile: ReferenceProfile, cur: dict[int, int]) -> float:
    """PSI over the union of observed buckets, identical smoothing to the
    batch op: p = n/greatest(total, 1) + 1e-6 on both sides."""
    n_cur = sum(cur.values())
    buckets = set(profile.counts) | set(cur)
    psi = 0.0
    for b in buckets:
        p_ref = profile.counts.get(b, 0) / max(profile.n_ref, 1) + _EPS
        p_cur = cur.get(b, 0) / max(n_cur, 1) + _EPS
        psi += (p_cur - p_ref) * math.log(p_cur / p_ref)
    return round(psi, 6)


class DriftMonitor:
    """Driver-side accumulator over update-mode micro-batch rows: keeps the
    latest (window → bucket → count) state (update mode re-emits a
    (window, bucket) row whenever its count changes, so upserting the
    newest value is exact), recomputes each touched window's PSI, fires
    ``on_drift`` for windows at/above the threshold. State is windows ×
    buckets — monitoring-scale, never event-scale."""

    def __init__(
        self,
        profile: ReferenceProfile,
        threshold: float = 0.2,
        on_drift: Callable[[list[DriftAlert]], None] | None = None,
    ) -> None:
        self.profile = profile
        self.threshold = threshold
        self.on_drift = on_drift
        self.state: dict[tuple, dict[int, int]] = {}
        self.alerts: list[DriftAlert] = []

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        rows = batch_df.collect()
        touched = set()
        for r in rows:
            key = (str(r.window_start), str(r.window_end))
            self.state.setdefault(key, {})[int(r.bucket)] = int(r.n)
            touched.add(key)
        fired = []
        for key in sorted(touched):
            cur = self.state[key]
            psi = psi_from_counts(self.profile, cur)
            if psi >= self.threshold:
                fired.append(
                    DriftAlert(
                        window_start=key[0],
                        window_end=key[1],
                        psi=psi,
                        n_cur=sum(cur.values()),
                    )
                )
        if fired:
            self.alerts.extend(fired)
            if self.on_drift:
                self.on_drift(fired)

    def window_psi(self) -> dict[tuple, float]:
        """Current PSI per window — what a dashboard scrapes."""
        return {k: psi_from_counts(self.profile, v) for k, v in self.state.items()}


def drift_monitor_stream(
    events: DataFrame,
    profile: ReferenceProfile,
    monitor: DriftMonitor,
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "drift_monitor",
) -> StreamingQuery:
    """Wire it together: windowed bucket counts → update-mode foreachBatch
    into the monitor. Alert emission is at-least-once (a replayed epoch
    re-fires its windows); route on_drift into an idempotent sink keyed by
    (window, psi) for exactly-once, as streaming/alerts.py does."""
    counts = windowed_bucket_counts(events, profile, value_col, window, watermark)
    return (
        counts.writeStream.outputMode("update")
        .queryName(query_name)
        .foreachBatch(monitor.process_batch)
        .start()
    )
