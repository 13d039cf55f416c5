"""Streaming rolling z-score anomaly monitor: the continuous twin of
operators.timeseries.zscore_anomalies.

The batch op scores each value against the mean/sample-stddev of the
trailing ``n_preceding``-row frame ending at the PREVIOUS row. A window
frame can't run on an unbounded stream, but the state it needs is tiny and
per-key: the last ``n_preceding`` values. This module keeps exactly that in
``applyInPandasWithState`` — state size is O(active keys × n_preceding),
independent of stream length — and replays the batch operator's semantics
row by row:

- rows process in (ts, id) order within each micro-batch (sorted in the
  state function; cross-batch order is the source's delivery order, the
  standard streaming contract);
- NULL values emit NULL z / false flag and still occupy a frame slot
  (stored as NaN), exactly like the batch ROWS frame;
- baselines with <2 non-null points or zero spread yield NULL z;
- z rounds like the batch side (BigDecimal-style HALF_UP on the double).

Stream==batch agreement on the same slice is pinned in
tests/test_streaming_ml.py (flags exact, z to 1e-6 — the engines' stddev
accumulation orders differ at the last ulp, so bit-equality is pinned only
where rounding absorbs it).
"""

from __future__ import annotations

from collections.abc import Iterable
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "event_id long, user_id long, value double, zscore double, is_anomaly boolean"
_STATE_SCHEMA = "vals array<double>"


def _round_half_up(x: float, precision: int) -> float:
    """Spark F.round semantics: HALF_UP on the double's exact binary value
    (Python's round() is banker's and disagrees at .5 boundaries)."""
    q = Decimal(1).scaleb(-precision)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))


def _make_zscore_fn(
    n_preceding: int, z_threshold: float, precision: int, idle_timeout_ms: int | None
):
    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        (user_id,) = key
        vals: list[float] = list(state.get[0]) if state.exists else []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        zs: list[float | None] = []
        flags: list[bool] = []
        for v in pdf["value"].to_numpy(dtype=np.float64):
            base = np.asarray(vals[-n_preceding:], dtype=np.float64)
            finite = base[~np.isnan(base)]
            z = None
            if len(finite) >= 2 and not np.isnan(v):
                sd = float(finite.std(ddof=1))
                if sd > 0:
                    z = (float(v) - float(finite.mean())) / sd
            zs.append(None if z is None else _round_half_up(z, precision))
            flags.append(bool(z is not None and abs(z) > z_threshold))
            vals.append(float(v))
            if len(vals) > n_preceding:
                vals = vals[-n_preceding:]
        state.update((vals,))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": user_id,
                "value": pdf["value"],
                "zscore": pd.Series(zs, dtype="float64"),
                "is_anomaly": flags,
            }
        )

    return fn


def zscore_alert_stream(
    events: DataFrame,
    n_preceding: int = 20,
    z_threshold: float = 2.5,
    precision: int = 4,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Continuous per-user rolling z-score scoring over an event stream.

    Input needs (user_id, event_id, ts, value). State per key is the last
    ``n_preceding`` values only — the production posture for an unbounded
    keyspace is ``idle_timeout_ms`` set (abandoned users expire; note a
    processing-time timeout schedules cleanup triggers even with no data,
    which keeps drain-and-stop test harnesses from settling — hence the
    None default, same trade-off as running_user_stats)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_zscore_fn(n_preceding, z_threshold, precision, idle_timeout_ms),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
