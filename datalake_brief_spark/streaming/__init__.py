"""Structured Streaming layer (SURVEY §2.10).

The reference's monitoring/alerting is Azure-level design only (README.md:
179-257: Log Analytics + KQL row-count alert, severity levels). The semantic
core — filter an append-only event table, count, fire at a threshold — is
reproduced here the idiomatic Spark way: readStream → watermark → windowed
aggregation → foreachBatch alert sink.
"""

from datalake_brief_spark.streaming.alerts import (
    Alert,
    alerts_to_parquet,
    stream_events,
    threshold_alert_stream,
    windowed_counts,
)
from datalake_brief_spark.streaming.sinks import (
    append_stream_to_txlog,
    apply_append_batch,
    merge_stream_to_txlog,
)
from datalake_brief_spark.streaming.source import (
    TxlogDataSource,
    register_txlog_source,
)
from datalake_brief_spark.streaming.anomaly import zscore_alert_stream
from datalake_brief_spark.streaming.stateful import (
    dedup_stream,
    enrich_stream,
    running_user_stats,
    sessionize_stream,
    transition_stream,
)

__all__ = [
    "Alert",
    "alerts_to_parquet",
    "append_stream_to_txlog",
    "apply_append_batch",
    "dedup_stream",
    "enrich_stream",
    "merge_stream_to_txlog",
    "transition_stream",
    "zscore_alert_stream",
    "register_txlog_source",
    "running_user_stats",
    "sessionize_stream",
    "stream_events",
    "TxlogDataSource",
    "threshold_alert_stream",
    "windowed_counts",
]
