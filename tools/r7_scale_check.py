"""Round-7 operator scale check: times the round-7 registry entries at
sf0.1 and the sf1-equivalent (tools/build_sf1.py) with the bench.py
noop-sink convention — full computation, all columns, no driver collect.

The numbers recorded in BASELINE.md §"Round-7 operator scale point" come
from this harness. Two hard-won conventions live here:

- noop sink, NEVER count(): Catalyst column-prunes unused window/derived
  columns under a count, so count()-timing a per-row operator measures a
  plan that skipped the operator (measured 0.6 s "for" a window op whose
  real cost was 26.5 s).
- min-of-N on a shared box: single-shot timings of Python-worker stages
  vary multiple seconds for the same plan.

Usage::

    python tools/build_sf1.py          # once, writes /tmp/spark_graft_sf1
    python tools/r7_scale_check.py     # prints query: sf0.1s sf1s ratio
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalake_brief_spark.queries import QUERIES  # noqa: E402
from datalake_brief_spark.session import get_spark  # noqa: E402

R7_ENTRIES = [
    "window_distribution_suite",
    "dedup_latest_by_key",
    "scd2_intervals",
    "gaps_islands",
    "graph_degree_stats",
    "graph_triangles",
    "ts_zscore_anomaly",
    "ts_interpolate_linear",
    "ml_one_hot",
    "ml_split_stratified",
    "text_ttr",
    "dedup_segments_corpus",
    "emb_assign_cells",
    "knn_pq",
    "sample_group_hash",
    "ts_rolling_median",
    "profile_entropy",
    "join_interval_overlap",
    "ml_eval_metrics",
    "text_zipf_alpha",
    "graph_adamic_adar",
    "pq_metadata_profile",
    "market_basket_rules",
    "seq_transition_matrix",
    "window_running_distinct",
    "text_vocab_coverage",
    "text_batch_padding",
    "ml_auc_rank",
    "ml_calibration_bins",
    "agg_decimal_exact",
    "pipeline_curation_v3",
    "dq_date_bounds",
]

SF01 = os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))


def main() -> None:
    spark = get_spark("r7_scale_check")

    def run(name: str, sf_dir: str) -> float:
        def once() -> float:
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.perf_counter() - t0

        once()  # warm: JIT/codegen/IO cache
        return min(once() for _ in range(REPS))

    print(f"{'query':34s} {'sf0.1 s':>8s} {'sf1 s':>8s} {'ratio':>6s}")
    for name in R7_ENTRIES:
        a = run(name, SF01)
        if os.path.isdir(SF1):
            b = run(name, SF1)
            print(f"{name:34s} {a:8.3f} {b:8.3f} {b / a:6.2f}", flush=True)
        else:
            print(f"{name:34s} {a:8.3f} {'-':>8s} {'-':>6s}", flush=True)


if __name__ == "__main__":
    main()
