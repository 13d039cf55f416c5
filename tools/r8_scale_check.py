"""Round-8 operator scale check: times the round-8 new/rewritten entries
at sf0.1 and the sf1-equivalent (tools/build_sf1.py) with the bench.py
noop-sink min-of-N convention (see tools/r7_scale_check.py for why noop
and why min-of-N).

The round-8 band is exactly the single-partition-window class the r7
verdict flagged (events_pareto / customer_rfm / ml_auc_rank, now
two-phase binned) plus the entropy-profile normalizer fix and the two
new lakehouse entries — the point of this harness is the ×10-data ratio
of the REWRITTEN forms: the old forms' global windows would go
superlinear as the single reducer saturates.

Usage::

    python tools/build_sf1.py          # once, writes /tmp/spark_graft_sf1
    python tools/r8_scale_check.py     # prints query: sf0.1s sf1s ratio
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalake_brief_spark.queries import QUERIES  # noqa: E402
from datalake_brief_spark.session import get_spark  # noqa: E402

R8_ENTRIES = [
    "events_pareto",
    "customer_rfm",
    "ml_auc_rank",
    "profile_entropy",
    "txlog_update_dv",
    "txlog_rename_column",
    "txlog_reorg_purge",
    "txlog_partitioned_read",
    "text_url_canonical",
    "asof_join_nearest",
    "dedup_edit_distance",
]

SF01 = os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))


def main() -> None:
    spark = get_spark("r8_scale_check")

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
    for name in R8_ENTRIES:
        a = run(name, SF01)
        if os.path.isdir(SF1):
            b = run(name, SF1)
            print(f"{name:34s} {a:8.3f} {b:8.3f} {b / a:6.2f}", flush=True)
        else:
            print(f"{name:34s} {a:8.3f} {'-':>8s} {'-':>6s}", flush=True)
    print("loadavg:", [round(x, 2) for x in os.getloadavg()])


if __name__ == "__main__":
    main()
