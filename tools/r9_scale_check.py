"""Round-9 scale check: the two claims the round's additions make about
100 TB behavior, measured instead of asserted (the bench.py noop-sink
min-of-N convention; see tools/r7_scale_check.py for why).

1. **CDC reads cost the CHANGE, not the table.** A fixed-size CoW UPDATE
   (o_orderkey < 500 — the same physical rows at every scale) lands on a
   table built from orders at sf0.1 and at the sf1-equivalent;
   `table_changes` over the update window must stay FLAT across the ×10
   table (it reads only the commit's stored ``_change_data`` files),
   while the LEGACY path (change record stripped from the commit json —
   the pre-round-9 per-commit snapshot diff) pays the full two-snapshot
   scan and should grow with the table.

2. **IVF-PQ search tracks the probe fraction, not the corpus.** The
   composed index's registry entry (knn_ivf_pq: 16 cells, nprobe=12,
   refine=64, recall gate inside) re-times at sf0.1 and sf1 alongside
   the round's other new entries.

Usage::

    python tools/build_sf1.py          # once, writes /tmp/spark_graft_sf1
    python tools/r9_scale_check.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datalake_brief_spark.catalog import load_table  # noqa: E402
from datalake_brief_spark.queries import QUERIES  # noqa: E402
from datalake_brief_spark.session import get_spark  # noqa: E402
from datalake_brief_spark.sources import txlog  # noqa: E402

R9_ENTRIES = ["txlog_cdf_update", "txlog_cdf", "knn_ivf_pq"]

SF01 = os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))


def _min_of(fn) -> float:
    fn()  # warm
    return min(fn() for _ in range(REPS))


def cdc_flatness(spark, sf_dir: str) -> tuple[float, float, int]:
    """(stored-record read s, legacy snapshot-diff read s, n_change_rows)
    for a FIXED-size update window on a table built from this sf_dir."""
    path = os.path.join(tempfile.mkdtemp(prefix="r9cdc_"), "t")
    txlog.append(load_table(spark, sf_dir, "orders"), path)
    txlog.update_where(
        spark,
        path,
        F.col("o_orderkey") < 500,
        {"o_totalprice": F.col("o_totalprice") + 1.0},
        prune_col="o_orderkey",
        lo=None,
        hi=499,
    )
    n = txlog.table_changes(spark, path, 1, 2).count()

    def stored() -> float:
        t0 = time.perf_counter()
        txlog.table_changes(spark, path, 1, 2).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    a = _min_of(stored)
    # strip the stored record -> the reader falls back to the per-commit
    # snapshot diff (the pre-round-9 implementation), same result
    cpath = txlog._commit_path(path, 2)  # noqa: SLF001
    with open(cpath) as f:
        commit = json.load(f)
    commit.pop("change_data", None)
    with open(cpath, "w") as f:
        json.dump(commit, f)
    b = _min_of(stored)
    return a, b, n


def row_id_read_overhead(spark, sf_dir: str) -> tuple[float, float]:
    """(plain read s, read_with_row_ids s) over the same orders-backed
    table: the id resolution is one broadcast of an n_files-row base map
    + a JVM coalesce — the overhead should be a fixed small factor, flat
    in data size."""
    path = os.path.join(tempfile.mkdtemp(prefix="r9rid_"), "t")
    txlog.append(load_table(spark, sf_dir, "orders"), path)
    txlog.enable_row_tracking(path)

    def plain() -> float:
        t0 = time.perf_counter()
        txlog.read(spark, path).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def with_ids() -> float:
        t0 = time.perf_counter()
        txlog.read_with_row_ids(spark, path).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    return _min_of(plain), _min_of(with_ids)


def main() -> None:
    spark = get_spark("r9_scale_check")

    print("== row-id read overhead (plain read vs read_with_row_ids)")
    print(f"{'table':22s} {'plain s':>8s} {'ids s':>8s} {'factor':>7s}")
    for label, sf in (("sf0.1", SF01), ("sf1", SF1)):
        if not os.path.isdir(sf):
            continue
        a, b = row_id_read_overhead(spark, sf)
        print(f"{label:22s} {a:8.3f} {b:8.3f} {b / a:7.2f}", flush=True)

    print("== CDC read cost: stored change record vs legacy snapshot diff")
    print(f"{'table':22s} {'stored s':>9s} {'legacy s':>9s} {'rows':>6s}")
    for label, sf in (("sf0.1", SF01), ("sf1", SF1)):
        if not os.path.isdir(sf):
            print(f"{label:22s} {'-':>9s} {'-':>9s}  (no data)")
            continue
        a, b, n = cdc_flatness(spark, sf)
        print(f"{label:22s} {a:9.3f} {b:9.3f} {n:6d}", flush=True)

    print("== round-9 entries, x10-data ratio")

    def run(name: str, sf_dir: str) -> float:
        def once() -> float:
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.perf_counter() - t0

        return _min_of(once)

    print(f"{'query':22s} {'sf0.1 s':>8s} {'sf1 s':>8s} {'ratio':>6s}")
    for name in R9_ENTRIES:
        a = run(name, SF01)
        if os.path.isdir(SF1):
            b = run(name, SF1)
            print(f"{name:22s} {a:8.3f} {b:8.3f} {b / a:6.2f}", flush=True)
        else:
            print(f"{name:22s} {a:8.3f} {'-':>8s} {'-':>6s}", flush=True)
    print("loadavg:", [round(x, 2) for x in os.getloadavg()])


if __name__ == "__main__":
    main()
