"""Round-10 scale check: the two claims this round's additions make about
100 TB behavior, measured instead of asserted (the bench.py noop-sink
min-of-N convention; see tools/r7_scale_check.py for why).

1. **MERGE costs the MATCHED BAND, not the table.** A FIXED-size source
   (o_orderkey < 2000 — the same physical rows at every scale) merges
   into an orders-backed table landed in 8 key-range bands with per-file
   stats. The clause-based merge_into must stay near-FLAT across the ×10
   table (stats+bloom pruning + the semi-join match scan bound the
   rewrite to the touched band), while the whole-snapshot rewrite the
   old merge performed would grow ~linearly. The ×10 whole-table
   counterfactual is measured too (a merge whose source spans EVERY
   band), so the gap is visible in one table.

2. **Multi-part parquet checkpoints bound the big-table state.** A
   synthetic 100k-live-file state (commit JSONs referencing uuid rels
   with stats — _replay never stats data files, so the state can be
   synthetic) is checkpointed twice: once forced-JSON, once forced
   multi-part parquet. What the format buys at scale: ~8× fewer bytes
   (zstd-columnar vs raw JSON — the object-store GET/PUT cost), parts
   individually bounded (a writer never PUTs one giant blob, a reader
   never holds one), and table-readability (checkpoint_as_dataframe is
   a plain distributed scan). Driver-side resolve CPU is measured too —
   both formats are linear and within ~1.6× of each other after the
   batch-parse optimization in _load_checkpoint (CPython's single-blob
   C parse is genuinely fast; the blob's failure mode is bytes and
   memory, not parse speed — the same reason Delta went parquet).

Usage::

    python tools/build_sf1.py          # once, writes /tmp/spark_graft_sf1
    python tools/r10_scale_check.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datalake_brief_spark.catalog import load_table  # noqa: E402
from datalake_brief_spark.session import get_spark  # noqa: E402
from datalake_brief_spark.sources import txlog  # noqa: E402

SF01 = os.environ.get("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))


def _banded_table(spark, sf_dir: str) -> tuple[str, int]:
    """orders landed in 8 o_orderkey range bands with per-file stats."""
    path = os.path.join(tempfile.mkdtemp(prefix="r10merge_"), "t")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    m = int(o.agg(F.max("o_orderkey")).collect()[0][0])
    step = m // 8 + 1
    for b in range(8):
        band = o.filter(
            (F.col("o_orderkey") >= b * step) & (F.col("o_orderkey") < (b + 1) * step)
        )
        txlog.append(band.coalesce(2), path, stats_cols=["o_orderkey"])
    return path, m


def merge_cost(spark, sf_dir: str) -> tuple[float, float, int]:
    """(fixed-band merge s, whole-table merge s, n_table_rows). Each rep
    builds a fresh table (a merge mutates its input)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    n_rows = o.count()
    fixed_src = o.filter(F.col("o_orderkey") < 2000).select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") + 1.0).alias("o_totalprice"),
    )
    wide_src = o.select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") + 1.0).alias("o_totalprice"),
    )

    def run(src) -> float:
        path, _ = _banded_table(spark, sf_dir)
        t0 = time.perf_counter()
        txlog.merge_into(
            spark, path, src, ["o_orderkey"],
            when_matched=[("update", "*")], when_not_matched=True,
        )
        return time.perf_counter() - t0

    fixed = min(run(fixed_src) for _ in range(REPS))
    wide = min(run(wide_src) for _ in range(REPS))
    return fixed, wide, n_rows


def checkpoint_parse() -> None:
    """Synthetic 100k-live-file state → JSON vs multi-part resolution."""
    n_files, per_commit = 100_000, 10_000
    base = tempfile.mkdtemp(prefix="r10ckpt_")
    for fmt in ("json", "parquet"):
        path = os.path.join(base, fmt)
        os.makedirs(txlog._log_dir(path))  # noqa: SLF001
        for v in range(1, n_files // per_commit + 1):
            rels = [f"data/{uuid.uuid4().hex}/part-0.parquet" for _ in range(per_commit)]
            commit = {
                "version": v,
                "adds": rels,
                "removes": [],
                "ts": "2026-08-16T00:00:00+00:00",
                "rows": {r: 1000 for r in rels},
                "stats": {r: {"o_orderkey": [1, 9, 0]} for r in rels},
            }
            with open(txlog._commit_path(path, v), "w") as f:  # noqa: SLF001
                json.dump(commit, f)
        old_min = txlog._CHECKPOINT_MULTIPART_MIN_FILES  # noqa: SLF001
        txlog._CHECKPOINT_MULTIPART_MIN_FILES = (  # noqa: SLF001
            10**9 if fmt == "json" else 1
        )
        try:
            t0 = time.perf_counter()
            txlog._maybe_checkpoint(path, 10)  # noqa: SLF001
            w = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(REPS):
                live = txlog._load_checkpoint(path, 10)  # noqa: SLF001
            r = (time.perf_counter() - t0) / REPS
        finally:
            txlog._CHECKPOINT_MULTIPART_MIN_FILES = old_min  # noqa: SLF001
        assert len(live) == n_files
        cp_glob = [
            f
            for f in os.listdir(txlog._log_dir(path))  # noqa: SLF001
            if ".checkpoint." in f
        ]
        size = sum(
            os.path.getsize(os.path.join(txlog._log_dir(path), f))  # noqa: SLF001
            for f in cp_glob
        )
        print(
            f"{fmt:8s} write={w:6.2f}s resolve={r:6.3f}s "
            f"files={len(cp_glob):3d} bytes={size/1e6:7.1f}MB",
            flush=True,
        )


def main() -> None:
    spark = get_spark("r10_scale_check")
    print("== MERGE cost: fixed-band source vs whole-table source")
    print(f"{'table':10s} {'band s':>8s} {'whole s':>8s} {'rows':>9s}")
    for label, sf in (("sf0.1", SF01), ("sf1", SF1)):
        if not os.path.isdir(sf):
            print(f"{label:10s} {'-':>8s} {'-':>8s}  (no data)")
            continue
        a, b, n = merge_cost(spark, sf)
        print(f"{label:10s} {a:8.2f} {b:8.2f} {n:9d}", flush=True)
    print("== checkpoint resolution at 100k live files: JSON vs multi-part")
    checkpoint_parse()
    spark.stop()


if __name__ == "__main__":
    main()
