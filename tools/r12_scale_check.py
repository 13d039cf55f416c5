"""Round-12 scale evidence: auto-compaction and type widening.

1. **Auto-compaction at CDC cadence** — the append-stream shape: N tiny
   single-file appends with and without ``auto_compact=True``. Measures
   the final visible-file count (bounded vs linear), the total ingest
   wall time (the hook's overhead), and the post-hoc full-scan time
   (the cost the unbounded file count actually inflicts on every
   reader: per-file open + footer + task overhead).

2. **Type widening is metadata-only and size-independent** — widen one
   column on a table at 1× and at 8× the data, timing the widening
   commit itself; the counterfactual (CAST + overwrite, what an engine
   without the feature must do) is timed at both sizes. The widen
   should be flat milliseconds at any size while the rewrite grows
   with the data.

Usage: PYTHONPATH=. python tools/r12_scale_check.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datalake_brief_spark.session import get_spark
from datalake_brief_spark.sources import txlog

N_APPENDS = 60


def fresh(tag: str) -> str:
    return os.path.join(tempfile.mkdtemp(prefix=f"r12scale_{tag}_"), "t")


def ingest(spark, path: str, auto: bool) -> float:
    t0 = time.perf_counter()
    for i in range(N_APPENDS):
        txlog.append(
            spark.range(i * 1000, (i + 1) * 1000)
            .withColumnRenamed("id", "k")
            .withColumn("v", (F.col("k") % 97).cast("int"))
            .coalesce(1),
            path,
            stats_cols=["k"],
            auto_compact=auto,
            auto_compact_min_files=16,
        )
    return time.perf_counter() - t0


def scan_time(spark, path: str) -> float:
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        txlog.read(spark, path).groupBy().agg(F.sum("v")).collect()
        best = min(best, time.perf_counter() - t0)
    return best


def widen_point(spark, scale: int) -> tuple[float, float, int]:
    """(widen_seconds, rewrite_counterfactual_seconds, n_files) at
    ``scale`` × 100k rows spread over ``scale`` × 20 files."""
    path = fresh(f"widen{scale}x")
    for i in range(scale * 20):
        txlog.append(
            spark.range(i * 5000, (i + 1) * 5000)
            .selectExpr("CAST(id AS INT) k", "CAST(id % 97 AS INT) v")
            .coalesce(1),
            path,
            stats_cols=["k"],
        )
    n_files = len(txlog.visible_files(path))
    t0 = time.perf_counter()
    txlog.widen_column_type(path, "k", "bigint")
    t_widen = time.perf_counter() - t0
    # counterfactual: the no-type-widening engine rewrites the table
    t0 = time.perf_counter()
    wide = txlog.read(spark, path).withColumn("v", F.col("v").cast("bigint"))
    txlog.overwrite(wide, path, stats_cols=["k"])
    t_rewrite = time.perf_counter() - t0
    return t_widen, t_rewrite, n_files


def main() -> None:
    spark = get_spark("r12-scale")

    p_raw, p_auto = fresh("raw"), fresh("auto")
    t_raw = ingest(spark, p_raw, auto=False)
    t_auto = ingest(spark, p_auto, auto=True)
    n_raw = len(txlog.visible_files(p_raw))
    n_auto = len(txlog.visible_files(p_auto))
    s_raw = scan_time(spark, p_raw)
    s_auto = scan_time(spark, p_auto)
    print(
        f"auto-compact: {N_APPENDS} appends -> {n_raw} files raw vs "
        f"{n_auto} files auto (ingest {t_raw:.2f}s vs {t_auto:.2f}s; "
        f"full-scan min-of-3 {s_raw:.3f}s vs {s_auto:.3f}s)"
    )

    for scale in (1, 8):
        t_w, t_r, nf = widen_point(spark, scale)
        print(
            f"widen @ {scale}x ({nf} files): widen_column_type "
            f"{t_w*1000:.1f} ms vs cast+overwrite {t_r:.2f} s"
        )


if __name__ == "__main__":
    main()
