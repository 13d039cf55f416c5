"""Second scale point for the TPC-H join/agg shapes (the dedup band has
tools/dedup_scale_check.py; this is the relational twin).

Replicates the sf0.1 FACT tables (lineitem, orders) 1x/2x/4x/8x with a
per-replica order-key offset — join fan-out per order stays constant, and
dimension tables stay fixed — then times four representative shapes.
Because every replica is an exact copy, results are exactly predictable:

- q1_pricing_summary: every sum/count scales by N (avg invariant);
- q21_waiting_suppliers: each supplier's numwait scales by N exactly
  (replicated orders are disjoint, so sole-late status is preserved);
- q8_market_share: the ratio is invariant;
- q2_min_cost_supplier: the winner set is invariant (same per-supplier
  minima, N x the aggregate input);
- q12_late_lines: both priority counts scale by N;
- q13_customer_distribution: each customer's order count scales by N,
  so histogram KEYS multiply by N while bucket sizes stay fixed;
- q16_supplier_cnt: distinct-supplier counts are invariant (replicas
  add no new suppliers);
- q22_dormant_customers: the dormant set is invariant (replicas carry
  the same custkeys).

A superlinear wall-time trend, or any invariant breaking, fails the
check. Results recorded in BASELINE.md.

Usage::

    python tools/tpch_scale_check.py            # scales 1 2 4 8
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datalake_brief_spark.catalog import load_table
from datalake_brief_spark.queries import QUERIES
from datalake_brief_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
BASE = "/tmp/spark_graft_tpch_scale"
OFFSET = 1 << 33  # far above any real orderkey at bench scales
CHECK = [
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q8_market_share",
    "q12_late_lines",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
]


def build(spark, scale: int) -> str:
    out = os.path.join(BASE, str(scale))
    if os.path.isdir(out) and os.listdir(out):
        return out
    os.makedirs(out, exist_ok=True)
    for name in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copy(os.path.join(SF_DIR, f"{name}.parquet"), os.path.join(out, f"{name}.parquet"))
    reps = list(range(scale))
    l = load_table(spark, SF_DIR, "lineitem")
    lrep = None
    for i in reps:
        li = l.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * OFFSET))
        lrep = li if lrep is None else lrep.unionAll(li)
    lrep.coalesce(max(1, scale)).write.mode("overwrite").parquet(os.path.join(out, "lineitem.parquet"))
    o = load_table(spark, SF_DIR, "orders")
    orep = None
    for i in reps:
        oi = o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * OFFSET))
        orep = oi if orep is None else orep.unionAll(oi)
    orep.coalesce(max(1, scale)).write.mode("overwrite").parquet(os.path.join(out, "orders.parquet"))
    return out


def main() -> None:
    spark = get_spark("tpch-scale")
    base_rows: dict[str, list] = {}
    walls: dict[str, dict[int, float]] = {q: {} for q in CHECK}
    for scale in SCALES:
        d = build(spark, scale)
        for q in CHECK:
            df = QUERIES[q].fn(spark, d)
            df.write.format("noop").mode("overwrite").save()  # warm
            best = 1e18
            for _ in range(3):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            walls[q][scale] = best
            rows = sorted(tuple(r) for r in df.collect())
            if scale == SCALES[0]:
                base_rows[q] = rows
            else:
                f = scale // SCALES[0]
                if q == "q1_pricing_summary":
                    got = {r[:2]: r for r in rows}
                    for b in base_rows[q]:
                        g = got[b[:2]]
                        assert g[9] == b[9] * f, (b, g)  # count_order scales exactly
                elif q == "q21_waiting_suppliers":
                    exp = sorted((r[0], r[1] * f) for r in base_rows[q])
                    assert rows == exp, (rows[:3], exp[:3])
                elif q == "q12_late_lines":
                    exp = sorted((r[0], r[1] * f, r[2] * f) for r in base_rows[q])
                    assert rows == exp, (rows, exp)
                elif q == "q4_order_priority":
                    exp = sorted((r[0], r[1] * f) for r in base_rows[q])
                    assert rows == exp, (rows, exp)
                elif q == "q15_top_supplier":
                    # revenue scales xN but is rounded; the WINNER SET is
                    # the scale-invariant part
                    assert sorted(r[0] for r in rows) == sorted(
                        r[0] for r in base_rows[q]
                    ), (rows, base_rows[q])
                elif q == "q13_customer_distribution":
                    exp = sorted((r[0] * f, r[1]) for r in base_rows[q])
                    assert rows == exp, (rows[:3], exp[:3])
                else:  # q2 winners / q8 share / q16 counts / q22 set invariant
                    assert rows == base_rows[q], (q, rows[:3], base_rows[q][:3])
            print(f"scale={scale} {q}: {best:.2f}s rows={len(rows)}", flush=True)
    print("\nlinearity (wall_N / wall_1 vs N):")
    for q in CHECK:
        w1 = walls[q][SCALES[0]]
        trend = ", ".join(f"{s}x:{walls[q][s] / w1:.2f}" for s in SCALES)
        print(f"  {q}: {trend}")
    print("all scale invariants held")
    spark.stop()


if __name__ == "__main__":
    main()
