"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Materialization is via the noop sink (full computation + all columns, no
write cost, no driver collect) so timings reflect the distributed plan.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from datalake_brief_spark import get_spark
from datalake_brief_spark.queries import headline_queries


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")

    timings: dict[str, float] = {}
    for name, fn in headline_queries().items():
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (JIT/codegen/IO cache)
        # min-of-N: single-shot timings on a shared box pick up Python-worker
        # spawn and scheduler noise (measured 2s..30s for the SAME plan);
        # the minimum is the reproducible cost of the plan itself. Stop once
        # TWO independent runs agree (second-best within 20% of best) — a
        # single "latest within 25% of best" check can lock in a sustained
        # contention spike when the first few runs are all inflated.
        best = second = float("inf")
        for i in range(8):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if dt < best:
                best, second = dt, best
            elif dt < second:
                second = dt
            if i >= 2 and second <= best * 1.2:
                break
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # box contention context (the r5/r7 cross-round comparisons
                # were dominated by it): 1/5/15-min load averages at exit
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
