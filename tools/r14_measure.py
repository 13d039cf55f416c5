"""Round-14 optimization measurement harness (guide §1).

Captures, for each headline query (or a named subset):
  - .explain("formatted") → plans/r14/<name>_<tag>.txt
  - min-of-N noop-sink wall time (same methodology as bench.py)
  - plan-shape counters: Exchange count, join strategies, Python eval nodes

Usage:
  python tools/r14_measure.py [--tag before|after] [--runs N] [query ...]

Writes a JSON summary to /tmp/r14_measure_<tag>.json and the plan files
under plans/r14/. Headline-only by default; pass names for a subset.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import time
from contextlib import redirect_stdout

from datalake_brief_spark import get_spark
from datalake_brief_spark.queries import headline_queries


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_shape(txt: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", txt)),
        "reused_exchanges": len(re.findall(r"ReusedExchange", txt)),
        "bhj": len(re.findall(r"BroadcastHashJoin", txt)),
        "smj": len(re.findall(r"SortMergeJoin", txt)),
        "shj": len(re.findall(r"ShuffledHashJoin", txt)),
        "batch_eval_python": len(re.findall(r"BatchEvalPython", txt)),
        "arrow_eval_python": len(re.findall(r"ArrowEvalPython", txt)),
        "map_in_pandas": len(re.findall(r"MapInPandas|MapInArrow", txt)),
        "take_ordered": len(re.findall(r"TakeOrderedAndProject", txt)),
        "cartesian": len(re.findall(r"CartesianProduct", txt)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=6)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r14-measure")
    from datalake_brief_spark.warmup import warm_session

    warm_session(spark)
    os.makedirs("plans/r14", exist_ok=True)

    qs = headline_queries()
    names = args.names or list(qs)
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"r14:{name}")
        df = fn(spark, sf_dir)
        txt = plan_text(df)
        with open(f"plans/r14/{name}_{args.tag}.txt", "w") as f:
            f.write(txt)
        df.write.format("noop").mode("overwrite").save()  # warm
        best = second = float("inf")
        for i in range(args.runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if dt < best:
                best, second = dt, best
            elif dt < second:
                second = dt
            if i >= 2 and second <= best * 1.2:
                break
        out[name] = {"sec": round(best, 4), **plan_shape(txt)}
        print(name, out[name], flush=True)
        spark.sparkContext.setJobDescription(None)

    with open(f"/tmp/r14_measure_{args.tag}.json", "w") as f:
        json.dump({"loadavg": list(os.getloadavg()), "queries": out}, f, indent=1)
    print(json.dumps({k: v["sec"] for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
