"""Second scale point for the round-4 curation ops (DSIR importance
weights, token-budget sampling, Gopher rules): replicate the sf0.1
``documents`` corpus 1x/2x/4x/8x (id-shifted so strata and vocab shapes
hold) and time each operator end-to-end (noop count sink, min-of-2).

If the shapes are linear as claimed — one keyed histogram + vocab join for
DSIR, one window per stratum for budget sampling, pure scan for Gopher —
wall time grows ~proportionally with n. Results recorded in BASELINE.md.

Usage::

    python tools/curation_scale_check.py    # scales 1 2 4 8
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datalake_brief_spark.catalog import load_table
from datalake_brief_spark.operators import text
from datalake_brief_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]


def replicate(docs, factor: int):
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(j * 10_000_000)).alias("doc_id"),
            "text",
            "lang",
            F.concat(F.col("source"), F.lit(f"_{j}")).alias("source"),
        )
        for j in range(factor)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    spark = get_spark("curation-scale")
    base = load_table(spark, SF_DIR, "documents")
    print(f"# base corpus: {base.count()} docs ({SF_DIR})", flush=True)
    for k in SCALES:
        docs = replicate(base, k).localCheckpoint()
        n = docs.count()
        t_dsir = timed(
            lambda: text.dsir_log_weights(docs, F.col("lang") == "en").count()
        )
        t_budget = timed(
            lambda: text.budget_sample(docs, budget=500, group_col="source").count()
        )
        t_gopher = timed(lambda: text.gopher_rules(docs).count())
        t_c4 = timed(lambda: text.c4_rules(docs).count())
        t_shuffle = timed(lambda: text.seeded_shuffle(docs, seed=7).count())
        t_shard = timed(lambda: text.shard_assignment(docs, n_shards=64).count())

        def _hh():
            from datalake_brief_spark.functions import tokens as _toks
            from datalake_brief_spark.operators.relational import heavy_hitters

            tok = docs.select(F.explode(_toks("text")).alias("t")).filter(
                F.col("t") != ""
            )
            heavy_hitters(tok, "t", support=0.02).count()

        t_hh = timed(_hh)
        print(
            f"scale {k}: rows={n} dsir={t_dsir:.2f}s "
            f"budget={t_budget:.2f}s gopher={t_gopher:.2f}s c4={t_c4:.2f}s "
            f"shuffle={t_shuffle:.2f}s shard={t_shard:.2f}s "
            f"heavy_hitters={t_hh:.2f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
