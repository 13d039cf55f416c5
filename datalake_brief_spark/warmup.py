"""Session warm-up shared by bench.py and the measurement tools (ADVICE r13:
the private ``bench._warm_session`` coupled the tools to the top-level script
being importable; it now lives in the package and both import it from here).

One-off SESSION warm-up before any timed query (measurement fix, guide §1:
time the computation, not process setup). JVM JIT/codegen, the shuffle
machinery, the Python worker pool and the Arrow serde paths all initialize
lazily on first use, so whichever query runs FIRST absorbs seconds of one-off
cost that belongs to no query: r12's bench had text_bm25 first at 1.28 s vs
0.57 s isolated, and with the r13 registry order dedup_segments_corpus
(second) measured 2.97 s vs 0.65 s isolated — the per-query warm run alone
does not drain JIT, whose compiler threads keep stealing CPU through the
first timed min-of-N. This touches NO benchmarked table and caches NO query
state: a tiny synthetic frame exercises scan→Python UDF→explode→shuffle→
broadcast-join→agg→noop three times and is discarded. Old (unwarmed) numbers
are kept in BENCH_r12 and OPTIMIZATION_r13.md; bench.py emits
``"session_warmup": true`` in its JSON so cross-round comparisons can detect
the methodology change programmatically.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def warm_session(spark) -> None:
    @F.pandas_udf("long")
    def _ident(s: pd.Series) -> pd.Series:
        return s

    base = spark.range(0, 200_000, 1, 32)
    df = (
        base.select(F.xxhash64("id").alias("h"), (F.col("id") % 97).alias("k"))
        .withColumn("hp", _ident("h"))
        .select("k", "h", F.explode(F.array("h", "hp")).alias("e"))
        .repartition(32, "k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.min("e").alias("m"))
    )
    small = spark.range(0, 97).select(F.col("id").alias("k"), F.lit(1).alias("tag"))
    out = df.join(F.broadcast(small), "k")
    for _ in range(3):
        out.write.format("noop").mode("overwrite").save()
