"""Skew robustness check for the join layer (TESTDATA keys are uniform;
real 100 TB keys are not).

Plants a hot key: a fraction of lineitem rows get their l_orderkey
rewritten to ONE order, then the lineitem ⋈ orders shuffle join is
measured two ways:

- plain shuffle join, relying on AQE's OptimizeSkewedJoin to split the
  hot partition at runtime (the executed plan is checked for the
  ``skew=true`` marker);
- salted join (joins.salted_join — the explicit mitigation);

and both results are checked EQUAL (salting is an execution-strategy
change only). Broadcast joins are disabled for the session: at bench
scale every side fits under the 64 MiB threshold and a broadcast would
hide the skew entirely, while at 100 TB the orders side would never
broadcast — the shuffle IS the plan under test.

Usage::

    python tools/skew_check.py [hot_fraction ...]   # default 0.25 0.5 0.75
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datalake_brief_spark.catalog import load_table
from datalake_brief_spark.operators.joins import salted_join
from datalake_brief_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FRACTIONS = [float(a) for a in sys.argv[1:]] or [0.25, 0.5, 0.75]


def main() -> None:
    spark = get_spark("skew_check")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # Bench-scale data is megabytes, so AQE's production skew threshold
    # (256 MB) would never trip; scale it down so the MECHANISM under
    # test — detect the hot partition, split it, preserve results —
    # actually executes here, exactly as the default thresholds would at
    # 100 TB partition sizes.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
    l = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    hot_key = o.select(F.min("okey")).collect()[0][0]
    for frac in FRACTIONS:
        # Skew split subdivides a reduce partition BY MAPPER RANGES
        # (PartialReducerPartitionSpec carries startMapIndex/endMapIndex):
        # a shuffle fed by one or two mappers — which is what sf0.1's
        # single parquet file produces, even under a small scan split
        # size, because its row groups bound the task count — is ATOMIC
        # and can never split, regardless of thresholds. Repartition the
        # skewed side so the join shuffle has many mappers, as any real
        # multi-file table would.
        skewed = l.select(
            F.when(
                F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), 1000) < int(frac * 1000),
                F.lit(hot_key),
            )
            .otherwise(F.col("l_orderkey"))
            .alias("okey"),
            "l_extendedprice",
        ).repartition(16)

        plain = (
            skewed.join(o, "okey")
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
        )
        plain.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.monotonic()
        plain.write.format("noop").mode("overwrite").save()
        t_plain = time.monotonic() - t0
        # the skew marker only exists in an ADAPTIVE FINAL plan, and a
        # write runs its own query execution — materialize via collect
        # and read THIS DataFrame's executed plan
        a = sorted(map(tuple, plain.collect()))
        plan = plain._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        aqe_skew = "skew=true" in plan

        salted = (
            salted_join(skewed, o, "okey", salt_buckets=16)
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
        )
        salted.write.format("noop").mode("overwrite").save()
        t0 = time.monotonic()
        salted.write.format("noop").mode("overwrite").save()
        t_salt = time.monotonic() - t0

        b = sorted(map(tuple, salted.collect()))
        assert a == b, "salting changed the result"
        assert aqe_skew, f"AQE skew split did not engage at hot_frac={frac}"
        print(
            f"hot_frac={frac} plain={t_plain:.2f}s (aqe_skew_split={aqe_skew}) "
            f"salted={t_salt:.2f}s results_equal=True",
            flush=True,
        )
    print("skew check passed")
    spark.stop()


if __name__ == "__main__":
    main()
