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


def _file_overlap_fraction(spark, path, col, lo, hi):
    """Fraction of parquet files whose [min,max] stats intersect [lo,hi] —
    the files a stats-driven reader must open for that predicate."""
    back = spark.read.parquet(path)
    per_file = (
        back.withColumn("f", F.element_at(F.split(F.input_file_name(), "/"), -1))
        .groupBy("f")
        .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
        .collect()
    )
    n_hit = sum(1 for r in per_file if r.hi >= lo and r.lo <= hi)
    return n_hit / len(per_file)


def test_zorder_skips_on_both_columns(spark, tmp_path):
    """Z-order contract: a narrow range filter on EITHER clustered column
    touches a fraction of the files, where a single-column sort leaves the
    secondary column unbounded (~every file hit)."""
    from datalake_brief_spark.sources.io import write_zorder

    df = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    n_files = 16
    zpath = str(tmp_path / "lineitem_z")
    spath = str(tmp_path / "lineitem_s")
    write_zorder(df, zpath, ["l_partkey", "l_suppkey"], n_files=n_files)
    write_sorted(df, spath, ["l_partkey"], n_files=n_files)

    pk_hi = df.agg(F.max("l_partkey")).first()[0]
    sk_hi = df.agg(F.max("l_suppkey")).first()[0]
    # ~1/16th-of-keyspace range predicates on each dimension
    pk_band = (1, max(pk_hi // 16, 1))
    sk_band = (1, max(sk_hi // 16, 1))

    z_pk = _file_overlap_fraction(spark, zpath, "l_partkey", *pk_band)
    z_sk = _file_overlap_fraction(spark, zpath, "l_suppkey", *sk_band)
    s_pk = _file_overlap_fraction(spark, spath, "l_partkey", *pk_band)
    s_sk = _file_overlap_fraction(spark, spath, "l_suppkey", *sk_band)

    # leading-column sort: excellent on partkey, useless on suppkey
    assert s_pk <= 0.25, s_pk
    assert s_sk >= 0.9, s_sk
    # z-order: real skipping on BOTH dimensions
    assert z_pk <= 0.5, z_pk
    assert z_sk <= 0.5, z_sk

    # round-trip correctness
    back = spark.read.parquet(zpath)
    assert back.count() == df.count()
    want = df.filter(F.col("l_suppkey") <= sk_band[1]).count()
    assert back.filter(F.col("l_suppkey") <= sk_band[1]).count() == want
