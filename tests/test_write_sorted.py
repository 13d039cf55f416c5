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


class TestCompaction:
    def test_compact_merges_small_files_and_preserves_data(self, spark, tmp_path):
        from datalake_brief_spark.sources.io import compact_parquet

        out = str(tmp_path / "frag")
        df = load_table(spark, SF_SMOKE, "customer")
        df.repartition(16).write.parquet(out)
        before = spark.read.parquet(out)
        n_before, sum_before = before.count(), before.agg(F.sum("c_acctbal")).first()[0]

        stats = compact_parquet(spark, out, target_file_bytes=1 << 30)
        assert stats["files_before"] >= 16
        assert stats["files_after"] == 1, stats
        assert stats["dirs_compacted"] == 1
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        assert len(files) == 1

        after = spark.read.parquet(out)
        assert after.count() == n_before
        assert abs(after.agg(F.sum("c_acctbal")).first()[0] - sum_before) < 1e-6

    def test_compact_leaves_large_files_untouched(self, spark, tmp_path):
        from datalake_brief_spark.sources.io import compact_parquet

        out = str(tmp_path / "mixed")
        load_table(spark, SF_SMOKE, "orders").coalesce(1).write.parquet(out)
        load_table(spark, SF_SMOKE, "customer").select(
            F.col("c_custkey").alias("o_orderkey"),
            F.col("c_acctbal").alias("o_totalprice"),
        ).repartition(8).write.mode("append").parquet(out)

        parts = {
            f: os.path.getsize(os.path.join(out, f))
            for f in os.listdir(out)
            if f.endswith(".parquet")
        }
        big = max(parts, key=parts.get)
        big_mtime = os.path.getmtime(os.path.join(out, big))
        n_before = spark.read.parquet(out).select("o_orderkey", "o_totalprice").count()

        compact_parquet(
            spark, out, target_file_bytes=2 * parts[big], small_file_bytes=parts[big]
        )
        # the large file is still there, byte-for-byte untouched
        assert os.path.exists(os.path.join(out, big))
        assert os.path.getmtime(os.path.join(out, big)) == big_mtime
        small_left = [
            f
            for f in os.listdir(out)
            if f.endswith(".parquet")
            and f != big
            and not f.startswith("compact-")
        ]
        assert small_left == [], small_left
        assert (
            spark.read.parquet(out).select("o_orderkey", "o_totalprice").count() == n_before
        )

    def test_compact_partitioned_table_compacts_each_leaf(self, spark, tmp_path):
        from datalake_brief_spark.sources.io import compact_parquet

        out = str(tmp_path / "part")
        (
            load_table(spark, SF_SMOKE, "orders")
            .repartition(6)
            .write.partitionBy("o_orderstatus")
            .parquet(out)
        )
        before = spark.read.parquet(out)
        counts_before = {
            r.o_orderstatus: r["count"]
            for r in before.groupBy("o_orderstatus").count().collect()
        }
        stats = compact_parquet(spark, out, target_file_bytes=1 << 30)
        assert stats["dirs_compacted"] == len(counts_before)
        after = spark.read.parquet(out)
        counts_after = {
            r.o_orderstatus: r["count"]
            for r in after.groupBy("o_orderstatus").count().collect()
        }
        assert counts_after == counts_before
        for d in os.listdir(out):
            if d.startswith("o_orderstatus="):
                files = [
                    f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")
                ]
                assert len(files) == 1, (d, files)
