"""Sketch-accuracy bounds: the approximate aggregates the 100 TB path uses
(HyperLogLog++ distinct counts, KLL-style approximate percentiles) must stay
within their advertised error of the exact forms computed on the same data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_brief_spark.catalog import load_table

from tests.conftest import SF_SMOKE


def test_hll_distinct_within_rsd(spark):
    """approx_count_distinct(rsd=0.02): HLL++ standard error is rsd, so a
    5-sigma band (10%) is a safely non-flaky bound."""
    l = load_table(spark, SF_SMOKE, "lineitem")
    row = l.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).first()
    rel_err = abs(row.approx - row.exact) / row.exact
    assert rel_err <= 0.10, (row.exact, row.approx, rel_err)


def test_approx_percentile_within_accuracy(spark):
    """percentile_approx with accuracy=N bounds rank error by 1/N of the
    row count; assert the approximate p50/p90 sit within the exact values'
    neighborhood (rank-tolerance converted to a value check via filtering)."""
    o = load_table(spark, SF_SMOKE, "orders")
    n = o.count()
    accuracy = 1000
    row = o.agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("exact_p50"),
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(accuracy)).alias("apx_p50"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("exact_p90"),
        F.percentile_approx("o_totalprice", F.lit(0.9), F.lit(accuracy)).alias("apx_p90"),
    ).first()
    for q, exact, apx in [(0.5, row.exact_p50, row.apx_p50), (0.9, row.exact_p90, row.apx_p90)]:
        # rank of the approximate answer must be within n/accuracy of q*n
        rank = o.filter(F.col("o_totalprice") <= apx).count()
        rank_err = abs(rank - q * n)
        assert rank_err <= max(2.0 * n / accuracy, 2), (q, exact, apx, rank_err)


def test_hll_sketch_merge_matches_exact(spark):
    """sketch_merge_distinct: per-(flag,status) Datasketches HLL partials
    unioned up to flag must estimate the true distinct part count within
    the sketch's error (default lgK=12 → rsd ≈1.6%; assert 3x that).
    This is the mergeability contract that lets 100 TB pipelines store
    daily sketches and union them instead of rescanning."""
    from datalake_brief_spark.queries import QUERIES, _hll_merged_distinct

    merged = {
        r.l_returnflag: r.n_parts_merged
        for r in _hll_merged_distinct(spark, SF_SMOKE).collect()
    }
    l = load_table(spark, SF_SMOKE, "lineitem")
    exact = {
        r.l_returnflag: r.exact
        for r in l.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("exact"))
        .collect()
    }
    assert set(merged) == set(exact)
    for flag, est in merged.items():
        rel_err = abs(est - exact[flag]) / exact[flag]
        assert rel_err <= 0.05, (flag, exact[flag], est, rel_err)
    for r in QUERIES["sketch_merge_distinct"].fn(spark, SF_SMOKE).collect():
        assert r.in_bound and r.exact_parts == exact[r.l_returnflag], r


def test_kll_sketch_merge_quantiles_within_rank_error(spark):
    """KLL estimates (independent of the registry's own bound exprs):
    per-(flag,status) partials merged up to flag must place p50/p95 within
    KLL's normalized rank error of the true rank (default k=200 → ~1.65%
    single-sided; assert 2x). The quantile twin of the HLL mergeability
    contract. The registry entry re-expresses this bound as driver-gate
    booleans; assert those too."""
    from datalake_brief_spark.queries import QUERIES, _kll_merged_quantiles

    got = {
        r.l_returnflag: (r.p50, r.p95)
        for r in _kll_merged_quantiles(spark, SF_SMOKE).collect()
    }
    l = load_table(spark, SF_SMOKE, "lineitem")
    for flag, (p50, p95) in got.items():
        vals = l.filter(F.col("l_returnflag") == flag)
        n = vals.count()
        for q, est in [(0.5, p50), (0.95, p95)]:
            rank = vals.filter(F.col("l_extendedprice") <= est).count()
            assert abs(rank - q * n) <= max(0.033 * n, 2), (flag, q, est, rank, n)
    for r in QUERIES["sketch_merge_quantiles"].fn(spark, SF_SMOKE).collect():
        assert r.p50_in_bound and r.p95_in_bound, r


def test_theta_sketch_intersection_within_error(spark):
    """Theta estimates (independent of the registry's own bound exprs):
    union AND intersection must land near the exact set sizes.
    Intersection error compounds (relative to the union's sampling
    threshold, not the intersection size) — assert a conservative 10% of
    the UNION as the absolute bound. The registry entry re-expresses this
    as driver-gate booleans; assert those too."""
    from datalake_brief_spark.queries import QUERIES, _theta_overlap_estimates

    row = _theta_overlap_estimates(spark, SF_SMOKE).collect()[0]
    l = load_table(spark, SF_SMOKE, "lineitem")
    parts = lambda flag: {
        r.l_partkey
        for r in l.filter(F.col("l_returnflag") == flag)
        .select("l_partkey")
        .distinct()
        .collect()
    }
    a, r_ = parts("A"), parts("R")
    exact_union, exact_overlap = len(a | r_), len(a & r_)
    assert abs(row.n_union - exact_union) <= max(0.05 * exact_union, 2)
    assert abs(row.n_overlap - exact_overlap) <= max(0.10 * exact_union, 2)
    gate = QUERIES["sketch_set_overlap"].fn(spark, SF_SMOKE).collect()[0]
    assert (gate.exact_union, gate.exact_overlap) == (exact_union, exact_overlap)
    assert gate.union_in_bound and gate.overlap_in_bound
