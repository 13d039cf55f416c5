"""Round-8 additions: two-phase global rank / prefix-sum helpers (the
scale-safe replacements for unpartitioned WindowExec frames — VERDICT r7
asks #2-#4), the closed-form NTILE, and the plan-lint detector itself."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from datalake_brief_spark.operators.windows import (
    binned_prefix_sums,
    two_phase_rank,
)
from datalake_brief_spark.plans import unpartitioned_window_count


def _rand_df(spark, n=500, seed=8):
    rng = random.Random(seed)
    rows = [
        (i, rng.choice([None, *range(40)]), rng.uniform(-5, 5), rng.randint(1, 9))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, k int, x double, v long")


class TestTwoPhaseRank:
    def test_matches_global_row_number_with_ties_and_nulls(self, spark):
        df = _rand_df(spark)
        naive = df.withColumn(
            "rank", F.row_number().over(Window.orderBy("k", "id")).cast("long")
        )
        got = two_phase_rank(df, F.col("k"), ["id"], out="rank")
        assert sorted(got.collect()) == sorted(naive.collect())

    def test_descending_via_negated_key(self, spark):
        df = _rand_df(spark).filter(F.col("x").isNotNull())
        naive = df.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.col("x").desc(), "id")).cast("long"),
        )
        got = two_phase_rank(df, F.col("x") * -1, ["id"], out="rank")
        assert sorted(got.collect()) == sorted(naive.collect())

    def test_constant_key_collapses_to_one_bin_still_exact(self, spark):
        df = spark.range(100).select(F.lit(7).alias("c"), F.col("id"))
        got = two_phase_rank(df, F.col("c"), ["id"], out="rank")
        assert [r.rank for r in got.orderBy("id").collect()] == list(range(1, 101))

    def test_plan_has_no_data_scale_funnel(self, spark):
        """The ONLY unpartitioned window is the ≤257-row bin-offset cumsum;
        the data-scale ranking runs partitioned by __bin."""
        df = _rand_df(spark)
        got = two_phase_rank(df, F.col("x"), ["id"])
        assert unpartitioned_window_count(got) == 1
        plan = got._jdf.queryExecution().sparkPlan().toString()  # noqa: SLF001
        assert "row_number()" in plan


class TestBinnedPrefixSums:
    def test_matches_exclusive_running_sum(self, spark):
        df = _rand_df(spark).select("id", "x", "v").distinct()
        w = Window.orderBy("x", "id").rowsBetween(Window.unboundedPreceding, -1)
        naive = df.select(
            "id", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("pre")
        )
        got = binned_prefix_sums(df, "x", {"pre": F.col("v")}, tiebreak=["id"])
        assert sorted((r.id, r.pre) for r in got.collect()) == sorted(
            (r.id, r.pre) for r in naive.collect()
        )

    def test_multiple_values_one_pass(self, spark):
        df = spark.createDataFrame(
            [(1, 10, 2), (3, 20, 4), (2, 5, 1), (4, 1, 8)], "s long, a long, b long"
        )
        got = {
            r.s: (r.pa, r.pb)
            for r in binned_prefix_sums(
                df, "s", {"pa": F.col("a"), "pb": F.col("b")}
            ).collect()
        }
        assert got == {1: (0, 0), 2: (10, 2), 3: (15, 3), 4: (35, 7)}

    def test_exactly_one_unpartitioned_window(self, spark):
        df = _rand_df(spark)
        got = binned_prefix_sums(df, "x", {"p": F.col("v")}, tiebreak=["id"])
        assert unpartitioned_window_count(got) == 1


class TestNtileClosedForm:
    @pytest.mark.parametrize("n", [1, 4, 5, 7, 23, 100, 101])
    def test_matches_sql_ntile(self, spark, n):
        df = spark.range(1, n + 1).select(F.col("id").alias("v"))
        naive = df.select(
            "v", F.ntile(5).over(Window.orderBy("v")).cast("long").alias("t")
        )
        ranked = two_phase_rank(df, F.col("v"), [], out="__rk")
        cnt = ranked.agg(F.count(F.lit(1)).cast("long").alias("__n"))
        nn, rk = F.col("__n"), F.col("__rk")
        base = F.floor(nn / 5).cast("long")
        rem = nn % 5
        cut = rem * (base + 1)
        tile = (
            F.when(rk <= cut, F.ceil(rk / (base + 1)))
            .otherwise(rem + F.ceil((rk - cut) / base))
            .cast("long")
        )
        got = ranked.crossJoin(F.broadcast(cnt)).select("v", tile.alias("t"))
        assert sorted(got.collect()) == sorted(naive.collect())


class TestUnpartitionedWindowDetector:
    def test_flags_global_order_window(self, spark):
        df = spark.range(10).select(
            F.row_number().over(Window.orderBy("id")).alias("r")
        )
        assert unpartitioned_window_count(df) == 1

    def test_flags_empty_partition_by(self, spark):
        df = spark.range(10).select(
            F.sum("id").over(Window.partitionBy()).alias("s")
        )
        assert unpartitioned_window_count(df) == 1

    def test_ignores_partitioned_windows(self, spark):
        df = spark.range(10).select(
            (F.col("id") % 3).alias("k"), F.col("id")
        )
        ordered = df.select(
            F.row_number().over(Window.partitionBy("k").orderBy("id")).alias("r")
        )
        whole = df.select(F.sum("id").over(Window.partitionBy("k")).alias("s"))
        assert unpartitioned_window_count(ordered) == 0
        assert unpartitioned_window_count(whole) == 0


class TestAucBinnedSpectrum:
    def test_auc_unchanged_by_binning_vs_naive_midranks(self, spark):
        """The binning only re-partitions the spectrum cumsum — AUC must
        equal the naive midrank computation bit-for-bit."""
        from datalake_brief_spark.mlops import auc_score

        rng = random.Random(42)
        rows = [
            (rng.choice([0.1, 0.25, rng.random()]), rng.randint(0, 1))
            for _ in range(400)
        ]
        df = spark.createDataFrame(rows, "score double, label int")
        got = auc_score(df, "score", "label").collect()[0]
        # naive: midranks via one global sort window
        ranked = df.withColumn(
            "__r", F.row_number().over(Window.orderBy("score", "label"))
        )
        mid = ranked.select(
            "label",
            (
                F.min("__r").over(Window.partitionBy("score"))
                + (F.count(F.lit(1)).over(Window.partitionBy("score")) - 1) / 2.0
            ).alias("mid"),
        )
        agg = mid.agg(
            F.sum(F.when(F.col("label") == 1, F.col("mid"))).alias("rs"),
            F.sum(F.when(F.col("label") == 1, 1).otherwise(0)).alias("np"),
            F.sum(F.when(F.col("label") == 0, 1).otherwise(0)).alias("nn"),
        ).collect()[0]
        expect = (agg.rs - agg.np * (agg.np + 1) / 2.0) / (agg.np * agg.nn)
        assert got.auc == pytest.approx(round(expect, 6), abs=0)
        assert got.n_pos == agg.np and got.n_neg == agg.nn


class TestBatchTopkIdTypes:
    def test_string_ids_match_cosine_topk(self, spark):
        """cosine_topk_batch hardcoded int64 ids (mapInPandas '<id> long'
        schema) while claiming parity with cosine_topk, which accepts any
        id type — string keys crashed with a cast error. The schema now
        derives from the input dtypes."""
        import random

        from datalake_brief_spark.operators import similarity

        rng = random.Random(8)
        rows = [
            (f"doc-{i:03d}", [rng.uniform(-1, 1) for _ in range(8)])
            for i in range(40)
        ]
        emb = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
        q = emb.filter(F.col("vec_id") < "doc-005").select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        want = {
            (r.query_id, r.rank): (r.vec_id, r.score)
            for r in similarity.cosine_topk(emb, q, k=5).collect()
        }
        got = {
            (r.query_id, r.rank): (r.vec_id, r.score)
            for r in similarity.cosine_topk_batch(
                emb.repartition(3), q, k=5
            ).collect()
        }
        assert got == want


class TestUrlCanonicalize:
    def test_rules(self, spark):
        from datalake_brief_spark.operators.text import canonicalize_url

        cases = [
            ("HTTPS://WWW.Ex.COM:443/A/B/?utm_source=x&b=2&a=1#f",
             "https://www.ex.com/A/B?a=1&b=2"),
            ("http://Host.com:80/", "http://host.com/"),
            ("http://host.com:8080/p", "http://host.com:8080/p"),  # non-default kept
            ("https://h.com:80/p", "https://h.com:80/p"),  # :80 is NOT https default
            ("https://h.com", "https://h.com/"),  # bare host gets root path
            ("https://h.com/p?ref=abc&gclid=1&fbclid=2", "https://h.com/p"),
            ("https://h.com/p?z=1&a=2", "https://h.com/p?a=2&z=1"),  # sorted
        ]
        df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
        got = [r[0] for r in df.select(canonicalize_url("url")).collect()]
        assert got == [want for _, want in cases]


class TestAsofNearest:
    def test_nearest_picks_closer_side_and_backward_on_ties(self, spark):
        from datalake_brief_spark.operators.joins import asof_join

        left = spark.createDataFrame(
            [(1, "2020-01-01 10:00:00"), (2, "2020-01-01 10:00:10"),
             (3, "2020-01-01 09:00:00"), (4, "2020-01-02 00:00:00")],
            "id long, ts string",
        ).select("id", F.col("ts").cast("timestamp").alias("ts"))
        left = left.withColumn("k", F.lit("a"))
        right = spark.createDataFrame(
            [(100, "2020-01-01 09:59:55"), (200, "2020-01-01 10:00:05"),
             (300, "2020-01-01 10:00:15")],
            "rid long, rts string",
        ).select("rid", F.col("rts").cast("timestamp").alias("rts"))
        right = right.withColumn("k", F.lit("a"))
        out = {
            r.id: r.rid
            for r in asof_join(
                left, right, key="k", left_ts="ts", right_ts="rts",
                value_cols=["rid"], right_tiebreak="rid", direction="nearest",
            ).collect()
        }
        assert out[1] == 100  # 5s back vs 5s fwd: TIE -> backward
        assert out[2] == 200  # 5s back beats 5s fwd tie -> backward again
        assert out[3] == 100  # nothing behind; takes the earliest ahead
        assert out[4] == 300  # nothing ahead; takes the latest behind

    def test_nearest_tolerance_nulls_far_matches(self, spark):
        from datalake_brief_spark.operators.joins import asof_join

        left = spark.createDataFrame(
            [(1, "2020-01-01 10:00:00")], "id long, ts string"
        ).select("id", F.col("ts").cast("timestamp").alias("ts"), F.lit("a").alias("k"))
        right = spark.createDataFrame(
            [(9, "2020-01-01 12:00:00")], "rid long, rts string"
        ).select("rid", F.col("rts").cast("timestamp").alias("rts"), F.lit("a").alias("k"))
        got = asof_join(
            left, right, key="k", left_ts="ts", right_ts="rts",
            value_cols=["rid"], right_tiebreak="rid",
            direction="nearest", tolerance=3600,
        ).collect()[0]
        assert got.rid is None  # 2h away > 1h tolerance
