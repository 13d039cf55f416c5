"""Ground-truth pins for the round-7 operator band: sequence analytics
(SCD2 / islands / latest-per-key), graph (degree histogram, triangles),
time-series scoring (rolling z-score, linear interpolation), ML prep
(one-hot, stratified hash split), corpus segment dedup, lexical
diversity, PQ ANN. Oracle parity at corpus scale lives in
test_oracle_parity.py; these tests pin hand-computable semantics and the
edge cases the oracles can't reach (empty input, NULL categories,
leading/trailing gaps, known triangle counts)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


class TestIslands:
    def test_runs_collapse_and_split(self, spark):
        from datalake_brief_spark.operators.windows import islands

        rows = [
            (1, "a", _ts(1), 1),
            (1, "a", _ts(2), 2),
            (1, "b", _ts(3), 3),
            (1, "a", _ts(4), 4),  # new 'a' island after the 'b' break
            (2, "a", _ts(1), 5),
        ]
        df = spark.createDataFrame(rows, "user_id int, state string, ts timestamp, eid int")
        out = islands(df, "user_id", "state", "ts", "eid")
        got = {
            (r.user_id, r.state, r.island_start.hour, r.n_events)
            for r in out.collect()
        }
        assert got == {(1, "a", 1, 2), (1, "b", 3, 1), (1, "a", 4, 1), (2, "a", 1, 1)}

    def test_timestamp_collision_deterministic(self, spark):
        from datalake_brief_spark.operators.windows import islands

        # two different states at the SAME timestamp: the eid tiebreaker
        # decides run membership, so repeated runs agree.
        rows = [(1, "a", _ts(1), 1), (1, "b", _ts(1), 2), (1, "a", _ts(2), 3)]
        df = spark.createDataFrame(rows, "user_id int, state string, ts timestamp, eid int")
        a = sorted(map(tuple, islands(df, "user_id", "state", "ts", "eid").collect()))
        b = sorted(map(tuple, islands(df, "user_id", "state", "ts", "eid").collect()))
        assert a == b and len(a) == 3  # a|b|a -> three islands

    def test_single_shuffle_plan(self, spark):
        from datalake_brief_spark.operators.windows import islands

        df = spark.createDataFrame(
            [(1, "a", _ts(1), 1)], "user_id int, state string, ts timestamp, eid int"
        )
        plan = islands(df, "user_id", "state", "ts", "eid")._jdf.queryExecution().executedPlan().toString()
        # one exchange for the user-key partitioning; the (user,state)
        # window and the final agg reuse it (hashpartitioning(user_id…)).
        assert plan.count("Exchange hashpartitioning") <= 2


class TestScd2:
    def test_intervals_chain(self, spark):
        from datalake_brief_spark.operators.windows import scd2_intervals

        rows = [(1, _ts(1), "x"), (1, _ts(5), "y"), (2, _ts(2), "z")]
        df = spark.createDataFrame(rows, "k int, ts timestamp, v string")
        out = {
            (r.k, r.version, r.valid_from.hour, r.valid_to.hour if r.valid_to else None, r.is_current)
            for r in scd2_intervals(df, "k", "ts").collect()
        }
        assert out == {(1, 1, 1, 5, False), (1, 2, 5, None, True), (2, 1, 2, None, True)}


class TestZscoreAnomalies:
    def test_excludes_current_row_from_baseline(self, spark):
        from datalake_brief_spark.operators.timeseries import zscore_anomalies

        # constant 10.0 baseline, then a spike: z must be computed against
        # the PRIOR rows only. Constant baseline -> sd == 0 -> z NULL for
        # the early rows; the spike sees a nonzero sd only if baseline
        # varies, so use 9/11 alternation then spike.
        vals = [9.0, 11.0, 9.0, 11.0, 50.0]
        rows = [(1, _ts(1, i), i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k int, ts timestamp, eid int, v double")
        out = zscore_anomalies(df, ["k"], [F.col("ts"), F.col("eid")], "v", n_preceding=20).collect()
        by_eid = {r.eid: r for r in out}
        assert by_eid[0].zscore is None and not by_eid[0].is_anomaly
        assert by_eid[4].is_anomaly  # 50 vs mean 10, sd ~1.15 -> z ~34
        # row 4's own value must not shrink its baseline: mean of prior
        # four is exactly 10.0 -> z = (50-10)/sd(9,11,9,11)
        assert by_eid[4].zscore == pytest.approx((50 - 10) / 1.1547, abs=1e-3)

    def test_zero_spread_yields_null(self, spark):
        from datalake_brief_spark.operators.timeseries import zscore_anomalies

        rows = [(1, _ts(1, i), i, 5.0) for i in range(4)]
        df = spark.createDataFrame(rows, "k int, ts timestamp, eid int, v double")
        out = zscore_anomalies(df, ["k"], [F.col("ts"), F.col("eid")], "v").collect()
        assert all(r.zscore is None and not r.is_anomaly for r in out)


class TestInterpolateLinear:
    def _series(self, spark, vals):
        rows = [(1, _ts(i), v) for i, v in enumerate(vals)]
        return spark.createDataFrame(rows, "k int, bucket timestamp, v double")

    def test_midpoint_and_thirds(self, spark):
        from datalake_brief_spark.operators.timeseries import interpolate_linear

        df = self._series(spark, [10.0, None, 20.0, None, None, 50.0])
        out = interpolate_linear(df, ["k"], "bucket", "v")
        got = [r.value_interp for r in out.orderBy("bucket").collect()]
        assert got == [10.0, 15.0, 20.0, 30.0, 40.0, 50.0]

    def test_no_extrapolation(self, spark):
        from datalake_brief_spark.operators.timeseries import interpolate_linear

        df = self._series(spark, [None, 10.0, None, 20.0, None])
        out = interpolate_linear(df, ["k"], "bucket", "v")
        got = [r.value_interp for r in out.orderBy("bucket").collect()]
        assert got == [None, 10.0, 15.0, 20.0, None]

    def test_all_null_key_stays_null(self, spark):
        from datalake_brief_spark.operators.timeseries import interpolate_linear

        df = self._series(spark, [None, None])
        got = [r.value_interp for r in interpolate_linear(df, ["k"], "bucket", "v").collect()]
        assert got == [None, None]


class TestGraph:
    def test_triangle_count_k4(self, spark):
        from datalake_brief_spark.operators.graph import triangle_count

        # K4 has C(4,3) = 4 triangles; feed edges in mixed orientation
        # with a duplicate to exercise canonicalization.
        edges = [(a, b) for a in range(4) for b in range(4) if a != b]
        edges.append((2, 1))
        df = spark.createDataFrame(edges, "src int, dst int")
        assert triangle_count(df).collect()[0].n_triangles == 4

    def test_triangle_count_chain_is_zero(self, spark):
        from datalake_brief_spark.operators.graph import triangle_count

        df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src int, dst int")
        assert triangle_count(df).collect()[0].n_triangles == 0

    def test_degree_histogram_star(self, spark):
        from datalake_brief_spark.operators.graph import degree_histogram

        # undirected star on 4 leaves (both orientations): hub degree 4,
        # leaves degree 1.
        e = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
        df = spark.createDataFrame(e, "src int, dst int")
        got = {(r.degree, r.n_nodes) for r in degree_histogram(df).collect()}
        assert got == {(4, 1), (1, 4)}


class TestOneHot:
    def test_null_and_unseen_encode_zero(self, spark):
        from datalake_brief_spark.mlops import one_hot

        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, None), (4, "zz")], "id int, c string"
        )
        out = one_hot(df, "c", categories=["a", "b"])
        rows = {r.id: (r.c_a, r.c_b) for r in out.collect()}
        assert rows == {1: (1, 0), 2: (0, 1), 3: (0, 0), 4: (0, 0)}

    def test_derived_categories_sorted(self, spark):
        from datalake_brief_spark.mlops import one_hot

        df = spark.createDataFrame([(1, "b"), (2, "a")], "id int, c string")
        out = one_hot(df, "c")
        assert [c for c in out.columns if c.startswith("c_")] == ["c_a", "c_b"]


class TestSegmentDedup:
    def test_exact_duplicate_doc_fully_removed(self, spark):
        from datalake_brief_spark.operators.text import segment_dedup

        t = "one two three four five six seven eight nine ten"
        df = spark.createDataFrame([(1, t), (2, t), (3, "unique words only")],
                                   "doc_id int, text string")
        out = {r.doc_id: r for r in segment_dedup(df, segment_words=4).collect()}
        assert out[1].n_kept == out[1].n_segments == 3
        assert out[2].n_kept == 0 and out[2].text_kept is None
        assert out[3].text_kept == "unique words only"

    def test_partial_overlap_keeps_fresh_segments(self, spark):
        from datalake_brief_spark.operators.text import segment_dedup

        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c d x y z w")], "doc_id int, text string"
        )
        out = {r.doc_id: r for r in segment_dedup(df, segment_words=4).collect()}
        assert out[2].text_kept == "x y z w" and out[2].n_kept == 1

    def test_reassembly_preserves_order(self, spark):
        from datalake_brief_spark.operators.text import segment_dedup

        # doc 2 repeats doc 1's segment in the MIDDLE; survivors must
        # rejoin in original position order.
        df = spark.createDataFrame(
            [(1, "dup dup"), (2, "aa bb dup dup zz yy")], "doc_id int, text string"
        )
        out = {r.doc_id: r.text_kept for r in segment_dedup(df, segment_words=2).collect()}
        assert out[2] == "aa bb zz yy"


class TestLexicalDiversity:
    def test_known_ratios(self, spark):
        from datalake_brief_spark.operators.text import lexical_diversity

        df = spark.createDataFrame([(1, "a a b"), (2, "x y z")], "doc_id int, text string")
        out = {r.doc_id: r for r in lexical_diversity(df).collect()}
        assert out[1].n_tokens == 3 and out[1].n_types == 2
        assert out[1].ttr == pytest.approx(2 / 3, abs=1e-6)
        assert out[1].hapax_ratio == pytest.approx(0.5, abs=1e-6)
        assert out[2].ttr == 1.0 and out[2].hapax_ratio == 1.0


class TestPQ:
    def test_recall_floor_smoke(self, spark):
        from datalake_brief_spark.operators import similarity

        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = similarity.cosine_topk(emb, q, k=10).select("query_id", "vec_id")
        approx = similarity.pq_topk(
            emb, q, dim=64, m=16, ks=32, k=10, refine=64
        ).select("query_id", "vec_id")
        hits = approx.join(exact, ["query_id", "vec_id"]).count()
        assert hits >= 0.9 * 50

    def test_search_path_has_no_python_eval(self, spark):
        from datalake_brief_spark.operators import similarity

        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        books = similarity.train_pq_codebooks(emb, dim=64, m=16, ks=32)
        codes = similarity.pq_encode(emb, books)
        # the ENCODE pass is the sanctioned Arrow stage; the ADC scoring
        # plan over pre-encoded codes must stay JVM-only (the LUT lookup
        # is zip_with/aggregate, not a UDF).
        plan = similarity.pq_topk(
            codes.join(emb, "vec_id"), q, dim=64, m=16, ks=32, codebooks=books
        )
        # building from raw corpus: assert the final plan has no
        # row-at-a-time BatchEvalPython (ArrowEvalPython allowed for encode)
        s = plan._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in s

    def test_encode_shrinks_to_m_codes(self, spark):
        from datalake_brief_spark.operators import similarity

        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(20)
        books = similarity.train_pq_codebooks(emb, dim=64, m=8, ks=16)
        row = similarity.pq_encode(emb, books).first()
        assert len(row.codes) == 8 and all(0 <= c < 16 for c in row.codes)


class TestEmptyInputsRound7:
    """Round-7 operators degrade to empty results, never crash, on empty
    input (the r6 degradation contract extended)."""

    def test_all_empty(self, spark):
        from datalake_brief_spark.mlops import one_hot
        from datalake_brief_spark.operators.graph import degree_histogram, triangle_count
        from datalake_brief_spark.operators.text import lexical_diversity, segment_dedup
        from datalake_brief_spark.operators.timeseries import (
            interpolate_linear,
            zscore_anomalies,
        )
        from datalake_brief_spark.operators.windows import (
            distribution_ranks,
            islands,
            scd2_intervals,
        )

        ev = spark.createDataFrame([], "k int, ts timestamp, eid int, v double, s string")
        docs = spark.createDataFrame([], "doc_id int, text string")
        edges = spark.createDataFrame([], "src int, dst int")
        assert islands(ev, "k", "s", "ts", "eid").count() == 0
        assert scd2_intervals(ev, "k", "ts").count() == 0
        assert distribution_ranks(ev, ["s"], [F.col("v"), F.col("eid")]).count() == 0
        assert zscore_anomalies(ev, ["k"], [F.col("ts")], "v").count() == 0
        assert interpolate_linear(ev, ["k"], "ts", "v").count() == 0
        assert degree_histogram(edges).count() == 0
        assert triangle_count(edges).collect()[0].n_triangles == 0
        assert segment_dedup(docs).count() == 0
        assert lexical_diversity(docs).count() == 0
        assert one_hot(ev, "s", categories=["a"]).count() == 0

    def test_batch23_empty(self, spark):
        from datalake_brief_spark.mlops import classification_report
        from datalake_brief_spark.operators.graph import adamic_adar_topk
        from datalake_brief_spark.operators.joins import interval_join
        from datalake_brief_spark.operators.relational import entropy_profile
        from datalake_brief_spark.operators.text import zipf_profile
        from datalake_brief_spark.operators.timeseries import rolling_median

        ev = spark.createDataFrame([], "k int, ts timestamp, eid int, v double, s string")
        docs = spark.createDataFrame([], "doc_id int, source string, text string")
        edges = spark.createDataFrame([], "src int, dst int")
        iv = spark.createDataFrame([], "k int, a_start timestamp, a_end timestamp")
        iv2 = spark.createDataFrame([], "k int, b_start timestamp, b_end timestamp")
        assert rolling_median(ev, ["k"], [F.col("eid")], "v", 5).count() == 0
        # entropy over an empty relation: the column row exists with
        # n_distinct 0 would be a lie — the groupBy yields no counts, so
        # the per-column re-agg emits nothing.
        assert entropy_profile(ev, ["s"]).count() == 0
        assert zipf_profile(docs).count() == 0
        assert adamic_adar_topk(edges).count() == 0
        assert interval_join(iv, iv2, "a_start", "a_end", "b_start", "b_end",
                             keys=["k"]).count() == 0
        r = classification_report(
            spark.createDataFrame([], "pred boolean, label boolean"),
            "pred", "label").collect()[0]
        assert r.tp is None and r.precision is None


class TestRollingMedian:
    def test_known_frames(self, spark):
        from datalake_brief_spark.operators.timeseries import rolling_median

        vals = [1.0, 9.0, 5.0, 3.0]
        rows = [(1, _ts(1, i), i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k int, ts timestamp, eid int, v double")
        out = rolling_median(df, ["k"], [F.col("ts"), F.col("eid")], "v", n_preceding=2)
        got = [r.rolling_median for r in out.orderBy("eid").collect()]
        # frames: [1], [1,9], [1,9,5], [9,5,3]
        assert got == [1.0, 5.0, 5.0, 5.0]

    def test_nulls_skipped_and_all_null_frame(self, spark):
        from datalake_brief_spark.operators.timeseries import rolling_median

        rows = [(1, _ts(1, 0), 0, None), (1, _ts(1, 1), 1, 4.0)]
        df = spark.createDataFrame(rows, "k int, ts timestamp, eid int, v double")
        got = [r.rolling_median for r in rolling_median(
            df, ["k"], [F.col("eid")], "v", n_preceding=5).orderBy("eid").collect()]
        assert got == [None, 4.0]


class TestEntropyProfile:
    def test_constant_zero_uniform_log2(self, spark):
        from datalake_brief_spark.operators.relational import entropy_profile

        df = spark.createDataFrame(
            [("a", i % 4) for i in range(16)], "c string, u int"
        )
        out = {r.col_name: r for r in entropy_profile(df, ["c", "u"]).collect()}
        assert out["c"].entropy == 0.0 and out["c"].n_distinct == 1
        assert out["u"].entropy == pytest.approx(2.0, abs=1e-9)

    def test_null_counts_as_value(self, spark):
        from datalake_brief_spark.operators.relational import entropy_profile

        df = spark.createDataFrame([("x",), (None,)], "c string")
        r = entropy_profile(df, ["c"]).collect()[0]
        assert r.n_distinct == 2 and r.entropy == pytest.approx(1.0, abs=1e-9)


class TestIntervalJoin:
    def _dfs(self, spark):
        a = spark.createDataFrame(
            [(1, 10, _ts(1, 0), _ts(3, 0)),   # long interval spans 3 buckets
             (1, 11, _ts(5, 0), _ts(5, 30)),
             (2, 20, _ts(1, 0), _ts(2, 0))],
            "k int, aid int, a_start timestamp, a_end timestamp",
        )
        b = spark.createDataFrame(
            [(1, 100, _ts(2, 30), _ts(4, 0)),  # overlaps aid=10 in 2 buckets
             (1, 101, _ts(6, 0), _ts(7, 0)),   # no overlap
             (2, 200, _ts(1, 30), _ts(1, 45))],
            "k int, bid int, b_start timestamp, b_end timestamp",
        )
        return a, b

    def test_overlaps_and_multibucket_dedup(self, spark):
        from datalake_brief_spark.operators.joins import interval_join

        a, b = self._dfs(spark)
        out = interval_join(a, b, "a_start", "a_end", "b_start", "b_end",
                            keys=["k"], band_seconds=3600)
        got = {(r.aid, r.bid): r.overlap_us for r in out.collect()}
        # aid=10 × bid=100 meets in buckets 2 AND 3 — must appear ONCE
        assert got == {(10, 100): 30 * 60 * 1_000_000,
                       (20, 200): 15 * 60 * 1_000_000}

    def test_no_nested_loop_join(self, spark):
        from datalake_brief_spark.operators.joins import interval_join

        a, b = self._dfs(spark)
        plan = interval_join(a, b, "a_start", "a_end", "b_start", "b_end",
                             keys=["k"])._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestClassificationReport:
    def test_hand_confusion(self, spark):
        from datalake_brief_spark.mlops import classification_report

        rows = [(True, True)] * 3 + [(True, False)] * 1 + \
               [(False, True)] * 2 + [(False, False)] * 4
        df = spark.createDataFrame(rows, "pred boolean, label boolean")
        r = classification_report(df, "pred", "label").collect()[0]
        assert (r.tp, r.fp, r.fn, r.tn) == (3, 1, 2, 4)
        assert r.precision == pytest.approx(0.75)
        assert r.recall == pytest.approx(0.6)
        assert r.f1 == pytest.approx(2 * 0.75 * 0.6 / 1.35, abs=1e-6)
        assert r.accuracy == pytest.approx(0.7)

    def test_degenerate_no_predicted_positives(self, spark):
        from datalake_brief_spark.mlops import classification_report

        df = spark.createDataFrame([(False, True), (False, False)],
                                   "pred boolean, label boolean")
        r = classification_report(df, "pred", "label").collect()[0]
        assert r.precision is None and r.f1 is None
        assert r.recall == 0.0 and r.accuracy == 0.5


class TestZipfProfile:
    def test_known_slope(self, spark):
        from datalake_brief_spark.operators.text import zipf_profile

        # exact Zipf with alpha=1: freq(rank r) = 12/r for r=1..3
        # ("a"x12, "b"x6, "c"x4) -> slope of ln f on ln r is exactly -1
        # over {(0, ln12), (ln2, ln6), (ln3, ln4)}... not exactly linear;
        # use a 2-point table which any line fits exactly: a x4, b x1 ->
        # slope = (ln1 - ln4)/(ln2 - ln1) = -2, alpha = 2.
        df = spark.createDataFrame([("s", "a a a a b")], "source string, text string")
        r = zipf_profile(df).collect()[0]
        assert r.n_types == 2 and r.n_tokens == 5
        assert r.zipf_alpha == pytest.approx(2.0, abs=1e-4)

    def test_single_type_yields_null(self, spark):
        from datalake_brief_spark.operators.text import zipf_profile

        df = spark.createDataFrame([("s", "a a a")], "source string, text string")
        assert zipf_profile(df).collect()[0].zipf_alpha is None


class TestAdamicAdar:
    def test_known_scores_and_exclusion(self, spark):
        from datalake_brief_spark.operators.graph import adamic_adar_topk

        # path 1-2-3 plus 3-4: candidates (1,3) via 2, (2,4) via 3,
        # (1,4)? no common neighbor. Edge (1,2) itself must be excluded.
        import math

        df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src int, dst int")
        got = {(r.node_a, r.node_b): r.aa_score for r in adamic_adar_topk(df, k=10).collect()}
        assert set(got) == {(1, 3), (2, 4)}
        assert got[(1, 3)] == pytest.approx(round(1 / math.log(2), 4))
        assert got[(2, 4)] == pytest.approx(round(1 / math.log(2), 4))

    def test_connected_pairs_never_predicted(self, spark):
        from datalake_brief_spark.operators.graph import adamic_adar_topk

        # triangle: every pair already connected -> no predictions
        df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src int, dst int")
        assert adamic_adar_topk(df, k=10).count() == 0


class TestParquetMetadataProfile:
    def test_footer_counts_match_engine(self, spark, tmp_path):
        from datalake_brief_spark.sources.io import parquet_metadata_profile

        p = str(tmp_path / "t")
        spark.range(1000).repartition(3).write.parquet(p)
        r = parquet_metadata_profile(spark, p).collect()[0]
        assert r.n_files == 3 and r.n_rows_meta == 1000
        assert r.n_row_groups >= 3


class TestMarketBasket:
    def test_known_lift(self, spark):
        from datalake_brief_spark.operators.relational import market_basket_rules

        # 4 baskets; items x,y together in 2, x alone in 1, y alone in 1.
        rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (4, "y")]
        df = spark.createDataFrame(rows, "b int, i string")
        r = market_basket_rules(df, "b", "i", min_pair_orders=2).collect()
        assert len(r) == 1
        row = r[0]
        assert (row.item_a, row.item_b, row.n_pair) == ("x", "y", 2)
        assert row.support == pytest.approx(0.5)
        assert row.confidence_a_b == pytest.approx(2 / 3, abs=1e-6)
        assert row.lift == pytest.approx(2 * 4 / (3 * 3), abs=1e-6)

    def test_duplicate_items_in_basket_counted_once(self, spark):
        from datalake_brief_spark.operators.relational import market_basket_rules

        rows = [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y")]
        df = spark.createDataFrame(rows, "b int, i string")
        assert market_basket_rules(df, "b", "i").collect()[0].n_pair == 2


class TestTransitionMatrix:
    def test_known_chain(self, spark):
        from datalake_brief_spark.operators.windows import transition_matrix

        # user 1: a->b->a ; user 2: a->b  =>  a->b n=2 p=1.0, b->a n=1 p=1.0
        rows = [(1, "a", _ts(1), 1), (1, "b", _ts(2), 2), (1, "a", _ts(3), 3),
                (2, "a", _ts(1), 4), (2, "b", _ts(2), 5)]
        df = spark.createDataFrame(rows, "user_id int, event_type string, ts timestamp, event_id int")
        got = {(r.prev_state, r.next_state): (r.n, r.prob)
               for r in transition_matrix(df, "user_id", "event_type", "ts", "event_id").collect()}
        assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}

    def test_no_cross_user_transitions(self, spark):
        from datalake_brief_spark.operators.windows import transition_matrix

        rows = [(1, "a", _ts(1), 1), (2, "b", _ts(2), 2)]
        df = spark.createDataFrame(rows, "user_id int, event_type string, ts timestamp, event_id int")
        assert transition_matrix(df, "user_id", "event_type", "ts", "event_id").count() == 0


class TestRunningDistinct:
    def test_vocabulary_growth(self, spark):
        from datalake_brief_spark.operators.windows import running_distinct

        rows = [(1, "a", _ts(1), 1), (1, "a", _ts(2), 2), (1, "b", _ts(3), 3),
                (1, "a", _ts(4), 4), (1, "c", _ts(5), 5)]
        df = spark.createDataFrame(rows, "k int, v string, ts timestamp, eid int")
        out = running_distinct(df, "k", "v", "ts", "eid")
        got = [r.n_distinct_so_far for r in out.orderBy("eid").collect()]
        assert got == [1, 1, 2, 2, 3]


class TestVocabCoverage:
    def test_hand_curve_and_beyond_vocab(self, spark):
        from datalake_brief_spark.operators.text import vocab_coverage

        # freqs: a=4, b=2, c=1, d=1 (total 8, 4 types)
        df = spark.createDataFrame([(1, "a a a a b b c d")], "id int, text string")
        got = {r.vocab_size: r for r in vocab_coverage(df, [1, 2, 3, 10]).collect()}
        assert got[1].n_covered == 4 and got[1].coverage == pytest.approx(0.5)
        assert got[2].n_covered == 6 and got[2].coverage == pytest.approx(0.75)
        # V=3 splits the f=1 tie (c,d): either type gives the same tokens
        assert got[3].n_covered == 7
        # V beyond vocab: full coverage
        assert got[10].n_covered == 8 and got[10].coverage == 1.0
        assert all(r.n_types == 4 for r in got.values())


class TestBatchPadding:
    def test_hand_buckets(self, spark):
        from datalake_brief_spark.operators.text import batch_padding_stats

        # lengths 3, 4 (bucket 0) and 12 (bucket 1) with width 10
        df = spark.createDataFrame(
            [(1, "a b c"), (2, "a b c d"), (3, " ".join("x" * 1 for _ in range(12)))],
            "id int, text string",
        )
        got = {r.bucket: r for r in batch_padding_stats(df, 10).collect()}
        assert got[0].n_docs == 2 and got[0].max_len == 4
        assert got[0].pad_tokens == 2 * 4 - 7 == 1
        assert got[0].pad_fraction == pytest.approx(1 / 8)
        assert got[1].n_docs == 1 and got[1].pad_tokens == 0


class TestAucScore:
    def test_perfect_and_random_and_ties(self, spark):
        from datalake_brief_spark.mlops import auc_score

        # perfect separation
        rows = [(0.9, True), (0.8, True), (0.2, False), (0.1, False)]
        df = spark.createDataFrame(rows, "score double, label boolean")
        assert auc_score(df, "score", "label").collect()[0].auc == 1.0
        # anti-perfect
        rows = [(0.1, True), (0.9, False)]
        df = spark.createDataFrame(rows, "score double, label boolean")
        assert auc_score(df, "score", "label").collect()[0].auc == 0.0
        # all-tied scores: midrank correction gives exactly 0.5
        rows = [(0.5, True), (0.5, False), (0.5, True), (0.5, False)]
        df = spark.createDataFrame(rows, "score double, label boolean")
        assert auc_score(df, "score", "label").collect()[0].auc == 0.5

    def test_sklearn_equivalence_formula(self, spark):
        from datalake_brief_spark.mlops import auc_score

        # mixed case with a tie across classes; hand Mann-Whitney:
        # scores: pos {0.8, 0.5}, neg {0.5, 0.2}
        # pairs: (0.8>0.5)=1, (0.8>0.2)=1, (0.5==0.5)=0.5, (0.5>0.2)=1
        # AUC = 3.5/4
        rows = [(0.8, True), (0.5, True), (0.5, False), (0.2, False)]
        df = spark.createDataFrame(rows, "score double, label boolean")
        assert auc_score(df, "score", "label").collect()[0].auc == pytest.approx(0.875)

    def test_degenerate_single_class(self, spark):
        from datalake_brief_spark.mlops import auc_score

        df = spark.createDataFrame([(0.5, True), (0.7, True)], "score double, label boolean")
        r = auc_score(df, "score", "label").collect()[0]
        assert r.auc is None and r.n_neg == 0


class TestCalibrationBins:
    def test_edges_and_rates(self, spark):
        from datalake_brief_spark.mlops import calibration_bins

        rows = [(0.05, False), (0.05, True), (0.95, True), (1.0, True)]
        df = spark.createDataFrame(rows, "score double, label boolean")
        got = {r.bin: r for r in calibration_bins(df, "score", "label").collect()}
        assert got[0].n == 2 and got[0].positive_rate == pytest.approx(0.5)
        # score 1.0 clamps into the last bin with 0.95
        assert got[9].n == 2 and got[9].positive_rate == 1.0


# ---------------------------------------------------------------------------
# Property-based invariants (hypothesis) for the round-7 operators: the
# algebraic facts example tests can't sweep. Spark round-trips dominate the
# cost, so examples are few but each checks a law, not a value.
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_EXAMPLES = 6

# integer lattice: distinct scores stay distinct under any reasonable
# monotone float transform (subnormal-scale gaps collapse under exp/affine
# rounding and would falsify the rank-invariance law spuriously)
_vals = st.lists(
    st.integers(min_value=-100, max_value=100).map(float),
    min_size=2,
    max_size=14,
)
_states = st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=12)


class TestIslandsProperties:
    @settings(max_examples=_EXAMPLES, deadline=None)
    @given(states=_states)
    def test_islands_partition_the_sequence(self, spark, states):
        """Island sizes sum to the row count, and consecutive islands of
        one key never share a state (else they'd be one island)."""
        from datalake_brief_spark.operators.windows import islands

        rows = [(1, s, _ts(1, i), i) for i, s in enumerate(states)]
        df = spark.createDataFrame(rows, "k int, s string, ts timestamp, eid int")
        out = sorted(
            islands(df, "k", "s", "ts", "eid").collect(),
            key=lambda r: r.island_start,
        )
        assert sum(r.n_events for r in out) == len(states)
        for a, b in zip(out, out[1:]):
            assert a.s != b.s
            assert a.island_end < b.island_start

    @settings(max_examples=_EXAMPLES, deadline=None)
    @given(states=_states)
    def test_running_distinct_is_monotone_and_bounded(self, spark, states):
        from datalake_brief_spark.operators.windows import running_distinct

        rows = [(1, s, _ts(1, i), i) for i, s in enumerate(states)]
        df = spark.createDataFrame(rows, "k int, v string, ts timestamp, eid int")
        got = [
            r.n_distinct_so_far
            for r in running_distinct(df, "k", "v", "ts", "eid")
            .orderBy("eid")
            .collect()
        ]
        assert got[0] == 1
        assert all(b - a in (0, 1) for a, b in zip(got, got[1:]))
        assert got[-1] == len(set(states))


class TestAucProperties:
    @settings(max_examples=_EXAMPLES, deadline=None)
    @given(vals=_vals)
    def test_auc_invariant_under_monotone_transform(self, spark, vals):
        """AUC is a rank statistic: any strictly increasing transform of
        the scores leaves it unchanged, and 1-score flips it to 1-AUC."""
        from datalake_brief_spark.mlops import auc_score

        rows = [(float(v), i % 2 == 0) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "score double, label boolean")
        base = auc_score(df, "score", "label").collect()[0].auc
        if base is None:
            return
        mono = df.select(
            (F.exp(F.col("score") / 50.0)).alias("score"), "label"
        )
        assert auc_score(mono, "score", "label").collect()[0].auc == pytest.approx(
            base, abs=1e-6
        )
        flip = df.select((-F.col("score")).alias("score"), "label")
        assert auc_score(flip, "score", "label").collect()[0].auc == pytest.approx(
            1 - base, abs=1e-6
        )


class TestInterpolationProperties:
    @settings(max_examples=_EXAMPLES, deadline=None)
    @given(
        lo=st.floats(min_value=-50, max_value=50, allow_nan=False, width=16),
        hi=st.floats(min_value=-50, max_value=50, allow_nan=False, width=16),
        gap=st.integers(min_value=1, max_value=6),
    )
    def test_interpolation_bounded_by_endpoints(self, spark, lo, hi, gap):
        from datalake_brief_spark.operators.timeseries import interpolate_linear

        vals = [float(lo)] + [None] * gap + [float(hi)]
        rows = [(1, _ts(1, i), v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k int, bucket timestamp, v double")
        got = [
            r.value_interp
            for r in interpolate_linear(df, ["k"], "bucket", "v")
            .orderBy("bucket")
            .collect()
        ]
        m, M = min(lo, hi), max(lo, hi)
        assert all(m - 1e-4 <= g <= M + 1e-4 for g in got)
        # and monotone between the endpoints
        sign = 1 if hi >= lo else -1
        assert all(sign * (b - a) >= -1e-4 for a, b in zip(got, got[1:]))


class TestSegmentDedupProperties:
    @settings(max_examples=_EXAMPLES, deadline=None)
    @given(
        words=st.lists(
            st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=16
        )
    )
    def test_self_dedup_keeps_everything_once(self, spark, words):
        """A single doc retains all its segments EXCEPT intra-doc repeats;
        kept count equals distinct segment count."""
        from datalake_brief_spark.operators.text import segment_dedup

        text = " ".join(words)
        df = spark.createDataFrame([(1, text)], "doc_id int, text string")
        r = segment_dedup(df, segment_words=3).collect()[0]
        segs = [" ".join(words[i : i + 3]) for i in range(0, len(words), 3)]
        assert r.n_segments == len(segs)
        assert r.n_kept == len(dict.fromkeys(segs))


class TestEditDistancePairs:
    def test_blocking_and_verify(self, spark):
        from datalake_brief_spark.operators.dedup import edit_distance_pairs

        rows = [(1, "red bolt"), (2, "rod bolt"), (3, "red bolz"),
                (4, "completely different words"), (5, "red bolt")]
        df = spark.createDataFrame(rows, "id int, nm string")
        got = {(r.id_a, r.id_b): r.dist for r in
               edit_distance_pairs(df, "id", "nm", max_dist=2).collect()}
        assert got[(1, 2)] == 1       # red -> rod, shares 'bolt'
        assert got[(1, 5)] == 0       # exact dup
        assert got[(2, 5)] == 1
        assert got[(1, 3)] == 1       # bolt -> bolz, shares 'red'
        # (2,3) "rod bolt"/"red bolz" is within distance 2 but shares NO
        # token — the stated blocking contract excludes it
        assert (2, 3) not in got
        assert (1, 4) not in got       # no shared token: not a candidate

    def test_matches_bruteforce_regardless_of_hash_order(self, spark):
        """ADVICE r8 (low): pair identity must not depend on xxhash64
        alone. The candidate filter now admits equal-hash pairs and
        canonicalizes on the text at the join-back; this brute-force
        sweep covers pairs whose hash order disagrees with text order
        in both directions, so any ordering mistake in the rewrite
        drops pairs here."""
        from datalake_brief_spark.operators.dedup import edit_distance_pairs

        def lev(a, b):
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                                   prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        rows = [(i, f"tok{i % 7} base word{i % 5}") for i in range(30)]
        expect = set()
        for i, ta in rows:
            for j, tb in rows:
                if i >= j:
                    continue
                if not (set(ta.split()) & set(tb.split())):
                    continue
                if lev(ta, tb) <= 2:
                    expect.add((i, j))
        df = spark.createDataFrame(rows, "id int, nm string")
        got = {(r.id_a, r.id_b) for r in
               edit_distance_pairs(df, "id", "nm", max_dist=2).collect()}
        assert got == expect

    def test_max_df_drops_hot_tokens(self, spark):
        from datalake_brief_spark.operators.dedup import edit_distance_pairs

        # 'the' appears everywhere; with max_df=2 it can't generate
        # candidates, so the only pair comes from the rare shared token.
        rows = [(i, f"the item{i}") for i in range(6)] + [(10, "the itemX"), (11, "thx itemX")]
        df = spark.createDataFrame(rows, "id int, nm string")
        got = {(r.id_a, r.id_b) for r in
               edit_distance_pairs(df, "id", "nm", max_dist=2, max_df=2).collect()}
        assert got == {(10, 11)}


class TestNullSafeJoinSemantics:
    def test_null_group_survives(self, spark):
        df = spark.createDataFrame([(1, None), (2, "x"), (3, None)], "id int, k string")
        dim = df.groupBy(F.col("k").alias("k2")).count()
        strict = df.join(dim, df["k"] == dim["k2"]).count()
        safe = df.join(dim, df["k"].eqNullSafe(dim["k2"])).count()
        assert strict == 1 and safe == 3


class TestCoreNumbers:
    def test_clique_cycle_path(self, spark):
        from datalake_brief_spark.operators.graph import core_numbers

        edges = [(a, b) for a in range(5) for b in range(5) if a < b]      # K5
        edges += [(i, i + 1) for i in range(5, 12)] + [(12, 5)]            # cycle
        edges += [(i, i + 1) for i in range(13, 24)]                       # path
        df = spark.createDataFrame(edges, "src int, dst int")
        got = {r.id: r.core for r in core_numbers(df, rounds=15).collect()}
        assert all(got[i] == 4 for i in range(5))
        assert all(got[i] == 2 for i in range(5, 13))
        assert all(got[i] == 1 for i in range(13, 25))

    def test_star_hub_pulled_down_to_one(self, spark):
        from datalake_brief_spark.operators.graph import core_numbers

        # hub degree 6 but every neighbor is a leaf: coreness 1 everywhere —
        # the case where the degree INITIALIZATION is maximally wrong and
        # only the h-index descent fixes it.
        df = spark.createDataFrame([(0, i) for i in range(1, 7)], "src int, dst int")
        got = {r.id: r.core for r in core_numbers(df, rounds=5).collect()}
        assert set(got.values()) == {1}
