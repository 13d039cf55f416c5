"""Property-based tests (hypothesis): operator semantics pinned against
small executable models, over generated inputs rather than fixtures.

Spark-side evaluation is ~0.3 s per example, so example counts are kept
small — the point is shrinking counterexamples for semantic edges (empty
strings, all-null rows, single-token docs), not fuzzing volume.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datalake_brief_spark.functions import MINHASH_PRIME, tokens, word_shingles
from datalake_brief_spark.operators.nulls import drop_nulls
from datalake_brief_spark.operators.windows import sessionize

_EXAMPLES = 8  # per-example Spark round-trips are the cost driver

_words = st.text(alphabet="abcdef", min_size=1, max_size=4)
_docs = st.lists(_words, min_size=0, max_size=12).map(" ".join)


class TestShingleProperties:
    @settings(max_examples=_EXAMPLES, deadline=None)
    @given(doc=_docs, k=st.integers(min_value=1, max_value=4))
    def test_shingle_count_formula(self, spark, doc, k):
        """|shingles| == max(n_tokens - k + 1, 1) — including the short-doc
        edge where the whole doc becomes one shingle."""
        df = spark.createDataFrame([(doc,)], "text string")
        row = df.select(
            F.size(tokens("text")).alias("n"),
            F.size(word_shingles(tokens("text"), k)).alias("s"),
        ).first()
        assert row.s == max(row.n - k + 1, 1)

    @settings(max_examples=_EXAMPLES, deadline=None)
    @given(doc=_docs, k=st.integers(min_value=1, max_value=4))
    def test_shingle_values_match_python_model(self, spark, doc, k):
        """The zip_with n-gram chain must emit exactly the model's
        shingles, in position order — guards the chain + short-doc
        fallback against off-by-one regressions (it feeds every
        Jaccard/MinHash/containment path)."""
        df = spark.createDataFrame([(doc,)], "text string")
        got = df.select(word_shingles(tokens("text"), k).alias("s")).first().s
        toks = doc.split() if doc.split() else [""]
        want = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        if not want:
            want = [" ".join(toks)]
        assert got == want

    @settings(max_examples=_EXAMPLES, deadline=None)
    @given(doc=_docs)
    def test_minhash_signature_range_and_self_identity(self, spark, doc):
        """Signature values live in the prime field; identical docs get
        identical signatures (the property LSH banding relies on)."""
        from datalake_brief_spark.functions import minhash_values

        df = spark.createDataFrame([(1, doc), (2, doc)], "id long, text string")
        rows = df.select(
            "id",
            minhash_values(
                F.array_distinct(word_shingles(tokens("text"), 2)), 8, seed=7
            ).alias("sig"),
        ).collect()
        sigs = {r.id: list(r.sig) for r in rows}
        assert sigs[1] == sigs[2]
        assert all(0 <= v < MINHASH_PRIME for v in sigs[1])


class TestNullDropProperties:
    @settings(max_examples=_EXAMPLES, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.one_of(st.none(), st.integers(0, 9)),
                st.one_of(st.none(), st.integers(0, 9)),
                st.one_of(st.none(), st.text(alphabet="xy", max_size=2)),
            ),
            min_size=0,
            max_size=8,
        ),
        thresh=st.integers(min_value=0, max_value=4),
    )
    def test_thresh_matches_model(self, spark, rows, thresh):
        """na.drop(thresh=k) keeps exactly the rows with >= k non-nulls
        (reference's thresh=2 edge, pyspark-2.ipynb:216, generalized)."""
        df = spark.createDataFrame(rows, "a int, b int, c string")
        got = sorted(map(tuple, drop_nulls(df, thresh=thresh).collect()), key=repr)
        want = sorted(
            (r for r in rows if sum(v is not None for v in r) >= thresh), key=repr
        )
        assert got == want

    @settings(max_examples=_EXAMPLES, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.one_of(st.none(), st.integers(0, 9)),
                st.one_of(st.none(), st.integers(0, 9)),
            ),
            min_size=0,
            max_size=8,
        )
    )
    def test_how_any_vs_all_bracket_every_row(self, spark, rows):
        """drop(how='all') ⊇ drop(how='any'): 'all' keeps every row 'any'
        keeps, plus rows with partial nulls."""
        df = spark.createDataFrame(rows, "a int, b int")
        kept_any = {tuple(r) for r in drop_nulls(df, how="any").collect()}
        kept_all = {tuple(r) for r in drop_nulls(df, how="all").collect()}
        assert kept_any <= kept_all
        assert kept_all == {r for r in map(tuple, rows) if any(v is not None for v in r)}


class TestSessionizeProperties:
    @settings(max_examples=_EXAMPLES, deadline=None)
    @given(
        gaps=st.lists(st.integers(min_value=1, max_value=2000), min_size=1, max_size=10),
        threshold=st.integers(min_value=1, max_value=1500),
    )
    def test_session_count_equals_big_gap_count_plus_one(self, spark, gaps, threshold):
        """For one user, #sessions == #(inter-event gaps > threshold) + 1."""
        ts, cur = [], 0
        for g in gaps:
            cur += g
            ts.append(cur)
        rows = [(1, float(t)) for t in ts]
        df = spark.createDataFrame(rows, "user_id long, sec double").withColumn(
            "ts", F.timestamp_seconds(F.col("sec"))
        )
        out = sessionize(df, "user_id", "ts", gap_seconds=threshold)
        n_sessions = out.agg(F.max("session_id")).first()[0]
        expected = 1 + sum(1 for g in gaps[1:] if g > threshold)
        assert n_sessions == expected


class TestPackChunksProperties:
    @settings(max_examples=_EXAMPLES, deadline=None)
    @given(
        sizes=st.lists(st.integers(min_value=1, max_value=100), min_size=1, max_size=20),
        budget=st.integers(min_value=50, max_value=200),
    )
    def test_budget_respected_and_all_chunks_assigned(self, spark, sizes, budget):
        """Every multi-chunk pack totals <= budget; every chunk is assigned
        exactly once; oversized single chunks isolate into their own pack."""
        from datalake_brief_spark.operators.text import pack_chunks

        rows = [(i, 0, f"c{i}", s) for i, s in enumerate(sizes)]
        chunks = spark.createDataFrame(
            rows, "doc_id long, chunk_idx long, chunk_text string, n_chunk_tokens long"
        )
        out = pack_chunks(chunks, budget=budget, n_shards=4).collect()
        assert len(out) == len(sizes)
        by_pack: dict[int, list[int]] = {}
        for r in out:
            by_pack.setdefault(r.pack_id, []).append(r.n_chunk_tokens)
        for members in by_pack.values():
            if len(members) > 1:
                assert sum(members) <= budget


class TestTxlogMutationProperties:
    """DELETE/UPDATE three-valued-logic semantics pinned against a Python
    model over generated nullable columns — the shape of the round-3 advice
    bug (NOT(NULL)=NULL silently deleting NULL-predicate rows) can't
    reappear anywhere in the generated space."""

    @settings(max_examples=6, deadline=None)
    @given(
        vals=st.lists(
            st.one_of(st.none(), st.integers(-5, 5)), min_size=1, max_size=10
        ),
        t=st.integers(min_value=-5, max_value=5),
    )
    def test_delete_where_matches_three_valued_model(
        self, spark, tmp_path_factory, vals, t
    ):
        import uuid

        from datalake_brief_spark.sources import txlog

        path = str(tmp_path_factory.mktemp("txprop") / uuid.uuid4().hex)
        rows = [(i, v) for i, v in enumerate(vals)]
        txlog.append(spark.createDataFrame(rows, "id long, v long"), path)
        txlog.delete_where(spark, path, f"v > {t}")
        got = {r.id for r in txlog.read(spark, path).collect()}
        want = {i for i, v in rows if not (v is not None and v > t)}
        assert got == want, (vals, t)

    @settings(max_examples=6, deadline=None)
    @given(
        vals=st.lists(
            st.one_of(st.none(), st.integers(-5, 5)), min_size=1, max_size=10
        ),
        t=st.integers(min_value=-5, max_value=5),
    )
    def test_update_where_matches_three_valued_model(
        self, spark, tmp_path_factory, vals, t
    ):
        import uuid

        from datalake_brief_spark.sources import txlog

        path = str(tmp_path_factory.mktemp("txprop") / uuid.uuid4().hex)
        rows = [(i, v) for i, v in enumerate(vals)]
        txlog.append(spark.createDataFrame(rows, "id long, v long"), path)
        txlog.update_where(spark, path, f"v > {t}", {"v": "v + 100"})
        got = {r.id: r.v for r in txlog.read(spark, path).collect()}
        want = {
            i: (v + 100 if (v is not None and v > t) else v) for i, v in rows
        }
        assert got == want, (vals, t)


class TestBudgetSampleProperties:
    @settings(max_examples=_EXAMPLES, deadline=None)
    @given(
        sizes=st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=12),
        budget=st.integers(min_value=1, max_value=120),
    )
    def test_matches_python_model_exactly(self, spark, sizes, budget):
        """budget_sample == the model: sort docs by the Knuth hash (id
        tie-break), take while the running token total stays <= budget."""
        from datalake_brief_spark.operators.text import budget_sample

        rows = [("s", i, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
        df = spark.createDataFrame(rows, ["source", "doc_id", "text"])
        got = {r.doc_id for r in budget_sample(df, budget=budget).collect()}

        order = sorted(range(len(sizes)), key=lambda i: ((i * 2654435761) % (1 << 32), i))
        want, cum = set(), 0
        for i in order:
            cum += sizes[i]
            if cum > budget:
                break
            want.add(i)
        assert got == want


class TestGopherRuleProperties:
    @settings(max_examples=_EXAMPLES, deadline=None)
    @given(
        doc=st.lists(
            st.text(alphabet="ab12", min_size=1, max_size=4),  # digits too:
            min_size=1,                                        # alpha ratio
            max_size=12,                                       # must vary
        ).map(" ".join)
    )
    def test_signals_match_python_model(self, spark, doc):
        """Word count, mean word length, and alpha fraction equal the
        whitespace-token model on arbitrary generated docs."""
        from datalake_brief_spark.operators.text import gopher_rules

        df = spark.createDataFrame([(1, doc)], ["doc_id", "text"])
        row = gopher_rules(df).first()
        toks = " ".join(doc.lower().split()).split(" ")
        assert row.n_words == len(toks)
        assert row.mean_word_len == round(sum(map(len, toks)) / len(toks), 6)
        alpha = sum(1 for t in toks if any(c.isalpha() for c in t))
        assert row.alpha_word_ratio == round(alpha / len(toks), 6)


class TestProfilingOps:
    """Pinned semantics for the one-pass profiling operators (the registry
    oracles re-check them against DuckDB on TESTDATA)."""

    def test_histogram_buckets_underflow_overflow_nulls(self, spark):
        from datalake_brief_spark.operators.relational import histogram

        df = spark.createDataFrame(
            [(-1.0,), (0.0,), (4.9,), (5.0,), (9.9,), (10.0,), (25.0,), (None,)],
            "v double",
        )
        got = {r.bucket: r.n for r in histogram(df, "v", 2, 0.0, 10.0).collect()}
        # width 5: bucket 0 = underflow, 1 = [0,5), 2 = [5,10), 3 = overflow;
        # NULL excluded entirely
        assert got == {0: 1, 1: 2, 2: 2, 3: 2}

    def test_correlations_known_values(self, spark):
        from datalake_brief_spark.operators.relational import correlations

        df = spark.createDataFrame(
            [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.0, -4.0)],
            "a double, b double, c double",
        )
        got = {(r.col_a, r.col_b): r.corr for r in correlations(df, ["a", "b", "c"]).collect()}
        assert got == {("a", "b"): 1.0, ("a", "c"): -1.0, ("b", "c"): -1.0}
        # upper triangle only: 3 columns -> exactly C(3,2) rows
        assert len(got) == 3

    def test_dq_report_null_passes_check_semantics(self, spark):
        from datalake_brief_spark.operators.relational import dq_report

        df = spark.createDataFrame([(1.0,), (-2.0,), (None,)], "v double")
        got = {r.rule: (r.n_violations, r.violation_rate) for r in dq_report(
            df, {"pos": "v > 0", "present": "v IS NOT NULL"}
        ).collect()}
        # NULL predicate is not a violation (SQL CHECK); the explicit
        # presence rule counts it
        assert got["pos"] == (1, 0.333333)
        assert got["present"] == (1, 0.333333)


class TestRepeatedSpanProperties:
    @staticmethod
    def _model(docs: list[tuple[int, str]], k: int, min_docs: int):
        """Pure-Python reference: duplicated k-grams (>= min_docs distinct
        docs) -> per-doc hit positions -> merge islands with gap <= k."""
        gram_docs: dict[str, set[int]] = {}
        for did, text in docs:
            toks = text.split()
            for i in range(len(toks) - k + 1):
                gram_docs.setdefault(" ".join(toks[i : i + k]), set()).add(did)
        spans = set()
        for did, text in docs:
            toks = text.split()
            hits = [
                i
                for i in range(len(toks) - k + 1)
                if len(gram_docs[" ".join(toks[i : i + k])]) >= min_docs
            ]
            start = prev = None
            for p in hits:
                if start is None:
                    start = prev = p
                elif p > prev + k:
                    spans.add((did, start, prev + k - 1))
                    start = prev = p
                else:
                    prev = p
            if start is not None:
                spans.add((did, start, prev + k - 1))
        return spans

    @settings(max_examples=_EXAMPLES, deadline=None)
    @given(
        data=st.lists(
            st.lists(
                st.sampled_from(["a", "b", "c"]), min_size=1, max_size=14
            ).map(" ".join),
            min_size=2,
            max_size=6,
        ),
        k=st.integers(min_value=2, max_value=4),
    )
    def test_spans_match_python_model(self, spark, data, k):
        from datalake_brief_spark.operators.dedup import repeated_spans

        docs = list(enumerate(data))
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            (r.doc_id, r.span_start, r.span_end)
            for r in repeated_spans(df, k=k).collect()
        }
        assert got == self._model(docs, k, 2)

    def test_histogram_fp_width_boundary_clamps_to_last_bucket(self, spark):
        from datalake_brief_spark.operators.relational import histogram

        # width 1/3 rounds DOWN in fp, so 0.9999999999999999 (< hi) would
        # compute floor(v/width)+1 == 4 without the clamp — it must land in
        # the LAST in-range bucket, not overflow
        df = spark.createDataFrame([(0.9999999999999999,), (1.0,)], "v double")
        got = {r.bucket: r.n for r in histogram(df, "v", 3, 0.0, 1.0).collect()}
        assert got == {3: 1, 4: 1}

    def test_correlations_weird_names_and_single_column(self, spark):
        import pytest as _pytest

        from datalake_brief_spark.operators.relational import correlations

        # '__'-bearing names must not collide in internal aliases
        df = spark.createDataFrame(
            [(1.0, 2.0, 3.0, 4.0)], ["a__b", "c", "a", "b__c"]
        )
        got = {(r.col_a, r.col_b) for r in correlations(df, ["a__b", "c", "a", "b__c"]).collect()}
        assert len(got) == 6
        with _pytest.raises(ValueError):
            correlations(df, ["a"])

    def test_dq_report_rule_names_with_dots(self, spark):
        from datalake_brief_spark.operators.relational import dq_report

        df = spark.createDataFrame([(1.0,), (-1.0,)], "v double")
        got = {r.rule: r.n_violations for r in dq_report(
            df, {"price.positive": "v > 0", "`weird`": "v < 100"}
        ).collect()}
        assert got == {"price.positive": 1, "`weird`": 0}


class TestTrailingFeatures:
    def test_ewma_enforces_shard_memory_contract(self, spark):
        """VERDICT r8 ask #7: the per-shard pandas materialization bound
        is ENFORCED in-task, not trusted — a shard over max_shard_rows
        fails fast with the sizing instruction (instead of an
        unattributable executor OOM), and the same data passes once
        n_shards spreads it back under the bound."""
        from datalake_brief_spark.operators.timeseries import ewma

        df = spark.createDataFrame(
            [(i % 50, i, float(i)) for i in range(1000)], "k int, o int, v double"
        )
        with pytest.raises(Exception, match="max_shard_rows"):
            ewma(
                df, ["k"], ["o"], "v", alpha=0.3, n_shards=1, max_shard_rows=100
            ).collect()
        # 50 keys × 20 rows over 64 shards: even a 10-key collision pile
        # stays under 500 — the resize is what fixes the bound violation
        assert (
            ewma(
                df, ["k"], ["o"], "v", alpha=0.3, n_shards=64, max_shard_rows=500
            ).count()
            == 1000
        )

    def test_ewma_matches_driver_side_model_exactly(self, spark):
        """The distributed EWMA (Arrow applyInPandas per shard) must equal
        the DEFINITIONAL recurrence y₀=x₀; yₜ=α·xₜ+(1−α)·yₜ₋₁ computed
        driver-side — identical IEEE operation sequence, so equality is
        EXACT, not approximate. (Deliberately NOT pandas ``.ewm()``, whose
        adjust=False kernel divides by the accumulated float weight and
        drifts a ulp; cross-engine hash-matching — the events_ewma oracle
        replays the same fold in DuckDB — needs the definitional form.)
        pandas ewm must still agree within float noise, guarding against
        a semantic (not ulp-level) divergence."""
        from datalake_brief_spark.catalog import load_table
        from datalake_brief_spark.operators.timeseries import ewma
        from tests.conftest import SF_SMOKE

        ev = load_table(spark, SF_SMOKE, "events").filter(
            "event_type = 'click'"
        ).select("event_id", "user_id", "ts", "value")
        got = {
            r.event_id: r.ewma
            for r in ewma(ev, ["user_id"], ["ts", "event_id"], "value", alpha=0.3)
            .select("event_id", "ewma")
            .collect()
        }
        pdf = ev.toPandas()
        a, b = 0.3, 1.0 - 0.3
        expected, pandas_ref = {}, {}
        for _, g in pdf.groupby("user_id"):
            g = g.sort_values(["ts", "event_id"])
            y = None
            for eid, x in zip(g["event_id"], g["value"]):
                x = float(x)
                y = x if y is None else a * x + b * y
                expected[eid] = y
            e = g["value"].ewm(alpha=0.3, adjust=False).mean()
            pandas_ref.update(dict(zip(g["event_id"], e)))
        assert got == expected
        for eid, v in got.items():
            assert abs(v - pandas_ref[eid]) <= 1e-9 * max(1.0, abs(v))

    def test_rolling_stats_window_edges(self, spark):
        """First rows of each key aggregate over fewer than N rows (the
        frame truncates at the partition start) — pinned against a tiny
        hand-computed series."""
        from datalake_brief_spark.operators.timeseries import rolling_stats

        df = spark.createDataFrame(
            [("u", 1, 10.0), ("u", 2, 20.0), ("u", 3, 30.0), ("v", 1, 5.0)],
            "k string, i long, x double",
        )
        got = {
            (r.k, r.i): (r.avg_x, r.max_x)
            for r in rolling_stats(
                df, ["k"], ["i"], "x", n_preceding=1,
                aggs={"avg_x": "avg", "max_x": "max"},
            ).collect()
        }
        assert got == {
            ("u", 1): (10.0, 10.0),
            ("u", 2): (15.0, 20.0),
            ("u", 3): (25.0, 30.0),
            ("v", 1): (5.0, 5.0),
        }

    def test_trailing_range_count_includes_timestamp_peers(self, spark):
        """RANGE frames include all peer rows at the current timestamp —
        ties must count each other regardless of row order."""
        from datalake_brief_spark.operators.timeseries import trailing_range_count

        df = spark.createDataFrame(
            [
                ("u", 1, "2024-01-01 10:00:00"),
                ("u", 2, "2024-01-01 10:00:00"),  # same second as event 1
                ("u", 3, "2024-01-01 10:30:00"),
                ("u", 4, "2024-01-01 12:00:00"),  # outside 1h of all above
            ],
            "k string, i long, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        got = {
            r.i: r.n_trailing
            for r in trailing_range_count(df, ["k"], "ts", 3600).collect()
        }
        assert got == {1: 2, 2: 2, 3: 3, 4: 1}


class TestOperationalProfiling:
    def test_fk_integrity_counts_orphans_and_nulls(self, spark):
        """NULL FKs are legal (counted separately, never orphans); an
        orphan is a non-null FK with no parent; unreferenced parents
        lower coverage."""
        from datalake_brief_spark.operators.relational import fk_integrity

        child = spark.createDataFrame(
            [(1, 10), (2, 10), (3, 20), (4, 99), (5, None)], "id long, fk long"
        )
        parent = spark.createDataFrame([(10,), (20,), (30,)], "pk long")
        r = fk_integrity(child, parent, "fk", "pk", "c->p").collect()[0]
        assert (r.n_child, r.n_null_fk, r.n_orphans) == (5, 1, 1)
        assert r.orphan_rate == 0.2
        assert (r.n_parent, r.n_referenced) == (3, 2)
        assert r.parent_coverage == round(2 / 3, 6)

    def test_fk_integrity_null_parent_key_is_not_a_parent(self, spark):
        """count(DISTINCT pk) excludes NULL: a nullable parent key must
        not inflate n_parent or deflate parent_coverage."""
        from datalake_brief_spark.operators.relational import fk_integrity

        child = spark.createDataFrame([(1, 10), (2, 20)], "id long, fk long")
        parent = spark.createDataFrame(
            [(10,), (20,), (None,)], "pk long"
        )
        r = fk_integrity(child, parent, "fk", "pk", "c->p").collect()[0]
        assert (r.n_parent, r.n_referenced) == (2, 2)
        assert r.parent_coverage == 1.0
        assert r.n_orphans == 0

    def test_join_key_skew_flags_heavy_key(self, spark):
        from datalake_brief_spark.operators.relational import join_key_skew

        rows = [("hot",)] * 8 + [("a",), ("b",), ("c",), ("d",)]
        df = spark.createDataFrame(rows, "k string")
        got = join_key_skew(df, "k", top_k=2).collect()
        assert got[0].key == "hot" and got[0].n_rows == 8
        # 12 rows over 5 keys -> mean 2.4; hot = 8/2.4
        assert got[0].skew_factor == round(8 / 2.4, 6)
        assert got[1].n_rows == 1 and got[1].key == "a"  # tiebreak by key

    def test_distribution_drift_psi_semantics(self, spark):
        """PSI ≈ 0 for an identical distribution; large for a planted
        shift; epsilon smoothing keeps empty buckets finite."""
        from datalake_brief_spark.operators.relational import distribution_drift

        ref = spark.createDataFrame([(float(i % 100),) for i in range(1000)], "x double")
        same = {r.column: r.psi for r in distribution_drift(ref, ref, ["x"]).collect()}
        assert abs(same["x"]) < 1e-9
        # shift the whole mass into the top reference bucket
        shifted = spark.createDataFrame([(99.0,) for _ in range(1000)], "x double")
        drift = {r.column: r.psi for r in distribution_drift(ref, shifted, ["x"]).collect()}
        import math
        assert drift["x"] > 1.0 and math.isfinite(drift["x"])

    def test_distribution_drift_constant_reference_column(self, spark):
        """mx == mn (constant reference column) maps everything to bucket
        0 instead of dividing by zero into NaN PSI: identical constant
        current -> PSI 0; moved constant still lands in bucket 0 under
        the reference's degenerate binning -> PSI 0 (documented rule),
        and the value is finite either way."""
        import math
        from datalake_brief_spark.operators.relational import distribution_drift

        ref = spark.createDataFrame([(5.0,)] * 100, "x double")
        cur_same = spark.createDataFrame([(5.0,)] * 50, "x double")
        cur_moved = spark.createDataFrame([(9.0,)] * 50, "x double")
        same = distribution_drift(ref, cur_same, ["x"]).collect()[0]
        moved = distribution_drift(ref, cur_moved, ["x"]).collect()[0]
        assert math.isfinite(same.psi) and abs(same.psi) < 1e-9
        assert math.isfinite(moved.psi) and abs(moved.psi) < 1e-9
        assert (same.n_ref, same.n_cur) == (100, 50)

    def test_distribution_drift_null_values_land_in_bucket_zero(self, spark):
        """NULLs bucket to 0 on BOTH sides (greatest(NULL,0)=0 — the
        Spark/DuckDB-shared convention): identical half-null
        distributions must read PSI 0, not a null-bucket blowup; an
        all-null reference must stay finite."""
        import math
        from datalake_brief_spark.operators.relational import distribution_drift

        rows = [(float(i % 10),) for i in range(100)] + [(None,)] * 100
        ref = spark.createDataFrame(rows, "x double")
        cur = spark.createDataFrame(rows, "x double")
        r = distribution_drift(ref, cur, ["x"]).collect()[0]
        assert math.isfinite(r.psi) and abs(r.psi) < 1e-9
        assert (r.n_ref, r.n_cur) == (200, 200)
        allnull = spark.createDataFrame([(None,)] * 20, "x double")
        r2 = distribution_drift(allnull, cur, ["x"]).collect()[0]
        assert math.isfinite(r2.psi)


class TestMediaCodecProperties:
    """Hypothesis round-trips for the pure-numpy codecs: any image shape
    (incl. widths whose scanlines need padding) and any PCM layout must
    survive encode → decode bit-exactly — these are parsers, and parsers
    earn property tests."""

    @given(
        st.integers(min_value=1, max_value=7),
        st.integers(min_value=1, max_value=7),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=25, deadline=None)
    def test_bmp_roundtrip_any_shape(self, h, w, seed):
        import numpy as np

        from datalake_brief_spark.operators import multimodal

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (multimodal.decode_bmp(multimodal.encode_bmp(img)) == img).all()

    @given(
        st.integers(min_value=1, max_value=6),
        st.integers(min_value=1, max_value=6),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=25, deadline=None)
    def test_ppm_roundtrip_any_shape(self, h, w, seed):
        import numpy as np

        from datalake_brief_spark.operators import multimodal

        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (multimodal.decode_ppm(multimodal.encode_ppm(img)) == img).all()

    @given(
        st.integers(min_value=1, max_value=50),
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=25, deadline=None)
    def test_wav_roundtrip_any_layout(self, n, ch, seed):
        import numpy as np

        from datalake_brief_spark.operators import multimodal

        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
        out, rate = multimodal.decode_wav(multimodal.encode_wav(s, 22050))
        assert rate == 22050 and (out == s).all()


class TestEmptyInputRobustness:
    """Every operator must degrade to an empty (or well-defined) result on
    an empty input, never crash — at 100 TB an empty partition, an
    all-filtered day, or a cold-start table is routine, not exceptional."""

    def test_text_and_dedup_ops_on_empty_corpus(self, spark):
        from datalake_brief_spark.operators import dedup, text

        empty = spark.createDataFrame([], "doc_id long, text string")
        assert text.with_quality(empty).count() == 0
        assert text.gopher_rules(empty).count() == 0
        assert text.c4_rules(empty).count() == 0
        assert text.seeded_shuffle(empty, seed=1).count() == 0
        assert text.shard_assignment(empty, n_shards=4).count() == 0
        assert dedup.exact_dedup(empty).count() == 0
        assert dedup.ngram_jaccard_pairs(empty, threshold=0.8).count() == 0
        assert dedup.simhash_pairs(empty).count() == 0
        assert dedup.repeated_spans(empty).count() == 0

    def test_relational_and_timeseries_ops_on_empty(self, spark):
        from pyspark.sql import functions as F

        from datalake_brief_spark.operators.relational import (
            distribution_drift,
            fk_integrity,
            heavy_hitters,
        )
        from datalake_brief_spark.operators.timeseries import ewma

        empty = spark.createDataFrame([], "k long, v double")
        some = spark.createDataFrame([(1, 2.0)], "k long, v double")
        # empty child: zero counts, not a crash
        r = fk_integrity(empty, some, "k", "k", "e->s").collect()[0]
        assert (r.n_child, r.n_orphans) == (0, 0)
        # empty current snapshot: finite PSI (every ref bucket vs eps)
        import math
        d = distribution_drift(some, empty, ["v"]).collect()[0]
        assert math.isfinite(d.psi) and d.n_cur == 0
        # empty REFERENCE: no baseline -> the column is omitted (the SQL
        # oracles' inner edges-join contract), never a NaN row
        assert distribution_drift(empty, some, ["v"]).count() == 0
        assert heavy_hitters(empty, "v", support=0.5).count() == 0
        assert ewma(empty, ["k"], ["v"], "v", alpha=0.3).count() == 0

    def test_similarity_ops_on_empty_corpus(self, spark):
        from datalake_brief_spark.operators import similarity

        empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
        q = spark.createDataFrame(
            [(1, [1.0, 0.0])], "query_id long, embedding array<float>"
        )
        assert similarity.cosine_topk(empty, q, k=3).count() == 0
        assert similarity.cosine_pairs_exact(empty, threshold=0.5).count() == 0


class TestEwmaNullOracleContract:
    def test_planted_nulls_match_oracle_sql(self, spark):
        """The null contract (emit null, carry state) must hold on BOTH
        engines: run the registry's actual oracle SQL over a planted-null
        events table in DuckDB and compare to the operator."""
        import duckdb
        import pandas as pd

        from datalake_brief_spark.queries import QUERIES

        rows = [
            (1, "2024-01-01 00:00:00", 7, "click", 10.0),
            (2, "2024-01-01 00:01:00", 7, "click", None),
            (3, "2024-01-01 00:02:00", 7, "click", 20.0),
            (4, "2024-01-01 00:03:00", 8, "click", None),
            (5, "2024-01-01 00:04:00", 8, "click", 5.0),
        ]
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        con = duckdb.connect()
        con.register("events", pdf)
        oracle = {r[0]: r[2] for r in con.sql(QUERIES["events_ewma"].oracle).fetchall()}

        from pyspark.sql import functions as F

        from datalake_brief_spark.operators.timeseries import ewma

        sdf = spark.createDataFrame(pdf)
        got = {
            r.event_id: r.ewma
            for r in ewma(sdf, ["user_id"], ["ts", "event_id"], "value", alpha=0.3)
            .select("event_id", F.round("ewma", 6).alias("ewma"))
            .collect()
        }
        import math
        norm = lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else v
        assert {k: norm(v) for k, v in got.items()} == {k: norm(v) for k, v in oracle.items()}
        # the carry contract itself: value after the null continues from 10
        assert got[3] == round(0.3 * 20.0 + 0.7 * 10.0, 6)
        assert norm(got[2]) is None and norm(got[4]) is None and got[5] == 5.0

    def test_null_keys_form_one_group(self, spark):
        """Null keys are one series of their own — neither merged into an
        adjacent key (object-dtype None != None -> False) nor split one
        row per series (float NaN != NaN -> True). Both dtypes must agree."""
        import math

        from datalake_brief_spark.operators.timeseries import ewma

        # string (object-dtype) null keys
        s = spark.createDataFrame(
            [(1, "a", 10.0), (2, None, 100.0), (3, None, 200.0), (4, "a", 20.0)],
            "ord long, k string, v double",
        )
        got = {
            r.ord: r.ewma
            for r in ewma(s, ["k"], ["ord"], "v", alpha=0.5).collect()
        }
        # the null group chains 100 -> 150, independent of key "a"
        assert got[2] == 100.0 and got[3] == 0.5 * 200.0 + 0.5 * 100.0
        assert got[1] == 10.0 and got[4] == 0.5 * 20.0 + 0.5 * 10.0
        # float (NaN) null keys: identical grouping
        f = spark.createDataFrame(
            [(1, 1.0, 10.0), (2, None, 100.0), (3, None, 200.0), (4, 1.0, 20.0)],
            "ord long, k double, v double",
        )
        gotf = {
            r.ord: r.ewma
            for r in ewma(f, ["k"], ["ord"], "v", alpha=0.5).collect()
        }
        assert gotf == got


class TestAsofJoinDirections:
    """asof_join (joins.py): the merge_asof surface — backward/forward,
    ties, tolerance — on a hand-built fixture."""

    def _fixture(self, spark):
        import datetime as dt

        t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
        left = spark.createDataFrame(
            [(1, "u", t(10)), (2, "u", t(20)), (3, "v", t(5))],
            "id long, k string, ts timestamp",
        )
        right = spark.createDataFrame(
            [
                ("u", t(8), 100),
                ("u", t(10), 101),  # same-instant: matches both directions
                ("u", t(10), 102),  # equal-ts tie -> greatest tiebreak wins
                ("u", t(25), 103),
                ("v", t(50), 104),
            ],
            "k string, rts timestamp, val int",
        )
        return left, right

    def test_backward_forward_and_ties(self, spark):
        from datalake_brief_spark.operators.joins import asof_join

        left, right = self._fixture(spark)
        back = {
            r.id: r.val
            for r in asof_join(
                left, right, "k", "ts", "rts", ["val"], right_tiebreak="val"
            ).collect()
        }
        # id1@10: right rows at 8,10,10 qualify -> tie at 10 -> 102
        # id2@20: most recent <=20 is 102; id3@5 (v): nothing before -> null
        assert back == {1: 102, 2: 102, 3: None}
        fwd = {
            r.id: r.val
            for r in asof_join(
                left, right, "k", "ts", "rts", ["val"],
                right_tiebreak="val", direction="forward",
            ).collect()
        }
        # id1@10: earliest >=10 is the t=10 pair -> greatest tiebreak 102
        # id2@20 -> 103 at t=25; id3@5 (v) -> 104 at t=50
        assert fwd == {1: 102, 2: 103, 3: 104}

    def test_tolerance_nulls_far_matches(self, spark):
        from datalake_brief_spark.operators.joins import asof_join

        left, right = self._fixture(spark)
        fwd = {
            r.id: r.val
            for r in asof_join(
                left, right, "k", "ts", "rts", ["val"],
                right_tiebreak="val", direction="forward", tolerance=10.0,
            ).collect()
        }
        # id3's nearest forward match (t=50 vs 5) is 45 s out -> nulled;
        # id1 (0 s) and id2 (5 s) stay matched
        assert fwd == {1: 102, 2: 103, 3: None}
        back = {
            r.id: r.val
            for r in asof_join(
                left, right, "k", "ts", "rts", ["val"],
                right_tiebreak="val", tolerance=1.0,
            ).collect()
        }
        # backward with 1 s window: only the same-instant match survives
        assert back == {1: 102, 2: None, 3: None}


class TestMadAndKs:
    """mad_outliers / ks_drift (relational.py): robust monitoring stats."""

    def test_mad_hand_computed_and_breakdown_resistance(self, spark):
        """Hand-computed median/MAD; ONE extreme value flags as the only
        outlier and cannot drag the threshold (the property that breaks
        mean/stddev z-scores)."""
        from datalake_brief_spark.operators.relational import mad_outliers

        vals = [10.0, 12.0, 11.0, 13.0, 12.0, 11.0, 1000.0]
        df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
        r = mad_outliers(df, "v", "g", k=3.0).collect()[0]
        # sorted: 10 11 11 12 12 13 1000 -> med 12; |x-12|: 2 1 1 0 0 1 988 -> mad 1
        assert (r.n, r.med, r.mad) == (7, 12.0, 1.0)
        assert r.n_outliers == 1  # only the 1000; threshold 3*1.4826*1 ≈ 4.45

    def test_ks_endpoints(self, spark):
        """Identical samples -> D=0; disjoint ranges -> D=1; a shifted
        distribution lands strictly between."""
        from datalake_brief_spark.operators.relational import ks_drift

        a = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
        same = {r.column: r.ks for r in ks_drift(a, a, ["x"]).collect()}
        assert same["x"] == 0.0
        lo = spark.createDataFrame([(float(i),) for i in range(50)], "x double")
        hi = spark.createDataFrame([(float(i),) for i in range(200, 250)], "x double")
        # disjoint ranges: out-of-range cur values clamp into the top bin,
        # where ref's own max also lives, so grid-D reads 1 - 1/n_ref
        # (=0.98 here) instead of the exact 1.0 — the documented one-bin
        # under-read, negligible at monitoring thresholds
        disj = {r.column: r.ks for r in ks_drift(lo, hi, ["x"]).collect()}
        assert disj["x"] == 0.98
        shifted = spark.createDataFrame(
            [(float(i) + 25,) for i in range(100)], "x double"
        )
        mid = {r.column: r.ks for r in ks_drift(a, shifted, ["x"]).collect()}
        assert 0.2 < mid["x"] < 0.3  # exact D for a 25/100 shift is 0.25


class TestSnapshotDiff:
    """snapshot_diff (relational.py): the keyed symmetric-diff audit op."""

    def test_null_safe_classification(self, spark):
        """NULL→value and value→NULL are updates; NULL==NULL is unchanged;
        untouched keys never appear; insert/delete classified by side."""
        from datalake_brief_spark.operators.relational import snapshot_diff

        left = spark.createDataFrame(
            [(1, "a"), (2, None), (3, None), (4, "keep"), (5, "gone")],
            "id long, v string",
        )
        right = spark.createDataFrame(
            [(1, None), (2, "b"), (3, None), (4, "keep"), (6, "new")],
            "id long, v string",
        )
        got = {
            r.id: r.change_type
            for r in snapshot_diff(left, right, ["id"]).collect()
        }
        assert got == {
            1: "update",   # value -> NULL
            2: "update",   # NULL -> value
            5: "delete",
            6: "insert",
        }  # 3 (NULL==NULL) and 4 (equal) must not appear

    def test_identical_relations_diff_empty(self, spark):
        from datalake_brief_spark.operators.relational import snapshot_diff
        from datalake_brief_spark.catalog import load_table
        from tests.conftest import SF_SMOKE

        c = load_table(spark, SF_SMOKE, "customer")
        assert snapshot_diff(c, c, ["c_custkey"]).count() == 0

    def test_key_only_diff(self, spark):
        """Every shared column is a key (or compare_cols=[]): updates are
        impossible but insert/delete classification still works — must not
        crash on the empty compare-column set."""
        from datalake_brief_spark.operators.relational import snapshot_diff

        left = spark.createDataFrame([(1,), (2,), (3,)], "id long")
        right = spark.createDataFrame([(2,), (3,), (4,)], "id long")
        got = {r.id: r.change_type for r in snapshot_diff(left, right, ["id"]).collect()}
        assert got == {1: "delete", 4: "insert"}
        # explicit empty compare_cols on wider relations: same contract
        l2 = spark.createDataFrame([(1, "a"), (5, "x")], "id long, v string")
        r2 = spark.createDataFrame([(1, "CHANGED"), (6, "y")], "id long, v string")
        got2 = {
            r.id: r.change_type
            for r in snapshot_diff(l2, r2, ["id"], compare_cols=[]).collect()
        }
        assert got2 == {5: "delete", 6: "insert"}


class TestFunnelRetention:
    """funnel / retention_cohorts (windows.py): ordering + cohort math."""

    def test_funnel_strict_order_semantics(self, spark):
        """A later-step event BEFORE the earlier step's completion must not
        count; the earliest QUALIFYING time (not the global min) gates the
        next step."""
        from datalake_brief_spark.operators.windows import funnel

        rows = [
            # u1 converts fully in order
            (1, "2024-01-01 10:00:00", "view"),
            (1, "2024-01-01 11:00:00", "click"),
            (1, "2024-01-01 12:00:00", "purchase"),
            # u2: click BEFORE view -> click must not count
            (2, "2024-01-01 09:00:00", "click"),
            (2, "2024-01-01 10:00:00", "view"),
            (2, "2024-01-01 10:30:00", "purchase"),  # no qualifying click -> no purchase
            # u3: purchase between view and click -> purchase must not count
            (3, "2024-01-01 10:00:00", "view"),
            (3, "2024-01-01 10:15:00", "purchase"),
            (3, "2024-01-01 11:00:00", "click"),
            # u4: view only
            (4, "2024-01-01 10:00:00", "view"),
        ]
        ev = spark.createDataFrame(
            [(u, t, y) for u, t, y in rows], "user_id long, ts string, event_type string"
        ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type")
        got = {
            r.step: r.n_users
            for r in funnel(ev, ["view", "click", "purchase"]).collect()
        }
        assert got == {"view": 4, "click": 2, "purchase": 1}

    def test_retention_offsets(self, spark):
        """Users cohorted by first-event week; offsets count from the
        cohort's Monday; distinct users per cell."""
        from datalake_brief_spark.operators.windows import retention_cohorts

        rows = [
            (1, "2024-01-01 08:00:00"),  # Monday wk0 cohort 2024-01-01
            (1, "2024-01-10 08:00:00"),  # wk1
            (1, "2024-01-10 09:00:00"),  # wk1 again (distinct-user: 1)
            (2, "2024-01-03 08:00:00"),  # same cohort week
            (2, "2024-01-17 08:00:00"),  # wk2
            (3, "2024-01-09 08:00:00"),  # cohort 2024-01-08
        ]
        ev = spark.createDataFrame(rows, "user_id long, ts string").selectExpr(
            "user_id", "CAST(ts AS TIMESTAMP) AS ts"
        )
        got = {
            (str(r.cohort_week), r.week_offset): r.n_active
            for r in retention_cohorts(ev).collect()
        }
        assert got == {
            ("2024-01-01", 0): 2,
            ("2024-01-01", 1): 1,
            ("2024-01-01", 2): 1,
            ("2024-01-08", 0): 1,
        }


class TestPageRank:
    """pagerank (graph.py): values vs a driver-side power-iteration model."""

    def _model(self, edges, iterations=15, d=0.85):
        nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
        deg = {n: sum(1 for a, _ in edges if a == n) for n in nodes}
        rank = {n: 1.0 for n in nodes}
        for _ in range(iterations):
            contrib = {n: 0.0 for n in nodes}
            for a, b in edges:
                contrib[b] += rank[a] / deg[a]
            rank = {n: (1 - d) + d * contrib[n] for n in nodes}
        return rank

    def test_matches_power_iteration_model(self, spark):
        """Asymmetric 4-node graph (no dangling): every rank equals the
        model's power iteration to 1e-9 after the same fixed rounds."""
        from datalake_brief_spark.operators.graph import pagerank

        edges = [(1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 4), (4, 1)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.id: r.rank for r in pagerank(df, iterations=15).collect()}
        want = self._model(edges)
        assert set(got) == set(want)
        assert all(abs(got[n] - want[n]) < 1e-9 for n in want)
        # mass conservation: no dangling nodes -> sum == n exactly
        assert abs(sum(got.values()) - len(want)) < 1e-9

    def test_symmetric_cycle_is_uniform(self, spark):
        """A↔B: perfectly symmetric, so both ranks stay exactly 1.0."""
        from datalake_brief_spark.operators.graph import pagerank

        df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
        got = {r.id: r.rank for r in pagerank(df, iterations=5).collect()}
        assert got == {1: 1.0, 2: 1.0}


class TestCurationSampling:
    """domain_cap / weighted_sample / target_encode / winsorize_stats —
    the round-6 curation-sampling band."""

    def test_domain_cap_hand_computed(self, spark):
        """Cap 2 per domain by length desc, id-asc tiebreak; rank column
        reflects the within-domain position."""
        from datalake_brief_spark.operators.text import domain_cap

        rows = [
            (1, "a", 100), (2, "a", 300), (3, "a", 300), (4, "a", 50),
            (5, "b", 10),
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        got = {
            r.doc_id: r.domain_rank
            for r in domain_cap(df, cap=2, domain_col="source").collect()
        }
        # domain a: 300(id2) rank1, 300(id3) rank2 beat 100/50; b keeps its one doc
        assert got == {2: 1, 3: 2, 5: 1}

    def test_weighted_sample_properties(self, spark):
        """k >= group size keeps everything; the draw is deterministic
        across invocations; a dominant weight is selected at k=1 for most
        seeds (A-ES bias property, checked over 20 seeds)."""
        from datalake_brief_spark.operators.relational import weighted_sample

        rows = [(i, "g", 1 if i else 10_000) for i in range(8)]
        df = spark.createDataFrame(rows, "doc_id long, source string, w long")
        all_kept = weighted_sample(df, k=100, weight_col="w", group_col="source")
        assert all_kept.count() == 8
        a = sorted(r.doc_id for r in weighted_sample(df, k=3, weight_col="w", group_col="source", seed=7).collect())
        b = sorted(r.doc_id for r in weighted_sample(df, k=3, weight_col="w", group_col="source", seed=7).collect())
        assert a == b
        wins = 0
        for seed in range(20):
            top = weighted_sample(df, k=1, weight_col="w", group_col="source", seed=seed).collect()[0]
            wins += top.doc_id == 0
        # doc 0 carries 10000/10007 of the mass; P(win) per seed ≈ 0.9993
        assert wins >= 18

    def test_target_encode_excludes_own_fold(self, spark):
        """2 categories x 2 folds, hand-computable: each (cat, fold)
        encoding equals the mean of the OTHER fold's targets; a category
        entirely inside one fold falls back to the out-of-fold global
        mean."""
        from datalake_brief_spark import mlops
        from pyspark.sql import functions as F

        # pick ids landing in known folds: fold = md5-prefix(seed=0) % 2
        df = spark.createDataFrame(
            [(i, "c", 0.0) for i in range(40)], "id long, cat string, y double"
        )
        fold_of = {
            r.id: r.fold
            for r in mlops.target_encode(
                df.withColumn("cat", F.col("id").cast("string")),
                "cat", "y", "id", n_folds=2, seed=0
            ).select(F.col("cat").cast("long").alias("id"), "fold").collect()
        }
        f0 = [i for i in range(40) if fold_of[i] == 0][:2]
        f1 = [i for i in range(40) if fold_of[i] == 1][:2]
        rows = [(f0[0], "A", 10.0), (f0[1], "A", 20.0)]  # A fold0: mean 15
        rows += [(f1[0], "A", 40.0)]                      # A fold1: 40
        rows += [(f1[1], "B", 100.0)]                     # B only in fold1
        d = spark.createDataFrame(rows, "id long, cat string, y double")
        enc = {
            (r.cat, r.fold): r.encoding
            for r in mlops.target_encode(d, "cat", "y", "id", n_folds=2, seed=0).collect()
        }
        assert enc[("A", 0)] == 40.0            # other fold = {40}
        assert enc[("A", 1)] == 15.0            # other fold = {10, 20}
        # B has no other fold -> out-of-fold global mean = mean(10,20,40),
        # reported at the default precision=4 rounding
        assert enc[("B", 1)] == round((10 + 20 + 40) / 3, 4)

    def test_winsorize_hand_computed(self, spark):
        """1..10 at p05/p95: numpy-linear-interp bounds 1.45/9.55, one
        clip each side, winsorized mean computed by hand."""
        from datalake_brief_spark.operators.relational import winsorize_stats

        df = spark.createDataFrame([(float(i),) for i in range(1, 11)], "v double")
        r = winsorize_stats(df, "v", 0.05, 0.95).collect()[0]
        assert (r.p_low_value, r.p_high_value) == (1.45, 9.55)
        assert (r.n_clipped_low, r.n_clipped_high) == (1, 1)
        assert r.mean_raw == 5.5
        # clipped: 1.45,2..9,9.55 -> (1.45 + 44 + 9.55)/10
        assert r.mean_winsorized == 5.5


class TestDistributionProfilers:
    """token_kl_by_group / quantile_bins / benford_profile — round-6
    distribution-profiling band."""

    def test_token_kl_zero_for_identical_mix(self, spark):
        """Two groups with the SAME token distribution -> KL exactly 0 for
        both; a group with private vocabulary diverges positively."""
        from datalake_brief_spark.operators.text import token_kl_by_group

        rows = [("a", "x y"), ("b", "x y")]
        df = spark.createDataFrame(rows, "source string, text string")
        got = {r.source: r.kl_vs_corpus for r in token_kl_by_group(df).collect()}
        assert got == {"a": 0.0, "b": 0.0}
        rows = [("a", "x x x x"), ("b", "z z z z")]
        df = spark.createDataFrame(rows, "source string, text string")
        got = {r.source: r.kl_vs_corpus for r in token_kl_by_group(df).collect()}
        # p(x|a)=1, q(x)=0.5 -> KL = ln 2 for each side
        import math
        assert all(abs(v - math.log(2)) < 1e-6 for v in got.values())

    def test_quantile_bins_uniform_and_ties(self, spark):
        """1..8 into quartiles -> 4 bins x 2 rows with exact ranges; a
        constant column collapses into one bin (empty bins SHOW the
        imbalance, the audit contract)."""
        from datalake_brief_spark.operators.relational import quantile_bins

        df = spark.createDataFrame([(float(i),) for i in range(1, 9)], "v double")
        got = {r.bin: (r.n_rows, r.lo, r.hi) for r in quantile_bins(df, "v", 4).collect()}
        assert {b: n for b, (n, _, _) in got.items()} == {0: 2, 1: 2, 2: 2, 3: 2}
        assert got[0] == (2, 1.0, 2.0) and got[3] == (2, 7.0, 8.0)
        const = spark.createDataFrame([(5.0,)] * 10, "v double")
        one = quantile_bins(const, "v", 4).collect()
        assert len(one) == 1 and one[0].n_rows == 10 and one[0].bin == 0

    def test_benford_digit_exact_at_powers_of_ten(self, spark):
        """1000.0 (the float-log10 trap) classifies as digit 1; negatives
        and zeros excluded; shares sum to 1 and expectations follow
        log10(1+1/d)."""
        from datalake_brief_spark.operators.relational import benford_profile
        import math

        vals = [1000.0, 1.0, 0.002, 25.0, 90.1, -7.0, 0.0]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        rows = {r.digit: r for r in benford_profile(df, "v").collect()}
        # kept: 1000->1, 1->1, 0.002->2, 25->2, 90.1->9  (neg/zero dropped)
        assert {d: r.n for d, r in rows.items()} == {1: 2, 2: 2, 9: 1}
        assert abs(sum(r.obs_share for r in rows.values()) - 1.0) < 1e-6
        for d, r in rows.items():
            assert abs(r.benford_share - round(math.log10(1 + 1 / d), 6)) < 1e-9


class TestUnicodeAndEmbeddingProfile:
    """normalize_unicode / norm_profile — round-6 canonicalization band."""

    def test_nfc_makes_composed_and_decomposed_equal(self, spark):
        """'é' composed (U+00E9) and decomposed (e + U+0301) normalize to
        the SAME string; casefold applies; ø (no decomposition) survives
        accent-stripping unchanged while é folds to e."""
        from datalake_brief_spark.operators.text import normalize_unicode

        rows = [(1, "Caf\u00e9 \u00d8re"), (2, "Cafe\u0301 \u00d8re")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: (r.norm_text, r.ascii_fold)
            for r in normalize_unicode(df, strip_accents_out="ascii_fold").collect()
        }
        assert out[1] == out[2]
        assert out[1][0] == "café øre"
        assert out[1][1] == "cafe øre"

    def test_norm_profile_hand_computed(self, spark):
        """3-4-0 and unit vectors: norms 5 and 1, grouped and global."""
        from datalake_brief_spark.operators.similarity import norm_profile

        rows = [(0, [3.0, 4.0, 0.0]), (0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 2.0])]
        df = spark.createDataFrame(rows, "label int, embedding array<float>")
        by = {r.label: r for r in norm_profile(df).collect()}
        assert (by[0].n, by[0].min_norm, by[0].max_norm, by[0].mean_norm) == (2, 1.0, 5.0, 3.0)
        assert (by[1].n, by[1].mean_norm) == (1, 2.0)
        g = norm_profile(df, group_col=None).collect()[0]
        assert (g.n, g.min_norm, g.max_norm) == (3, 1.0, 5.0)


class TestFeatureRanking:
    """mutual_information / group_quantiles — round-6 feature-screen band."""

    def test_mi_endpoints(self, spark):
        """Perfectly dependent feature -> MI == H(Y), normalized 1.0; an
        independent uniform feature -> MI exactly 0; label vs itself is the
        leak detector."""
        import math
        from datalake_brief_spark import mlops

        # y = x (dependent); z independent of y (all combos equally likely)
        rows = [(x, z, x) for x in "ab" for z in "cd" for _ in range(3)]
        df = spark.createDataFrame(rows, "x string, z string, y string")
        got = {r.feature: r for r in mlops.mutual_information(df, ["x", "z"], "y").collect()}
        h_y = math.log(2)
        assert abs(got["x"].mi_nats - round(h_y, 6)) < 1e-6
        assert got["x"].mi_normalized == 1.0
        assert got["z"].mi_nats == 0.0
        assert abs(got["x"].label_entropy - round(h_y, 6)) < 1e-6

    def test_group_quantiles_hand_computed(self, spark):
        """1..4 per group: quartiles at numpy-linear positions (1.75,
        2.5, 3.25); group key and count carried."""
        from datalake_brief_spark.operators.relational import group_quantiles

        rows = [("g", float(i)) for i in range(1, 5)] + [("h", 10.0)]
        df = spark.createDataFrame(rows, "k string, v double")
        got = {r.k: r for r in group_quantiles(df, "v", "k").collect()}
        assert (got["g"].n, got["g"].p25, got["g"].p50, got["g"].p75) == (4, 1.75, 2.5, 3.25)
        assert (got["h"].n, got["h"].p25, got["h"].p50, got["h"].p75) == (1, 10.0, 10.0, 10.0)


class TestLmPerplexity:
    """ngram_lm_perplexity — CCNet-style bigram LM quality scoring."""

    def test_hand_computed_add_k(self, spark):
        """ref = {a b, a b, a c}: C(a,b)=2, C(a)=3, V=3, k=0.5. Scoring
        'a b' -> p=2.5/4.5, ppl=1.8; unseen context 'z z' -> p=k/(kV)=1/3,
        ppl=3; single-token docs drop (no bigram events)."""
        from datalake_brief_spark.operators.text import ngram_lm_perplexity

        ref = spark.createDataFrame(
            [(100, "a b"), (101, "a b"), (102, "a c")], "doc_id long, text string"
        )
        score = spark.createDataFrame(
            [(1, "a b"), (2, "z z"), (3, "a")], "doc_id long, text string"
        )
        got = {r.doc_id: r for r in ngram_lm_perplexity(score, ref=ref).collect()}
        assert set(got) == {1, 2}  # doc 3 has no bigrams
        assert got[1].n_bigrams == 1 and abs(got[1].ppl - 1.8) < 1e-9
        assert got[2].n_bigrams == 1 and abs(got[2].ppl - 3.0) < 1e-9

    def test_self_trained_favors_repetitive_docs(self, spark):
        """Self-scored corpus: a document made of the corpus's dominant
        bigram scores LOWER ppl than a one-off document — the ordering the
        filter relies on."""
        from datalake_brief_spark.operators.text import ngram_lm_perplexity

        rows = [(i, "x y x y x y") for i in range(5)] + [(99, "q r s t u v")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r.ppl for r in ngram_lm_perplexity(df).collect()}
        assert got[0] < got[99]


class TestRound6EmptyInputs:
    """Empty-input degradation for the round-6 operator additions."""

    def test_curation_and_profiling_ops_on_empty(self, spark):
        from datalake_brief_spark import mlops
        from datalake_brief_spark.operators import relational, similarity, text

        docs = spark.createDataFrame(
            [], "doc_id long, source string, text string, n_chars long"
        )
        nums = spark.createDataFrame([], "k string, v double")
        assert text.domain_cap(docs, cap=5).count() == 0
        assert text.token_kl_by_group(docs).count() == 0
        assert text.ngram_lm_perplexity(docs).count() == 0
        assert text.normalize_unicode(docs, strip_accents_out="f").count() == 0
        assert relational.weighted_sample(
            docs, k=3, weight_col="n_chars", group_col="source"
        ).count() == 0
        assert relational.quantile_bins(nums, "v", 4).count() == 0
        assert relational.benford_profile(nums, "v").count() == 0
        assert relational.group_quantiles(nums, "v", "k").count() == 0
        assert mlops.target_encode(nums, "k", "v", "k").count() == 0
        assert mlops.mutual_information(nums, ["k"], "v").collect()[0].mi_nats is None
        emb = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
        assert similarity.norm_profile(emb).count() == 0
        # winsorize on empty: single row of nulls/zeros, never a crash
        w = relational.winsorize_stats(nums, "v").collect()
        assert len(w) <= 1


class TestQualityCutAndCompression:
    """quality_top_fraction / compression_ratio — round-6 curation signals."""

    def test_top_fraction_hand_computed(self, spark):
        """1..8 in one group at frac=0.25: p75 = 6.25, keep {7, 8}; a
        second group is cut independently."""
        from datalake_brief_spark.operators.text import quality_top_fraction

        rows = [(i, "a", i) for i in range(1, 9)] + [(100, "b", 5), (101, "b", 50)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        kept = {
            r.doc_id: r.cut_threshold
            for r in quality_top_fraction(df, frac=0.25).collect()
        }
        assert set(kept) == {7, 8, 101}
        assert kept[7] == 6.25
        # group b: p75 of {5, 50} = 38.75 -> only 50 survives
        assert kept[101] == 38.75

    def test_compression_ratio_ordering_and_nulls(self, spark):
        """Repetitive text compresses strictly below shuffled-unique text;
        empty string -> null ratio; values reproducible (level pinned)."""
        from datalake_brief_spark.operators.text import compression_ratio

        rep = "spam " * 200
        uniq = " ".join(f"w{i}x{i * 7 % 93}" for i in range(200))
        df = spark.createDataFrame(
            [(1, rep), (2, uniq), (3, "")], "doc_id long, text string"
        )
        got = {r.doc_id: r.compression_ratio for r in compression_ratio(df).collect()}
        assert got[3] is None
        assert got[1] < 0.1 < got[2]
        again = {r.doc_id: r.compression_ratio for r in compression_ratio(df).collect()}
        assert got == again


class TestChainComponents:
    """connected_components on a path graph — pointer jumping must close a
    100-node diameter well inside the default round budget."""

    def test_long_path_converges_to_min_label(self, spark):
        from datalake_brief_spark.operators.dedup import connected_components

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(100)], "id_a long, id_b long"
        )
        got = {r.id: r.comp for r in connected_components(edges).collect()}
        assert got == {i: 0 for i in range(101)}
