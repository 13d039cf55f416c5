"""Hand-computed ground truth for the r3 curation operators: Gopher-style
repetition metrics and n-gram benchmark decontamination. The DuckDB
hash-match runs in test_oracle_parity; these pin the semantics on inputs
small enough to verify by eye."""

from __future__ import annotations

from datalake_brief_spark.operators import text


def _rows(df, key):
    return {r[key]: r.asDict() for r in df.collect()}


class TestRepetitionMetrics:
    def test_hand_computed_fractions(self, spark):
        df = spark.createDataFrame(
            [
                # tokens: a a a b -> 4 total, 2 distinct -> dup 0.5
                # bigrams: "a a" x2, "a b" x1 -> top 2/3
                (1, "A  a a B"),
                # all distinct tokens -> 3 distinct bigrams, top 1/3
                (2, "w x y z"),
            ],
            ["doc_id", "text"],
        )
        out = _rows(text.repetition_metrics(df), "doc_id")
        assert out[1]["n_tokens"] == 4
        assert out[1]["dup_word_frac"] == 0.5
        assert out[1]["top_bigram_frac"] == 0.666667
        assert out[2]["dup_word_frac"] == 0.0
        assert out[2]["top_bigram_frac"] == 0.333333

    def test_single_token_doc_has_no_bigrams(self, spark):
        df = spark.createDataFrame([(1, "solo")], ["doc_id", "text"])
        out = _rows(text.repetition_metrics(df), "doc_id")
        assert out[1]["n_tokens"] == 1
        assert out[1]["dup_word_frac"] == 0.0
        assert out[1]["top_bigram_frac"] == 0.0  # left-join fill, not NULL


class TestContaminationOverlap:
    def test_shared_5gram_flags_doc(self, spark):
        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps over")], ["doc_id", "text"]
        )
        corpus = spark.createDataFrame(
            [
                # contains "the quick brown fox jumps" AND
                # "quick brown fox jumps over" -> n_shared == 2
                (1, "said The quick brown fox jumps over everything"),
                # shares 4-gram only -> clean at n=5
                (2, "quick brown fox jumps high"),
                (3, "completely unrelated text with no overlap at all"),
            ],
            ["doc_id", "text"],
        )
        out = _rows(text.contamination_overlap(corpus, bench, n=5), "doc_id")
        assert set(out) == {1}
        assert out[1]["n_shared"] == 2

    def test_repeated_gram_counts_once_per_doc(self, spark):
        bench = spark.createDataFrame([(9, "p q r s t")], ["doc_id", "text"])
        corpus = spark.createDataFrame(
            [(1, "p q r s t and again p q r s t")], ["doc_id", "text"]
        )
        out = _rows(text.contamination_overlap(corpus, bench, n=5), "doc_id")
        assert out[1]["n_shared"] == 1  # distinct grams per doc, not occurrences


class TestGopherRules:
    def test_hand_computed_signals(self, spark):
        # 60 words, all 4-letter alphabetic, includes 'the' and 'with':
        # passes every rule.
        good = " ".join(["word"] * 56 + ["the", "with", "that", "have"])
        # 10 words -> fails the 50-word floor; no required stopwords.
        short = " ".join(["zz"] * 10)
        # symbol soup: '#' per word -> symbol_ratio 1.0 >= 0.1.
        syms = " ".join(["the#"] * 30 + ["with"] * 30)
        df = spark.createDataFrame(
            [(1, good), (2, short), (3, syms)], ["doc_id", "text"]
        )
        out = _rows(text.gopher_rules(df), "doc_id")
        assert out[1]["n_words"] == 60
        assert out[1]["mean_word_len"] == 4.0 or 3.0 <= out[1]["mean_word_len"] <= 10.0
        assert out[1]["n_stop_distinct"] == 4
        assert out[1]["passes"] is True
        assert out[2]["passes"] is False  # too short
        assert out[2]["n_stop_distinct"] == 0
        assert out[3]["symbol_ratio"] == 0.5  # 30 hashes / 60 words
        assert out[3]["passes"] is False

    def test_alpha_word_ratio_counts_letterless_words(self, spark):
        df = spark.createDataFrame([(1, "abc 123 456 789")], ["doc_id", "text"])
        out = _rows(text.gopher_rules(df), "doc_id")
        assert out[1]["alpha_word_ratio"] == 0.25


class TestBudgetSample:
    def test_budget_is_respected_per_stratum(self, spark):
        rows = [(s, i, " ".join(["w"] * 10)) for s in ("a", "b") for i in range(20)]
        df = spark.createDataFrame(rows, ["source", "doc_id", "text"])
        out = text.budget_sample(df, budget=55, group_col="source").collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r.source, []).append(r)
        for src, got in by_src.items():
            assert max(r.cum_tokens for r in got) <= 55
            # 10-token docs under a 55 budget -> exactly 5 docs per stratum
            assert len(got) == 5, src

    def test_sample_is_deterministic_and_stable_under_inserts(self, spark):
        rows = [("a", i, " ".join(["w"] * 10)) for i in range(40)]
        df = spark.createDataFrame(rows, ["source", "doc_id", "text"])
        pick1 = {r.doc_id for r in text.budget_sample(df, budget=100).collect()}
        pick2 = {r.doc_id for r in text.budget_sample(df, budget=100).collect()}
        assert pick1 == pick2  # reproducible
        # hash order is stable under inserts: adding docs can only displace
        # picks near the budget boundary, and the kept prefix is a prefix
        # of the same hash order
        bigger = spark.createDataFrame(
            rows + [("a", 1000 + i, " ".join(["w"] * 10)) for i in range(40)],
            ["source", "doc_id", "text"],
        )
        pick3 = {r.doc_id for r in text.budget_sample(bigger, budget=100).collect()}
        # inserts can only DISPLACE old picks toward the budget boundary
        # (old docs' relative hash order is unchanged; cumulative tokens
        # only grow), never promote an old doc that wasn't picked before
        old_survivors = {d for d in pick3 if d < 1000}
        assert old_survivors <= pick1
        assert old_survivors, "some original picks must survive the insert"


class TestTemperatureResample:
    def _df(self, spark, sizes):
        rows = [
            (s, 1000 * j + i)
            for j, (s, n) in enumerate(sizes.items())
            for i in range(n)
        ]
        return spark.createDataFrame(rows, ["source", "doc_id"])

    def test_tau_endpoints(self, spark):
        """tau=1 keeps natural proportions; tau=0 splits the budget
        uniformly across strata regardless of size."""
        df = self._df(spark, {"big": 90, "small": 10})
        nat = {
            s: n
            for s, n in (
                text.temperature_resample(df, total_budget=50, tau=1.0)
                .groupBy("source")
                .count()
                .collect()
            )
        }
        assert nat == {"big": 45, "small": 5}
        uni = {
            s: n
            for s, n in (
                text.temperature_resample(df, total_budget=20, tau=0.0)
                .groupBy("source")
                .count()
                .collect()
            )
        }
        assert uni == {"big": 10, "small": 10}

    def test_tau_half_upweights_small_and_clamps(self, spark):
        """tau=0.5: sqrt weights lift the small stratum's share above its
        natural proportion; budgets never exceed stratum size (no
        up-sampling)."""
        df = self._df(spark, {"big": 100, "small": 4})
        out = (
            text.temperature_resample(df, total_budget=60, tau=0.5)
            .groupBy("source")
            .count()
            .collect()
        )
        got = {r.source: r["count"] for r in out}
        # weights 10 vs 2 -> shares 50 vs 10, small clamps at 4
        assert got == {"big": 50, "small": 4}
        # small's share of the SELECTED corpus (4/54) exceeds a natural
        # tau=1 split's would-be floor(60*4/104)=2
        assert got["small"] > 2

    def test_selection_is_deterministic(self, spark):
        df = self._df(spark, {"a": 30, "b": 30})
        p1 = {r.doc_id for r in text.temperature_resample(df, 20).collect()}
        p2 = {r.doc_id for r in text.temperature_resample(df, 20).collect()}
        assert p1 == p2 and len(p1) == 20


class TestDsirWeights:
    def test_target_like_docs_score_higher(self, spark):
        from pyspark.sql import functions as F

        # target speaks 'alpha beta', raw background speaks 'gamma delta';
        # a candidate in target vocabulary must outscore one in background
        # vocabulary under log p_t - log q.
        rows = (
            [(i, "alpha beta alpha beta", "t") for i in range(5)]
            + [(100 + i, "gamma delta gamma delta", "r") for i in range(5)]
            + [(900, "alpha beta alpha beta", "r"), (901, "gamma delta gamma delta", "x")]
        )
        df = spark.createDataFrame(rows, ["doc_id", "text", "grp"])
        out = {
            r.doc_id: r.log_iw
            for r in text.dsir_log_weights(df, target=F.col("grp") == "t").collect()
        }
        assert out[900] > out[901]
        # target-vocab docs all share one score; same for background docs
        assert out[900] == out[0]

    def test_weights_are_exact_llr(self, spark):
        import math

        from pyspark.sql import functions as F

        # one target doc 'a a', one raw-only doc 'b'; V=2 tokens.
        df = spark.createDataFrame(
            [(1, "a a", True), (2, "b", False)], ["doc_id", "text", "t"]
        )
        out = {
            r.doc_id: r.log_iw
            for r in text.dsir_log_weights(df, target=F.col("t")).collect()
        }
        # totals: np=2 (both 'a'), nq=3, v=2
        # token a: p=(2+1)/(2+2), q=(2+1)/(3+2) -> lr = ln(3/4) - ln(3/5)
        lr_a = math.log(3 / 4) - math.log(3 / 5)
        # token b: p=(0+1)/4, q=(1+1)/5 -> lr = ln(1/4) - ln(2/5)
        lr_b = math.log(1 / 4) - math.log(2 / 5)
        assert out[1] == round(2 * lr_a, 6)
        assert out[2] == round(lr_b, 6)

    def test_hashed_variant_equals_explicit_when_collision_free(self, spark):
        """With n_buckets far above the vocabulary, bucket statistics are
        exactly token statistics, so hashed-DSIR == explicit-unigram DSIR."""
        from pyspark.sql import functions as F

        rows = (
            [(i, "alpha beta gamma", True) for i in range(4)]
            + [(10 + i, "delta epsilon zeta eta", False) for i in range(6)]
        )
        df = spark.createDataFrame(rows, ["doc_id", "text", "t"])
        exact = {
            r.doc_id: (r.n_tokens, r.log_iw)
            for r in text.dsir_log_weights(df, target=F.col("t")).collect()
        }
        hashed = {
            r.doc_id: (r.n_tokens, r.log_iw)
            for r in text.dsir_log_weights_hashed(
                df, target=F.col("t"), n_buckets=1 << 30
            ).collect()
        }
        assert hashed == exact


class TestC4Rules:
    def test_rules_catch_each_residue_class(self, spark):
        """One crafted row per C4 rule: code braces, lorem ipsum,
        javascript boilerplate, blocklist hits, too-few sentences —
        plus one clean passer."""
        rows = [
            (1, "Good first sentence. A second one! And a third?"),
            (2, "function() { return 1; }. Two. Three."),
            (3, "Lorem ipsum dolor sit amet. Two. Three."),
            (4, "Enable javascript to view this page. Two. Three."),
            (5, "Win at the casino today. Two. Three."),
            (6, "Only two sentences here. Really just two."),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in text.c4_rules(df).collect()}
        assert got[1].passes and got[1].ends_terminal and got[1].n_sentences == 3
        assert got[2].has_brace and not got[2].passes
        assert got[3].has_lorem and not got[3].passes
        assert got[4].has_javascript and not got[4].passes
        assert got[5].bad_word_hits == 1 and not got[5].passes
        assert got[6].n_sentences == 2 and not got[6].passes

    def test_javascript_is_word_bounded(self, spark):
        df = spark.createDataFrame(
            [(1, "He loves javascripting daily. Two. Three.")],
            "doc_id long, text string",
        )
        r = text.c4_rules(df).collect()[0]
        assert not r.has_javascript and r.passes


class TestSeededShuffleAndSharding:
    def test_shuffle_is_a_seeded_permutation(self, spark):
        df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
        a = {r.doc_id: r.shuffle_rank for r in text.seeded_shuffle(df, seed=1).collect()}
        b = {r.doc_id: r.shuffle_rank for r in text.seeded_shuffle(df, seed=1).collect()}
        c = {r.doc_id: r.shuffle_rank for r in text.seeded_shuffle(df, seed=2).collect()}
        assert a == b, "same seed must reproduce the permutation"
        assert sorted(a.values()) == list(range(1, 201)), "must be a permutation"
        assert a != c, "different seeds must differ"
        # not order-preserving (an identity 'shuffle' would be useless)
        assert [a[i] for i in range(200)] != sorted(a.values())

    def test_shard_assignment_is_stable_and_balanced(self, spark):
        df = spark.createDataFrame([(i,) for i in range(800)], "doc_id long")
        out = text.shard_assignment(df, n_shards=8, seed=0)
        a = {r.doc_id: r.shard for r in out.collect()}
        b = {r.doc_id: r.shard for r in text.shard_assignment(df, n_shards=8, seed=0).collect()}
        assert a == b
        sizes = {}
        for s in a.values():
            sizes[s] = sizes.get(s, 0) + 1
        assert set(sizes) == set(range(8))
        # uniform in expectation: no shard more than 2x the ideal 100
        assert max(sizes.values()) < 200 and min(sizes.values()) > 40


class TestHeavyHitters:
    def test_two_phase_equals_exact_on_skewed_data(self, spark):
        """The sketch-then-count pipeline must return EXACTLY the values
        at >= support frequency — planted: one dominant value, one at the
        boundary's edge, a long uniform tail below support."""
        from pyspark.sql import functions as F

        from datalake_brief_spark.operators.relational import heavy_hitters

        rows = (
            [("hot",)] * 500
            + [("warm",)] * 60
            + [(f"tail{i}",) for i in range(440)]
        )  # n=1000: hot 50%, warm 6%, tail 0.1% each
        df = spark.createDataFrame(rows, "v string")
        got = {r.value: r.n_occurrences for r in heavy_hitters(df, "v", support=0.05).collect()}
        assert got == {"hot": 500, "warm": 60}

    def test_null_values_ignored(self, spark):
        from datalake_brief_spark.operators.relational import heavy_hitters

        df = spark.createDataFrame([("a",), (None,), ("a",), (None,)], "v string")
        got = {r.value: r.n_occurrences for r in heavy_hitters(df, "v", support=0.4).collect()}
        assert got == {"a": 2}
