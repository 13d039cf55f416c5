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
