"""Text-analysis operators for LLM training-data pipelines (SURVEY §2.14).

lang-id (stopword-hit heuristic), quality scoring, token counting, document
fingerprinting. All pure column expressions over built-ins — at 100 TB these
run inside the parquet scan stage with zero shuffles and zero Python.

The duckdb oracle SQL for each lives beside the query registration
(queries module); the Spark expression and the SQL are kept textually
parallel so they hash-match.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Window

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_brief_spark.functions import (
    normalize_text,
    punct_count,
    spread_scan,
    token_count,
    tokens,
)

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# Public-knowledge most-frequent function words.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "fr": ["le", "la", "les", "de", "et", "est", "que", "un"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "es": ["el", "la", "los", "de", "y", "es", "que", "un"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["a", "for", "on", "with", "as", "at", "by"]


def marker_hits(text_col: Column | str, markers: list[str]) -> Column:
    """Count of tokens that are in ``markers`` (duplicates counted)."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens(text_col), lambda t: F.array_contains(arr, t)))


def with_token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    """Whitespace token count (the BPE-ish regex variant is
    ``with_subword_count``)."""
    return df.withColumn(out, token_count(text_col))


def with_subword_count(df: DataFrame, text_col: str = "text", out: str = "n_subwords") -> DataFrame:
    """BPE-ish proxy token count: split on word/non-word boundaries so
    punctuation and digit runs count as their own tokens — a deterministic
    stand-in for a real tokenizer's token count (within ~15% for English)."""
    pieces = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"([^\w\s])", r" $1 ")), r"\s+"
    )
    return df.withColumn(out, F.size(pieces))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality signals + composite score in [0,1]:

    - length score: saturating ramp on token count (short docs score low)
    - punctuation ratio penalty (symbol-soup detection)
    - stopword ratio reward (natural-language-likeness, C4-style heuristic;
      Raffel et al. 2020 use terminal punctuation + stopword filters)
    """
    n_tok = token_count(text_col).cast("double")
    n_chars = F.length(F.col(text_col)).cast("double")
    punct_ratio = punct_count(text_col).cast("double") / F.greatest(n_chars, F.lit(1.0))
    stop_ratio = marker_hits(text_col, STOPWORDS_EN).cast("double") / F.greatest(
        n_tok, F.lit(1.0)
    )
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    score = F.round(
        F.greatest(
            F.least(
                F.lit(0.5) * len_score + F.lit(0.5) * F.least(stop_ratio * 4, F.lit(1.0))
                - punct_ratio * 2,
                F.lit(1.0),
            ),
            F.lit(0.0),
        ),
        6,
    )
    return (
        df.withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("quality", score)
    )


def with_lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hits, with a
    deterministic priority order (en > fr > de > es > und) on ties.

    A real deployment swaps in a fastText/CLD3 model via pandas_udf; the
    heuristic is the shuffle-free, dependency-free baseline.
    """
    hits = {lang: marker_hits(text_col, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # Build the when-chain in reverse priority so earlier langs win ties.
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return df.withColumn(out, expr)


def with_fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Content fingerprint: md5 of the normalized text. Exact-dup detection
    key that's stable across whitespace/case variation."""
    return df.withColumn(out, F.md5(normalize_text(text_col)))


# PII surface patterns: deliberately restricted to syntax supported by BOTH
# Java regex (Spark) and RE2 (DuckDB oracle) — no lookarounds, no backrefs —
# so detection and redaction hash-match cross-engine. High-precision shapes
# (leading '+' for phones, full dotted quads) over recall: a curation
# pipeline prefers missing an ambiguous digit run to shredding numbers in
# prose. Swap in a Presidio-style NER model via pandas_udf for recall.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "phone": r"\+\d[\d\s().-]{7,}\d",
    "ipv4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
}

PII_REPLACEMENTS: dict[str, str] = {
    "email": "<EMAIL>",
    "url": "<URL>",
    "phone": "<PHONE>",
    "ipv4": "<IP>",
}


def with_pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-category PII match counts + ``has_pii`` flag — pure scan-stage
    regexp expressions, zero shuffles at any scale."""
    out = df
    for cat, pat in PII_PATTERNS.items():
        out = out.withColumn(f"n_{cat}", F.regexp_count(F.col(text_col), F.lit(pat)))
    flag = None
    for cat in PII_PATTERNS:
        c = F.col(f"n_{cat}") > 0
        flag = c if flag is None else (flag | c)
    return out.withColumn("has_pii", flag)


def redact_pii(df: DataFrame, text_col: str = "text", out: str = "redacted") -> DataFrame:
    """Replace every PII match with its category placeholder. Application
    order is the (fixed) PII_PATTERNS order on both engines, so nested
    matches (emails inside URLs) resolve deterministically."""
    expr = F.col(text_col)
    for cat, pat in PII_PATTERNS.items():
        expr = F.regexp_replace(expr, pat, PII_REPLACEMENTS[cat])
    return df.withColumn(out, expr)


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k TF-IDF terms per document: tfidf = tf × ln(N / df).

    Shuffle budget: explode feeds a partial-aggregated groupBy(doc, token)
    (map-side combine absorbs the token blow-up before the exchange);
    document frequency is a second small aggregate over distinct (doc,
    token) — already materialized by the first — and the N scalar is a
    broadcast. Ranking reuses the doc partitioning. Rank on the ROUNDED
    score with a token tie-break so ordering is reproducible cross-engine
    (raw float ranking is ulp-sensitive).
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    tf = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n"))
    scored = (
        tf.join(docfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(id_col, "token", "tfidf", F.col("rn").cast("long").alias("rn"))
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranked retrieval for a fixed bag of query terms — the classic
    lexical scorer (Robertson–Spärck Jones; Lucene/Elasticsearch's
    default) and the lexical leg of a hybrid BM25+embedding retrieval
    stack over a training corpus:

        score(d) = Σ_t idf(t) · tf(t,d)·(k1+1)
                       / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
        idf(t)   = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))   (Lucene
                   form — always positive)

    Shuffle budget at corpus scale — the corpus TOKENIZES ONCE: for a
    fixed (small) query bag, per-term frequencies and doc length are
    scan-stage array expressions over one tokenization
    (``size(filter(toks, = term))`` — the repeated ``toks`` subtrees
    collapse under subexpression elimination), never an explode. The
    (id, dl, tf…) projection — a few ints per document, the lightweight
    proxy of guide §8 — is materialized through ONE doc-keyed exchange
    that both consumers read (AQE ReusedExchange): the scalar-statistics
    aggregation (N, avgdl, per-term document frequencies — ONE global
    agg, broadcast back) and the scoring pass. r12 shipped this as two
    full tokenize scans with zero keyed exchanges; shuffling ~16 bytes/doc
    to halve the regex work wins at every scale, and the narrow exchange
    is AQE-coalescible. The match filter is expressed as ``score > 0``
    (equivalent: Lucene idf is strictly positive, every summand is ≥ 0
    and > 0 iff its tf > 0) — score references the broadcast stats, so
    Catalyst cannot push the filter below the shared exchange and split
    it into a second serial scan-side evaluation of the tokenizer (the
    r12 plan evaluated the tokenizer TWICE more in the scan task for the
    pushed ``matched > 0`` filter). The final top-k is a global
    orderBy(…).limit(k) — TakeOrderedAndProject, partition-local heaps +
    one k-row merge at the driver, no global sort. Ranking uses the
    ROUNDED score with an id tie-break so the k-boundary selection is
    reproducible cross-engine (raw float ordering is ulp-sensitive)."""
    if not query_terms:
        # an empty bag would leave score=None (F.round(None) raises) and
        # matched=0 (a Python int passed to filter) — fail with the real
        # contract violation instead of the downstream symptom
        raise ValueError("query_terms must be non-empty")
    toks = tokens(text_col)
    nt = len(query_terms)

    def _eq(term):
        # closure factory, NOT a default arg: F.filter treats a 2-param
        # lambda as (element, index)
        return lambda x: x == F.lit(term)

    base = spread_scan(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        *[
            F.size(F.filter(toks, _eq(term))).alias(f"__tf{i}")
            for i, term in enumerate(query_terms)
        ],
    )
    # one doc-keyed exchange ABOVE the tokenized projection: the stats agg
    # and the scoring pass both read it (ReusedExchange) → ONE tokenization
    base = base.repartition(id_col)
    stats = base.agg(
        F.avg("dl").alias("avgdl"),
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(nt)
        ],
    )
    j = base.crossJoin(F.broadcast(stats))
    norm = k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    score = None
    for i in range(nt):
        tf_i = F.col(f"__tf{i}")
        s_i = F.when(
            tf_i > 0,
            F.log(
                F.lit(1.0)
                + (F.col("n") - F.col(f"__df{i}") + 0.5)
                / (F.col(f"__df{i}") + 0.5)
            )
            * tf_i
            * (k1 + 1.0)
            / (tf_i + norm),
        ).otherwise(F.lit(0.0))
        score = s_i if score is None else score + s_i
    # score > 0 ⟺ some tf_i > 0 (matched): Lucene idf = ln(1 + x) with
    # x > 0 is strictly positive, norm ≥ k1·(1−b) > 0, so each summand is
    # ≥ 0 and > 0 exactly when its term occurs. Filtering on the RAW score
    # keeps the predicate dependent on the broadcast stats side — see the
    # docstring for why that placement matters.
    return (
        j.filter(score > 0)  # only docs containing a query term rank
        .select(F.col(id_col), F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token-window chunks (the standard
    context-window prep for embedding/training pipelines): chunk i covers
    tokens [i*stride, i*stride + chunk_size); the last chunk may be short.

    Pure expressions (tokens → sequence → slice → posexplode): the blow-up
    happens inside the scan stage with zero shuffles, and chunk count per
    doc is ceil(max(n-chunk_size,0)/stride)+1 — bounded, no skew surprises.

    Cost note: the slice inside the per-chunk lambda re-evaluates the
    tokenizer expression per chunk (HOF lambda bodies evaluate per
    element), so per-doc work is O(chunks × tokens) ≈ O(tokens²/stride) —
    ONE tokenizer eval per chunk: the token count derives from the
    exploded chunk_text attribute (tokens contain no spaces by
    construction, so re-splitting the materialized chunk recovers the
    count at O(chunk) cost), never from a second slice of the doc. Fine
    for documents (first-run cost is codegen compile, steady-state 0.6 s
    at sf0.1); for book-length inputs materialize the token array through
    an Arrow pass first.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    n_chunks = (
        F.ceil(F.greatest(n - F.lit(chunk_size), F.lit(0)) / F.lit(float(stride))) + 1
    ).cast("int")
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i * stride + 1, chunk_size)),
            )
        ).alias("chunk_idx", "chunk_text"),
    ).select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk_text",
        F.size(F.split("chunk_text", " ")).cast("long").alias("n_chunk_tokens"),
    )


def pack_chunks(
    chunks: DataFrame,
    budget: int = 256,
    n_shards: int = 64,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tokens_col: str = "n_chunk_tokens",
) -> DataFrame:
    """Token-budget packing: assign chunks to packs of <= ``budget`` tokens
    (the step between chunking and training-batch assembly).

    Greedy first-fit in deterministic order, run independently per hash
    shard with ``applyInPandas`` — packing is inherently sequential (each
    decision depends on the running remainder), so the scalable form is
    sequential-within-shard, parallel-across-shards; a global Window would
    serialize the whole dataset onto one partition. pack_id =
    shard * 2^32 + local ordinal: globally unique without coordination.

    Guarantee: every pack's token total <= budget, unless a single chunk
    alone exceeds the budget (it then gets a pack of its own — pre-split
    oversized chunks upstream).
    """
    import pandas as pd

    out_fields = [*chunks.schema.fields]
    out_schema = T.StructType(out_fields + [T.StructField("pack_id", T.LongType())])

    def pack_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (shard,) = key
        pdf = pdf.sort_values([id_col, idx_col], kind="mergesort").reset_index(drop=True)
        pack_ids, local, used = [], 0, 0
        for n in pdf[tokens_col]:
            n = int(n)
            if used > 0 and used + n > budget:
                local += 1
                used = 0
            used += n
            pack_ids.append((int(shard) << 32) + local)
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        return pdf.drop(columns=["__shard"])

    sharded = chunks.withColumn(
        "__shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    )
    # __shard must be in the output schema contract minus the drop above:
    return sharded.groupBy("__shard").applyInPandas(
        lambda key, pdf: pack_shard(key, pdf), schema=out_schema
    )


def word_ngrams_udtf():
    """The engine's UDTF extension point (SURVEY §2.11): an Arrow-optimized
    Python user-defined TABLE function generating word n-grams — one input
    row fans out to ``len(words)-n+1`` output rows via ``LATERAL``.

    Why a UDTF and not ``explode``: built-in generators cover the
    expressible cases (``explode_tokens`` in the registry is the JVM
    route); the UDTF is the blessed escape hatch for table-generating logic
    with real Python state per row — and the policy constraint carries
    over: ``useArrow=True`` so it plans as ArrowEvalPythonUDTF (batched
    Arrow transfer), never BatchEvalPythonUDTF (pickled row loop). The
    registry-wide plan lint enforces exactly that.

    Splitting is ``text.split(' ')`` — the same single-space semantics as
    DuckDB's ``string_split(text, ' ')`` so the oracle matches empty-piece
    behavior on doubled spaces.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="ngram: string, pos: int", useArrow=True)
    class WordNGrams:
        def eval(self, text: str, n: int):
            words = (text or "").split(" ")
            for i in range(max(0, len(words) - n + 1)):
                yield " ".join(words[i : i + n]), i

    return WordNGrams


def ngrams_lateral(df: DataFrame, n: int, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """LATERAL-join the n-gram UDTF against each row of ``df``: returns
    (id_col, ngram, pos). The UDTF runs in the scan stage per Arrow batch —
    no shuffle is introduced by the generation itself."""
    spark = df.sparkSession
    spark.udtf.register("word_ngrams", word_ngrams_udtf())
    df.select(id_col, text_col).createOrReplaceTempView("__ngram_in")
    return spark.sql(
        f"SELECT i.{id_col}, g.ngram, g.pos "
        f"FROM __ngram_in i, LATERAL word_ngrams(i.{text_col}, {int(n)}) g"
    )


# Re-exported from functions (single home for the O(n) zip_with n-gram
# chain — word_shingles builds on the same helper).
from datalake_brief_spark.functions import word_ngram_array  # noqa: E402,F401


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/MassiveText-style repetition signals per document
    (Rae et al. 2021 §A1.1 "repetitious text" filters):

    - ``dup_word_frac``    — 1 − |distinct tokens| / |tokens|: high when the
                             doc keeps reusing the same words.
    - ``top_bigram_frac``  — occurrences of the single most frequent word
                             bigram / total bigrams: high for boilerplate
                             loops ("click here click here …").

    Scale shape: the token/distinct metrics are pure scan-stage expressions.
    The bigram mode needs per-(doc, gram) counts → one explode + two keyed
    aggregations on doc-prefixed keys, both with map-side partial combine;
    the final join back to the per-doc row is doc_id-keyed and AQE picks
    broadcast at small scale. No Python anywhere. The raw (id, text)
    projection is spread first (r13, guide §2.6): a single-split source
    otherwise evaluates the tokenizer/ngram chain serially in the scan
    task for BOTH consumers of ``base``; at scale the spread no-ops."""
    toks = tokens(text_col)
    df = spread_scan(df.select(F.col(id_col), F.col(text_col)))
    base = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(toks)) / F.size(toks), 6
        ).alias("dup_word_frac"),
        word_ngram_array(toks, 2).alias("__grams"),
    )
    # explode_OUTER + post-filter, not explode: a non-outer generate gains
    # an inferred `size(__grams) > 0` filter that Catalyst pushes BELOW the
    # spread exchange — re-evaluating the whole ngram chain a second time,
    # serially, in the single-split scan task (the dedup._banded lesson;
    # measured 1.1 s → 4.7 s when the inferred filter landed)
    gram_counts = (
        base.select(id_col, F.explode_outer("__grams").alias("gram"))
        .filter(F.col("gram").isNotNull())
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = gram_counts.groupBy(id_col).agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac")
    )
    return (
        base.drop("__grams")
        .join(top, id_col, "left")
        .withColumn("top_bigram_frac", F.coalesce("top_bigram_frac", F.lit(0.0)))
    )


# Gopher's required-stopword list (Rae et al. 2021 §A1.1): a document must
# contain at least 2 of these to count as natural language.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher/MassiveText quality-rule suite (Rae et al. 2021 §A1.1) — the
    standard pre-training document filter, evaluated per document:

    - ``n_words``          in [50, 100 000]
    - ``mean_word_len``    in [3, 10]
    - ``symbol_ratio``     (# and ... occurrences / words) < 0.1
    - ``alpha_word_ratio`` (words containing a letter / words) > 0.80
    - ``n_stop_distinct``  (distinct required stopwords present) ≥ 2

    Emits every signal plus the composite ``passes`` flag, so downstream
    curation can re-threshold without recomputing. All pure column
    expressions over the normalized token array — scan-stage, zero
    shuffles, zero Python at any scale (same posture as with_quality).
    """
    toks = tokens(text_col)
    n = F.size(toks).cast("double")
    n_safe = F.greatest(n, F.lit(1.0))
    mean_len = F.round(
        F.aggregate(
            toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
        )
        / n_safe,
        6,
    )
    sym = (
        F.regexp_count(F.col(text_col), F.lit("#"))
        + F.regexp_count(F.col(text_col), F.lit(r"\.\.\."))
    ).cast("double")
    symbol_ratio = F.round(sym / n_safe, 6)
    alpha_ratio = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / n_safe, 6
    )
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr)).cast("long")
    n_words = n.cast("long")
    passes = (
        n_words.between(50, 100_000)
        & mean_len.between(3.0, 10.0)
        & (symbol_ratio < 0.1)
        & (alpha_ratio > 0.8)
        & (n_stop >= 2)
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        n_stop.alias("n_stop_distinct"),
        passes.alias("passes"),
    )


C4_BAD_WORDS = ["casino", "viagra", "xxx"]  # stand-in for the blocklist file


def c4_rules(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """C4 cleaning-rule suite (Raffel et al. 2020 §2.2, the "Colossal Clean
    Crawled Corpus" heuristics), document-level signals:

    - ``n_sentences``      terminal-punctuation count ([.!?]) — C4 drops
                           pages with fewer than 3 sentences
    - ``ends_terminal``    document ends in . ! ? or closing quote
    - ``has_lorem``        contains "lorem ipsum" (template residue)
    - ``has_brace``        contains "{" (code residue)
    - ``has_javascript``   contains the word "javascript" (boilerplate)
    - ``bad_word_hits``    occurrences from the blocklist (stand-in list;
                           deployments swap in the real "List of Dirty,
                           Naughty …" file)
    - ``passes``           composite: ≥3 sentences, no lorem/brace/
                           javascript/bad-word hits

    Same execution posture as gopher_rules: pure column expressions,
    scan-stage only, zero shuffles, zero Python at any scale. The two
    suites compose — C4 catches markup/boilerplate residue, Gopher
    catches statistical degeneracy."""
    low = F.lower(F.col(text_col))
    n_sent = F.regexp_count(low, F.lit(r"[.!?]")).cast("long")
    has_lorem = low.contains("lorem ipsum")
    has_brace = low.contains("{")
    has_js = low.rlike(r"\bjavascript\b")
    bad_hits = marker_hits(low, C4_BAD_WORDS).cast("long")
    ends_term = low.rlike(r"""[.!?]["']?\s*$""")
    passes = (
        (n_sent >= 3) & ~has_lorem & ~has_brace & ~has_js & (bad_hits == 0)
    )
    return df.select(
        F.col(id_col),
        n_sent.alias("n_sentences"),
        ends_term.alias("ends_terminal"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        has_js.alias("has_javascript"),
        bad_hits.alias("bad_word_hits"),
        passes.alias("passes"),
    )


def seeded_shuffle(
    df: DataFrame, seed: int, id_col: str = "doc_id", out: str = "shuffle_rank"
) -> DataFrame:
    """Deterministic global corpus shuffle — the epoch-reshuffle every
    pre-training run needs: rank rows by ``md5(seed || '|' || id)`` so the
    permutation is (a) uniform, (b) reproducible across engines and runs
    (md5, not engine-local xxhash64 — the DuckDB oracle derives the
    IDENTICAL permutation), (c) different per seed.

    Distributed two-phase rank — a naive ``row_number() OVER (ORDER BY
    key)`` plans an Exchange SinglePartition (one reducer ranks the whole
    corpus; dead at 100 TB). Instead: the first 2 hex chars of the key bin
    rows 256 ways (md5-uniform, and the bin is a PREFIX of the sort key so
    per-bin order concatenates to the global order); one hash shuffle
    computes per-bin local ranks in parallel; bin row-counts (a map-side-
    combined 256-row aggregate) cumsum into bin offsets (256-row driver-
    scale window) and broadcast-join back. global = offset + local,
    exactly row_number by (key, id)."""
    key = F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string")))
    b = df.withColumn("__k", key).withColumn("__bin", F.substring("__k", 1, 2))
    local = F.row_number().over(
        Window.partitionBy("__bin").orderBy("__k", F.col(id_col))
    )
    counts = b.groupBy("__bin").agg(F.count(F.lit(1)).cast("long").alias("__n"))
    # This unpartitioned window is what emits Spark's "Moving all data to a
    # single partition" warning in bench logs — BENIGN here by construction:
    # it runs over the 256-row bin-count aggregate (one row per 2-hex-char
    # bin), never over data-scale rows. The data-scale ranking above is the
    # per-bin partitioned window; plan-asserted in tests/test_plans.py.
    offs = counts.select(
        "__bin",
        F.coalesce(
            F.sum("__n").over(
                Window.orderBy("__bin").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__off"),
    )
    return (
        b.withColumn("__local", local.cast("long"))
        .join(F.broadcast(offs), "__bin")
        .withColumn(out, (F.col("__off") + F.col("__local")).cast("long"))
        .drop("__k", "__bin", "__local", "__off")
    )


def shard_assignment(
    df: DataFrame,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
    out: str = "shard",
) -> DataFrame:
    """Deterministic shard assignment for training-data output files:
    ``shard = first 8 hex digits of md5(seed|id) mod n_shards`` — stable
    across runs/engines (same md5 contract as seeded_shuffle), uniform in
    expectation, and purely scan-stage (the actual write then
    ``repartition(out)`` + partitioned sink). Avoids both round-robin
    (order-dependent) and Spark-internal hash (engine-specific)."""
    key = F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string")))
    shard = F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_shards
    return df.withColumn(out, shard)


def ngram_lm_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref: DataFrame | None = None,
    k_smooth: float = 0.5,
    precision: int = 6,
) -> DataFrame:
    """Bigram-LM perplexity per document — the CCNet-style quality filter
    (Wenzek et al. 2020: docs are kept/bucketed by perplexity under a
    reference-corpus LM): train add-k-smoothed bigram counts on ``ref``
    (defaults to ``df`` itself), score every document as
    ``ppl = exp(−mean log P(w_i | w_{i−1}))`` with
    ``P(w2|w1) = (C(w1,w2)+k) / (C(w1)+k·V)``. Low ppl = reads like the
    reference; high ppl = boilerplate/garbled/off-domain. Documents with
    fewer than two tokens have no bigram events and are dropped.

    All relational, no Python: bigram pairs come from arrays_zip over two
    slices of the token array (args evaluated once — never the
    re-tokenizing slice-per-position lambda, cf. word_ngram_array);
    counts are two keyed partial+final aggregates on the vocabulary-sized
    relations; scoring is a LEFT join of doc bigrams onto the count
    tables (unseen bigram → k mass; unseen context → uniform 1/V) and one
    doc-keyed aggregate. Four linear keyed shuffles total, no broadcast
    of anything vocabulary-sized."""
    ref = df if ref is None else ref

    def bigrams(frame: DataFrame, *extra):
        t = tokens(text_col)
        n1 = F.greatest(F.size(t) - 1, F.lit(0))
        pairs = F.arrays_zip(
            F.slice(t, 1, n1).alias("w1"), F.slice(t, 2, n1).alias("w2")
        )
        return frame.select(*extra, F.explode(pairs).alias("__pr")).select(
            *extra, F.col("__pr.w1").alias("__w1"), F.col("__pr.w2").alias("__w2")
        )

    b = bigrams(ref).groupBy("__w1", "__w2").agg(
        F.count(F.lit(1)).cast("double").alias("__cb")
    )
    c = b.groupBy("__w1").agg(F.sum("__cb").alias("__cw"))
    v = (
        ref.select(F.explode(tokens(text_col)).alias("__tok"))
        .agg(F.countDistinct("__tok").cast("double").alias("__v"))
    )
    d = bigrams(df, id_col)
    p = (
        F.coalesce(F.col("__cb"), F.lit(0.0)) + F.lit(float(k_smooth))
    ) / (
        F.coalesce(F.col("__cw"), F.lit(0.0)) + F.lit(float(k_smooth)) * F.col("__v")
    )
    return (
        d.join(b, ["__w1", "__w2"], "left")
        .join(c, "__w1", "left")
        .crossJoin(F.broadcast(v))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.exp(-F.avg(F.log(p))), precision).alias("ppl"),
        )
    )


def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    out: str = "norm_text",
    form: str = "NFC",
    lower: bool = True,
    strip_accents_out: str | None = None,
) -> DataFrame:
    """Unicode canonicalization — the first pass of any multilingual corpus
    pipeline: bring text to a canonical normalization ``form`` (NFC by
    default, so visually-identical decomposed/composed sequences compare
    and hash equal — dedup and fingerprinting are wrong without it),
    optionally casefold, and optionally emit an accent-stripped column
    (NFD → drop combining marks, the matching/blocking key for fuzzy
    joins across diacritic conventions).

    Spark has no built-in UAX#15 normalizer, so this is a genuine
    Arrow-batch Pandas UDF case (ArrowEvalPython — vectorized batches, not
    the forbidden row-at-a-time BatchEvalPython): unicodedata implements
    the same Unicode normalization algorithm DuckDB's nfc_normalize /
    strip_accents do, which is what the oracle replays. Scan-stage: no
    shuffle, composes with every downstream filter in the same stage."""

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata  # noqa: PLC0415

        r = s.map(
            lambda v: unicodedata.normalize(form, v) if v is not None else None
        )
        return r.str.lower() if lower else r

    res = df.withColumn(out, _norm(F.col(text_col)))
    if strip_accents_out:

        @F.pandas_udf("string")
        def _strip(s: pd.Series) -> pd.Series:
            import unicodedata  # noqa: PLC0415

            def fold(v):
                if v is None:
                    return None
                return "".join(
                    c
                    for c in unicodedata.normalize("NFD", v)
                    if not unicodedata.combining(c)
                )

            return s.map(fold)

        res = res.withColumn(strip_accents_out, _strip(F.col(out)))
    return res


def token_kl_by_group(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    precision: int = 6,
) -> DataFrame:
    """Per-group unigram KL divergence vs the whole corpus — the
    distribution-shift lens on a training mix: KL(source ‖ corpus) ≈ 0
    means the source reads like the blend; a large value flags a source
    whose vocabulary the mix under-represents (the quantity DSIR/DoReMi
    importance weights are built from).

    KL(p‖q) = Σ_t p(t)·ln(p(t)/q(t)) with p the group's unigram
    distribution and q the corpus's. Every group token is in the corpus by
    construction, so q(t) > 0 wherever p(t) > 0 and the sum is finite.

    Scale shape: explode → ONE (group, token)-keyed partial+final
    aggregate (map-side combine collapses each partition to its distinct
    pairs); everything after runs on the VOCABULARY-sized count relation,
    never the corpus — global token mass re-aggregates from the pair
    counts (no second scan), joins back keyed on token, and the final
    per-group sum is a |G|-row aggregate."""
    tok = df.select(
        F.col(group_col), F.explode(tokens(text_col)).alias("token")
    )
    st = tok.groupBy(group_col, "token").agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    s = st.groupBy(group_col).agg(F.sum("__c").alias("__n"))
    g = st.groupBy("token").agg(F.sum("__c").alias("__gc"))
    tot = g.agg(F.sum("__gc").alias("__gn"))
    p = F.col("__c") / F.col("__n")
    q = F.col("__gc") / F.col("__gn")
    return (
        st.join(F.broadcast(s), group_col)
        .join(g, "token")
        .crossJoin(F.broadcast(tot))
        .groupBy(group_col, "__n")
        .agg(F.round(F.sum(p * F.log(p / q)), precision).alias("kl_vs_corpus"))
        .select(
            F.col(group_col),
            F.col("__n").cast("long").alias("n_tokens"),
            "kl_vs_corpus",
        )
    )


def domain_cap(
    df: DataFrame,
    cap: int,
    domain_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    out: str = "domain_rank",
) -> DataFrame:
    """Per-domain document cap — the standard crawl-curation guard against
    a single domain dominating the training mix (RefinedWeb / FineWeb keep
    at most N pages per registered domain): keep the top ``cap`` documents
    of each ``domain_col`` group ranked by ``order_col`` descending (a
    quality proxy — length, model score, ...), deterministic ``id_col``
    ascending tiebreak.

    Scale shape: ONE hash shuffle on the domain key; each domain ranks
    inside its window partition (sort spills to disk for pathological
    mega-domains, and AQE skew-split does not apply to windows — for a
    known-degenerate domain, pre-filter with an approximate per-domain
    quality threshold first, then rank the survivors). No driver state,
    no collect; the rank column is retained so downstream audits can see
    how close each kept document sat to the cut."""
    w = Window.partitionBy(domain_col).orderBy(
        F.col(order_col).desc(), F.col(id_col)
    )
    return (
        df.withColumn(out, F.row_number().over(w).cast("long"))
        .filter(F.col(out) <= cap)
    )


def quality_top_fraction(
    df: DataFrame,
    frac: float,
    group_col: str = "source",
    order_col: str = "n_chars",
    threshold_out: str = "cut_threshold",
) -> DataFrame:
    """Keep each group's top ``frac`` of rows by a quality score — the
    percentile twin of domain_cap ("top quartile per source", not "top N
    per source"): rows at or above their group's exact (1−frac) quantile
    survive, the applied threshold carried alongside for audits.

    Scale shape: one keyed exact-percentile aggregate to a |G|-row
    threshold frame, broadcast-joined back onto the scan, filter inline —
    the fact shuffles ZERO times (same shape as normalize_features).
    Exact percentile is scale-safe for bounded-cardinality scores; swap
    approx_percentile for unbounded doubles at 100 TB."""
    p = 1.0 - frac
    thr = df.groupBy(group_col).agg(
        F.expr(f"percentile({order_col}, {p})").alias(threshold_out)
    )
    return (
        df.join(F.broadcast(thr), group_col)
        .filter(F.col(order_col).cast("double") >= F.col(threshold_out))
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out: str = "compression_ratio",
    level: int = 6,
) -> DataFrame:
    """zlib compression ratio per document — the Gopher/Dolma redundancy
    signal (compressed_bytes / raw_bytes): boilerplate and repeated spans
    compress far below ~0.4, high-entropy garbage sits near 1.0; both
    tails are cut in production curation. A DEFLATE pass is genuinely not
    expressible relationally, so this is an Arrow-batch Pandas UDF
    (ArrowEvalPython — scan-stage, no shuffle); the level is pinned so the
    statistic is reproducible run-to-run. Empty/null text → null ratio
    (no bytes to measure), never a division error."""

    @F.pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        import zlib  # noqa: PLC0415

        def r(v):
            if not v:
                return None
            raw = v.encode("utf-8")
            return len(zlib.compress(raw, level)) / len(raw)

        return s.map(r)

    return df.withColumn(out, F.round(_ratio(F.col(text_col)), 6))


def budget_sample(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget mixture sampling: per ``group_col`` stratum, take
    documents in a deterministic pseudo-random order until the stratum's
    cumulative token count reaches ``budget`` — how a training mix caps
    each source's contribution ("no more than N tokens of source X").

    Order is a Knuth multiplicative hash of the id (expressible identically
    in any SQL engine — the DuckDB oracle replays it verbatim, unlike
    xxhash64), so the sample is reproducible across runs AND engines, and
    adding new docs to a stratum perturbs only the tail near the budget
    boundary, not the whole sample (hash order is stable under inserts —
    the reservoir-stability property a re-runnable pipeline needs).

    Scale shape: ONE window aggregation partitioned by stratum (running
    sum over hash order). Strata are the unit of parallelism; a stratum's
    rows must sort within its partition, which is exactly Spark's window
    exchange — no driver-side state, no collect."""
    h = F.pmod(F.col(id_col) * F.lit(2654435761), F.lit(4294967296))
    w = (
        Window.partitionBy(group_col)
        .orderBy(h, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = token_count(text_col).cast("long")
    return (
        df.select(
            F.col(group_col),
            F.col(id_col),
            n_tok.alias("n_tokens"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget)
    )


def temperature_resample(
    df: DataFrame,
    total_budget: int,
    tau: float = 0.5,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled mixture resampling — the data-mixing step of
    multilingual/multi-source training recipes (Conneau & Lample 2019
    §3.1; mT5, BLOOM): stratum ``g`` receives a share of ``total_budget``
    proportional to ``n_g^tau``. ``tau=1`` keeps natural proportions,
    ``tau=0`` is uniform across strata, and the customary ``tau≈0.3-0.7``
    up-weights small strata (low-resource languages / rare sources)
    without letting any single stratum dominate. Down-sampling only
    (budgets clamp at ``n_g``): up-sampling is a training-loader concern
    (epoch repetition), not a corpus materialization one.

    Selection within a stratum orders by the same Knuth multiplicative
    hash as :func:`budget_sample` — engine-portable (the DuckDB oracle
    replays it verbatim) and insert-stable. ``tau=0.5`` computes the
    weight via sqrt, the one power IEEE 754 requires correctly rounded,
    so the per-stratum budget floors land identically across engines;
    other ``tau`` go through ``pow`` (last-ulp engine variance possible
    exactly at a floor boundary — harmless for mixing, noted for oracle
    authors).

    Scale shape: one stratum-keyed count (map-side combined, |strata|
    rows), the budget table broadcast back, ONE window rank per stratum —
    the same single exchange budget_sample pays. No driver state."""
    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    wcol = (
        F.sqrt(F.col("__n"))
        if float(tau) == 0.5
        else F.pow(F.col("__n"), F.lit(float(tau)))
    )
    weights = counts.select(group_col, "__n", wcol.alias("__w"))
    tot = weights.agg(F.sum("__w").alias("__tw"))
    budgets = weights.crossJoin(F.broadcast(tot)).select(
        group_col,
        F.least(
            F.col("__n"),
            F.floor(F.lit(int(total_budget)) * F.col("__w") / F.col("__tw")).cast(
                "double"
            ),
        )
        .cast("long")
        .alias("__budget"),
    )
    h = F.pmod(F.col(id_col) * F.lit(2654435761), F.lit(4294967296))
    rank = F.row_number().over(
        Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    )
    return (
        df.withColumn("__r", rank)
        .join(F.broadcast(budgets), group_col)
        .filter(F.col("__r") <= F.col("__budget"))
        .drop("__r", "__budget")
    )


def dsir_log_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
    score every document by its log importance weight
    ``log p_target(doc) − log q_raw(doc)`` under bag-of-unigram language
    models with add-one smoothing — the standard cheap way to select raw
    web data that "looks like" a high-quality target corpus. ``target`` is
    a boolean Column marking the target subset within ``df``; documents
    whose vocabulary leans toward the target score high and are kept by a
    top-k / thresholded resample downstream.

    DSIR proper hashes n-grams into a fixed bucket space; explicit unigrams
    keep the statistic engine-portable (the DuckDB oracle replays it
    exactly) and the scale shape identical: ONE token-keyed aggregation
    builds both corpus histograms in a single pass (count + conditional
    count, map-side combined), the 3 scalars broadcast, and the per-doc
    score is one join of the exploded corpus against the vocabulary-sized
    ratio table + one doc-keyed sum — every stage partial-aggregated, no
    Python, no driver state. Swap the unigram key for
    ``xxhash64(gram) % B`` to get hashed-DSIR when vocabulary size (not
    portability) is the constraint.

    Add-one smoothing over the RAW vocabulary keeps every corpus token
    scoreable (target-unseen tokens get mass 1/(N_target+V), pulling the
    weight down — exactly the penalty DSIR wants for off-target text).
    """
    # NOT spread (r13 A/B): the token histogram aggregates on a GLOBAL key,
    # so fanning a small single-split scan across all cores multiplies the
    # map-side partial-agg output by the partition count (32 × vocab rows
    # into the shuffle instead of 1 × vocab) — measured 0.55 s → 0.75 s at
    # sf0.1. At scale the input arrives multi-split and the partial-agg
    # blowup is already priced in; nothing to fix here.
    tok = df.select(
        F.col(id_col),
        target.alias("__is_t"),
        F.explode(tokens(text_col)).alias("token"),
    )
    return _dsir_score(tok, id_col)


def dsir_log_weights_hashed(
    df: DataFrame,
    target: Column,
    n_buckets: int = 1 << 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashed-feature DSIR — the Xie et al. 2023 shape proper: tokens map
    to ``xxhash64(token) % n_buckets``, bounding the histogram/ratio table
    at ``n_buckets`` rows no matter how large the vocabulary grows (the
    hashing trick). Collisions merge token statistics — harmless smoothing
    at DSIR's operating point; with ``n_buckets`` well above the vocabulary
    the weights equal :func:`dsir_log_weights` exactly (pinned in tests).
    Use this form at corpus scale: the explicit-unigram variant's ratio
    table is vocabulary-sized, this one is a constant-sized broadcast."""
    tok = df.select(
        F.col(id_col),
        target.alias("__is_t"),
        F.explode(tokens(text_col)).alias("__tok"),
    ).select(
        id_col,
        "__is_t",
        F.pmod(F.xxhash64("__tok"), F.lit(int(n_buckets))).alias("token"),
    )
    return _dsir_score(tok, id_col)


def _dsir_score(tok: DataFrame, id_col: str) -> DataFrame:
    """Shared DSIR core over (id, __is_t, token-key) rows: one keyed
    double-histogram aggregation (count + conditional count, map-side
    combined), a broadcast of the 3 scalars, a key join, a doc-keyed sum."""
    counts = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("q_c"),
        F.count_if(F.col("__is_t")).cast("double").alias("p_c"),
    )
    scalars = counts.select(
        F.sum("q_c").alias("nq"),
        F.sum("p_c").alias("np"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    ratio = counts.crossJoin(F.broadcast(scalars)).select(
        "token",
        (
            F.log((F.col("p_c") + 1) / (F.col("np") + F.col("v")))
            - F.log((F.col("q_c") + 1) / (F.col("nq") + F.col("v")))
        ).alias("lr"),
    )
    return (
        tok.join(ratio, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.sum("lr"), 6).alias("log_iw"),
        )
    )


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination by word n-gram overlap (the GPT-3 appendix
    C / Dolma shape): a corpus document is contaminated when it shares at
    least one length-``n`` word n-gram with any benchmark document. Returns
    (id_col, n_shared) for contaminated docs only, where ``n_shared`` counts
    the corpus doc's DISTINCT n-grams that appear anywhere in the benchmark.

    Scale shape: benchmark suites are small by definition → their distinct
    gram set broadcasts; the corpus explodes its per-doc distinct grams and
    joins JVM-side on ``xxhash64(gram)`` (8-byte keys instead of ~8·n-char
    strings — smaller broadcast map, cheaper probe; a 64-bit collision would
    need ~4 B distinct grams to matter). One broadcast join + one doc-keyed
    count with map-side combine; the corpus is read exactly once."""
    def grams(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_ngram_array(tokens(text_col), n))
            ).alias("gram"),
        ).select(id_col, F.xxhash64("gram").alias("gram_h"))

    bench_set = grams(benchmark).select("gram_h").distinct()
    return (
        grams(corpus)
        .join(F.broadcast(bench_set), "gram_h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def lexical_diversity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document lexical-diversity signals: token count, type count
    (distinct tokens), type-token ratio, and hapax ratio (share of types
    occurring exactly once) — the classic cheap filters for template spam
    (TTR → 0) and gibberish (TTR → 1 with high hapax share) in a pretrain
    corpus. Computed as explode → (doc, token) count → per-doc re-agg:
    two partial-aggregated shuffles on the doc key, linear in corpus
    tokens — never the O(tokens²) per-row array-lambda form (a
    higher-order filter-inside-filter re-scans the token array per
    distinct type). Ratios are NULL on empty docs, not 0."""
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__t"))
    counts = tok.groupBy(id_col, "__t").agg(F.count(F.lit(1)).alias("__c"))
    return counts.groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.round(
            F.count(F.lit(1)) / F.when(F.sum("__c") > 0, F.sum("__c")), 6
        ).alias("ttr"),
        F.round(
            F.sum(F.when(F.col("__c") == 1, 1).otherwise(0))
            / F.when(F.count(F.lit(1)) > 0, F.count(F.lit(1))),
            6,
        ).alias("hapax_ratio"),
    )


def segment_dedup(
    df: DataFrame,
    segment_words: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level segment dedup (the RefinedWeb/C4 paragraph-dedup shape,
    over fixed ``segment_words``-word windows since this corpus has no
    newline structure): every document is cut into consecutive word
    segments, each segment keeps only its FIRST corpus occurrence
    (ordered by (doc_id, segment index) — deterministic, engine-
    portable), and documents are reassembled from their surviving
    segments. Returns (doc_id, text_kept, n_segments, n_kept);
    ``text_kept`` is NULL when every segment of a doc was seen earlier.

    Scale shape: the token array is materialized ONCE per row in a
    projection before the chunking ``transform`` references it (a lambda
    over the raw tokenizer expression would re-tokenize per segment —
    the word_ngram_array lesson), segments explode to (doc, idx, seg),
    first-occurrence is one row_number window shuffled on the segment
    text, and the doc rebuild is one shuffle back on the doc key. Linear
    in corpus tokens; the duplicated-segment key distribution is exactly
    what LSH dedup already shuffles, so skew behavior is no worse."""
    w = segment_words
    tokd = df.select(F.col(id_col), tokens(text_col).alias("__tok"))
    n_chunks = F.ceil(F.size("__tok") / F.lit(w)).cast("int")
    segs = tokd.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda c: F.array_join(
                    F.slice(F.col("__tok"), c * w + 1, w), " "
                ),
            )
        ).alias("idx", "seg"),
    )
    first = F.row_number().over(
        Window.partitionBy("seg").orderBy(F.col(id_col), F.col("idx"))
    )
    ranked = segs.withColumn("__rn", first)
    kept = F.array_sort(
        F.collect_list(
            F.when(F.col("__rn") == 1, F.struct(F.col("idx"), F.col("seg")))
        )
    )
    return ranked.groupBy(id_col).agg(
        F.when(
            F.size(kept) > 0,
            F.array_join(F.transform(kept, lambda s: s["seg"]), " "),
        ).alias("text_kept"),
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum(F.when(F.col("__rn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
    )


def zipf_profile(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    precision: int = 4,
) -> DataFrame:
    """Zipf-law fit per group: OLS slope of ln(freq) on ln(rank) over the
    group's token frequency table → (group, n_types, n_tokens,
    zipf_alpha) with alpha = −slope. Natural corpora sit near alpha ≈ 1;
    template/boilerplate-heavy sources flatten (alpha ≪ 1, many
    same-frequency types) and spam with a few hammered tokens steepen —
    a one-number per-source health signal for a pretrain mix.

    Closed-form least squares, no iteration: token counts are one
    (group, token) partial-aggregated shuffle, ranks one window over the
    group's VOCABULARY (never the corpus rows), the five OLS sums one
    tiny re-agg. Rank ties break on the token string, so the fit is
    deterministic on any engine."""
    tok = df.select(F.col(group_col), F.explode(tokens(text_col)).alias("__t"))
    freq = tok.groupBy(group_col, "__t").agg(F.count(F.lit(1)).alias("__f"))
    w = Window.partitionBy(group_col).orderBy(F.col("__f").desc(), F.col("__t"))
    ranked = freq.select(
        F.col(group_col),
        F.col("__f"),
        F.log(F.row_number().over(w).cast("double")).alias("__x"),
        F.log(F.col("__f").cast("double")).alias("__y"),
    )
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("__x"), F.sum("__y")
    sxx, sxy = F.sum(F.col("__x") * F.col("__x")), F.sum(F.col("__x") * F.col("__y"))
    slope = (sxy - sx * sy / n) / F.when((sxx - sx * sx / n) > 0, sxx - sx * sx / n)
    return ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("__f").cast("long").alias("n_tokens"),
        F.round(-slope, precision).alias("zipf_alpha"),
    )


def vocab_coverage(
    df: DataFrame,
    vocab_sizes: list[int],
    text_col: str = "text",
    precision: int = 6,
) -> DataFrame:
    """Tokenizer-sizing curve: for each candidate vocabulary size V, the
    fraction of corpus TOKEN OCCURRENCES covered by the V most frequent
    types (the number you trade against embedding-table memory when
    sizing a vocab; the complement is the OOV/byte-fallback rate).

    Scale shape — no global rank over the vocabulary: token counts
    aggregate once (corpus → |vocab| rows), then collapse to the DISTINCT
    FREQUENCY spectrum (f, types_at_f, tokens_at_f) — Zipf keeps that
    O(√total) — and one tiny window over the spectrum yields cumulative
    types/tokens in descending-f order. Coverage at V reads the band
    where cumulative types crosses V: tokens above the band plus
    (V − types_above)·f. Within a frequency band every type contributes
    the same f, so coverage is TIE-INVARIANT — no token ordering enters
    the result, which is what makes it engine-portable."""
    tok = df.select(F.explode(tokens(text_col)).alias("__t"))
    freq = tok.groupBy("__t").agg(F.count(F.lit(1)).alias("__f"))
    spec = freq.groupBy("__f").agg(
        F.count(F.lit(1)).alias("__types"),
        (F.count(F.lit(1)) * F.col("__f")).alias("__toks"),
    )
    w = Window.orderBy(F.col("__f").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = spec.select(
        "__f",
        "__types",
        F.coalesce(F.sum("__types").over(w), F.lit(0)).alias("__types_above"),
        F.coalesce(F.sum("__toks").over(w), F.lit(0)).alias("__toks_above"),
    )
    totals = spec.agg(
        F.sum("__toks").cast("long").alias("__total"),
        F.sum("__types").cast("long").alias("n_types"),
    )
    rows = []
    for v in vocab_sizes:
        band = (
            cum.filter(
                (F.col("__types_above") < v)
                & (F.col("__types_above") + F.col("__types") >= v)
            )
            .select(
                (
                    F.col("__toks_above")
                    + (F.lit(v) - F.col("__types_above")) * F.col("__f")
                ).alias("__cov")
            )
        )
        # V beyond the whole vocabulary: every band has types_above+types
        # < V, the filter matches nothing -> full coverage.
        cov = band.agg(F.sum("__cov").alias("__cov"))
        rows.append(
            totals.crossJoin(F.broadcast(cov)).select(
                F.lit(v).cast("long").alias("vocab_size"),
                "n_types",
                F.coalesce(F.col("__cov"), F.col("__total"))
                .cast("long")
                .alias("n_covered"),
                F.col("__total").alias("n_tokens"),
                F.round(
                    F.coalesce(F.col("__cov"), F.col("__total"))
                    / F.col("__total"),
                    precision,
                ).alias("coverage"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def batch_padding_stats(
    df: DataFrame,
    bucket_width: int,
    text_col: str = "text",
    precision: int = 6,
) -> DataFrame:
    """Length-bucket batching audit: group documents into token-length
    buckets of ``bucket_width`` and report, per bucket, the padding waste
    if each bucket batches to its own max length — the number that tells
    you whether length-bucketed batching is worth the shuffle vs padding
    everything to global max (sum the buckets' pad_tokens vs the global
    single-bucket run). Pure scan-stage bucketing + one partial-
    aggregated shuffle on the tiny bucket key; padding arithmetic is
    exact integers."""
    n = token_count(text_col)
    b = F.floor(n / F.lit(bucket_width)).cast("long")
    base = df.select(n.alias("__n"), b.alias("bucket"))
    return base.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max("__n").cast("long").alias("max_len"),
        F.sum("__n").cast("long").alias("n_tokens"),
        (F.count(F.lit(1)) * F.max("__n") - F.sum("__n"))
        .cast("long")
        .alias("pad_tokens"),
        F.round(
            (F.count(F.lit(1)) * F.max("__n") - F.sum("__n"))
            / (F.count(F.lit(1)) * F.max("__n")),
            precision,
        ).alias("pad_fraction"),
    )


def canonicalize_url(url) -> Column:
    """Canonical form of a URL for dedup/crawl-frontier keys — the
    normalization every web-corpus pipeline needs before URL-level dedup
    (mirrors of one page differ only in case, default ports, tracking
    params, fragments, and trailing slashes):

    - scheme and host LOWERCASE; default ports stripped (http:80,
      https:443);
    - fragment dropped entirely (client-side only);
    - tracking query params removed (utm_*, gclid, fbclid, ref) and the
      survivors SORTED (param order is transport noise), '?' dropped
      when none survive;
    - trailing slashes trimmed from non-root paths (the root path keeps
      its single '/').

    Pure Column expressions (regexp + higher-order array functions —
    JVM-side, zero Python), chosen so the IDENTICAL logic is expressible
    in ANSI/DuckDB SQL for the oracle: regexp_extract group semantics,
    starts_with, list filter/sort/join all agree across engines."""
    u = F.col(url) if isinstance(url, str) else url
    base = F.regexp_replace(u, "#.*", "")
    scheme = F.lower(F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(base, r"^[^:/?]+://([^/?]+)", 1))
    host = (
        F.when(
            (scheme == "http") & hostport.endswith(":80"),
            F.regexp_replace(hostport, ":80$", ""),
        )
        .when(
            (scheme == "https") & hostport.endswith(":443"),
            F.regexp_replace(hostport, ":443$", ""),
        )
        .otherwise(hostport)
    )
    path = F.regexp_extract(base, r"^[^:/?]+://[^/?]*(/[^?]*)?", 1)
    path_c = F.when(
        F.regexp_replace(path, "/+$", "") == "", F.lit("/")
    ).otherwise(F.regexp_replace(path, "/+$", ""))
    query = F.regexp_extract(base, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.startswith("utm_")
            & ~p.startswith("gclid=")
            & ~p.startswith("fbclid=")
            & ~p.startswith("ref="),
        )
    )
    qs = F.array_join(kept, "&")
    suffix = F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs))
    return F.concat(scheme, F.lit("://"), host, path_c, suffix)
