"""Regenerate PLANS.md: formatted physical plans of the headline queries
with review commentary. Run: ``python -m datalake_brief_spark.plans.snapshot``.
"""

from __future__ import annotations

import os

from datalake_brief_spark import get_spark
from datalake_brief_spark.plans import formatted_plan
from datalake_brief_spark.queries import headline_queries

COMMENT = {
    "text_bm25": (
        "ONE tokenization (r13): per-term tf and doc length are scan-stage "
        "array expressions projected to a few ints per doc, and that narrow "
        "frame flows through one doc-keyed exchange which BOTH consumers "
        "read (AQE ReusedExchange) — the global stats agg (N/avgdl/df, "
        "broadcast back) and the scoring pass. The match filter is the "
        "equivalent raw score > 0, which references the broadcast stats "
        "side and so cannot be pushed below the shared exchange (the r12 "
        "shape paid a second full tokenize scan plus a third, serial, "
        "scan-side tokenizer eval for the pushed matched>0 filter). "
        "TakeOrderedAndProject for the top-20 — no total sort, no explode."
    ),
    "dedup_segments_corpus": (
        "One Generate (posexplode of the chunk transform) over a scan that "
        "materializes the token array ONCE, a single window exchange on the "
        "segment text for first-occurrence, one shuffle back on the doc key "
        "for reassembly — pure JVM end to end (no EvalPython node). At "
        "100 TB both exchanges key on values the dedup itself defines, so "
        "skew follows duplicate density exactly like the LSH band joins."
    ),
    "q1_pricing_summary": (
        "One scan, shipdate filter in PushedFilters, 7-column ReadSchema (of 11), "
        "partial+final HashAggregate around a single exchange."
    ),
    "join_dim_chain": (
        "Both dimension joins are BroadcastHashJoin; the only Exchange is the "
        "final group-by shuffle."
    ),
    "join_fact_revenue": (
        "Fact-fact equi-join shuffles both sides on the order key; AQE handles "
        "coalescing/skew at runtime."
    ),
    "q3_shipping_priority": (
        "Both date filters pushed to their scans; the segment-filtered "
        "customer side is scale-proportional, so orders-customer is DECLARED "
        "a shuffle join and AQE elects the runtime broadcast at gate scale "
        "(asserted on the adaptive final plan in test_plans.py); "
        "TakeOrderedAndProject for the top-10 (no total sort)."
    ),
    "q5_nation_revenue": (
        "Nation and region (fixed dims) broadcast into supplier; the "
        "scale-proportional ASIA-supplier side is declared a shuffle join "
        "(a forced broadcast would fail at 100 TB where it is ~3 GB+), so "
        "the static plan honestly carries the lineitem shuffle write and "
        "AQE re-elects the broadcast at gate scale."
    ),
    "topk_per_group": "Single exchange on the partition key; window row_number + rank filter.",
    "txlog_pruned_read": (
        "Lakehouse range read: the file list is resolved from the commit "
        "log's per-file stats BEFORE the plan exists, so the scan node "
        "carries only the overlapping files (see the file-skipping section "
        "below) and the residual BETWEEN filter is pushed to it; "
        "partial+final aggregate, one exchange."
    ),
    "txlog_delete_dv": (
        "Merge-on-read through live deletion vectors: the DV union (tiny, "
        "bounded by deleted rows) broadcasts into a left-anti "
        "BroadcastHashJoin against the data scan keyed on "
        "(file name, row_index) — no data file was rewritten by the "
        "delete, and the anti-join cost tracks the DELETED rows; above "
        "DV_BROADCAST_MAX_ROWS positions the guard flips to a shuffle "
        "anti-join (measured crossover in BASELINE.md r8)."
    ),
    "txlog_update_dv": (
        "DV UPDATE read = the delete_dv MOR plan plus the appended "
        "rewritten-rows file group in the same scan; one aggregate "
        "exchange on top. The update itself cost one sidecar + the "
        "matched rows — this read is the steady-state consumer view."
    ),
    "events_hourly": "Scan-stage date_trunc, partial+final aggregate, one shuffle.",
    "dedup_ngram_jaccard": (
        "Shingles hashed to int64 in the scan stage; candidates come from the "
        "MinHash-LSH band equi-join on (band_idx, band_hash, source) — linear "
        "in candidates, never quadratic in a block — exact Jaccard verifies "
        "candidates only. Minima+banding are ONE Arrow pass (minhash_band_udf) "
        "and the band explode is posexplode_outer so InferFiltersFromGenerate "
        "cannot clone the UDF into a pre-exchange filter; at runtime AQE reads "
        "both join sides from one ReusedExchange, so the signature computes "
        "once."
    ),
    "dedup_minhash": (
        "JVM xxhash shingle pass, one fused Arrow pass for the 128 minima AND "
        "the band hashes (ArrowEvalPython), posexplode_outer band explode, "
        "equi-join on (band, hash) over a ReusedExchange, exact verification "
        "of candidates only."
    ),
    "dedup_simhash": (
        "Token hashing is JVM xxhash64 in the scan stage; the 64-bit bit-vote "
        "is one Arrow pass; Manku multi-block keys (C(6,3)=20 combos, ≥32 "
        "matched bits per key) propose candidates via a bucketed equi-join — "
        "random collisions n²/2^32, measured ~linear at 8× corpus — and "
        "hamming64 verifies."
    ),
    "multimodal_features": (
        "Two chained MapInPandas nodes directly over the scan — encode real "
        ".bmp payloads, decode + reduce to typed stats — ZERO exchanges: the "
        "binary payloads never shuffle, Python sees whole Arrow batches, and "
        "the output is one row per doc. r13 audited a spread here and kept "
        "it OUT: with the vectorized code-point synth the BMP round trip is "
        "so cheap that 32-way Python fan-out loses to per-task overhead "
        "(0.33 s serial vs 1.31 s spread at sf0.1); the PNG twin, whose "
        "codec is heavy, keeps the spread. At 100 TB this is the shape a "
        "GPU/codec stage needs: per-partition batch processing with no "
        "payload movement."
    ),
    "corpus_seeded_shuffle": (
        "Distributed two-phase global rank: md5-prefix bins the corpus 256 "
        "ways (hashpartitioning(__bin), the only data-scale exchange), "
        "per-bin row_number ranks in parallel, and the 256-row bin-count "
        "cumsum (the sole SinglePartition exchange — metadata-sized) "
        "broadcast-joins offsets back. A naive global row_number would be "
        "one reducer over the whole corpus; plan-asserted against that "
        "regression in test_plans.py."
    ),
    "text_pii_redact": (
        "Per-row regexp detection/redaction over a spread raw projection "
        "(r13: one round-robin exchange, a no-op once the source is "
        "multi-split — 8 regex passes per row ran serially in the "
        "single-split scan task before; 0.49 s → 0.16 s at sf0.1). No "
        "keyed exchange, no Python."
    ),
    "knn_batch": (
        "25-query exact KNN via the matmul scale path: one MapInPandas node "
        "scores every query per Arrow batch of the single corpus scan and "
        "emits only per-batch top-k partials; the one Exchange is the global "
        "rank merge on query_id — shuffle volume k·|queries|·|batches|, "
        "never |corpus|·|queries| (both node counts plan-asserted). r13 "
        "audited a corpus spread and kept it OUT: fan-out shrinks every "
        "Arrow batch and the matmul amortization beats extra cores at "
        "bench scale (0.34 s vs 0.64 s)."
    ),
    "text_repetition": (
        "dup_word_frac is a per-row expression; the bigram mode is "
        "Generate (explode_OUTER + post-filter — a non-outer generate's "
        "inferred size()>0 filter would push below the r13 spread exchange "
        "and re-evaluate the ngram chain serially in the scan task) → "
        "partial+final count keyed on (doc, gram) → re-aggregate to per-doc "
        "max/sum; the join back to the per-doc row is a BroadcastHashJoin "
        "under AQE (shuffle join on doc_id at scale, both sides already "
        "doc-keyed). The doc-keyed aggregation keeps map-side combine "
        "effective under the spread (unlike the global-key DSIR histogram, "
        "which stays unspread for exactly that reason). 0.90 s → 0.59 s."
    ),
    "text_quality": (
        "Per-row expressions over a spread raw projection (r13 — see "
        "text_pii_redact; 0.35 s → 0.22 s at sf0.1). No keyed exchange, "
        "no Python."
    ),
    "knn_bruteforce": (
        "BroadcastNestedLoopJoin of 5 query vectors against the corpus scan "
        "(spread in r13 so the zip_with/aggregate cosine expressions run on "
        "every core for single-split sources; 0.40 s → 0.33 s); window "
        "top-k on query_id."
    ),
    "text_gopher_rules": (
        "The whole rule suite (word count, mean word length, symbol ratio, "
        "alpha fraction, stopword presence, composite flag) is per-row "
        "expressions over the token array — zero KEYED exchanges, zero "
        "Python; r13 adds the one round-robin spread of the raw (id, text) "
        "projection so the suite runs on every core for single-split "
        "sources (0.30 s → 0.16 s at sf0.1; a no-op at scale)."
    ),
    "dedup_repeated_spans": (
        "ExactSubstr-style span detection in four linear keyed passes: gram "
        "hashing is scan-stage JVM (zip_with n-gram chain + xxhash64, "
        "posexplode_outer so InferFiltersFromGenerate cannot clone the chain "
        "into a pre-filter); doc frequency is a partial+final HashAggregate "
        "keyed on the 64-bit gram hash; duplicated-gram membership is an "
        "equi-join on the same key (the dup side is the HAVING-filtered "
        "aggregate: broadcast while its stats stay small, AQE flips to a "
        "shuffle join as it grows). The gram chain computes once per join "
        "side deliberately: materializing it through a gram-keyed exchange "
        "measured slower, 2.2 s vs 1.5 s at sf0.1, than re-running the "
        "scan-stage expressions. Island-merging is one per-doc window plus "
        "a doc-keyed final aggregate. No Python node anywhere."
    ),
    "q2_min_cost_supplier": (
        "Correlated-min as aggregate + join-back, with the selective part "
        "band JOINED BELOW the cost aggregate (filter-through-aggregate: "
        "the band drops whole parts, never lines within one, so each "
        "surviving part's per-supplier min is unchanged and the aggregate "
        "input shrinks ~300×). nation/region broadcast; supplier shuffles "
        "(scale-proportional). The EU-cost relation feeds both the main "
        "branch and the per-part min; explicit not-null source filters "
        "keep the two subtrees canonically identical so AQE wires a "
        "runtime ReusedExchange instead of recomputing (asserted in "
        "test_plans.py)."
    ),
    "q8_market_share": (
        "Seven-table star: nation/region broadcast (fixed dims); "
        "part/supplier/customer/orders join their fact sides as declared "
        "shuffle joins (scale-proportional; AQE re-elects runtime "
        "broadcasts at gate scale). Numerator and denominator of the "
        "market share are conditional DECIMAL sums in ONE partial+final "
        "aggregate — one scan of lineitem, one 2-row result exchange, "
        "never two jobs for a ratio."
    ),
    "q21_waiting_suppliers": (
        "EXISTS → LeftSemi on (orderkey, suppkey≠) and NOT EXISTS → "
        "LeftAnti over the same late relation — never distinct+inner. "
        "Both self-join sides carry explicit merge hints: they are "
        "scale-proportional (full lineitem / the late quarter), and "
        "un-hinted the static planner broadcast them from compressed-"
        "file-size estimates — 22.9× wall at 8× data in "
        "tools/tpch_scale_check.py; hinted, the 8× point is ~linear at "
        "unchanged sf0.1 cost. The late relation is consumed twice; "
        "source-side not-null filters keep both branches' shuffle "
        "subtrees canonical so AQE reuses the l⋈o exchanges (without "
        "alignment the join recomputed: 7.4 s → 0.95 s at sf0.1). "
        "Top-20 is TakeOrderedAndProject with a unique tiebreak."
    ),
    "multimodal_png": (
        "Scan → spread (r13: one round-robin exchange so the codec runs on "
        "every core for single-split sources; no-op at scale) → "
        "MapInPandas(synthesize PNG payloads) → MapInPandas(decode: real "
        "zlib inflate + all five unfilters, stdlib-only) — no keyed "
        "exchange: binary payloads shuffle once as raw text bytes and "
        "never again, Python sees whole Arrow batches, one typed row "
        "leaves per image. r13 also vectorized the synth's code-point "
        "extraction and rewrote the unfilter loops (137 µs → 29 µs per "
        "image, byte-identical); net 1.59 s → 0.83 s at sf0.1. Still the "
        "shape a GPU/codec stage swap needs."
    ),
    "dsir_weights_hashed": (
        "The hashing-trick DSIR form — the 100 TB path: tokens key as "
        "xxhash64 % 65536, so the double histogram is a partial+final "
        "aggregate into a CONSTANT-size ratio table regardless of corpus "
        "vocabulary, the ratio table broadcasts (BuildLeft) into the "
        "exploded-token scan, and the per-doc score is one doc-keyed "
        "partial-aggregated sum. The BroadcastNestedLoopJoin is the 1-row "
        "totals scalar cross — benign. Raw-vocab twin: dsir_weights."
    ),
    "dsir_weights": (
        "One token-keyed aggregation builds BOTH corpus histograms in a "
        "single pass (count + conditional count, partial+final around one "
        "exchange); the 3 scalars ride a 1-row broadcast; the per-doc score "
        "is the exploded corpus joined against the vocabulary-sized ratio "
        "table plus one doc-keyed partial-aggregated sum. Swap the key for "
        "xxhash64 % B (dsir_log_weights_hashed) to bound the ratio table at "
        "corpus scale."
    ),
}

HEADER = """# PLANS — physical-plan audit of the headline queries

Generated with `.explain("formatted")` at sf0.01 (plan shapes are
scale-invariant; AQE adjusts partition counts at runtime). Each plan was
reviewed against the shape we want at 100 TB; the commentary states what
to look for. Regenerate: `python -m datalake_brief_spark.plans.snapshot`.
"""

MAX_LINES = 120


def lakehouse_section(spark, sf: str) -> list[str]:
    """txlog data skipping happens at PLAN BUILD (the log picks the file
    list), so the evidence is scan-file counts, not plan-node shapes."""
    from datalake_brief_spark import queries as q
    from datalake_brief_spark.sources import txlog

    lines = [
        "## Lakehouse reads (txlog file-skipping evidence)",
        "",
        "A txlog snapshot read plans over the log-resolved file list; data",
        "skipping therefore shows up as FEWER FILES IN THE SCAN rather than a",
        "different plan shape. `df.inputFiles()` at sf0.01, pruned vs the",
        "snapshot's full file count:",
        "",
    ]
    probes = [
        ("txlog_pruned_read", "pruned", "range [1, 1000] on the clustered key"),
        ("txlog_point_read", "bloom", "bloom point lookup on a scattered key"),
        ("txlog_null_skip", "nullskip", "IS NULL via per-file null counts"),
    ]
    for name, kind, what in probes:
        df = q.QUERIES[name].fn(spark, sf)
        scanned = len(df.inputFiles())
        path = q._LAKEHOUSE_TABLES[(kind, os.path.abspath(sf))]  # noqa: SLF001
        total = len(txlog.visible_files(path))
        lines.append(f"- `{name}` ({what}): scans **{scanned} / {total}** files")
    lines.append("")
    return lines


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.01")
    spark = get_spark("plans")
    lines = [HEADER]
    for name, fn in headline_queries().items():
        plan_lines = formatted_plan(fn(spark, sf)).splitlines()
        lines += [f"## {name}", "", COMMENT.get(name, ""), "", "```"]
        lines += plan_lines[:MAX_LINES]
        if len(plan_lines) > MAX_LINES:
            lines.append(f"... ({len(plan_lines) - MAX_LINES} more lines)")
        lines += ["```", ""]
    lines += lakehouse_section(spark, sf)
    with open(os.path.join(os.path.dirname(__file__), "..", "..", "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    spark.stop()


if __name__ == "__main__":
    main()
