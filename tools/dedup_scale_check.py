"""Second scale point for the dedup band's O(n) claims (VERDICT r3 #8).

Replicates the sf0.1 ``documents`` corpus 1×/2×/4×/8× (≈ sf0.8 at the top)
with per-replica word salting, so replicas of the same document are NOT
near-duplicates of each other — true-pair density stays constant while n
grows. If the MinHash-LSH candidate generator is linear as claimed, the
candidate-pair count and wall time grow ~proportionally with n; a quadratic
regression would show candidates growing ~n².

Usage::

    python tools/dedup_scale_check.py            # sf0.1 base, scales 1 2 4 8

Prints one line per scale: rows, LSH candidate pairs, verified dup pairs,
wall seconds for the full ngram_jaccard pipeline (noop count sink), then a
linearity summary. Results are recorded in BASELINE.md §r4.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datalake_brief_spark.catalog import load_table
from datalake_brief_spark.operators import dedup
from datalake_brief_spark.operators.dedup import (  # noqa: PLC2701
    _hashed_shingles,
    _lsh_candidate_pairs,
)
from datalake_brief_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]


def replicate(docs, factor: int):
    """factor salted copies: every word in replica j>0 gains a j-specific
    suffix on a deterministic half of the vocabulary, pushing cross-replica
    Jaccard far below any dedup threshold while keeping within-replica
    similarity structure identical to the base corpus."""
    parts = []
    for j in range(factor):
        if j == 0:
            parts.append(docs)
            continue
        salted = docs.select(
            (F.col("doc_id") + F.lit(j * 10_000_000)).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(
                        w,
                        F.when(
                            F.pmod(F.xxhash64(w, F.lit(j)), F.lit(2)) == 0,
                            F.lit(f"_{j}"),
                        ).otherwise(F.lit("")),
                    ),
                ),
                " ",
            ).alias("text"),
        )
        parts.append(salted)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replicate_full_salt(docs, factor: int):
    """factor copies with EVERY word suffixed per replica: no gram ever
    matches across replicas, so the duplicated-gram structure is exactly
    ``factor`` disjoint copies of the base corpus — the clean control for
    the repeated-spans linearity check (hits, spans, and covered tokens
    must all grow exactly ×factor if the pipeline is linear)."""
    parts = [docs]
    for j in range(1, factor):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(j * 10_000_000)).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(w, F.lit(f"_{j}")),
                    ),
                    " ",
                ).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def simhash_check(spark, base, scales) -> None:
    """SimHash candidate linearity (VERDICT r4 #2): with Manku multi-block
    keys (≥32 matched bits per candidate) the candidate-pair count must
    grow ~×N at ×N docs; the old 16-bit pigeonhole chunks grew ~n²/2^16.
    FULLY-salted replicas (disjoint vocabulary) make cross-replica
    signatures independent — half-salting would leave replicas ~50%
    token-similar, which SimHash keys legitimately bucket together and
    which would mask the collision term being measured. With disjoint
    replicas, candidates = ×factor within-replica structure + the random
    n²/2^32 collision term; ~linear growth proves the latter is
    negligible."""
    from datalake_brief_spark.operators.dedup import (
        simhash_candidate_keys,
        with_simhash,
    )

    print("-- simhash (multi-block keys: candidates ~linear expected)")
    results = []
    for s in scales:
        corpus = replicate_full_salt(base, s)
        n = corpus.count()
        # the SHIPPED key generator (shared with simhash_pairs), so the
        # linearity evidence can never drift from the production layout
        sh = with_simhash(corpus.select("doc_id", "text"), "text").select(
            "doc_id", "simhash"
        )
        keys = simhash_candidate_keys(sh, "doc_id", max_hamming=3)
        lhs = keys.select(F.col("doc_id").alias("id_a"), "combo_idx", "combo_key")
        rhs = keys.select(F.col("doc_id").alias("id_b"), "combo_idx", "combo_key")
        t0 = time.monotonic()
        cands = (
            lhs.join(rhs, on=["combo_idx", "combo_key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
            .count()
        )
        dt = time.monotonic() - t0  # candidate-generation pipeline only
        pairs = dedup.simhash_pairs(corpus, max_hamming=3).count()
        results.append((s, n, cands, pairs, dt))
        print(
            f"scale={s} rows={n} simhash_candidates={cands} dup_pairs={pairs} "
            f"wall_sec={dt:.2f}",
            flush=True,
        )
    s1, s_top = results[0], results[-1]
    n_ratio = s_top[1] / s1[1]
    c_ratio = s_top[2] / max(s1[2], 1)
    print(
        f"simhash linearity: n x{n_ratio:.1f} -> candidates x{c_ratio:.1f} "
        f"(quadratic would be x{n_ratio**2:.0f})"
    )


def spans_check(spark, base, scales) -> None:
    """Repeated-spans (ExactSubstr) linearity: span count must track the
    replica factor exactly (disjoint-vocabulary replicas), wall time
    ~linearly."""
    print("-- repeated_spans (fully-salted replicas: exact ×factor expected)")
    results = []
    for s in scales:
        corpus = replicate_full_salt(base, s)
        t0 = time.monotonic()
        agg = dedup.repeated_spans(corpus, k=5, min_docs=2).agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("span_tokens").alias("covered"),
        ).collect()[0]
        dt = time.monotonic() - t0
        results.append((s, agg.n_spans, agg.covered, dt))
        print(
            f"scale={s} spans={agg.n_spans} covered_tokens={agg.covered} "
            f"wall_sec={dt:.2f}",
            flush=True,
        )
    s1, s_top = results[0], results[-1]
    print(
        f"spans linearity: factor x{s_top[0] / s1[0]:.0f} -> spans "
        f"x{s_top[1] / max(s1[1], 1):.2f} (exact linear = x{s_top[0] / s1[0]:.0f}), "
        f"time x{s_top[3] / s1[3]:.1f}"
    )


def incremental_check(spark, docs, scales) -> None:
    """The incremental-dedup claim: a FIXED increment's cost is
    O(increment), not O(corpus). The index holds the even-doc_id half
    replicated 1x..Nx with fully-salted vocabulary (replicas share no
    gram with anything), the increment is always the odd half of the
    base corpus. Expected: the pair set is EXACTLY invariant as the
    index grows (salted replicas can't pass exact-Jaccard verify), and
    wall time grows far slower than the index (only the band equi-join's
    probe side widens; the increment is shingled/banded once)."""
    import tempfile

    print("-- incremental_dedup (fixed increment vs growing index)")
    base = docs.filter(F.pmod("doc_id", F.lit(2)) == 0)
    inc = docs.filter(F.pmod("doc_id", F.lit(2)) == 1)
    results = []
    for s in scales:
        idx_corpus = replicate_full_salt(base, s)
        path = tempfile.mkdtemp(prefix="dbs_incidx_")
        dedup.build_dedup_index(idx_corpus, path, k=3)
        n_idx = idx_corpus.count()
        # warm + min-of-2 of the pure increment query (no index append)
        dedup.incremental_dedup(spark, inc, path, k=3, threshold=0.8, update_index=False).count()
        best, pairs = 1e18, None
        for _ in range(2):
            t0 = time.monotonic()
            rows = sorted(
                (r.id_a, r.id_b)
                for r in dedup.incremental_dedup(
                    spark, inc, path, k=3, threshold=0.8, update_index=False
                ).collect()
            )
            best = min(best, time.monotonic() - t0)
            pairs = rows
        results.append((s, n_idx, pairs, best))
        print(f"scale={s} index_rows={n_idx} pairs={len(pairs)} wall_sec={best:.2f}", flush=True)
    first = results[0]
    for s, n_idx, pairs, _ in results[1:]:
        assert pairs == first[2], f"pair set changed at scale {s}"
    t_ratio = results[-1][3] / first[3]
    n_ratio = results[-1][1] / first[1]
    print(
        f"increment invariance held; index x{n_ratio:.0f} -> increment "
        f"wall x{t_ratio:.2f} (O(corpus) would be ~x{n_ratio:.0f})"
    )


def main() -> None:
    spark = get_spark("dedup_scale_check")
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    results = []
    for s in SCALES:
        corpus = replicate(base, s)
        n = corpus.count()
        hashed = _hashed_shingles(corpus, "text", "doc_id", 3)
        cands = _lsh_candidate_pairs(hashed, "doc_id", [], 128, 32, 42).count()
        t0 = time.monotonic()
        pairs = dedup.ngram_jaccard_pairs(corpus, threshold=0.8).count()
        dt = time.monotonic() - t0
        results.append((s, n, cands, pairs, dt))
        print(
            f"scale={s} rows={n} lsh_candidates={cands} dup_pairs={pairs} "
            f"pipeline_sec={dt:.2f}",
            flush=True,
        )
    s1 = results[0]
    s_top = results[-1]
    n_ratio = s_top[1] / s1[1]
    c_ratio = s_top[2] / max(s1[2], 1)
    t_ratio = s_top[4] / s1[4]
    print(
        f"linearity: n x{n_ratio:.1f} -> candidates x{c_ratio:.1f}, "
        f"time x{t_ratio:.1f} (quadratic would be x{n_ratio**2:.0f})"
    )
    simhash_check(spark, base, SCALES)
    spans_check(spark, base, SCALES)
    incremental_check(spark, base, SCALES)


if __name__ == "__main__":
    main()
