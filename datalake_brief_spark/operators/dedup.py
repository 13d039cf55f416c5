"""Deduplication operators for training-data pipelines (SURVEY §2.14).

Four tiers, in increasing fuzziness — all shuffle-frugal:

- exact_dedup          — hash-groupBy on a normalized fingerprint (1 shuffle)
- ngram_jaccard_pairs  — exact Jaccard on word-shingle sets within a
                         blocking key (shuffle on block key only)
- minhash_lsh_pairs    — MinHash signatures + LSH banding (Broder 1997;
                         MMDS ch.3): candidate pairs from band-bucket join,
                         verified with exact Jaccard. Scales ~linearly: the
                         only shuffle is groupBy(band, hash) over docs.
- simhash_pairs        — 64-bit SimHash (Charikar 2002) via a vectorized
                         pandas_udf; candidates from 16-bit chunk matches
                         (pigeonhole: hamming<=3 → ≥1 of 4 chunks equal),
                         verified with exact hamming via bit_count(xor).

At 100 TB: signatures are computed in the scan stage (pure expressions /
Arrow batches), candidate generation is one exploded groupBy-join on short
keys, and verification touches only candidate pairs — never the n² cross.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datalake_brief_spark.functions import (
    band_hashes,
    hamming64,
    minhash_signature_udf,
    normalize_text,
    shingle_hashes,
    tokens,
    word_shingles,
)
from datalake_brief_spark.operators.windows import dedup_sorted


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one deterministic representative (lowest id) per distinct
    normalized text. Hash-groupBy semantics, single shuffle."""
    return dedup_sorted(
        df.withColumn("__fp", F.md5(normalize_text(text_col))),
        keys=["__fp"],
        order_by=[F.col(id_col)],
    ).drop("__fp")


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a narrow scan across the cluster when the source arrives
    in fewer splits than cores (one small parquet file → one task would
    otherwise compute every signature serially). At scale the input already
    has ≥ parallelism splits and this is a no-op.

    Apply to the RAW (id, text) projection, before any shingling/hashing
    expression: an exchange sits above its child's projections, so spreading
    a computed column would still evaluate it serially in the scan task.
    The explicit partition count keeps AQE from coalescing the tiny exchange
    back to one partition (compute-bound stages want cores, not 64 MiB
    targets).
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        return df.repartition(parallelism)
    return df


def _shingled(
    df: DataFrame, text_col: str, id_col: str, k: int, extra_cols: list[str] | None = None
) -> DataFrame:
    src = _spread(df.select(F.col(id_col), *[F.col(c) for c in (extra_cols or [])], F.col(text_col)))
    return src.select(
        F.col(id_col),
        *[F.col(c) for c in (extra_cols or [])],
        F.array_distinct(word_shingles(tokens(text_col), k)).alias("shingles"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact word-k-gram Jaccard over candidate pairs.

    ``block_col`` restricts comparisons to equal blocking keys (e.g. same
    ``source``): the join shuffles on the block key instead of producing the
    full n² cross. With no block, this is quadratic — only for small inputs
    or as the verifier behind LSH candidates.
    """
    extra = [block_col] if block_col is not None else None
    sh = _shingled(df, text_col, id_col, k, extra_cols=extra)
    # Intersect 64-bit shingle hashes, not strings: set ops on fixed-width
    # longs beat ~20-char string comparisons several-fold, and a 64-bit
    # collision altering a Jaccard value needs ~2^32 distinct shingles.
    sh = sh.select(
        F.col(id_col),
        *[F.col(c) for c in (extra or [])],
        F.array_distinct(F.transform("shingles", lambda s: F.xxhash64(s))).alias("shingles"),
    )
    a = sh.withColumnRenamed(id_col, "id_a")
    b = sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("shingles", "shingles_b")
    if block_col is not None:
        pairs = a.join(b, on=block_col).filter(F.col("id_a") < F.col("id_b"))
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect(F.col("shingles"), F.col("shingles_b"))).cast("double")
    union = F.size(F.array_union(F.col("shingles"), F.col("shingles_b"))).cast("double")
    return (
        pairs.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    num_bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via MinHash + LSH banding, verified with exact Jaccard.

    Pipeline (3 shuffles total, each on small keys):
      1. scan: shingle + 64-hash MinHash signature + band hashes (pure exprs)
      2. explode bands → self-join on (band_idx, band_hash) → candidate pairs
      3. dedup candidate pairs, re-join shingle sets, exact-Jaccard filter

    With b=16 bands of r=4 rows the s-curve midpoint is (1/16)^(1/4) ≈ 0.5:
    pairs above ~0.5 Jaccard are near-certain candidates.
    """
    rows_per_band = num_hashes // num_bands
    base = _shingled(df, text_col, id_col, k)
    # Shingle-string hashing stays JVM-side (own select so nothing inlines
    # it repeatedly); the num_hashes minima run as one Arrow-vectorized
    # numpy pass — see minhash_signature_udf for why not expressions.
    hashed = base.select(F.col(id_col), shingle_hashes(F.col("shingles")).alias("__hx"))
    sig = hashed.select(
        F.col(id_col),
        minhash_signature_udf(num_hashes, seed=seed)(F.col("__hx")).alias("sig"),
    )
    banded = sig.select(
        F.col(id_col),
        F.posexplode(band_hashes(F.col("sig"), num_bands, rows_per_band)).alias(
            "band_idx", "band_hash"
        ),
    )
    lhs = banded.withColumnRenamed(id_col, "id_a")
    rhs = banded.withColumnRenamed(id_col, "id_b")
    candidates = (
        lhs.join(rhs, on=["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    sh = base.select(F.col(id_col), F.col("shingles"))
    verified = (
        candidates.join(sh.withColumnRenamed(id_col, "id_a"), "id_a")
        .join(
            sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("shingles", "shingles_b"),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("shingles", "shingles_b")).cast("double")
                / F.size(F.array_union("shingles", "shingles_b")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components over an undirected edge list → (id, component),
    component = smallest node id reachable (deterministic canonical label).

    Min-label propagation with pointer jumping: each round every node takes
    the min label in its neighborhood, then labels are compressed by one
    label-of-label hop (pointer doubling), so convergence is O(log diameter)
    rounds — near-dup graphs (tiny, dense clusters) converge in 1-2. Each
    round is one join+groupBy on the node id plus one self-join on the label:
    all shuffles on the same key, no driver-side graph state (the only
    driver value is the changed-count). ``localCheckpoint`` truncates the
    iterative lineage so plans don't grow unboundedly.

    This is the standard MapReduce CC recipe (cf. Kiveris et al. 2014,
    "Connected Components in MapReduce and Beyond" — large-star/small-star;
    the min-label + pointer-jump variant has the same shuffle shape per
    round and is simpler to express in DataFrame ops).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    e = e.localCheckpoint()
    labels = (
        e.select(F.col("src").alias("id")).distinct().withColumn("comp", F.col("id"))
    )
    for _ in range(max_iterations):
        nbr_min = (
            e.join(
                labels.select(F.col("id").alias("dst"), F.col("comp").alias("nbr_comp")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nbr_comp").alias("min_nbr"))
            .withColumnRenamed("src", "id")
        )
        stepped = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce(F.col("min_nbr"), F.col("comp"))).alias("comp"),
            (F.coalesce(F.col("min_nbr"), F.col("comp")) < F.col("comp")).alias("__changed"),
        )
        # pointer jumping: follow the label's own label one hop
        jumped = (
            stepped.alias("s")
            .join(
                stepped.select(
                    F.col("id").alias("comp"), F.col("comp").alias("comp2")
                ).alias("j"),
                "comp",
                "left",
            )
            .select(
                F.col("s.id").alias("id"),
                F.coalesce(F.col("j.comp2"), F.col("s.comp")).alias("comp"),
                F.col("s.__changed"),
            )
        )
        jumped = jumped.localCheckpoint()
        n_changed = jumped.filter(F.col("__changed")).count()
        labels = jumped.drop("__changed")
        if n_changed == 0:
            break
    return labels


def cluster_dedup(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    keep: str = "min",
) -> DataFrame:
    """Collapse near-duplicate PAIRS into a dedup decision: every doc gets a
    ``cluster_id`` (smallest doc id in its connected component; singletons
    cluster with themselves) and ``is_canonical`` marks the one row per
    cluster that survives dedup.

    ``pairs`` is any (id_a, id_b) near-dup relation — minhash_lsh_pairs,
    simhash_pairs, ngram_jaccard_pairs, or embedding_near_dup_pairs output.
    """
    comp = connected_components(pairs)
    out = df.join(
        comp.select(F.col("id").alias(id_col), F.col("comp").alias("cluster_id")),
        id_col,
        "left",
    ).withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col)))
    return out.withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))


_SIMHASH_BITS = 64


@F.pandas_udf(T.LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    """Vectorized 64-bit SimHash (Charikar 2002): per token, a 64-bit hash
    votes ±1 per bit position; the sign vector packs into the signature.
    Arrow-batched — one numpy pass per batch, no per-row Python."""
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = ("" if t is None else str(t).lower()).split()
        if not toks:
            continue
        # Stable token hash: numpy vectorized FNV-1a over the token bytes.
        hs = np.array([_fnv1a64(tok) for tok in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(_SIMHASH_BITS, dtype=np.uint64)) & 1).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for b in range(_SIMHASH_BITS):
            if votes[b] > 0:
                sig |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sig)
    return pd.Series(out)


def _fnv1a64(s: str) -> np.uint64:
    h = np.uint64(0xCBF29CE484222325)
    for byte in s.encode("utf-8"):
        h = np.uint64(h ^ np.uint64(byte)) * np.uint64(0x100000001B3)
    return h


def with_simhash(df: DataFrame, text_col: str = "text", out: str = "simhash") -> DataFrame:
    return df.withColumn(out, _simhash64(F.col(text_col)))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance ≤ ``max_hamming``.

    Candidate generation: split the 64-bit signature into max_hamming+1
    chunks; by pigeonhole any pair within the distance budget agrees on at
    least one chunk, so an equi-join per chunk finds all true pairs.
    """
    n_chunks = max_hamming + 1
    chunk_bits = _SIMHASH_BITS // n_chunks
    sh = with_simhash(df.select(id_col, text_col), text_col).select(id_col, "simhash")
    chunks = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * chunk_bits).bitwiseAND(
                        F.lit((1 << chunk_bits) - 1)
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    lhs = chunks.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "chunk_idx", "chunk_val"
    )
    rhs = chunks.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "chunk_idx", "chunk_val"
    )
    return (
        lhs.join(rhs, on=["chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming64(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
