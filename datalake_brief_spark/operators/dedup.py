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
    minhash_values,
    normalize_text,
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


def _shingled(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    return df.select(
        F.col(id_col),
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
    a = _shingled(df, text_col, id_col, k).withColumnRenamed(id_col, "id_a")
    b = (
        _shingled(df, text_col, id_col, k)
        .withColumnRenamed(id_col, "id_b")
        .withColumnRenamed("shingles", "shingles_b")
    )
    if block_col is not None:
        blocks = df.select(F.col(id_col), F.col(block_col))
        a = a.join(blocks.withColumnRenamed(id_col, "id_a"), "id_a")
        b = b.join(blocks.withColumnRenamed(id_col, "id_b"), "id_b")
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
    base = df.select(
        F.col(id_col),
        F.array_distinct(word_shingles(tokens(text_col), k)).alias("shingles"),
    )
    sig = base.withColumn("sig", minhash_values(F.col("shingles"), num_hashes, seed=seed))
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
