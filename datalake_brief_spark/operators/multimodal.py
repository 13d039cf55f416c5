"""Multimodal column handling (SURVEY §2.14): image/audio/video as opaque
``binary`` columns plus typed metadata structs.

The container has no image/audio libraries, so the *decode* step is stubbed
(clearly marked) while the Spark-side plumbing — schema, partition-friendly
batching, Arrow UDF signatures — is real and tested:

- ``attach_media_metadata``  — typed struct (modality, byte size, content
                               hash) from pure expressions.
- ``extract_features``       — mapInPandas over Arrow batches; per batch one
                               vectorized pass produces fixed-width feature
                               vectors. The real decoder plugs in behind
                               ``decoder=``; the default is a deterministic
                               byte-statistics fake so pipelines are testable.
- ``decode_image``           — the honest stub: raises NotImplementedError.

At 100 TB the binary payloads dominate IO: keep them in their own parquet
column chunk (they compress independently), filter on metadata columns
first so pruned row groups never decode payload bytes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def attach_media_metadata(
    df: DataFrame, binary_col: str = "payload", modality: str = "image", out: str = "media_meta"
) -> DataFrame:
    """Typed metadata struct computed JVM-side; no payload leaves the JVM."""
    b = F.col(binary_col)
    return df.withColumn(
        out,
        F.struct(
            F.lit(modality).alias("modality"),
            F.octet_length(b).cast("long").alias("n_bytes"),
            F.md5(b).alias("content_md5"),
        ),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB — real image decode needs PIL/opencv, not in this container.
    A deployment injects a decoder into ``extract_features(decoder=...)``."""
    raise NotImplementedError(
        "image decoding requires an imaging library (PIL/opencv); "
        "inject a real decoder via extract_features(decoder=...)"
    )


def _fake_byte_features(payloads: pd.Series, n_features: int) -> np.ndarray:
    """Deterministic decode-free stand-in: byte-histogram features.
    Shapes and dtypes match what a real embedding extractor would emit."""
    out = np.zeros((len(payloads), n_features), dtype=np.float32)
    for i, p in enumerate(payloads):
        if p is None or len(p) == 0:
            continue
        arr = np.frombuffer(bytes(p), dtype=np.uint8)
        hist = np.bincount(arr % n_features, minlength=n_features).astype(np.float32)
        out[i] = hist / max(len(arr), 1)
    return out


def extract_features(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    n_features: int = 16,
    decoder: Callable[[pd.Series, int], "np.ndarray"] | None = None,
) -> DataFrame:
    """Feature extraction over Arrow batches via mapInPandas.

    The per-batch contract is what a GPU/codec stage needs at scale: the UDF
    receives whole Arrow record batches (not rows), emits fixed-width float
    vectors, and the output schema is declared so downstream plans stay
    columnar. Default ``decoder`` is the deterministic fake above.
    """
    fn = decoder or _fake_byte_features
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = fn(pdf[binary_col], n_features)
            yield pd.DataFrame({id_col: pdf[id_col], "features": list(feats)})

    return df.select(id_col, binary_col).mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emits (id, frame_idx,
    frame_bytes) rows. Real codecs plug into the same shape; the stand-in
    slices the payload at fixed offsets (deterministic, dependency-free)."""
    b = F.col(binary_col)
    n_frames = F.least(
        F.greatest((F.octet_length(b) / every_n_bytes).cast("int"), F.lit(1)),
        F.lit(max_frames),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: F.substring(b, i * every_n_bytes + 1, every_n_bytes),
            )
        ).alias("frame_idx", "frame_bytes"),
    )
