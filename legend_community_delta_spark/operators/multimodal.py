"""Multimodal column plumbing: images/audio/video as opaque binary columns.

The Spark-side machinery here is real and tested — schemas, Arrow-batched
``mapInPandas`` pipelines, partition sizing — while the actual media
decoding is stubbed (the runtime image/audio libraries are not available in
this environment).  Swap ``_decode_image_stub`` for a PIL/libvips call and
everything else holds at scale.

Design rules baked in:

* media bytes ride in a ``binary`` column next to a typed ``meta`` struct,
  so predicates/pruning work on metadata without touching payloads;
* per-batch work happens in Arrow-batched ``mapInPandas`` (one
  Python round-trip per ~10k rows, not per row);
* decoded features come back as fixed-schema columns, never pickled blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]), True),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("sha256", T.StringType(), True),
    T.StructField("n_bytes", T.IntegerType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType(), False), True),
])


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Derive cheap metadata (byte size, content hash) without decoding."""
    return (df
            .withColumn("n_bytes", F.octet_length(payload_col))
            .withColumn("payload_hash", F.sha2(F.col(payload_col), 256)))


def _decode_image_stub(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decode + feature-extract'.

    Stands in for a real image decode (PIL/torchvision unavailable here):
    derives a *dim*-float pseudo-feature from the payload's sha256 so tests
    are reproducible.  Replace with a real decoder in production.
    """
    if payload is None:
        return []
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:dim]]


def extract_image_features(df: DataFrame, payload_col: str = "payload",
                           id_col: str = "media_id", dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` gives one Python invocation per Arrow batch; at 100 TB
    the parallelism knob is the input partitioning (use
    ``spark.sql.files.maxPartitionBytes`` to keep batches ~128 MB).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "sha256": payloads.map(
                    lambda p: hashlib.sha256(p).hexdigest() if p is not None else None),
                "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                "feature": payloads.map(lambda p: _decode_image_stub(p, dim)),
            })

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA)


def normalize_embeddings_per_group(df: DataFrame, vec_col: str = "embedding",
                                   group_col: str = "label",
                                   id_col: str = "vec_id") -> DataFrame:
    """Per-group embedding centering via ``applyInPandas`` (grouped-map).

    Subtracts each group's mean vector — the grouped-map pattern for
    anything needing a whole group in memory at once (normalization,
    whitening, per-group PCA).  One shuffle on *group_col*; groups must fit
    an executor (true for per-label/per-source groups; salt the key if a
    group can exceed memory).
    """
    import numpy as np

    out_schema = df.select(id_col, group_col, vec_col).schema

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        M = M - M.mean(axis=0)
        pdf = pdf.copy()
        pdf[vec_col] = [row.astype(np.float32).tolist() for row in M]
        return pdf

    return (df.select(id_col, group_col, vec_col)
            .groupBy(group_col).applyInPandas(center, schema=out_schema))


def resize_images(df: DataFrame, width: int, height: int,
                  payload_col: str = "payload") -> DataFrame:
    """Image resize — stub: requires an image codec library at runtime."""
    raise NotImplementedError(
        "image resize needs PIL/libvips in the runtime image; the plumbing "
        "pattern is extract_image_features with a resize inside the batch fn")


def sample_video_frames(df: DataFrame, every_ms: int,
                        payload_col: str = "payload") -> DataFrame:
    """Video frame sampling — stub: requires ffmpeg/pyav at runtime."""
    raise NotImplementedError(
        "frame sampling needs ffmpeg/pyav; implement as mapInPandas yielding "
        "one row per sampled frame with (media_id, ts_ms, frame_payload)")
