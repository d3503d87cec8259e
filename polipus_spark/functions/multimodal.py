"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as opaque
``binary`` columns next to typed metadata, and runs decode / feature-extract
/ resize / frame-sample as Arrow-batched pandas functions over
``mapInPandas``. This container has no image/audio libraries, so the decode
step is STUBBED (per round instructions): ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case it produces a
deterministic md5-derived feature vector. Everything around the stub — the
schema, the partition-sized Arrow batching, the UDF signatures, media-span
handling from the interleaved docs model — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

FEATURE_DIM = 8


def media_table_from_docs(docs: DataFrame) -> DataFrame:
    """Explode media spans of the interleaved docs into a media table.

    The payload is a deterministic synthetic binary derived from media_ref
    (stands in for the fetched bytes; on a real crawl this column comes from
    the fetcher). media_type parses from the ref scheme ('img://...' → img).
    """
    media = (
        docs.select(
            F.col("doc_id"),
            F.explode("spans").alias("s"),
        )
        .where(F.col("s.kind") == "media")
        .select(F.col("doc_id"), F.col("s.media_ref").alias("media_ref"))
    )
    payload = F.to_binary(F.md5(F.col("media_ref")), F.lit("hex"))
    return media.select(
        "doc_id",
        "media_ref",
        payload.alias("payload"),
        F.regexp_extract("media_ref", r"^([a-z]+)://", 1).alias("media_type"),
        F.length(payload).cast("bigint").alias("n_bytes"),
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to pixels. STUB: no imaging libs in this
    container — raises unless fake=True (deterministic md5-derived array)."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library (PIL/cv2) not present "
            "in this environment; pass fake=True for the deterministic stub"
        )
    d = hashlib.md5(bytes(payload or b"")).digest()
    return np.frombuffer(d[:FEATURE_DIM], dtype=np.uint8).astype(np.float64)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: binary payload → float feature vector.

    The Arrow-batch shape is the real thing (one pandas frame per partition
    batch, vectorized numpy inside); only the pixel decode is the stub.
    """
    out_schema = T.StructType(
        list(media.schema.fields)
        + [T.StructField("features", T.ArrayType(T.DoubleType()), True)]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_image(p, fake=fake).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pdf.assign(features=feats)

    return media.mapInPandas(_extract, out_schema)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index.

    The decode is stubbed; the row-explosion dataflow (the expensive part at
    scale — output cardinality = frames/every_n) is real: a sequence explode,
    no Python."""
    n_frames = F.pmod(F.abs(F.hash("media_ref")), F.lit(300)) + 1  # synthetic count
    return media.select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
