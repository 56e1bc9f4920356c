"""Multimodal column operators (training-pipeline additions).

Images/audio/video ride as opaque ``binary`` columns with typed metadata
structs; decode/resize/frame-sample run as Arrow-batched pandas UDFs over
``mapInPandas``.  The decode kernels are STUBBED in this sandbox (no
image/audio libraries installed) behind ``_require_codec`` — the
Spark-side plumbing (schemas, batch shape, partitioning) is real and
tested with the deterministic fake decoder.

Schema convention:
    media(doc_id string, media_ref string, kind string,
          payload binary, meta struct<width:int, height:int,
          duration_ms:int, mime:string>)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("mime", StringType(), True),
    ]
)

MEDIA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("meta", MEDIA_META, True),
    ]
)

FEATURE_SCHEMA = (
    # feature carries float64: the fake-decoder values are exact 4-decimal
    # rationals (k/10000) which float64 represents exactly but float32
    # does not — float32 storage made f0=0.0001 stringify as "1e-04" in
    # pandas-side checkers while the DuckDB oracle's double printed
    # "0.0001" (one-row hash mismatch at sf0.1, found round 7).  A real
    # model's embedding dtype is its own business; this schema is the
    # oracle-checked stand-in's.
    "doc_id string, media_ref string, kind string, "
    "feature array<double>, feat_dim int"
)


def _require_codec(name: str):
    raise NotImplementedError(
        f"media codec '{name}' is not available in this sandbox; "
        "swap _fake_decode for a real decoder (PIL/ffmpeg) on a cluster"
    )


def _fake_decode(payload: bytes | None, ref: str, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for decode+featurize: hash → float vector.

    Keeps the whole pipeline testable end-to-end (schema, batching,
    ordering) without image libs; replace with a real model on cluster.
    """
    h = hashlib.sha256((ref or "").encode() + (payload or b"")).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4],
                        dtype=np.uint32)
    return (raw % 10_000).astype(np.float64) / 10_000.0


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Explode media spans out of the interleaved documents table into
    the media table shape (payload empty until a fetch stage fills it)."""
    spans = documents.select(
        "doc_id", F.explode("spans").alias("s")
    ).where(F.col("s.media_ref").isNotNull())
    return spans.select(
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.kind").alias("kind"),
        F.lit(None).cast("binary").alias("payload"),
        F.lit(None).cast(MEDIA_META.simpleString()).alias("meta"),
    )


def extract_features(media: DataFrame, dim: int = 16,
                     real_decoder=None) -> DataFrame:
    """Decode + featurize each media item (mapInPandas, Arrow batches).

    ``real_decoder(payload, ref) -> np.ndarray`` plugs in a real codec;
    default is the deterministic fake (sandbox).
    """
    decoder = real_decoder or _fake_decode

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decoder(p, r, dim) if decoder is not _fake_decode
                else _fake_decode(p, r, dim)
                for p, r in zip(pdf["payload"], pdf["media_ref"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "feature": [f.tolist() for f in feats],
                    "feat_dim": [len(f) for f in feats],
                }
            )

    return media.mapInPandas(_batches, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage — STUB: raises at execution time (no codec);
    the plan (schema/partitioning) is real."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf):
                _require_codec("image-resize")
            yield pdf

    return media.mapInPandas(_batches, MEDIA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling — STUB (no codec); plumbing real."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf):
                _require_codec("video-frame-sample")
            yield pdf

    return media.mapInPandas(_batches, MEDIA)
