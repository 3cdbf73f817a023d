"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

No media libraries exist in this container, so the actual decode is STUBBED
(clearly marked below); everything Spark-side is real and tested — schema,
partitioning, ``mapInPandas`` batch shape, Arrow binary transfer — so swapping
the stub for PIL/ffmpeg later changes one function.

Design for 100 TB: binary payloads never pass through a shuffle — metadata is
projected out early (Catalyst column-prunes the binary away for pure-metadata
queries), and feature extraction is ``mapInPandas`` (streaming Arrow batches,
no grouping) so no executor materializes more than one batch of blobs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("payload", BinaryType()),     # opaque encoded bytes
    StructField("meta_format", StringType()),
    StructField("meta_width", IntegerType()),
    StructField("meta_height", IntegerType()),
    StructField("meta_duration_ms", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("digest", StringType()),
    StructField("feature", ArrayType(FloatType())),
])


def synthesize_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media table from a text corpus: payload = utf-8
    bytes (stands in for encoded pixels/samples). Real plumbing, fake codec."""
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"),
                                F.lit("video")),
                        (F.pmod(F.col("doc_id"), 3) + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("fake/v1").alias("meta_format"),
        F.when(kind == "image", (F.pmod(F.col("doc_id"), 512) + 32)
               .cast("int")).alias("meta_width"),
        F.when(kind == "image", (F.pmod(F.col("doc_id") * 7, 512) + 32)
               .cast("int")).alias("meta_height"),
        F.when(kind != "image", (F.pmod(F.col("doc_id") * 13, 60000) + 1000)
               .cast("int")).alias("meta_duration_ms"),
    )


def decode_media(payload: bytes, kind: str) -> np.ndarray:
    """STUB — the real decoder (PIL.Image.open / soundfile / pyav frame
    sampling) is not installable in this sandbox. The deterministic fake
    below keeps the pipeline testable end-to-end; replace this single
    function to go real."""
    raise NotImplementedError(
        "media decoding requires PIL/soundfile/pyav — not available in this "
        "container; use fake_decode for the deterministic test path")


def fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in 'decoded features': md5 → dim floats in [0,1)."""
    d = hashlib.md5(payload or b"").digest()
    raw = np.frombuffer((d * ((dim * 4) // len(d) + 1))[:dim * 4],
                        dtype=np.uint32)
    return (raw % 10_000).astype(np.float32) / 10_000.0


def extract_features(media: DataFrame, dim: int = 8,
                     use_fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch of blobs in, one batch
    of fixed-width features out. Binary column is dropped on output, so the
    downstream shuffle (if any) carries only features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = [None] * len(pdf)
            digests = [None] * len(pdf)
            nbytes = np.zeros(len(pdf), dtype=np.int64)
            for i, p in enumerate(payloads):
                b = bytes(p) if p is not None else b""
                nbytes[i] = len(b)
                digests[i] = hashlib.md5(b).hexdigest()
                vec = (fake_decode(b, dim) if use_fake
                       else decode_media(b, pdf["kind"].iloc[i]))
                feats[i] = vec.tolist()
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": nbytes,
                "digest": digests,
                "feature": feats,
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata projection: n_bytes/digest ARE computed from the payload
    column (length + md5 — Catalyst cannot prune the binary out of this
    scan), but the payload never survives past the projection, so no join,
    shuffle, or cache downstream carries blobs. A production table would
    precompute n_bytes/digest at write time and make this a true
    metadata-only read; with the synthesized media table the read is the
    point."""
    return media.select("media_id", "kind", "meta_format",
                        F.length("payload").alias("n_bytes"),
                        F.md5("payload").alias("digest"))
