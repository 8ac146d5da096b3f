"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a `modality` tag.
The decode / feature-extract step runs as an Arrow-vectorized
`mapInPandas` — the Spark-side plumbing (schema, batch shape,
partition passthrough) is real and tested; the actual codec call is
STUBBED deterministically because this container ships no image/audio
libraries (per the build contract). Swap `_decode_stub` for a real
PIL/torchaudio call on a cluster with the deps installed.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("modality", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("content_md5", StringType(), True),
        StructField("width", IntegerType(), True),   # stub: derived
        StructField("height", IntegerType(), True),  # stub: derived
    ]
)


def _decode_stub(payload: bytes):
    """Deterministic fake decode. A real implementation would return
    (width, height) from the image header; the stub derives a stable
    pair from the content hash so tests exercise the full pipeline
    shape. Raises on empty payload like a real decoder would."""
    if not payload:
        raise ValueError("empty payload")
    d = hashlib.md5(payload).digest()
    return 16 + d[0] % 64, 16 + d[1] % 64


def extract_features(df: DataFrame, id_col: str = "id",
                     payload_col: str = "payload",
                     modality_col: str = "modality") -> DataFrame:
    """(id, payload binary, modality) → FEATURE_SCHEMA rows, Arrow
    batches end-to-end. Decode failures yield NULL dims, not task
    failures."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload, mod in zip(
                pdf[id_col].values, pdf[payload_col].values,
                pdf[modality_col].values,
            ):
                b = bytes(payload) if payload is not None else b""
                md5 = hashlib.md5(b).hexdigest() if b else None
                try:
                    w, h = _decode_stub(b)
                except Exception:
                    w = h = None
                rows.append((int(i), mod, len(b), md5, w, h))
            yield pd.DataFrame(
                rows, columns=["id", "modality", "n_bytes", "content_md5",
                               "width", "height"],
            )

    return df.select(
        F.col(id_col).alias("id"),
        F.col(payload_col).alias("payload"),
        F.col(modality_col).alias("modality"),
    ).mapInPandas(fn, FEATURE_SCHEMA)


def documents_as_binary(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as an opaque payload so the
    multimodal path has a deterministic test corpus."""
    return docs.select(
        F.col("doc_id").alias("id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text").alias("modality"),
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("modality", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("payload_md5", StringType(), True),
    ]
)


def resize_images(df: DataFrame, width: int = 32, height: int = 32,
                  id_col: str = "id", payload_col: str = "payload",
                  modality_col: str = "modality") -> DataFrame:
    """Resize plumbing (decode → scale → re-encode) as mapInPandas.
    The codec is STUBBED: the "resized" payload is a deterministic
    function of the source bytes + target dims, so the batch shape,
    schema and partition passthrough are real and testable without
    image libraries. Swap the stub body for PIL's Image.resize on a
    real cluster."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload, mod in zip(
                pdf[id_col].values, pdf[payload_col].values,
                pdf[modality_col].values,
            ):
                b = bytes(payload) if payload is not None else b""
                if not b:
                    rows.append((int(i), mod, None, None, None))
                    continue
                fake = hashlib.md5(
                    b + (":%dx%d" % (width, height)).encode()).hexdigest()
                rows.append((int(i), mod, width, height, fake))
            yield pd.DataFrame(
                rows, columns=["id", "modality", "width", "height",
                               "payload_md5"])

    return df.select(
        F.col(id_col).alias("id"),
        F.col(payload_col).alias("payload"),
        F.col(modality_col).alias("modality"),
    ).mapInPandas(fn, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_md5", StringType(), True),
    ]
)


def sample_frames(df: DataFrame, max_frames: int = 8,
                  id_col: str = "id",
                  payload_col: str = "payload") -> DataFrame:
    """Frame-sampling plumbing: ONE input row fans out to N frame rows
    (UDTF shape under mapInPandas — exactly how a real ffmpeg-backed
    sampler plugs in). Stub: frame count = 1 + n_bytes % max_frames,
    frame content hash = md5(payload ':' idx) — deterministic, so the
    whole fan-out is value-oracled in SQL."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for i, payload in zip(pdf[id_col].values,
                                  pdf[payload_col].values):
                b = bytes(payload) if payload is not None else b""
                n = 1 + (len(b) % max_frames) if b else 0
                for k in range(n):
                    ids.append(int(i))
                    idxs.append(k)
                    hashes.append(
                        hashlib.md5(b + (":%d" % k).encode()).hexdigest())
            yield pd.DataFrame(
                {"id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame_md5": pd.Series(hashes, dtype="object")})

    return df.select(
        F.col(id_col).alias("id"),
        F.col(payload_col).alias("payload"),
    ).mapInPandas(fn, FRAME_SCHEMA)
