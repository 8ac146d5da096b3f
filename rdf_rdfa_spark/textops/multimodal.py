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
