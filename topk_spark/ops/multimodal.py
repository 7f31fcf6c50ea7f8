"""Multimodal column plumbing (north-star surface, BASELINE.json:6): treat
image/audio/video as opaque `binary` payloads with typed metadata, processed
by Arrow-batched pandas functions via mapInPandas.

The decode/feature-extract kernels are STUBS — this container ships no
image/audio libraries — but everything Spark-side is real and tested: the
binary schema, the mapInPandas batch shape (pandas DataFrames in/out via
Arrow), the partition-parallel execution, and deterministic fake outputs so
pipelines built on top are testable end-to-end. Swapping in PIL/librosa later
changes only `_decode_kernel`.

Scale notes: payloads never shuffle — mapInPandas is map-side; metadata-only
downstream queries select typed columns so Parquet column pruning skips the
blob bytes entirely (the whole point of separating payload from metadata).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    FloatType,
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # the real decoder would live here
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


DECODED_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("format", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in ingest: utf-8 bytes as the opaque payload column (in a real
    pipeline this is the image/audio blob read from object storage)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic fake image-header parse: format/width/height derived
    from a content digest. Replace with PIL when available."""
    digest = hashlib.sha256(payload).digest()
    fmt = ("jpeg", "png", "webp")[digest[0] % 3]
    width = 64 + digest[1] * 4  # 64..1084
    height = 64 + digest[2] * 4
    return fmt, width, height


def _decode_kernel(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-Arrow-batch decode. Real decode would be
    `PIL.Image.open(io.BytesIO(b))` — explicitly not implemented here."""
    if _HAVE_PIL:
        raise NotImplementedError(
            "real image decode intentionally stubbed; wire PIL here"
        )
    meta = [_fake_decode(b) for b in batch["payload"]]
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"].values,
            "n_bytes": [len(b) for b in batch["payload"]],
            "format": [m[0] for m in meta],
            "width": [m[1] for m in meta],
            "height": [m[2] for m in meta],
        }
    )


def decode_metadata(with_payload: DataFrame) -> DataFrame:
    """payload → typed metadata via mapInPandas (Arrow-batched, map-side,
    no shuffle). Input needs columns (doc_id, payload)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if len(batch):
                yield _decode_kernel(batch)

    return with_payload.select("doc_id", "payload").mapInPandas(
        run, DECODED_META_SCHEMA
    )


def extract_features(with_payload: DataFrame, dim: int = 8) -> DataFrame:
    """payload → fixed-dim float feature vector (the embedding-extraction
    slot). Deterministic hash-derived fake; the Arrow/batch/schema plumbing
    is what a real model-inference UDF would reuse unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                continue
            feats = []
            for b in batch["payload"]:
                digest = hashlib.sha256(b).digest()
                feats.append(
                    [round(digest[i] / 255.0 - 0.5, 6) for i in range(dim)]
                )
            yield pd.DataFrame(
                {"doc_id": batch["doc_id"].values, "feature": feats}
            )

    return with_payload.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)
