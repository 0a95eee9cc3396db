"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as BinaryType columns; decode /
feature-extract / resize / frame-sample run as Arrow-batched
mapInPandas stages. The decode libraries (PIL/ffmpeg/...) are NOT in
this container, so the codec step is stubbed behind
NotImplementedError with a deterministic fake feature extractor —
the Spark-side plumbing (schema, batching, partition flow) is real
and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, source string, n_bytes long, head_hex string, checksum long"
)


def decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: real image decode needs PIL/libjpeg, absent here.
    The plumbing around it (attach_payload -> extract_features) is the
    tested surface; swap this in a real deployment."""
    raise NotImplementedError("image codec not available in this environment")


def attach_payload(docs: DataFrame, text_col="text") -> DataFrame:
    """Treat utf-8 text bytes as the opaque payload (deterministic
    stand-in for an image/audio blob)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Deterministic fake 'decode': byte length, first-4-bytes hex, and a
    positional checksum (sum of byte*index mod 2^31) — stands in for
    width/height/duration. One Arrow batch per partition chunk; no
    shuffle.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "n_bytes": payloads.map(len),
                    "head_hex": payloads.map(lambda b: bytes(b[:4]).hex()),
                    "checksum": payloads.map(
                        lambda b: sum((i + 1) * v for i, v in enumerate(b)) % (2**31)
                    ),
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)
