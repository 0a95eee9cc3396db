"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as BinaryType columns; decode /
feature-extract / resize / frame-sample run as Arrow-batched
mapInPandas stages. The decode libraries (PIL/ffmpeg/...) are NOT in
this container, so the codec step is stubbed behind
NotImplementedError — the Spark-side plumbing (schema, batching,
partition flow) is real and tested.

Two feature paths:

- ``extract_features`` — pure JVM column expressions (octet_length,
  hex, aggregate over byte positions). This is the hot path: byte
  accounting and checksums never need Python, so they stay inside
  whole-stage codegen with zero serialization cost.
- ``extract_features_codec`` — the Arrow-batched mapInPandas seam
  where a real decoder (PIL/ffmpeg) plugs in. Kept as the extension
  point; produces the same schema so the two are interchangeable.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, source string, n_bytes long, head_hex string, checksum long"
)


def decode_image(payload: bytes):  # pragma: no cover - stub
    """STUB: real image decode needs PIL/libjpeg, absent here.
    The plumbing around it (attach_payload -> extract_features_codec)
    is the tested surface; swap this in a real deployment."""
    raise NotImplementedError("image codec not available in this environment")


def attach_payload(docs: DataFrame, text_col="text") -> DataFrame:
    """Treat utf-8 text bytes as the opaque payload (deterministic
    stand-in for an image/audio blob)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def extract_features(df: DataFrame) -> DataFrame:
    """Byte-level payload features as pure JVM column expressions.

    n_bytes / head_hex / positional checksum (sum of 1-based-pos *
    byte, mod 2^31) are all computable without leaving whole-stage
    codegen: hex() exposes the bytes, aggregate() over a position
    sequence folds the checksum. No Python, no Arrow transfer — the
    mapInPandas seam (extract_features_codec) is reserved for real
    codecs that genuinely need a library.
    """
    payload = F.col("payload")
    n = F.octet_length(payload).cast("long")
    hexs = F.lower(F.hex(payload))
    # byte at 1-based position i = conv(hex[2i-1 : 2i], 16, 10)
    checksum = F.when(n == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            F.sequence(F.lit(1).cast("long"), n),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + i * F.conv(F.substr(hexs, (i - 1) * 2 + 1, F.lit(2)), 16, 10).cast(
                "long"
            ),
        )
        % F.lit(2**31)
    )
    return df.select(
        "doc_id",
        "source",
        n.alias("n_bytes"),
        F.lower(F.hex(F.substr(payload, F.lit(1), F.lit(4)))).alias("head_hex"),
        checksum.alias("checksum"),
    )


def extract_features_codec(
    df: DataFrame, decode: Callable[[bytes], dict] | None = None
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the seam
    where a real codec (PIL / ffmpeg frame sampling) plugs in.

    `decode(payload) -> {n_bytes, head_hex, checksum}` runs per blob
    inside an Arrow batch; the default deterministic fake mirrors
    extract_features exactly (equivalence is tested), standing in for
    width/height/duration extraction. One Arrow batch per partition
    chunk; no shuffle.
    """

    def _fake_decode(b: bytes) -> dict:
        return {
            "n_bytes": len(b),
            "head_hex": bytes(b[:4]).hex(),
            "checksum": sum((i + 1) * v for i, v in enumerate(b)) % (2**31),
        }

    dec = decode or _fake_decode

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(dec)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "n_bytes": feats.map(lambda d: d["n_bytes"]),
                    "head_hex": feats.map(lambda d: d["head_hex"]),
                    "checksum": feats.map(lambda d: d["checksum"]),
                }
            )

    return df.mapInPandas(fn, FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary, n_bytes long"


def sample_frames(
    df: DataFrame, frame_size: int = 64, stride: int = 2
) -> DataFrame:
    """Frame sampling over opaque media payloads: one input blob ->
    every `stride`-th fixed-size frame (the 1->N mapInPandas shape a
    video pipeline needs). The deterministic fake "demuxer" slices
    byte ranges — a real ffmpeg demux plugs into the same seam with
    the same output schema. Arrow-batched; no shuffle; output rows
    carry (doc_id, frame_idx, frame bytes).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_frame, out_n = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_size - 1) // frame_size
                for i in range(0, n_frames, stride):
                    fr = b[i * frame_size : (i + 1) * frame_size]
                    out_id.append(doc_id)
                    out_idx.append(i)
                    out_frame.append(fr)
                    out_n.append(len(fr))
            yield pd.DataFrame(
                {"doc_id": out_id, "frame_idx": out_idx,
                 "frame": out_frame, "n_bytes": out_n}
            )

    return df.mapInPandas(fn, FRAME_SCHEMA)


def resize_payload(df: DataFrame, target_bytes: int = 128) -> DataFrame:
    """Resize stub: normalize every payload to `target_bytes`
    (truncate / zero-pad) — stands in for image resizing, keeping the
    schema/batching contract of a real PIL resize. Pure JVM columns:
    truncation via substr on binary, padding via rpad on hex."""
    payload = F.col("payload")
    n = F.octet_length(payload)
    truncated = F.substr(payload, F.lit(1), F.lit(target_bytes))
    padded = F.unhex(
        F.rpad(F.hex(payload), target_bytes * 2, "00")
    )
    return df.withColumn(
        "payload_resized",
        F.when(n >= target_bytes, truncated).otherwise(padded),
    ).withColumn("resized_bytes", F.octet_length("payload_resized"))
