"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio decode libraries are not available in this container, so the
decode kernels are STUBBED (deterministic fake features, clearly marked);
the Spark-side plumbing — schemas, Arrow batch shapes, partitioning,
``mapInPandas`` signatures, frame-sampling explode — is real and tested.
Swap ``_decode_stub`` for a PIL/ffmpeg call in deployment.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, width int, height int,"
    " n_frames int, sample_rate int"
)

FEATURES_SCHEMA = "doc_id long, media_type string, feature array<float>"

FRAME_FEATURES_SCHEMA = "doc_id long, frame_index int, feature array<float>"


def attach_fake_media(documents: DataFrame) -> DataFrame:
    """Derive a deterministic opaque media blob + metadata per document —
    the stand-in for a real (url -> image/audio bytes) crawl column."""
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
    )
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("media"),
        mt.alias("media_type"),
        (F.pmod(F.col("doc_id") * 37, F.lit(512)) + 64).cast("int").alias("width"),
        (F.pmod(F.col("doc_id") * 53, F.lit(512)) + 64).cast("int").alias("height"),
        (F.pmod(F.col("doc_id"), F.lit(24)) + 1).cast("int").alias("n_frames"),
        F.lit(16000).alias("sample_rate"),
    )


def _decode_stub(media: bytes, media_type: str, dim: int = 16) -> list[float]:
    """STUB decoder: deterministic pseudo-features from the blob hash.

    A real deployment replaces this with PIL/torchaudio/ffmpeg decoding —
    raising NotImplementedError on unsupported types is the intended
    behavior there; the fake keeps the pipeline testable here."""
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for media_type={media_type}")
    digest = hashlib.sha256(media or b"").digest()
    vals = struct.unpack(f">{dim}H", digest[: dim * 2])
    return [v / 65535.0 for v in vals]


def extract_features(media_df: DataFrame, dim: int = 16) -> DataFrame:
    """media -> fixed-width feature vector via Arrow-batched mapInPandas.
    Column-pruned input; one vector per blob."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "feature": [
                        _decode_stub(m, t, dim)
                        for m, t in zip(pdf["media"], pdf["media_type"])
                    ],
                }
            )

    return media_df.select("doc_id", "media", "media_type").mapInPandas(
        run, schema="doc_id long, media_type string, feature array<float>"
    )


def sample_frames(media_df: DataFrame, every_k: int = 4) -> DataFrame:
    """Frame sampling plumbing for video blobs: frame indices (0, k,
    2k, ...) are computed JVM-side as an ARRAY per video, and the fan-out
    to per-frame rows happens INSIDE the Python batch — the media blob
    crosses the Arrow boundary once per VIDEO, not once per sampled
    frame (a JVM-side explode before the decode duplicated the fat blob
    n_frames/k times through serialization — the classic fat-column-at-
    finer-grain trap; a real decoder also wants the whole blob per task
    to open the container once and seek, not one copy per frame)."""
    frames = media_df.where(F.col("media_type") == "video").select(
        "doc_id",
        "media",
        F.sequence(
            F.lit(0), F.col("n_frames") - 1, F.lit(every_k)
        ).alias("frame_indices"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            idxs: list = []
            feats: list = []
            for d, m, arr in zip(
                pdf["doc_id"], pdf["media"], pdf["frame_indices"]
            ):
                # numpy-array column: guard with `is None`, never truthiness
                for i in arr if arr is not None else []:
                    ids.append(d)
                    idxs.append(int(i))
                    feats.append(
                        _decode_stub(
                            (m or b"") + struct.pack(">I", int(i)), "video", 8
                        )
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_index": idxs, "feature": feats}
            )

    return frames.mapInPandas(run, schema=FRAME_FEATURES_SCHEMA)


def resize_metadata(media_df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning JVM-side: target dims preserving aspect ratio —
    metadata math needs no decode at all."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")),
    )
    return media_df.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )
