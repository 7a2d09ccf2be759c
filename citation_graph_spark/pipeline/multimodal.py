"""Multimodal column plumbing — images/audio/video as opaque binary.

The Spark-side machinery is real and tested: typed schema (binary payload +
metadata struct), Arrow-batched ``mapInPandas`` operators with bounded
batch sizes (media rows are big — the batch iterator shape is exactly what
keeps executor memory flat at 100 TB), and partition-count control so one
task never holds more than a few hundred MB of payload.

The codec step itself is STUBBED: the container has no image/audio libs, so
``decode_image`` raises ``NotImplementedError`` unless
``fake_decoder=True``, which substitutes a deterministic fake (parses the
synthetic payload header) letting every downstream op — feature extract,
resize bookkeeping, frame sampling — run and be tested for schema,
batching, and partitioning behavior.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feat array<double>"


def synth_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = b'FAKE' + kind byte +
    8-byte big-endian content hash; metadata consistent with kind."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from citation_graph_spark.datagen import _mix64

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = ("image", "audio", "video")[i % 3]
                content = _mix64(seed * 31 + i)
                payload = b"FAKE" + kind[:1].encode() + content.to_bytes(8, "big")
                meta = {
                    "width": 64 + i % 512 if kind != "audio" else None,
                    "height": 64 + (i * 7) % 512 if kind != "audio" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "duration_ms": (i % 300) * 1000 if kind != "image" else None,
                }
                rows.append((i, kind, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_features(
    media: DataFrame, fake_decoder: bool = False, feat_dim: int = 8
) -> DataFrame:
    """payload → feature vector via Arrow-batched mapInPandas.

    Real deployment plugs a codec (PIL/ffmpeg) into ``_decode_payload``;
    here that seam raises unless ``fake_decoder`` — the deterministic fake
    derives ``feat_dim`` doubles from the payload's content hash, so tests
    can assert exact values end-to-end."""

    def _decode_payload(payload: bytes) -> list[float]:
        if not fake_decoder:
            raise NotImplementedError(
                "media codecs not available in this environment; "
                "pass fake_decoder=True for the deterministic test path"
            )
        if payload[:4] != b"FAKE":
            raise ValueError("unknown payload format")
        content = int.from_bytes(payload[5:13], "big")
        return [((content >> (8 * j)) & 0xFF) / 255.0 for j in range(feat_dim)]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "feat": pdf["payload"].map(_decode_payload),
                }
            )
            yield out

    # Only (media_id, kind, payload) cross into Python; metadata stays JVM-side.
    return media.select("media_id", "kind", "payload").mapInPandas(
        op, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video rows → (media_id, frame_ts_ms) sampling plan. Pure column ops
    (sequence/explode) — the plan is JVM-side; only actual frame decode
    would touch Python."""
    videos = media.where(F.col("kind") == "video").where(
        F.col("meta.duration_ms").isNotNull() & (F.col("meta.duration_ms") > 0)
    )
    return videos.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
