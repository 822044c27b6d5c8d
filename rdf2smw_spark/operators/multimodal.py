"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched mapInPandas.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are stubs: `fake=True` (default in tests) runs a
deterministic fake decoder that exercises the full Spark-side plumbing —
schema, batch shape, partitioning, metadata propagation — while
`fake=False` raises NotImplementedError at the exact point a real codec
would plug in. Everything around the kernel (the distributed plan) is
real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, width int, height int, "
    "sample_rate int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, checksum string, "
    "feature array<float>"
)

FEATURE_DIM = 8


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (1 + i % 4)
        rows.append(
            (i, kind, bytearray(payload), 64 + i % 32, 48 + i % 16, 16000, 1000 + i)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, kind: str) -> list[float]:
    """Deterministic stand-in for decode + feature extraction: FEATURE_DIM
    floats derived from the payload digest."""
    d = hashlib.sha256(payload).digest()
    return [d[j] / 255.0 for j in range(FEATURE_DIM)]


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Binary payload → fixed-dim feature vector via mapInPandas.
    Real pipeline shape: one Arrow batch of payloads in, one batch of
    vectors out; the codec call is the only stubbed line."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, checks, sizes = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                raw = bytes(payload)
                if not fake:
                    raise NotImplementedError(
                        "real decode requires an image/audio codec not present "
                        "in this environment; plug PIL/ffmpeg here"
                    )
                feats.append(_fake_decode(raw, kind))
                checks.append(hashlib.sha256(raw).hexdigest())
                sizes.append(len(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "checksum": checks,
                    "feature": feats,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 250, fake: bool = True) -> DataFrame:
    """Video → frame rows (media_id, frame_ts_ms, frame binary). The
    sampling plan (explode over timestamps) is real Spark; the frame
    decode is the stubbed kernel."""
    vids = media.filter(F.col("kind") == "video").select(
        "media_id", "payload", "duration_ms"
    )
    ts = vids.select(
        "media_id",
        "payload",
        F.explode(F.expr(f"sequence(0, duration_ms - 1, {every_ms})")).alias("frame_ts_ms"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frames = []
            for payload, t in zip(pdf["payload"], pdf["frame_ts_ms"]):
                if not fake:
                    raise NotImplementedError("real frame decode requires ffmpeg")
                frames.append(hashlib.sha256(bytes(payload) + str(t).encode()).digest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "frame": frames,
                }
            )

    return ts.mapInPandas(batches, schema="media_id bigint, frame_ts_ms int, frame binary")
