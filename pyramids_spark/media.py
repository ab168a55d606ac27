"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Task-brief contract: treat media as ``binary`` columns with typed metadata;
implement decode / feature-extract / resize / frame-sample as pandas UDFs
over ``mapInPandas``. The imaging/audio libraries are not in this container,
so the DECODE step is stubbed (``decode_stub='error'`` raises the
documented NotImplementedError; ``'fake'`` produces a deterministic fake
decode from the bytes) — but the Spark-side plumbing is real and tested:
schemas, Arrow batch shapes, partitioning, and the UDF signatures are
exactly what a libjpeg/ffmpeg-backed implementation would drop into.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import cells

#: typed metadata carried alongside every media payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_DIM = 16


def synth_media(spark, docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents' non-text spans:
    payload bytes derived from the media_ref hash (stands in for real blob
    storage reads)."""
    refs = docs.select(
        F.explode(F.filter(F.col("spans"), lambda s: s["kind"] != "text")).alias("s")
    ).select(
        F.col("s.media_ref").alias("media_ref"), F.col("s.kind").alias("kind")
    )
    h = F.xxhash64("media_ref")
    h2 = F.xxhash64("media_ref", F.lit(31))  # second stream, no overflow-able h*31
    return refs.select(
        "media_ref",
        "kind",
        (F.pmod(h, 512) + 16).cast("int").alias("width"),
        (F.pmod(h2, 512) + 16).cast("int").alias("height"),
        F.when(F.col("kind") == "video", (F.pmod(h, 120) + 1))
        .otherwise(F.lit(1)).cast("int").alias("n_frames"),
        F.when(F.col("kind") == "audio", F.lit(16000)).otherwise(F.lit(0))
        .cast("int").alias("sample_rate"),
        F.sha2(F.col("media_ref"), 256).cast("binary").alias("payload"),
    )


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for image decode: tile the payload bytes into
    a (h, w) uint8 array. A real build replaces this one function with
    PIL/libjpeg — everything around it (batching, schema, partitioning)
    stays identical."""
    b = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(width * height / b.size))
    return np.tile(b, reps)[: width * height].reshape(height, width)


def decode_features(
    media: DataFrame, decode_stub: str = "fake", batch_hint: int = 1024
) -> DataFrame:
    """media table → (media_ref, kind, feature: array<float>) via
    mapInPandas. Feature = FEATURE_DIM-bin normalized intensity histogram of
    the decoded frame — the canonical embed-after-decode shape."""
    if decode_stub == "error":
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg, not present in this "
            "container; use decode_stub='fake' for the deterministic stand-in"
        )

    schema = "media_ref string, kind string, feature array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                img = _fake_decode(payload, int(w), int(h))
                hist, _ = np.histogram(img, bins=FEATURE_DIM, range=(0, 256))
                feats.append((hist / max(1, img.size)).astype(np.float32))
            yield pd.DataFrame(
                {"media_ref": pdf["media_ref"], "kind": pdf["kind"], "feature": feats}
            )

    return media.mapInPandas(run, schema=schema)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: output metadata reflects the new shape; payload is
    re-derived by the fake decoder (a real build swaps in a resampler)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                _fake_decode(p, width, height).tobytes() for p in pdf["payload"]
            ]
            out["width"] = np.int32(width)
            out["height"] = np.int32(height)
            yield out

    return media.mapInPandas(run, schema=media.schema)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame index
    (pure column algebra — the frame extraction itself is the stubbed part).
    """
    v = media.where(F.col("kind") == "video")
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return v.select("media_ref", F.explode(idx).alias("frame_idx"))
