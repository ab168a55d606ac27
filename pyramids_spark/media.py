"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Task-brief contract: treat media as ``binary`` columns with typed metadata;
implement decode / feature-extract / resize / frame-sample as pandas UDFs
over ``mapInPandas``.

The DECODE step is REAL for the container formats a pure-numpy parser can
handle — PGM/PPM (8/16-bit), BMP, GIF, PNG (incl. Adam7/16-bit), JPEG
(baseline + progressive, own Huffman entropy decoder,
:mod:`pyramids_spark.jpeg`), WAV (PCM/float), and a frame-concatenated
PGM video stream (:mod:`pyramids_spark.codecs`). Only H.264 still raises
the documented ``NotImplementedError`` (a motion-compensated video codec is
out of scope); the legacy deterministic fake decode remains for payloads
that are not parseable media (sniff fallback), so the plumbing accepts
any bytes. Schemas, Arrow batch shapes, partitioning and UDF signatures
are identical for every path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import codecs

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


def _refs(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.explode(F.filter(F.col("spans"), lambda s: s["kind"] != "text")).alias("s")
    ).select(
        F.col("s.media_ref").alias("media_ref"), F.col("s.kind").alias("kind")
    )


def synth_media(spark, docs: DataFrame, real_payloads: bool = True) -> DataFrame:
    """Deterministic media table from the documents' non-text spans
    (stands in for real blob-storage reads).

    ``real_payloads=True``: payloads are genuine containers — PGM for
    images, PCM16 WAV for audio, concatenated PGM frames for video —
    synthesized from a per-ref deterministic RNG, so the decode path runs
    for real. ``False`` keeps the legacy sha256 blob (exercises the
    fake-decode fallback)."""
    refs = _refs(docs)
    h = F.xxhash64("media_ref")
    h2 = F.xxhash64("media_ref", F.lit(31))  # second stream, no overflow-able h*31
    meta = refs.select(
        "media_ref",
        "kind",
        (F.pmod(h, 48) + 8).cast("int").alias("width"),
        (F.pmod(h2, 48) + 8).cast("int").alias("height"),
        F.when(F.col("kind") == "video", (F.pmod(h, 12) + 2))
        .otherwise(F.lit(1)).cast("int").alias("n_frames"),
        F.when(F.col("kind") == "audio", F.lit(16000)).otherwise(F.lit(0))
        .cast("int").alias("sample_rate"),
        F.pmod(h2, F.lit(2**31 - 1)).alias("_seed"),
    )
    if not real_payloads:
        return meta.drop("_seed").withColumn(
            "payload", F.sha2(F.col("media_ref"), 256).cast("binary")
        )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for kind, w, hh, nf, sr, seed in zip(
                pdf["kind"], pdf["width"], pdf["height"], pdf["n_frames"],
                pdf["sample_rate"], pdf["_seed"],
            ):
                rng = np.random.default_rng(int(seed))
                if kind == "audio":
                    samples = rng.integers(
                        -2**15, 2**15, size=int(sr) // 10,
                        dtype=np.int64).astype(np.int16)
                    # every third ref stores IMA ADPCM (format 0x11) —
                    # the wild compressed-WAV layout; the rest PCM16
                    if int(seed) % 3 == 0:
                        payloads.append(
                            codecs.encode_wav_ima(samples, int(sr)))
                    else:
                        payloads.append(codecs.encode_wav(samples, int(sr)))
                elif kind == "video":
                    raws = [
                        rng.integers(0, 256, size=(int(hh), int(w)),
                                     dtype=np.int64).astype(np.uint8)
                        for _ in range(int(nf))
                    ]
                    # every fourth ref stores an ANIMATED GIF (lossless
                    # gray, so frame pixels don't depend on container);
                    # the rest the concatenated-PGM stream
                    if int(seed) % 4 == 0:
                        payloads.append(
                            codecs.encode_gif_anim(np.stack(raws)))
                    else:
                        payloads.append(
                            b"".join(codecs.encode_pgm(r) for r in raws))
                else:
                    # rotate real image containers by seed so the corpus
                    # mixes PGM, grayscale/RGB PNG, GIF and baseline/
                    # progressive JPEG payloads
                    pick = int(seed) % 5
                    if pick == 4:
                        payloads.append(
                            codecs.encode_gif(
                                rng.integers(0, 256, size=(int(hh), int(w)),
                                             dtype=np.int64).astype(np.uint8)
                            )
                        )
                    elif pick == 3:
                        from . import jpeg as _jp

                        payloads.append(
                            _jp.encode_jpeg(
                                rng.integers(0, 256, size=(int(hh), int(w), 3),
                                             dtype=np.int64).astype(np.uint8),
                                quality=90,
                                progressive=bool(int(seed) % 8 == 7),
                            )
                        )
                    elif pick == 0:
                        # alternate PGM with RLE8 BMP — both lossless gray
                        # containers, so decoded values don't depend on
                        # which one a ref lands on
                        enc = (codecs.encode_bmp_rle8
                               if int(seed) % 10 >= 5 else codecs.encode_pgm)
                        payloads.append(
                            enc(rng.integers(0, 256, size=(int(hh), int(w)),
                                             dtype=np.int64).astype(np.uint8))
                        )
                    elif pick == 1:
                        payloads.append(
                            codecs.encode_png(
                                rng.integers(0, 256, size=(int(hh), int(w)),
                                             dtype=np.int64).astype(np.uint8)
                            )
                        )
                    else:
                        payloads.append(
                            codecs.encode_png(
                                rng.integers(0, 256, size=(int(hh), int(w), 3),
                                             dtype=np.int64).astype(np.uint8)
                            )
                        )
            out = pdf.drop(columns=["_seed"]).copy()
            out["payload"] = payloads
            yield out

    return meta.mapInPandas(build, schema=MEDIA_META_SCHEMA)


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for payloads that are NOT parseable media
    (sniff fallback): tile the payload bytes into a (h, w) uint8 array."""
    b = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(width * height / b.size))
    return np.tile(b, reps)[: width * height].reshape(height, width)


def _decode_any(payload: bytes, width: int, height: int) -> np.ndarray:
    """Real decode when the payload is a recognized container (PGM/PPM/
    BMP/PNG/JPEG/WAV); tiled fake for anything unrecognized (legacy
    blobs)."""
    try:
        kind = codecs.sniff(bytes(payload))
    except ValueError:
        return _fake_decode(payload, width, height)
    if kind == "wav":
        samples, _ = codecs.decode_wav(bytes(payload))
        # audio "frame": 8-bit companded magnitude row, histogram-compatible;
        # clip before the cast — abs(-32768)>>7 is 256 and would wrap to 0
        mag = np.minimum(np.abs(samples[:, 0].astype(np.int32)) >> 7, 255)
        return mag.astype(np.uint8)[None, :]
    return codecs.decode_image(bytes(payload))


def decode_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """media table → (media_ref, kind, feature: array<float>) via
    mapInPandas. Feature = FEATURE_DIM-bin normalized intensity histogram
    of the decoded frame (image luma / companded audio magnitude) — the
    canonical embed-after-decode shape."""
    schema = "media_ref string, kind string, feature array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                img = _decode_any(payload, int(w), int(h))
                hist, _ = np.histogram(img, bins=FEATURE_DIM, range=(0, 256))
                feats.append((hist / max(1, img.size)).astype(np.float32))
            yield pd.DataFrame(
                {"media_ref": pdf["media_ref"], "kind": pdf["kind"], "feature": feats}
            )

    return media.mapInPandas(run, schema=schema)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Real nearest-neighbour resize for IMAGE rows (re-encoded PGM);
    audio/video rows pass through UNTOUCHED — resizing must not truncate a
    video stream to its first frame or replace audio bytes with a
    fake-decoded picture while the metadata still claims the old kind.
    Unrecognized image blobs go through the fake decoder so the pipeline
    never stalls on a legacy payload."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            new_p, new_w, new_h = [], [], []
            for kind, p, w0, h0 in zip(
                pdf["kind"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                if kind != "image":
                    new_p.append(p)
                    new_w.append(np.int32(w0))
                    new_h.append(np.int32(h0))
                    continue
                try:
                    img = codecs.decode_image(bytes(p))
                except (ValueError, NotImplementedError):
                    img = _fake_decode(p, int(w0), int(h0))
                new_p.append(codecs.encode_pgm(codecs.resize_nearest(img, width, height)))
                new_w.append(np.int32(width))
                new_h.append(np.int32(height))
            out["payload"] = new_p
            out["width"] = new_w
            out["height"] = new_h
            yield out

    return media.mapInPandas(run, schema=media.schema)


# back-compat alias (round-2 name)
resize_stub = resize_images


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index (pure
    column algebra over n_frames)."""
    v = media.where(F.col("kind") == "video")
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return v.select("media_ref", F.explode(idx).alias("frame_idx"))


def frame_extract(media: DataFrame, every_n: int = 10) -> DataFrame:
    """REAL frame extraction from video payloads — the concatenated-PGM
    stream (walks the self-delimiting headers) or an ANIMATED GIF
    (composed via the full disposal/transparency semantics, each sampled
    frame re-encoded PGM) → (media_ref, frame_idx, frame: binary, width,
    height)."""
    schema = (
        "media_ref string, frame_idx int, frame binary, width int, height int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_ref": [], "frame_idx": [], "frame": [],
                    "width": [], "height": []}

            def keep(ref, idx, blob, w, h):
                rows["media_ref"].append(ref)
                rows["frame_idx"].append(idx)
                rows["frame"].append(blob)
                rows["width"].append(w)
                rows["height"].append(h)

            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                b = bytes(payload)
                if b[:6] in (b"GIF87a", b"GIF89a"):
                    frames, _ = codecs.decode_gif_frames(b)
                    for idx in range(0, len(frames), every_n):
                        g = codecs.rgb_to_luma(frames[idx])
                        keep(ref, idx, codecs.encode_pgm(g),
                             g.shape[1], g.shape[0])
                    continue
                off, idx = 0, 0
                while off < len(b):
                    w, h, mx, doff = codecs._pnm_header(b[off:], b"P5")
                    end = off + doff + w * h * (2 if mx > 255 else 1)
                    if idx % every_n == 0:
                        keep(ref, idx, b[off:end], w, h)
                    off, idx = end, idx + 1
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "video").mapInPandas(run, schema=schema)
