"""Baseline JPEG codec tests — pyramids_spark.jpeg.

Reference behavior: the reference decodes JPEG through GDAL/PIL system
libraries; this codec replaces that seam in pure Python/numpy (ITU-T
T.81 baseline sequential Huffman)."""

import struct

import numpy as np
import pytest

from pyramids_spark import codecs, jpeg


def _gradient_rgb(h, w):
    return np.stack([
        np.add.outer(np.arange(h), np.arange(w)) * 2 % 256,
        np.add.outer(np.arange(h) * 2, np.arange(w)) % 256,
        np.full((h, w), 100),
    ], axis=-1).astype(np.uint8)


def test_jpeg_gray_high_quality_near_exact():
    g = (np.add.outer(np.arange(40) * 3, np.arange(56) * 2) % 256
         ).astype(np.uint8)
    enc = jpeg.encode_jpeg(g, quality=95, subsample=False)
    assert enc[:3] == b"\xff\xd8\xff" and enc[-2:] == b"\xff\xd9"
    dec = jpeg.decode_jpeg(enc)
    assert dec.shape == g.shape and dec.dtype == np.uint8
    # smooth content at q95: DCT round trip is exact here
    assert int(np.abs(dec.astype(int) - g.astype(int)).max()) <= 2


def test_jpeg_color_444_and_420():
    rgb = _gradient_rgb(33, 41)  # odd sizes force edge-padded MCUs
    for sub, tol in ((False, 6), (True, 10)):
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(rgb, quality=95,
                                                subsample=sub))
        assert dec.shape == rgb.shape
        assert int(np.abs(dec.astype(int) - rgb.astype(int)).max()) <= tol


def test_jpeg_restart_markers():
    rgb = _gradient_rgb(37, 29)
    enc = jpeg.encode_jpeg(rgb, quality=92, subsample=True, restart=2)
    assert struct.pack(">HH", 0xFFDD, 4) + struct.pack(">H", 2) in enc
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(rgb, quality=92,
                                             subsample=True))
    dec = jpeg.decode_jpeg(enc)
    # RST only resets predictors/bit alignment: pixels match the
    # no-restart encode exactly
    assert np.array_equal(dec, base)


def test_jpeg_quality_monotone_and_size():
    rgb = _gradient_rgb(32, 32)
    lo = jpeg.encode_jpeg(rgb, quality=20)
    hi = jpeg.encode_jpeg(rgb, quality=95)
    assert len(lo) < len(hi)
    elo = np.abs(jpeg.decode_jpeg(lo).astype(int) - rgb.astype(int)).mean()
    ehi = np.abs(jpeg.decode_jpeg(hi).astype(int) - rgb.astype(int)).mean()
    assert ehi < elo


def test_jpeg_progressive_rejects():
    enc = bytearray(jpeg.encode_jpeg(np.zeros((8, 8), np.uint8)))
    at = enc.find(b"\xff\xc0")
    enc[at + 1] = 0xC2  # SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        jpeg.decode_jpeg(bytes(enc))


def test_jpeg_through_codec_dispatch():
    g = (np.arange(16 * 24, dtype=np.int64) % 256).astype(np.uint8
                                                          ).reshape(16, 24)
    enc = jpeg.encode_jpeg(g, quality=95)
    assert codecs.sniff(enc) == "jpeg"
    luma = codecs.decode_image(enc)
    assert luma.shape == (16, 24)
    rgbenc = jpeg.encode_jpeg(_gradient_rgb(16, 24), quality=95)
    assert codecs.decode_image(rgbenc).shape == (16, 24)


def test_jpeg_huffman_tables_canonical():
    """Encoder DHT tables must satisfy Kraft (prefix-free canonical)."""
    for counts, syms in ((jpeg._DC_COUNTS, jpeg._DC_SYMS),
                         (jpeg._AC_COUNTS, jpeg._AC_SYMS)):
        assert sum(counts) == len(syms)
        assert sum(c * 2 ** -(i + 1) for i, c in enumerate(counts)) <= 1
        codes = jpeg._huff_codes(counts, syms)
        seen = set()
        for c, ln in codes.values():
            assert c < (1 << ln)
            seen.add((ln, c))
        assert len(seen) == len(codes)


def test_media_corpus_contains_real_jpegs(spark):
    """media_features runs over a corpus whose image rotation now emits
    baseline JPEGs; every JPEG payload decodes through the real path."""
    from pyramids_spark import media, synth

    docs = synth.documents_spans(spark, 80)
    m = media.synth_media(spark, docs).persist()
    rows = m.collect()
    kinds = set()
    for r in rows:
        try:
            kinds.add(codecs.sniff(bytes(r.payload)))
        except ValueError:
            kinds.add("blob")
    assert "jpeg" in kinds
    feats = {f.media_ref: f.feature for f in media.decode_features(m).collect()}
    for r in rows:
        if r.kind == "image" and codecs.sniff(bytes(r.payload)) == "jpeg":
            img = codecs.decode_image(bytes(r.payload))
            hist, _ = np.histogram(img, bins=media.FEATURE_DIM,
                                   range=(0, 256))
            np.testing.assert_allclose(
                np.asarray(feats[r.media_ref]), hist / img.size, rtol=1e-6
            )


def test_jpeg_fill_bytes_before_marker():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker;
    the parser must skip them instead of reading a garbage segment length
    (code-review r5 finding)."""
    g = (np.add.outer(np.arange(16), np.arange(16)) % 256).astype(np.uint8)
    enc = jpeg.encode_jpeg(g, quality=90, subsample=False)
    i = enc.index(b"\xff\xdb")  # first DQT
    padded = enc[:i] + b"\xff\xff\xff" + enc[i:]
    assert np.array_equal(jpeg.decode_jpeg(padded), jpeg.decode_jpeg(enc))
