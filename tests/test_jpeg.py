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


def test_jpeg_arithmetic_rejects():
    enc = bytearray(jpeg.encode_jpeg(np.zeros((8, 8), np.uint8)))
    at = enc.find(b"\xff\xc0")
    enc[at + 1] = 0xC9  # SOF0 → SOF9 (arithmetic sequential)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        jpeg.decode_jpeg(bytes(enc))


def test_jpeg_progressive_roundtrip_matches_baseline():
    """Spectral-selection progressive (our encoder's layout: interleaved
    DC scan + one full-band AC scan per component) decodes to EXACTLY the
    baseline pixels — same coefficients, different entropy layout."""
    rng = np.random.default_rng(21)
    for shape, kw in [((16, 24), {}), ((21, 13, 3), {"subsample": False}),
                      ((21, 13, 3), {"subsample": True}),
                      ((32, 32, 3), {"subsample": True})]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90, **kw))
        pb = jpeg.encode_jpeg(img, quality=90, progressive=True, **kw)
        assert b"\xff\xc2" in pb  # really SOF2
        assert pb.count(b"\xff\xda") == (2 if img.ndim == 2 else 4)
        assert np.array_equal(jpeg.decode_jpeg(pb), base)
    assert codecs.sniff(pb) == "jpeg"
    with pytest.raises(NotImplementedError, match="restart"):
        jpeg.encode_jpeg(img, progressive=True, restart=2)


def test_jpeg_progressive_successive_approximation():
    """Hand-built 4-scan stream over two 8×8 gray blocks exercising every
    refine path: DC first/refine at Al=1/0, AC first with an EOBn run
    (EOB1 spanning both blocks), AC refine with tail correction bits and
    a newly-nonzero coefficient after a zero-run. Expected pixels come
    from the module's own IDCT on the intended final coefficients —
    the test isolates the progressive ENTROPY decode."""
    import struct

    dc_counts = [0] * 16
    dc_counts[0] = 1
    dc_counts[1] = 1
    dc_syms = [2, 3]
    ac_counts = [0] * 16
    ac_counts[2] = 5
    ac_syms = [0x01, 0x31, 0x10, 0x00, 0x11]
    dcc = jpeg._huff_codes(dc_counts, dc_syms)
    acc = jpeg._huff_codes(ac_counts, ac_syms)

    def wput(bwt, sym, tab):
        c, ln = tab[sym]
        bwt.put(c, ln)

    # A: DC=6, zz1=-3, zz5=2 ; B: DC=-5, zz2=1
    b1 = jpeg._BitWriter()  # DC first, Al=1: diffs of coef>>1 = 3, -6
    for d in (3, -6):
        s, bits = jpeg._mag(d)
        wput(b1, s, dcc)
        b1.put(bits, s)
    b1.flush()
    b2 = jpeg._BitWriter()  # AC first, Al=1: A gets -1@zz1, 1@zz5
    wput(b2, 0x01, acc)
    b2.put(jpeg._mag(-1)[1], 1)
    wput(b2, 0x31, acc)
    b2.put(jpeg._mag(1)[1], 1)
    wput(b2, 0x10, acc)  # EOB1: eobrun = 2 covers rest of A + all of B
    b2.put(0, 1)
    b2.flush()
    b3 = jpeg._BitWriter()  # DC refine: A bit 0 (6 stays), B bit 1 (-6→-5)
    b3.put(0, 1)
    b3.put(1, 1)
    b3.flush()
    b4 = jpeg._BitWriter()  # AC refine, Al=0
    wput(b4, 0x00, acc)  # A: EOB → tail corrections
    b4.put(1, 1)  # zz1: -2 → -3
    b4.put(0, 1)  # zz5: stays 2
    wput(b4, 0x11, acc)  # B: skip 1 zero, new +1 at zz2
    b4.put(1, 1)
    wput(b4, 0x00, acc)  # B: EOB (no corrections past k)
    b4.flush()

    def seg(m, body):
        return struct.pack(">HH", m, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, b"\x00" + bytes(np.ones(64, np.uint8)))
    out += seg(0xFFC2, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    out += seg(0xFFC4, b"\x00" + bytes(dc_counts) + bytes(dc_syms))
    out += seg(0xFFC4, b"\x10" + bytes(ac_counts) + bytes(ac_syms))
    for (ss, se, ah, al), ent in [((0, 0, 0, 1), b1), ((1, 63, 0, 1), b2),
                                  ((0, 0, 1, 0), b3), ((1, 63, 1, 0), b4)]:
        out += seg(0xFFDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        out += ent.buf
    out += b"\xff\xd9"

    got = jpeg.decode_jpeg(bytes(out))
    zzA = np.zeros(64, np.int32)
    zzA[0], zzA[1], zzA[5] = 6, -3, 2
    zzB = np.zeros(64, np.int32)
    zzB[0], zzB[2] = -5, 1
    exp = []
    for zz in (zzA, zzB):
        d = np.zeros(64, np.int32)
        d[jpeg._ZZ] = zz
        px = np.einsum("ji,jk,kl->il", jpeg._M,
                       d.reshape(8, 8).astype(float), jpeg._M) + 128.0
        exp.append(np.clip(np.rint(px), 0, 255).astype(np.uint8))
    assert np.array_equal(got, np.concatenate(exp, axis=1))


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


def test_jpeg_noninterleaved_sequential_scans():
    """T.81 allows SEQUENTIAL scans holding one component each: the MCU is
    then a single data unit over the component's own non-padded raster
    (NOT the interleaved padded-MCU walk). 4:2:0 frame 10×20 → luma raster
    2×3 blocks inside a 2×4 padded grid, so any layout confusion shifts
    every block. Chroma stays at DC 0 (=128) so expected RGB = luma."""
    import struct

    h, w = 10, 20
    dcc = jpeg._huff_codes(jpeg._DC_COUNTS, jpeg._DC_SYMS)
    acc = jpeg._huff_codes(jpeg._AC_COUNTS, jpeg._AC_SYMS)
    luma_dc = [[-80, 200, 404], [96, -320, 8]]  # per block, raster order

    def scan_bits(dcs):
        bwt = jpeg._BitWriter()
        pred = 0
        for v in dcs:
            s, bits = jpeg._mag(v - pred)
            pred = v
            c, ln = dcc[s]
            bwt.put(c, ln)
            if s:
                bwt.put(bits, s)
            c, ln = acc[0x00]  # EOB: DC-only block
            bwt.put(c, ln)
        bwt.flush()
        return bytes(bwt.buf)

    def seg(m, body):
        return struct.pack(">HH", m, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, b"\x00" + bytes(np.ones(64, np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, b"\x00" + bytes(jpeg._DC_COUNTS) + bytes(jpeg._DC_SYMS))
    out += seg(0xFFC4, b"\x10" + bytes(jpeg._AC_COUNTS) + bytes(jpeg._AC_SYMS))
    # one sequential scan PER component (Ss=0, Se=63)
    flat = [v for row in luma_dc for v in row]
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0])) + scan_bits(flat)
    out += seg(0xFFDA, bytes([1, 2, 0x00, 0, 63, 0])) + scan_bits([0, 0])
    out += seg(0xFFDA, bytes([1, 3, 0x00, 0, 63, 0])) + scan_bits([0, 0])
    out += b"\xff\xd9"

    got = jpeg.decode_jpeg(bytes(out))
    assert got.shape == (h, w, 3)
    for br in range(2):
        for bc in range(3):
            d = np.zeros((8, 8))
            d[0, 0] = luma_dc[br][bc]
            px = np.einsum("ji,jk,kl->il", jpeg._M, d, jpeg._M) + 128.0
            want = int(np.clip(np.rint(px[0, 0]), 0, 255))
            blockpx = got[br * 8:(br + 1) * 8, bc * 8:min((bc + 1) * 8, w)]
            assert (blockpx == want).all(), (br, bc, want, blockpx[0, 0])


def test_jpeg_12bit_gray_and_rgb_roundtrip():
    """12-bit precision (SOF1, Pq=1 16-bit quant tables, widened Huffman
    categories): decodes to uint16 in 0..4095, near-exact on smooth
    content at high quality."""
    g = ((np.add.outer(np.arange(24) * 48, np.arange(40) * 31)) % 4096
         ).astype(np.uint16)
    enc = jpeg.encode_jpeg(g, quality=95, bits=12)
    assert b"\xff\xc1" in enc and b"\xff\xc0" not in enc  # SOF1, not SOF0
    # DQT carries Pq=1 in the precision nibble
    at = enc.find(b"\xff\xdb")
    assert enc[at + 4] >> 4 == 1
    dec = jpeg.decode_jpeg(enc)
    assert dec.dtype == np.uint16 and dec.shape == g.shape
    assert dec.max() > 255  # genuinely more than 8 bits of range
    assert int(np.abs(dec.astype(int) - g.astype(int)).max()) <= 40
    rgb = np.stack([
        np.add.outer(np.arange(17) * 64, np.arange(21) * 32) % 4096,
        np.add.outer(np.arange(17) * 32, np.arange(21) * 64) % 4096,
        np.full((17, 21), 1600),
    ], axis=-1).astype(np.uint16)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(rgb, quality=95, bits=12,
                                            subsample=False))
    assert dec.dtype == np.uint16 and dec.shape == rgb.shape
    assert int(np.abs(dec.astype(int) - rgb.astype(int)).max()) <= 96


def test_jpeg_12bit_progressive_matches_sequential():
    g = ((np.add.outer(np.arange(16) * 5, np.arange(24) * 7) * 13) % 4096
         ).astype(np.uint16)
    seq = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=90, bits=12))
    pro = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=90, bits=12,
                                            progressive=True))
    assert np.array_equal(seq, pro)  # same coefficients, different scans


def test_jpeg_12bit_dc_ssss16_special_case():
    """A hand-patched scan exercises SSSS=16: diff=+32768 with NO
    appended bits (T.81 F.2.2.1) — the decoder must not consume 16
    magnitude bits."""
    # build a 1-block 12-bit gray stream whose DC table includes 16
    counts = [0] * 16
    counts[5] = 17
    syms = list(range(17))
    codes = jpeg._huff_codes(counts, syms)
    bw = jpeg._BitWriter()
    c, ln = codes[16]
    bw.put(c, ln)       # DC: SSSS=16 → +32768, no bits
    c, ln = jpeg._huff_codes(jpeg._AC12_COUNTS, jpeg._AC12_SYMS)[0x00]
    bw.put(c, ln)       # AC: EOB
    bw.flush()
    qz = np.ones(64, np.uint16)

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, b"\x10" + qz.astype(">u2").tobytes())
    out += seg(0xFFC1, struct.pack(">BHHB", 12, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += seg(0xFFC4, b"\x00" + bytes(counts) + bytes(syms))
    out += seg(0xFFC4, b"\x10" + bytes(jpeg._AC12_COUNTS)
               + bytes(jpeg._AC12_SYMS))
    out += seg(0xFFDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    out += bytes(bw.buf) + b"\xff\xd9"
    dec = jpeg.decode_jpeg(bytes(out))
    # DC=32768 × q=1 → IDCT flat plane 32768/8 + 2048 = 6144 → clips 4095
    assert dec.shape == (8, 8) and (dec == 4095).all()
