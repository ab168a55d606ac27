"""Baseline JPEG (ITU-T T.81 sequential DCT, Huffman) in pure
Python/numpy — the codec that carries essentially every wild image
corpus, previously the engine's biggest excluded media format.

What makes this tractable without a native library: baseline JPEG is
8×8 block DCT + scalar quantization + canonical Huffman coding — the
Huffman bit loop is sequential Python, but it runs per PAYLOAD inside
Arrow batches (``media.py`` thumbnail-scale blobs), and everything
around it (dequantize, inverse DCT, upsampling, color transform)
batches across all blocks of an image in one einsum. The reference
decodes JPEG through GDAL/PIL system libraries; this module replaces
that seam the same way ``codecs.py`` did for PNG/BMP/WAV.

Supported: SOF0/SOF1 (baseline + extended sequential, Huffman),
grayscale, 4:4:4 and 4:2:0 YCbCr, restart markers, multiple DQT/DHT
segments. Loud rejects: progressive (SOF2), arithmetic coding (SOF9+),
12-bit precision, other subsampling grids. The ENCODER (JFIF output;
quality knob with the libjpeg scaling law) exists as the engine's
export path and the fixture generator — tables are written into the
stream (DQT/DHT), so decoder interop never depends on them matching
any other encoder's defaults.
"""

from __future__ import annotations

import struct

import numpy as np


def _zigzag() -> np.ndarray:
    idx, r, c = [], 0, 0
    for _ in range(64):
        idx.append(r * 8 + c)
        if (r + c) % 2 == 0:
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return np.array(idx)


_ZZ = _zigzag()

#: Annex K quantization tables (informative defaults; the stream's DQT
#: is always authoritative on decode)
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)
_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

#: Huffman tables for the ENCODER. DC: Annex K. AC: every symbol at a
#: fixed 9-bit depth — trivially canonical-valid, self-described in the
#: DHT segment, so decode interop is exact regardless of optimality.
_DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_COUNTS = [0] * 16
_AC_COUNTS[8] = len(_AC_SYMS)  # all 162 symbols at length 9 (162/512 ≤ 1)


def _dct_mat() -> np.ndarray:
    u = np.arange(8)[:, None].astype(np.float64)
    x = np.arange(8)[None, :].astype(np.float64)
    m = np.cos((2 * x + 1) * u * np.pi / 16) / 2
    m[0] *= 1 / np.sqrt(2)
    return m


_M = _dct_mat()


def _huff_codes(counts, symbols) -> "dict[int, tuple[int, int]]":
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _scale_q(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)

    def restart(self, k: int):
        self.flush()
        self.buf += bytes([0xFF, 0xD0 + (k % 8)])


def _mag(v: int) -> "tuple[int, int]":
    """value → (size, bits) per the T.81 magnitude coding."""
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (level-shifted) → (H/8 * W/8, 8, 8) DCT coefs,
    blocks in raster order."""
    h, w = plane.shape
    b = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    b = b.reshape(-1, 8, 8)
    return np.einsum("ij,njk,lk->nil", _M, b, _M)


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % mh, -w % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = True, restart: int = 0) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 → baseline JFIF bytes. Color
    uses 4:2:0 when ``subsample`` (the wild-file default), else 4:4:4.
    ``restart`` > 0 emits a DRI segment and RST markers every that many
    MCUs — the error-resilience layout many wild files carry."""
    img = np.asarray(img, np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qy = _scale_q(_Q_LUM, quality)
    qc = _scale_q(_Q_CHR, quality)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2,
                             cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2,
                             crp.shape[1] // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # quantized zigzag coefficients per component, blocks in raster order;
    # each plane pads (edge-replicated) to exactly its MCU coverage
    comp_coef, comp_bw = [], []
    for ci, p in enumerate(planes):
        sh, sv = samp[ci]
        bh, bw_ = 8 * sv * mcus_y, 8 * sh * mcus_x
        p = np.pad(p, ((0, bh - p.shape[0]), (0, bw_ - p.shape[1])),
                   mode="edge")
        q = qy if qsel[ci] == 0 else qc
        coefs = _fdct_blocks(p - 128.0)
        qz = np.rint(coefs / q).astype(np.int32).reshape(-1, 64)[:, _ZZ]
        comp_coef.append(qz)
        comp_bw.append(bw_ // 8)

    dc_codes = _huff_codes(_DC_COUNTS, _DC_SYMS)
    ac_codes = _huff_codes(_AC_COUNTS, _AC_SYMS)
    bwt = _BitWriter()
    pred = [0] * len(planes)
    mcu_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_n and mcu_n % restart == 0:
                bwt.restart(mcu_n // restart - 1)
                pred = [0] * len(planes)
            mcu_n += 1
            for ci in range(len(planes)):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * comp_bw[ci] + mx * sh + bx
                        zz = comp_coef[ci][bi]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        size, bits = _mag(diff)
                        c, ln = dc_codes[size]
                        bwt.put(c, ln)
                        if size:
                            bwt.put(bits, size)
                        run = 0
                        nz = np.nonzero(zz[1:])[0]
                        last = nz[-1] + 1 if len(nz) else 0
                        for k in range(1, last + 1):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                c, ln = ac_codes[0xF0]
                                bwt.put(c, ln)
                                run -= 16
                            size, bits = _mag(v)
                            c, ln = ac_codes[(run << 4) | size]
                            bwt.put(c, ln)
                            bwt.put(bits, size)
                            run = 0
                        if last < 63:
                            c, ln = ac_codes[0x00]
                            bwt.put(c, ln)
    bwt.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + qy.reshape(-1)[_ZZ].astype(np.uint8)
               .tobytes())
    if not gray:
        out += seg(0xFFDB, b"\x01" + qc.reshape(-1)[_ZZ].astype(np.uint8)
                   .tobytes())
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci in range(len(planes)):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, b"\x00" + bytes(_DC_COUNTS) + bytes(_DC_SYMS))
    out += seg(0xFFC4, b"\x10" + bytes(_AC_COUNTS) + bytes(_AC_SYMS))
    if restart:
        out += seg(0xFFDD, struct.pack(">H", restart))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0 for all
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += bwt.buf
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.bit = 0

    def read1(self) -> int:
        v = (self.d[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return v

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read1()
        return v


def _dec_sym(br: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read1()
        s = table.get((ln, code))
        if s is not None:
            return s
    raise ValueError("invalid Huffman code in JPEG scan")


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JFIF bytes → (h, w) uint8 gray or (h, w, 3) uint8 RGB."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    i = 2
    qt: "dict[int, np.ndarray]" = {}
    huff: "dict[tuple[int, int], dict]" = {}
    comps = None
    h = w = None
    dri = 0
    scan = None
    scomp = None
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: optional fill bytes before a marker
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (ln,) = struct.unpack_from(">H", b, i + 2)
        body = b[i + 4:i + 2 + ln]
        i += 2 + ln
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                t = np.zeros(64, np.int32)
                t[_ZZ] = np.frombuffer(body, np.uint8, 64, p + 1)
                qt[tq] = t.reshape(8, 8)
                p += 65
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec, h, w, nc = struct.unpack_from(">BHHB", body)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            comps = []
            for k in range(nc):
                cid, sampb, tq = body[6 + 3 * k:9 + 3 * k]
                comps.append({"id": cid, "h": sampb >> 4, "v": sampb & 15,
                              "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "progressive/arithmetic/hierarchical JPEG (baseline "
                "sequential Huffman only)"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                counts = list(body[p + 1:p + 17])
                nsym = sum(counts)
                syms = list(body[p + 17:p + 17 + nsym])
                codes = _huff_codes(counts, syms)
                huff[(tc, th)] = {(lnn, c): s
                                  for s, (c, lnn) in codes.items()}
                p += 17 + nsym
        elif marker == 0xDD:
            (dri,) = struct.unpack_from(">H", body)
        elif marker == 0xDA:  # SOS: entropy data follows
            ns = body[0]
            scomp = []
            for k in range(ns):
                cid, tabs = body[1 + 2 * k:3 + 2 * k]
                scomp.append((cid, tabs >> 4, tabs & 15))
            # scan ends at the first marker that is not RST/stuffing
            j = i
            while j + 1 < len(b):
                if b[j] == 0xFF and b[j + 1] != 0 and not \
                        (0xD0 <= b[j + 1] <= 0xD7):
                    break
                j += 1
            scan = b[i:j]
            break
        # other APPn/COM segments: skipped
    if comps is None or scan is None:
        raise ValueError("JPEG without SOF/SOS")

    # split scan at restart markers, unstuff each segment
    segs, cur = [], bytearray()
    j = 0
    while j < len(scan):
        if scan[j] == 0xFF:
            nxt = scan[j + 1] if j + 1 < len(scan) else 0xD9
            if nxt == 0:
                cur.append(0xFF)
                j += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segs.append(bytes(cur))
                cur = bytearray()
                j += 2
                continue
            break
        cur.append(scan[j])
        j += 1
    segs.append(bytes(cur))

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    sampling = tuple((c["h"], c["v"]) for c in comps)
    if len(comps) == 1:
        hmax = vmax = 1
        sampling = ((1, 1),)
    elif sampling not in (((1, 1), (1, 1), (1, 1)),
                          ((2, 2), (1, 1), (1, 1))):
        raise NotImplementedError(
            f"sampling grid {sampling} (4:4:4 and 4:2:0 only)"
        )
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {sc[0]: (sc[1], sc[2]) for sc in (scomp or [])}
    ncomp = len(comps)
    cw = [mcus_x * c["h"] for c in comps] if ncomp > 1 else [mcus_x]
    chh = [mcus_y * c["v"] for c in comps] if ncomp > 1 else [mcus_y]
    coef = [np.zeros((chh[ci] * cw[ci], 64), np.int32)
            for ci in range(ncomp)]

    br = _BitReader(segs[0])
    seg_i = 0
    pred = [0] * ncomp
    mcu_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_n and mcu_n % dri == 0:
                seg_i += 1
                br = _BitReader(segs[seg_i])
                pred = [0] * ncomp
            for ci, c in enumerate(comps):
                dct = huff[(0, by_id[c["id"]][0])]
                act = huff[(1, by_id[c["id"]][1])]
                sh, sv = (c["h"], c["v"]) if ncomp > 1 else (1, 1)
                for by in range(sv):
                    for bx in range(sh):
                        s = _dec_sym(br, dct)
                        pred[ci] += _extend(br.read(s), s)
                        blk = coef[ci][(my * sv + by) * cw[ci]
                                       + mx * sh + bx]
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _dec_sym(br, act)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break
                            k += r
                            blk[k] = _extend(br.read(s), s)
                            k += 1
            mcu_n += 1

    planes = []
    for ci, c in enumerate(comps):
        dz = np.zeros((len(coef[ci]), 64), np.int32)
        dz[:, _ZZ] = coef[ci]
        dq = dz.reshape(-1, 8, 8).astype(np.float64) * qt[c["tq"]]
        px = np.einsum("ji,njk,kl->nil", _M, dq, _M) + 128.0
        ph, pw = chh[ci] * 8, cw[ci] * 8
        plane = (px.reshape(chh[ci], cw[ci], 8, 8)
                 .transpose(0, 2, 1, 3).reshape(ph, pw))
        planes.append(np.clip(np.rint(plane), 0, 255).astype(np.uint8))
    if ncomp == 1:
        return planes[0][:h, :w]
    y, cb, cr = planes
    if sampling[0] == (2, 2):
        cb = np.repeat(np.repeat(cb, 2, 0), 2, 1)
        cr = np.repeat(np.repeat(cr, 2, 0), 2, 1)
    y = y[:h, :w].astype(np.float64)
    cb = cb[:h, :w].astype(np.float64) - 128.0
    cr = cr[:h, :w].astype(np.float64) - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
