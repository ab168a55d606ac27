"""JPEG (ITU-T T.81 DCT, Huffman) in pure Python/numpy — the codec
that carries essentially every wild image corpus, previously the
engine's biggest excluded media format.

What makes this tractable without a native library: baseline JPEG is
8×8 block DCT + scalar quantization + canonical Huffman coding — the
Huffman bit loop is sequential Python, but it runs per PAYLOAD inside
Arrow batches (``media.py`` thumbnail-scale blobs), and everything
around it (dequantize, inverse DCT, upsampling, color transform)
batches across all blocks of an image in one einsum. The reference
decodes JPEG through GDAL/PIL system libraries; this module replaces
that seam the same way ``codecs.py`` did for PNG/BMP/WAV.

Supported: SOF0/SOF1 (baseline + extended sequential, Huffman) AND
SOF2 (progressive: spectral selection + successive approximation,
multi-scan, EOBn run codes, per-scan table redefinition), 8-bit AND
12-bit precision (Pq=1 16-bit quant tables, SSSS=16 DC codes, uint16
output — the aerial/medical layout), grayscale, 4:4:4 and 4:2:0 YCbCr,
restart markers, multiple DQT/DHT segments. Loud rejects: arithmetic
coding (SOF9+), hierarchical, lossless, other subsampling grids. The
ENCODER (JFIF output;
quality knob with the libjpeg scaling law; ``progressive=True`` emits
spectral-selection scans) exists as the engine's export path and the
fixture generator — tables are written into the stream (DQT/DHT), so
decoder interop never depends on them matching any other encoder's
defaults.
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

#: 12-bit tables: DC diff categories reach 16 (T.81 F.1.2.1.2) and AC
#: sizes reach 14 (F.1.2.2.1); flat-depth canonical tables again
_DC12_SYMS = list(range(17))
_DC12_COUNTS = [0] * 16
_DC12_COUNTS[5] = len(_DC12_SYMS)  # 17 six-bit codes (17/64 ≤ 1)
_AC12_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 15)
]
_AC12_COUNTS = [0] * 16
_AC12_COUNTS[8] = len(_AC12_SYMS)  # 226 nine-bit codes (226/512 ≤ 1)


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
                subsample: bool = True, restart: int = 0,
                progressive: bool = False, bits: int = 8) -> bytes:
    """(h, w) gray or (h, w, 3) RGB → JFIF bytes. Color uses 4:2:0
    when ``subsample`` (the wild-file default), else 4:4:4. ``restart``
    > 0 emits a DRI segment and RST markers every that many MCUs — the
    error-resilience layout many wild files carry. ``progressive`` emits
    SOF2 with spectral-selection scans (one interleaved DC scan, then one
    full-band AC scan per component, Ah=Al=0) — per-block EOB codes, so
    the standard K.3 tables suffice (EOBn run codes would need optimized
    tables, as libjpeg's mandatory two-pass does). ``bits`` = 8 (uint8)
    or 12 (uint16 samples 0..4095 — the aerial/medical layout): SOF1
    extended sequential, Pq=1 16-bit quant tables scaled ×16, and the
    widened Huffman category tables."""
    if progressive and restart:
        raise NotImplementedError(
            "restart markers with progressive encode (decode supports "
            "both; pick one on write)"
        )
    if bits not in (8, 12):
        raise NotImplementedError(f"{bits}-bit JPEG encode (8 or 12)")
    img = np.asarray(img, np.uint8 if bits == 8 else np.uint16)
    half = float(1 << (bits - 1))
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qy = _scale_q(_Q_LUM, quality)
    qc = _scale_q(_Q_CHR, quality)
    if bits == 12:  # keep quality relative to the 16× dynamic range
        qy, qc = qy * 16, qc * 16
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = half - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = half + 0.5 * r - 0.418688 * g - 0.081312 * b
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
        coefs = _fdct_blocks(p - half)
        qz = np.rint(coefs / q).astype(np.int32).reshape(-1, 64)[:, _ZZ]
        comp_coef.append(qz)
        comp_bw.append(bw_ // 8)

    dc_cnt, dc_sym = (_DC_COUNTS, _DC_SYMS) if bits == 8 else \
        (_DC12_COUNTS, _DC12_SYMS)
    ac_cnt, ac_sym = (_AC_COUNTS, _AC_SYMS) if bits == 8 else \
        (_AC12_COUNTS, _AC12_SYMS)
    dc_codes = _huff_codes(dc_cnt, dc_sym)
    ac_codes = _huff_codes(ac_cnt, ac_sym)

    def put_dc(bwt, zz, pred, ci):
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        size, bits = _mag(diff)
        c, ln = dc_codes[size]
        bwt.put(c, ln)
        if size:
            bwt.put(bits, size)

    def put_ac(bwt, zz):
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

    # entropy scans: [(sos_body, entropy_bytes)]
    scans = []
    if not progressive:
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
                            put_dc(bwt, zz, pred, ci)
                            put_ac(bwt, zz)
        bwt.flush()
        sos = bytes([len(planes)])
        for ci in range(len(planes)):
            sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0 for all
        sos += b"\x00\x3f\x00"
        scans.append((sos, bytes(bwt.buf)))
    else:
        # scan 1: interleaved DC, all components (Ss=Se=0, Ah=Al=0)
        bwt = _BitWriter()
        pred = [0] * len(planes)
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(len(planes)):
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            bi = (my * sv + by) * comp_bw[ci] + mx * sh + bx
                            put_dc(bwt, comp_coef[ci][bi], pred, ci)
        bwt.flush()
        sos = bytes([len(planes)])
        for ci in range(len(planes)):
            sos += bytes([ci + 1, 0x00])
        scans.append((sos + b"\x00\x00\x00", bytes(bwt.buf)))
        # one full-band AC scan per component, non-interleaved raster
        # over the component's NON-padded block grid
        for ci in range(len(planes)):
            sh, sv = samp[ci]
            bwp = comp_bw[ci]
            cpw = -(-(w * sh) // hmax)  # component pixel dims (ceil)
            cph = -(-(h * sv) // vmax)
            nbw, nbh = -(-cpw // 8), -(-cph // 8)
            bwt = _BitWriter()
            for r in range(nbh):
                for c in range(nbw):
                    put_ac(bwt, comp_coef[ci][r * bwp + c])
            bwt.flush()
            scans.append((
                bytes([1, ci + 1, 0x00]) + b"\x01\x3f\x00", bytes(bwt.buf)
            ))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if bits == 8:
        qdt, pq = np.uint8, 0
    else:
        qdt, pq = np.dtype(">u2"), 1  # Pq=1: 16-bit table entries
    out += seg(0xFFDB, bytes([pq << 4])
               + qy.reshape(-1)[_ZZ].astype(qdt).tobytes())
    if not gray:
        out += seg(0xFFDB, bytes([(pq << 4) | 1])
                   + qc.reshape(-1)[_ZZ].astype(qdt).tobytes())
    sof = struct.pack(">BHHB", bits, h, w, len(planes))
    for ci in range(len(planes)):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qsel[ci]])
    # 12-bit sequential is SOF1 (extended); SOF0 is 8-bit baseline only
    seq_marker = 0xFFC0 if bits == 8 else 0xFFC1
    out += seg(0xFFC2 if progressive else seq_marker, sof)
    out += seg(0xFFC4, b"\x00" + bytes(dc_cnt) + bytes(dc_sym))
    out += seg(0xFFC4, b"\x10" + bytes(ac_cnt) + bytes(ac_sym))
    if restart:
        out += seg(0xFFDD, struct.pack(">H", restart))
    for sos, entropy in scans:
        out += seg(0xFFDA, sos)
        out += entropy
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


def _split_rst(scan: bytes) -> "list[bytes]":
    """Split one scan's entropy bytes at restart markers, unstuffing
    0xFF00 in each segment."""
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
    return segs


def _scan_sequential(sc, comps, samp, coef, cw, bw, bh,
                     mcus_x, mcus_y) -> None:
    """One sequential scan (Ss=0, Se=63): interleaved MCU order when the
    scan holds >1 component (the baseline layout); a single-component
    scan of a multi-component frame is NON-interleaved — one block per
    MCU over the component's own (non-padded) raster, per T.81 A.2."""
    segs, huff, dri = sc["segs"], sc["huff"], sc["dri"]
    tabs = {m[0]: (m[1], m[2]) for m in sc["members"]}
    br = _BitReader(segs[0])
    seg_i = 0
    pred = {ci: 0 for ci in tabs}

    def block(ci, bi):
        dct = huff[(0, tabs[ci][0])]
        act = huff[(1, tabs[ci][1])]
        s = _dec_sym(br, dct)
        # 12-bit DC SSSS=16 codes diff=32768 with NO appended bits
        pred[ci] += 32768 if s == 16 else _extend(br.read(s), s)
        blk = coef[ci][bi]
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

    n = 0
    if len(sc["members"]) == 1 and len(comps) > 1:
        ci = sc["members"][0][0]
        for r in range(bh[ci]):
            for c in range(bw[ci]):
                if dri and n and n % dri == 0:
                    seg_i += 1
                    br = _BitReader(segs[seg_i])
                    pred = {ci: 0}
                block(ci, r * cw[ci] + c)
                n += 1
        return
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and n and n % dri == 0:
                seg_i += 1
                br = _BitReader(segs[seg_i])
                pred = {ci: 0 for ci in tabs}
            for ci, _, _ in sc["members"]:
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        block(ci, (my * sv + by) * cw[ci] + mx * sh + bx)
            n += 1


def _scan_dc(sc, comps, samp, coef, cw, bw, bh, mcus_x, mcus_y) -> None:
    """Progressive DC scan (Ss=Se=0): first pass (Ah=0) decodes shifted
    DC differences; refinement (Ah>0) appends one bit per block.
    Interleaved MCU order when the scan holds >1 component, the
    component's own (non-padded) block raster otherwise."""
    segs, huff, dri = sc["segs"], sc["huff"], sc["dri"]
    ah, al = sc["ah"], sc["al"]
    first = ah == 0
    br = _BitReader(segs[0])
    seg_i = 0
    pred = {m[0]: 0 for m in sc["members"]}

    def unit(ci, bi, dct):
        blk = coef[ci][bi]
        if first:
            s = _dec_sym(br, dct)
            pred[ci] += 32768 if s == 16 else _extend(br.read(s), s)
            blk[0] = pred[ci] << al
        elif br.read1():
            blk[0] |= 1 << al

    n = 0
    if len(sc["members"]) == 1:
        ci, dtab, _ = sc["members"][0]
        dct = huff.get((0, dtab))
        for r in range(bh[ci]):
            for c in range(bw[ci]):
                if dri and n and n % dri == 0:
                    seg_i += 1
                    br = _BitReader(segs[seg_i])
                    pred = {ci: 0}
                unit(ci, r * cw[ci] + c, dct)
                n += 1
        return
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and n and n % dri == 0:
                seg_i += 1
                br = _BitReader(segs[seg_i])
                pred = {m[0]: 0 for m in sc["members"]}
            for ci, dtab, _ in sc["members"]:
                dct = huff.get((0, dtab))
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        unit(ci, (my * sv + by) * cw[ci] + mx * sh + bx,
                             dct)
            n += 1


def _scan_ac(sc, coef, cw, bw, bh) -> None:
    """Progressive AC scan (Ss>0; single component, non-interleaved).
    First pass (Ah=0) decodes shifted coefficients with EOBn run codes;
    refinement (Ah>0) follows T.81 G.1.2.3 / libjpeg
    ``decode_mcu_AC_refine``: ±1<<Al for newly nonzero positions,
    correction bits for already-nonzero ones. Coefficients stay in
    zigzag index order (dezigzag happens at reconstruction)."""
    segs, huff, dri = sc["segs"], sc["huff"], sc["dri"]
    ss, se, ah, al = sc["ss"], sc["se"], sc["ah"], sc["al"]
    ci, _, atab = sc["members"][0]
    act = huff[(1, atab)]
    br = _BitReader(segs[0])
    seg_i = 0
    eobrun = 0
    p1 = 1 << al
    n = 0
    for row in range(bh[ci]):
        for col in range(bw[ci]):
            if dri and n and n % dri == 0:
                seg_i += 1
                br = _BitReader(segs[seg_i])
                eobrun = 0
            n += 1
            blk = coef[ci][row * cw[ci] + col]
            if ah == 0:  # first pass
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _dec_sym(br, act)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.read(r)
                        break
                    k += r
                    blk[k] = _extend(br.read(s), s) << al
                    k += 1
                continue
            # refinement pass
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _dec_sym(br, act)
                    r, s = rs >> 4, rs & 15
                    if s:
                        s = p1 if br.read1() else -p1
                    elif r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += br.read(r)
                        break
                    # advance over r zero-history positions, emitting
                    # correction bits for every nonzero one passed
                    while k <= se:
                        v = int(blk[k])
                        if v != 0:
                            if br.read1() and (v & p1) == 0:
                                blk[k] = v + (p1 if v >= 0 else -p1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if s and k <= se:
                        blk[k] = s
                    k += 1
            if eobrun > 0:  # tail: correction bits only
                while k <= se:
                    v = int(blk[k])
                    if v != 0 and br.read1() and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else -p1)
                    k += 1
                eobrun -= 1


def decode_jpeg(b: bytes) -> np.ndarray:
    """JFIF bytes → (h, w) uint8 gray or (h, w, 3) uint8 RGB. Baseline /
    extended sequential AND progressive (SOF2: spectral selection +
    successive approximation, multi-scan) Huffman streams; arithmetic
    coding, hierarchical, and lossless stay loud rejects."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    i = 2
    qt: "dict[int, np.ndarray]" = {}
    huff: "dict[tuple[int, int], dict]" = {}
    comps = None
    h = w = None
    dri = 0
    scans: "list[dict]" = []
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker == 0xFF:  # T.81 B.1.1.2: optional fill bytes before a marker
            i += 1
            continue
        if marker == 0xD9:  # EOI
            break
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
                t = np.zeros(64, np.int32)
                if pq:  # Pq=1: 16-bit big-endian entries (12-bit frames)
                    t[_ZZ] = np.frombuffer(body, ">u2", 64, p + 1)
                    p += 129
                else:
                    t[_ZZ] = np.frombuffer(body, np.uint8, 64, p + 1)
                    p += 65
                qt[tq] = t.reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", body)
            if prec not in (8, 12):
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            comps = []
            for k in range(nc):
                cid, sampb, tq = body[6 + 3 * k:9 + 3 * k]
                comps.append({"id": cid, "h": sampb >> 4, "v": sampb & 15,
                              "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "arithmetic/hierarchical/lossless JPEG (sequential and "
                "progressive Huffman only)"
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
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            # scan ends at the first marker that is not RST/stuffing
            j = i
            while j + 1 < len(b):
                if b[j] == 0xFF and b[j + 1] != 0 and not \
                        (0xD0 <= b[j + 1] <= 0xD7):
                    break
                j += 1
            scans.append({
                "comps": scomp, "ss": ss, "se": se,
                "ah": ahal >> 4, "al": ahal & 15,
                "segs": _split_rst(b[i:j]),
                "huff": dict(huff), "dri": dri,  # tables as of THIS scan
            })
            i = j
        # other APPn/COM segments: skipped
    if comps is None or not scans:
        raise ValueError("JPEG without SOF/SOS")

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
    ncomp = len(comps)
    samp = [sampling[ci] for ci in range(ncomp)]
    cw = [mcus_x * s[0] for s in samp]
    chh = [mcus_y * s[1] for s in samp]
    # non-padded block grid per component (progressive non-interleaved
    # scans cover exactly these blocks; MCU padding blocks stay zero)
    def cdiv(a, d):
        return -(-a // d)

    bw = [cdiv(cdiv(w * s[0], hmax), 8) for s in samp]
    bh = [cdiv(cdiv(h * s[1], vmax), 8) for s in samp]
    coef = [np.zeros((chh[ci] * cw[ci], 64), np.int32)
            for ci in range(ncomp)]
    idmap = {c["id"]: ci for ci, c in enumerate(comps)}

    for sc in scans:
        sc["members"] = [(idmap[cid], dt, at) for cid, dt, at in sc["comps"]]
        if sc["ss"] == 0 and sc["se"] == 63:
            _scan_sequential(sc, comps, samp, coef, cw, bw, bh,
                             mcus_x, mcus_y)
        elif sc["ss"] == 0:
            _scan_dc(sc, comps, samp, coef, cw, bw, bh, mcus_x, mcus_y)
        else:
            if len(sc["members"]) != 1:
                raise ValueError("progressive AC scan with >1 component")
            _scan_ac(sc, coef, cw, bw, bh)

    shift = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    out_dt = np.uint8 if prec == 8 else np.uint16
    planes = []
    for ci, c in enumerate(comps):
        dz = np.zeros((len(coef[ci]), 64), np.int32)
        dz[:, _ZZ] = coef[ci]
        dq = dz.reshape(-1, 8, 8).astype(np.float64) * qt[c["tq"]]
        px = np.einsum("ji,njk,kl->nil", _M, dq, _M) + shift
        ph, pw = chh[ci] * 8, cw[ci] * 8
        plane = (px.reshape(chh[ci], cw[ci], 8, 8)
                 .transpose(0, 2, 1, 3).reshape(ph, pw))
        planes.append(np.clip(np.rint(plane), 0, maxv).astype(out_dt))
    if ncomp == 1:
        return planes[0][:h, :w]
    y, cb, cr = planes
    if sampling[0] == (2, 2):
        cb = np.repeat(np.repeat(cb, 2, 0), 2, 1)
        cr = np.repeat(np.repeat(cr, 2, 0), 2, 1)
    y = y[:h, :w].astype(np.float64)
    cb = cb[:h, :w].astype(np.float64) - shift
    cr = cr[:h, :w].astype(np.float64) - shift
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.rint(rgb), 0, maxv).astype(out_dt)
