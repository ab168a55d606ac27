"""Blosc-1 chunk container + raw zstd/lz4/snappy codecs for zarr stores.

Blosc is the de-facto default zarr v2 compressor (numcodecs
``Blosc(cname='lz4', shuffle=SHUFFLE)``) and zstd is zarr-python 3's
default codec, so reading wild zarr stores requires both. The blosc-1
chunk layout is a PUBLIC documented format (c-blosc
``README_CHUNK_FORMAT.rst``):

- 16-byte header: ``version, versionlz, flags, typesize`` (4 × u8) then
  ``nbytes, blocksize, cbytes`` (3 × u32le; all sizes of THIS chunk).
- flags: bit 0 byte-shuffle, bit 1 memcpy (payload stored raw right
  after the header), bit 2 bit-shuffle, bit 4 dont-split (written by
  c-blosc ≥ 1.14 so decoders need no policy table), bits 5-7 the inner
  codec FORMAT: 0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib, 4 zstd.
- then ``nblocks`` u32le block-start offsets (``bstarts``, absolute
  within the chunk), each block compressed independently; a block is
  either ONE stream or — when the dont-split bit is clear and the block
  is not the trailing partial block — ``typesize`` consecutive streams
  of ``block/typesize`` bytes each. Every stream is ``[u32le csize]
  [payload]``; ``csize == uncompressed size`` marks a raw-stored stream.
- byte-shuffle is per block: the block's ``n`` elements of ``typesize``
  bytes are transposed to ``typesize`` lanes of ``n`` bytes (leftover
  ``block % typesize`` tail bytes ride unshuffled at the end).

Inner codecs: zlib via the stdlib; lz4 (block format), zstd and snappy
via ``pyarrow.Codec`` (Arrow is already the engine's UDF transport, and
its C++ codecs run at native speed — no pure-Python decode loops in the
chunk path). blosclz and bit-shuffle have no public in-container
implementation here and reject loudly.

Decoding runs inside the distributed chunk scan (``mapInPandas`` over
``binaryFile`` rows), one chunk per call — no driver loops, no state.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SHUFFLE = 0x1
_MEMCPY = 0x2
_BITSHUFFLE = 0x4
_DONT_SPLIT = 0x10

#: flags bits 5-7 — the inner codec FORMAT code
_FMT_BLOSCLZ, _FMT_LZ4, _FMT_SNAPPY, _FMT_ZLIB, _FMT_ZSTD = 0, 1, 2, 3, 4
_FMT_NAMES = {_FMT_BLOSCLZ: "blosclz", _FMT_LZ4: "lz4", _FMT_SNAPPY: "snappy",
              _FMT_ZLIB: "zlib", _FMT_ZSTD: "zstd"}
_FMT_CODES = {"blosclz": _FMT_BLOSCLZ, "lz4": _FMT_LZ4, "lz4hc": _FMT_LZ4,
              "snappy": _FMT_SNAPPY, "zlib": _FMT_ZLIB, "zstd": _FMT_ZSTD}


def raw_decompress(name: str, buf: bytes, nout: int) -> bytes:
    """One raw codec stream → ``nout`` bytes. ``lz4`` is the BLOCK format
    (no embedded size — ``nout`` is required), ``zstd`` a standard frame,
    ``snappy`` a raw block, ``zlib``/``gzip`` stdlib streams."""
    if name == "zlib":
        out = zlib.decompress(buf)
    elif name == "gzip":
        import gzip

        out = gzip.decompress(buf)
    else:
        import pyarrow as pa

        arrow = {"lz4": "lz4_raw", "zstd": "zstd", "snappy": "snappy"}
        if name not in arrow:
            raise NotImplementedError(f"unsupported codec {name!r}")
        out = pa.Codec(arrow[name]).decompress(
            buf, decompressed_size=nout, asbytes=True
        )
    if len(out) != nout:
        raise ValueError(
            f"{name} stream decoded to {len(out)} bytes, expected {nout}"
        )
    return out


def raw_compress(name: str, buf: bytes, level: "int | None" = None) -> bytes:
    """One raw codec stream (write-side twin of :func:`raw_decompress`)."""
    if name == "zlib":
        return zlib.compress(buf, 6 if level is None else int(level))
    if name == "gzip":
        import gzip

        return gzip.compress(
            buf, compresslevel=6 if level is None else int(level)
        )
    import pyarrow as pa

    arrow = {"lz4": "lz4_raw", "zstd": "zstd", "snappy": "snappy"}
    if name not in arrow:
        raise NotImplementedError(f"unsupported codec {name!r}")
    lvl = None
    if name == "zstd" and level is not None:
        # blosc clevel 1-9 maps into zstd's 1-22 range; identity is fine
        lvl = max(1, min(22, int(level)))
    return pa.Codec(arrow[name], compression_level=lvl).compress(
        buf, asbytes=True
    )


def _unshuffle(block: bytes, typesize: int) -> bytes:
    n = len(block)
    nel = n // typesize
    if typesize <= 1 or nel == 0:
        return block
    body = np.frombuffer(block, np.uint8, count=nel * typesize)
    out = body.reshape(typesize, nel).T.tobytes()
    return out + block[nel * typesize:]


def _shuffle_bytes(block: bytes, typesize: int) -> bytes:
    n = len(block)
    nel = n // typesize
    if typesize <= 1 or nel == 0:
        return block
    body = np.frombuffer(block, np.uint8, count=nel * typesize)
    out = body.reshape(nel, typesize).T.tobytes()
    return out + block[nel * typesize:]


def decode_blosc(buf: bytes) -> bytes:
    """One blosc-1 chunk → its raw little-endian payload bytes."""
    if len(buf) < 16:
        raise ValueError(f"blosc chunk too short ({len(buf)} bytes)")
    version, _versionlz, flags, typesize = struct.unpack_from("<4B", buf, 0)
    nbytes, blocksize, cbytes = struct.unpack_from("<3I", buf, 4)
    if version not in (1, 2):
        raise NotImplementedError(f"blosc chunk version {version}")
    if cbytes > len(buf):
        raise ValueError(
            f"blosc header cbytes {cbytes} exceeds buffer {len(buf)}"
        )
    if nbytes == 0:
        return b""
    if flags & _MEMCPY:
        # whole chunk stored raw (incompressible fallback) — shuffle bits
        # are ignored in this mode, matching c-blosc's decompressor
        return bytes(buf[16:16 + nbytes])
    if flags & _BITSHUFFLE:
        raise NotImplementedError(
            "blosc bit-shuffle filter is out of scope (byte-shuffle and "
            "no-shuffle chunks are supported)"
        )
    fmt = flags >> 5
    if fmt not in _FMT_NAMES or fmt == _FMT_BLOSCLZ:
        raise NotImplementedError(
            f"blosc inner codec {_FMT_NAMES.get(fmt, fmt)!r} is out of "
            "scope (lz4/zlib/zstd/snappy chunks are supported)"
        )
    codec = _FMT_NAMES[fmt]
    if blocksize <= 0:
        raise ValueError("blosc chunk with zero blocksize")
    nblocks = -(-nbytes // blocksize)
    bstarts = struct.unpack_from(f"<{nblocks}I", buf, 16)

    def decode_blocks(split: bool) -> bytes:
        parts = []
        for i, start in enumerate(bstarts):
            neblock = min(blocksize, nbytes - i * blocksize)
            leftover = neblock != blocksize
            nstreams = typesize if (split and not leftover) else 1
            per = neblock // nstreams
            pos = int(start)
            streams = []
            for _ in range(nstreams):
                (csize,) = struct.unpack_from("<i", buf, pos)
                pos += 4
                if csize < 0 or pos + csize > len(buf):
                    raise ValueError(
                        "blosc stream overruns the chunk buffer")
                raw = buf[pos:pos + csize]
                pos += csize
                streams.append(
                    bytes(raw) if csize == per
                    else raw_decompress(codec, raw, per)
                )
            block = streams[0] if nstreams == 1 else b"".join(streams)
            if flags & _SHUFFLE:
                block = _unshuffle(block, typesize)
            parts.append(block)
        out = b"".join(parts)
        if len(out) != nbytes:
            raise ValueError(
                f"blosc chunk decoded to {len(out)} bytes, expected {nbytes}"
            )
        return out

    # Flag-clear chunks follow c-blosc's split_block() policy (the rule
    # pre-dating the dont-split flag, kept by FORWARD_COMPAT mode): only
    # blosclz/lz4 split, and only when typesize ≤ 16 and the per-stream
    # buffer is ≥ 128 bytes. But old (≤ 1.10) or BLOSC_SPLITMODE=ALWAYS
    # writers split OTHER codecs too with the flag clear — when both
    # layouts are structurally possible, fall back to the other on a
    # decode error (stream sizes disambiguate: a wrong guess overruns or
    # misses the exact decompressed size).
    splittable = (
        not (flags & _DONT_SPLIT) and typesize > 1
        and blocksize % typesize == 0
    )
    policy_split = (
        splittable and fmt in (_FMT_BLOSCLZ, _FMT_LZ4)
        and typesize <= 16 and blocksize // typesize >= 128
    )
    try:
        return decode_blocks(policy_split)
    except (ValueError, OSError, zlib.error, struct.error):
        # a wrong layout guess surfaces as a size mismatch (ValueError),
        # a corrupt-frame error from pyarrow (OSError), zlib.error, or a
        # stream-header read off the buffer end (struct.error)
        if not splittable:
            raise
        return decode_blocks(not policy_split)


def encode_blosc(
    data: bytes, typesize: int, cname: str = "lz4", clevel: int = 5,
    shuffle: int = 1, blocksize: int = 0, split: bool = False,
) -> bytes:
    """Raw payload bytes → one blosc-1 chunk. ``shuffle``: 0 none /
    1 byte-shuffle (bit-shuffle not written). ``split=True`` writes the
    c-blosc split-stream block layout (typesize streams per full block —
    what wild lz4 chunks from c-blosc's FORWARD_COMPAT mode look like);
    the default writes one stream per block with the dont-split flag,
    which every c-blosc ≥ 1.14 reads."""
    if cname not in _FMT_CODES or cname == "blosclz":
        raise NotImplementedError(
            f"blosc write codec {cname!r} unsupported "
            "(lz4/lz4hc/zlib/zstd/snappy)"
        )
    typesize = max(1, int(typesize))
    if typesize > 255:
        typesize = 1  # c-blosc treats oversized typesize as untyped bytes
    nbytes = len(data)
    if blocksize <= 0:
        blocksize = min(max(nbytes, 1), 1 << 18)
    blocksize = max(typesize, blocksize - blocksize % typesize)
    fmt = _FMT_CODES[cname]
    flags = fmt << 5
    if shuffle == 1 and typesize > 1:
        flags |= _SHUFFLE
    elif shuffle not in (0, 1):
        raise NotImplementedError("blosc write shuffle: 0 or 1 only")
    # the flag-clear split layout must match decode's split_block()
    # policy exactly, or a symmetric reader would misparse our chunks
    do_split = (
        bool(split) and typesize > 1 and blocksize % typesize == 0
        and fmt == _FMT_LZ4
        and typesize <= 16 and blocksize // typesize >= 128
    )
    if split and not do_split:
        raise ValueError(
            "split=True needs lz4/lz4hc, 1 < typesize <= 16 and "
            "blocksize/typesize >= 128 (the c-blosc split_block policy)"
        )
    if not do_split:
        flags |= _DONT_SPLIT
    if nbytes == 0:
        return struct.pack("<4B3I", 2, 1, flags, typesize, 0, blocksize, 16)
    nblocks = -(-nbytes // blocksize)
    bstarts, blobs = [], []
    cur = 16 + 4 * nblocks
    for i in range(nblocks):
        block = data[i * blocksize:(i + 1) * blocksize]
        neblock = len(block)
        if flags & _SHUFFLE:
            block = _shuffle_bytes(block, typesize)
        nstreams = typesize if (do_split and neblock == blocksize) else 1
        per = neblock // nstreams
        chunk_parts = []
        for s in range(nstreams):
            piece = block[s * per:(s + 1) * per]
            comp = raw_compress(cname, piece, clevel)
            if len(comp) >= per:  # raw-store marker: csize == stream size
                comp = piece
            chunk_parts.append(struct.pack("<i", len(comp)) + comp)
        blob = b"".join(chunk_parts)
        bstarts.append(cur)
        blobs.append(blob)
        cur += len(blob)
    body = struct.pack(f"<{nblocks}I", *bstarts) + b"".join(blobs)
    if 16 + len(body) >= 16 + nbytes:
        # incompressible: raw memcpy chunk (smaller AND trivially decoded)
        flags = (flags & ~_SHUFFLE & ~_DONT_SPLIT) | _MEMCPY
        return struct.pack(
            "<4B3I", 2, 1, flags, typesize, nbytes, blocksize, 16 + nbytes
        ) + data
    return struct.pack(
        "<4B3I", 2, 1, flags, typesize, nbytes, blocksize, 16 + len(body)
    ) + body
