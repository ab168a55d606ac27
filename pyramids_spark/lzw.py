"""TIFF LZW codec (Compression=5) in pure Python/numpy — the most common
wild-GeoTIFF compression (reference reads it through GDAL,
``dataset/ops/io.py``). The TIFF 6.0 LZW variant is a PUBLIC spec:

- MSB-first bit packing;
- 256-entry byte alphabet + ClearCode 256 + EndOfInformation 257, first
  dynamic code 258, max code width 12 bits;
- **early change**: the code width increments one code EARLY relative to
  GIF-LZW — when the next code to be assigned is ``2^w - 1`` (511, 1023,
  2047), matching libtiff's writer (readers that miss this desync after
  the first width change, the classic TIFF-LZW interop bug);
- the table resets via ClearCode when code 4094 is reached.

Per-tile/strip streams only (each TIFF tile is an independent stream),
so both directions run executor-side over ~64 KiB payloads — the Python
code loop is bounded by the tile size, not the raster."""

from __future__ import annotations

_CLEAR, _EOI, _FIRST = 256, 257, 258
_MAX_WIDTH = 12


def encode(data: bytes) -> bytes:
    """bytes → TIFF-LZW stream (ClearCode first, EOI last, early change)."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt, width = _FIRST, 9
    emit(_CLEAR, width)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = nxt
        nxt += 1
        # early change: widen when the NEXT code to assign is 2^w - 1
        if nxt == (1 << width) - 1 and width < _MAX_WIDTH:
            width += 1
        if nxt == (1 << _MAX_WIDTH) - 2:  # 4094: reset the table
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt, width = _FIRST, 9
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def decode(data: bytes) -> bytes:
    """TIFF-LZW stream → bytes (mirrors :func:`encode`'s early change)."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: "bytes | None" = None
    acc = nbits = 0
    pos = 0
    n = len(data)

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # EOI-less stream: end at exhaustion
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        if code == _EOI:
            return bytes(out)
        if code == _CLEAR:
            reset()
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError(f"corrupt LZW stream: code {code} > table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > table")
        out += entry
        prev = entry
        # early change mirror, one entry earlier than the writer (510/
        # 1022/2046): the decoder's table lags the encoder's by one entry
        # (it appends AFTER reading the next code), so it must widen while
        # the encoder is at 2^w - 1
        if len(table) == (1 << width) - 2 and width < _MAX_WIDTH:
            width += 1
