"""Shared dense-block ↔ sparse-cell kernels for the container writers
AND readers (zarr chunks, GeoTIFF tiles, NetCDF blocks): ONE
implementation of fill-padding, edge trimming and NaN-vs-sentinel
masking so the formats stay byte-consistent by construction, plus
``bounded_concat`` — the reader-side Arrow-batch size bound every
container decode yields through."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def dense_block(pdf: pd.DataFrame, h: int, w: int, r0: int, c0: int, fill: float) -> np.ndarray:
    """Cell rows → full (h, w) float64 block padded with ``fill``."""
    block = np.full((h, w), fill, dtype=np.float64)
    r = pdf["row"].to_numpy(np.int64) - r0
    c = pdf["col"].to_numpy(np.int64) - c0
    block[r, c] = pdf["value"].to_numpy(np.float64)
    return block


def sparse_cells(
    block: np.ndarray, band: int, r0: int, c0: int,
    rows: int, cols: int, fill: "float | None",
) -> pd.DataFrame:
    """Padded block → cell rows inside the raster extent; cells equal to
    ``fill`` drop (NaN-aware), restoring the absent-row nodata contract."""
    h = min(block.shape[0], rows - r0)
    w = min(block.shape[1], cols - c0)
    block = block[:h, :w]
    if fill is None or math.isnan(fill):
        rr, cc = np.nonzero(~np.isnan(block))
    else:
        # NaN cells drop alongside fill-valued ones: NaN != fill is True,
        # and a NaN "value" row would violate the absent-row contract
        rr, cc = np.nonzero((block != fill) & ~np.isnan(block))
    return pd.DataFrame(
        {
            "band": np.int64(band),
            "row": (rr + r0).astype(np.int64),
            "col": (cc + c0).astype(np.int64),
            "value": block[rr, cc].astype(np.float64),
        }
    )


def bounded_concat(frames, max_cells: int = 2_000_000):
    """Yield ``pd.concat`` over accumulated cell frames, flushing
    whenever the buffered row count passes ``max_cells``; frames LARGER
    than ``max_cells`` (a single-strip foreign TIFF where RowsPerStrip
    = image height, a whale-sized chunk) are sliced first, so no
    yielded batch exceeds ``2 * max_cells`` rows regardless of tile
    geometry. Every container reader's ``mapInPandas`` decode explodes
    each META row (tile/chunk/part descriptor) into tile-sized cell
    frames — a per-input-batch concat is therefore UNBOUNDED in the
    raster size (one Arrow batch of rows*cols cells at a 6 GB BigTIFF
    blew netty's direct-memory pool), while per-tile yields fragment
    small reads. 2M cells ≈ 56-112 MB per Arrow batch keeps 32
    concurrent tasks well inside the JVM's direct-memory budget."""
    buf, n = [], 0

    def drain():
        # a lone frame passes through without the pd.concat copy
        return buf[0] if len(buf) == 1 else pd.concat(
            buf, ignore_index=True)

    for f in frames:
        if not len(f):
            continue
        pieces = ([f] if len(f) <= max_cells else
                  [f.iloc[i:i + max_cells]
                   for i in range(0, len(f), max_cells)])
        for p in pieces:
            buf.append(p)
            n += len(p)
            if n >= max_cells:
                yield drain()
                buf, n = [], 0
    if buf:
        yield drain()
