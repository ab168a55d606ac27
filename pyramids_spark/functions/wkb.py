"""WKB (ISO well-known binary) geometry encode/decode as Arrow-batched
vectorized kernels.

Reference surface: the reference round-trips geometries through OGR's WKB
everywhere it touches a binary container (``dataset/ops/_zonal.py:88``
``ogr.CreateGeometryFromWkb(geom.wkb)``; GeoPackage and FlatGeobuf store
WKB natively). With no shapely/OGR in a Spark executor, this module IS the
binary geometry codec: little-endian ISO WKB for Point / LineString /
Polygon, built and parsed with numpy offset math — the per-batch work is
O(total vertices) of C-side array ops, never a Python loop over
coordinates. (The only per-feature Python is output-list slicing, the same
shape as the container codecs in :mod:`pyramids_spark.codecs`.)

These are the binary twins of :mod:`pyramids_spark.functions.wkt` — same
constructor/extractor names, ``_wkb`` suffix, same single-exterior-ring
polygon contract (encode closes an open ring; decode returns the exterior
ring and skips holes, like ``wkt_ring_xs``).

Used by the GeoPackage container (:mod:`pyramids_spark.gpkg`), which wraps
these blobs in the GPKG binary header.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: ISO WKB type codes (2D, little-endian)
WKB_POINT, WKB_LINESTRING, WKB_POLYGON = 1, 2, 3
_TYPE_NAMES = {WKB_POINT: "Point", WKB_LINESTRING: "LineString",
               WKB_POLYGON: "Polygon", 4: "MultiPoint",
               5: "MultiLineString", 6: "MultiPolygon",
               7: "GeometryCollection"}


def _f8_bytes(s: pd.Series) -> np.ndarray:
    """float64 Series → (n, 8) little-endian byte view."""
    a = np.ascontiguousarray(s.to_numpy(dtype="float64"), dtype="<f8")
    return a.view(np.uint8).reshape(-1, 8)


def _u32_at(buf: np.ndarray, pos: np.ndarray, val: np.ndarray) -> None:
    """Scatter uint32 little-endian values at byte positions ``pos``."""
    v = np.asarray(val, dtype=np.uint32)
    for b in range(4):
        buf[pos + b] = ((v >> (8 * b)) & 0xFF).astype(np.uint8)


def _u32_read(buf: np.ndarray, pos: np.ndarray) -> np.ndarray:
    out = np.zeros(len(pos), dtype=np.uint32)
    for b in range(4):
        out |= buf[pos + b].astype(np.uint32) << (8 * b)
    return out


def _split(buf: np.ndarray, offs: np.ndarray) -> pd.Series:
    raw = buf.tobytes()
    return pd.Series(
        [raw[offs[i]:offs[i + 1]] for i in range(len(offs) - 1)]
    )


def _grouped_arange(counts: np.ndarray) -> np.ndarray:
    """[3, 2] → [0, 1, 2, 0, 1] (vectorized within-group index)."""
    if counts.size == 0:  # np.repeat((1,), (0,)) broadcast-errors on empty
        return np.zeros(0, dtype=np.int64)
    total = int(counts.sum())
    starts = np.concatenate([[0], counts.cumsum()[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def _interleave(all_x: np.ndarray, all_y: np.ndarray) -> np.ndarray:
    flat = np.empty(all_x.size * 2, dtype="<f8")
    flat[0::2], flat[1::2] = all_x, all_y
    return flat.view(np.uint8)


def _scatter_coords(
    buf: np.ndarray, offs: np.ndarray, hdr: int,
    counts: np.ndarray, coord_bytes: np.ndarray,
) -> None:
    """Place each feature's interleaved xy bytes after its ``hdr``-byte
    header — one fancy-indexed assignment for the whole batch."""
    nbytes = counts * 16
    dest = np.repeat(offs + hdr, nbytes) + _grouped_arange(nbytes)
    buf[dest] = coord_bytes


@F.pandas_udf(T.BinaryType())
def point_wkb(x: pd.Series, y: pd.Series) -> pd.Series:
    """(x, y) → 21-byte little-endian WKB ``Point``."""
    n = len(x)
    out = np.zeros((n, 21), dtype=np.uint8)
    out[:, 0] = 1  # little endian
    out[:, 1] = WKB_POINT
    out[:, 5:13] = _f8_bytes(x)
    out[:, 13:21] = _f8_bytes(y)
    raw = out.tobytes()
    return pd.Series([raw[i * 21:(i + 1) * 21] for i in range(n)])


def _encode_var(
    xs: pd.Series, ys: pd.Series, gtype: int
) -> pd.Series:
    """Shared LineString / Polygon encoder (polygon = one exterior ring,
    closed on write like ``polygon_wkt``)."""
    n = len(xs)
    xa = [np.asarray(a, dtype="<f8") for a in xs]
    ya = [np.asarray(a, dtype="<f8") for a in ys]
    if gtype == WKB_POLYGON:
        # close open rings (reference create_polygon closed-ring contract)
        open_ = [
            len(a) > 0 and (a[0] != a[-1] or b[0] != b[-1])
            for a, b in zip(xa, ya)
        ]
        xa = [np.append(a, a[0]) if o else a for a, o in zip(xa, open_)]
        ya = [np.append(b, b[0]) if o else b for b, o in zip(ya, open_)]
        hdr = 13  # 1 + type4 + nrings4 + npts4
    else:
        hdr = 9  # 1 + type4 + npts4
    counts = np.fromiter((len(a) for a in xa), dtype=np.int64, count=n)
    lens = hdr + 16 * counts
    offs = np.concatenate([[0], lens.cumsum()])
    buf = np.zeros(int(offs[-1]), dtype=np.uint8)
    starts = offs[:-1]
    buf[starts] = 1
    _u32_at(buf, starts + 1, np.full(n, gtype))
    if gtype == WKB_POLYGON:
        _u32_at(buf, starts + 5, np.ones(n))
        _u32_at(buf, starts + 9, counts)
    else:
        _u32_at(buf, starts + 5, counts)
    all_x = np.concatenate(xa) if n else np.empty(0)
    all_y = np.concatenate(ya) if n else np.empty(0)
    _scatter_coords(buf, starts, hdr, counts, _interleave(all_x, all_y))
    return _split(buf, offs)


@F.pandas_udf(T.BinaryType())
def linestring_wkb(xs: pd.Series, ys: pd.Series) -> pd.Series:
    """Coordinate arrays → WKB ``LineString``."""
    return _encode_var(xs, ys, WKB_LINESTRING)


@F.pandas_udf(T.BinaryType())
def polygon_wkb(xs: pd.Series, ys: pd.Series) -> pd.Series:
    """Coordinate arrays → single-exterior-ring WKB ``Polygon`` (open
    rings are closed on write, the ``polygon_wkt`` contract)."""
    return _encode_var(xs, ys, WKB_POLYGON)


def wkb_geometry_type(b: Column) -> Column:
    """WKB blob → type name — pure column algebra (byte 0 must be 1 =
    little-endian; type code is byte 1 for every 2D type), codegen and
    SQL-twinnable like the ``wkt_geometry_type`` twin."""
    code = F.conv(F.hex(F.substring(b, 2, 1)), 16, 10).cast("int")
    m = F.create_map(
        *[x for k, v in _TYPE_NAMES.items() for x in (F.lit(k), F.lit(v))]
    )
    return F.when(
        F.conv(F.hex(F.substring(b, 1, 1)), 16, 10) == "1", m[code]
    )


def _batch(b: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenate a binary Series: (byte buffer, start offsets, lengths)."""
    lens = np.fromiter((len(v) for v in b), dtype=np.int64, count=len(b))
    buf = np.frombuffer(b"".join(b), dtype=np.uint8)
    offs = np.concatenate([[0], lens.cumsum()])[:-1]
    return buf, offs, lens


def _check_head(buf: np.ndarray, offs: np.ndarray, gtype: int) -> None:
    if len(offs) == 0:
        return
    if not (buf[offs] == 1).all():
        raise ValueError("big-endian WKB not supported (byte order != 1)")
    codes = _u32_read(buf, offs + 1)
    if not (codes == gtype).all():
        bad = {_TYPE_NAMES.get(int(c), int(c)) for c in codes if c != gtype}
        raise ValueError(
            f"expected WKB {_TYPE_NAMES[gtype]}, got {sorted(map(str, bad))}"
            " — geometry types must be homogeneous per column (the"
            " reference's layer-per-geometry model)"
        )


def _point_coords(b: pd.Series) -> np.ndarray:
    buf, offs, lens = _batch(b)
    if len(lens) and not (lens == 21).all():
        raise ValueError("WKB Point blobs must be exactly 21 bytes")
    _check_head(buf, offs, WKB_POINT)
    arr = buf.reshape(-1, 21) if len(lens) else np.zeros((0, 21), np.uint8)
    return np.ascontiguousarray(arr[:, 5:21]).view("<f8").reshape(-1, 2)


@F.pandas_udf(T.DoubleType())
def wkb_point_x(b: pd.Series) -> pd.Series:
    return pd.Series(_point_coords(b)[:, 0])


@F.pandas_udf(T.DoubleType())
def wkb_point_y(b: pd.Series) -> pd.Series:
    return pd.Series(_point_coords(b)[:, 1])


def _ring_coords(b: pd.Series) -> tuple[list, list]:
    """Decode the vertex run of a LineString, or the EXTERIOR ring of a
    Polygon (holes skipped — the ``wkt_ring_xs`` contract). Counts and
    coordinate payloads read with numpy fancy indexing / buffer views."""
    buf, offs, lens = _batch(b)
    if len(offs) == 0:
        return [], []
    codes = _u32_read(buf, offs + 1)
    if not (buf[offs] == 1).all():
        raise ValueError("big-endian WKB not supported (byte order != 1)")
    if not np.isin(codes, (WKB_LINESTRING, WKB_POLYGON)).all():
        raise ValueError("wkb_ring_* expects LineString or Polygon blobs")
    is_poly = codes == WKB_POLYGON
    # POLYGON EMPTY is 9 bytes with numRings==0: its first-ring count field
    # does not exist, so reading offs+9 would hit the NEXT blob in the
    # batch buffer. Read numRings first and give empty polys count 0 by
    # pointing their count read at the (zero) numRings field itself.
    nrings = _u32_read(buf, offs + 5)
    empty_poly = is_poly & (nrings == 0)
    cstart = np.where(is_poly, offs + 13, offs + 9)
    counts = _u32_read(
        buf, np.where(is_poly & ~empty_poly, offs + 9, offs + 5)
    )
    counts = np.where(empty_poly, 0, counts)
    ends = cstart.astype(np.int64) + 16 * counts.astype(np.int64)
    over = (counts > 0) & (
        ends > offs.astype(np.int64) + lens.astype(np.int64)
    )
    if over.any():
        raise ValueError("WKB vertex run exceeds blob length")
    xs, ys = [], []
    for s, c in zip(cstart, counts):
        pts = np.ascontiguousarray(
            buf[s:s + 16 * int(c)]
        ).view("<f8").reshape(-1, 2)
        xs.append(pts[:, 0])
        ys.append(pts[:, 1])
    return xs, ys


@F.pandas_udf(T.ArrayType(T.DoubleType()))
def wkb_ring_xs(b: pd.Series) -> pd.Series:
    """Polygon exterior ring (or LineString) → x array<double>."""
    return pd.Series(_ring_coords(b)[0])


@F.pandas_udf(T.ArrayType(T.DoubleType()))
def wkb_ring_ys(b: pd.Series) -> pd.Series:
    """Polygon exterior ring (or LineString) → y array<double>."""
    return pd.Series(_ring_coords(b)[1])
