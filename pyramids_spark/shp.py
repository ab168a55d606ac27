"""ESRI Shapefile (.shp/.shx/.dbf) vector container in pure struct+numpy.

Reference surface: the ``"ESRI Shapefile"`` driver arm of ``to_file``
(``feature/collection.py:1657-1811``, ``ENCODING="UTF-8"`` layer option)
and ``read_file`` (``:789-948``) — GDAL/pyogrio there; parsed and written
directly here, the same no-GDAL discipline as :mod:`pyramids_spark.tiff`.

Format notes (public spec, ESRI Shapefile Technical Description 1998):

* ``.shp``: 100-byte header (file code 9994 and lengths BIG-endian, in
  16-bit words; bbox doubles little-endian), then records = 8-byte
  BIG-endian header (1-based record number, content words) + little-endian
  content. Shape types here: Point (1), PolyLine (3), Polygon (5).
* ``.shx``: same 100-byte header + one ``(offset, content words)``
  BIG-endian pair per record — the random-access index that makes the
  DISTRIBUTED read work: each task reads its 8·k slice of ``.shx``, then
  one contiguous byte range of ``.shp`` (records are laid out in record
  order), and its fixed-width slice of ``.dbf``. The driver touches only
  the three 100-ish-byte headers.
* ``.dbf``: dBASE III — 32-byte header + 32-byte field descriptors,
  fixed-width ASCII records ('N' numerics right-justified, 'C' text
  left-justified). Field widths are bytes, so text columns take one
  metadata aggregation to size (the same fixed-width contract OGR
  enforces).

Scale contract (the GeoTIFF split again): ``write_shapefile`` is the
single-file driver-stream sink — the format is sequential by construction
(record numbers, running offsets) and capped at 2 GiB by its 32-bit word
offsets (loud guard; the scale sink is parquet or the GPKG/COG-parts
paths). ``read_shapefile`` is distributed.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions import wkb as _wkb

SHP_POINT, SHP_POLYLINE, SHP_POLYGON = 1, 3, 5
_MAX_FILE = 2**31 - 1  # 32-bit signed word offsets → hard 2 GiB format cap


# --------------------------------------------------------------------------
# record-content encoders (executor-side, offset-math vectorized)
# --------------------------------------------------------------------------

def point_record(x, y):
    """(x, y) → Point record content (shape type + 2 doubles, 20 bytes)."""

    @F.pandas_udf(T.BinaryType())
    def build(xs: pd.Series, ys: pd.Series) -> pd.Series:
        n = len(xs)
        out = np.zeros((n, 20), dtype=np.uint8)
        out[:, 0] = SHP_POINT
        out[:, 4:12] = _wkb._f8_bytes(xs)
        out[:, 12:20] = _wkb._f8_bytes(ys)
        raw = out.tobytes()
        return pd.Series([raw[i * 20:(i + 1) * 20] for i in range(n)])

    return build(x, y)


def _poly_record(xs: pd.Series, ys: pd.Series, stype: int) -> pd.Series:
    """Single-part PolyLine/Polygon record content. Polygon rings are
    closed on write and oriented clockwise (the spec's outer-ring winding;
    the signed-area test is one vectorized shoelace per batch)."""
    xa = [np.asarray(a, dtype="<f8") for a in xs]
    ya = [np.asarray(a, dtype="<f8") for a in ys]
    if stype == SHP_POLYGON:
        fixed_x, fixed_y = [], []
        for a, b in zip(xa, ya):
            if len(a) and (a[0] != a[-1] or b[0] != b[-1]):
                a, b = np.append(a, a[0]), np.append(b, b[0])
            # shoelace > 0 = counter-clockwise → reverse to CW outer ring
            if np.dot(a[:-1], b[1:]) - np.dot(a[1:], b[:-1]) > 0:
                a, b = a[::-1], b[::-1]
            fixed_x.append(a)
            fixed_y.append(b)
        xa, ya = fixed_x, fixed_y
    n = len(xa)
    counts = np.fromiter((len(a) for a in xa), dtype=np.int64, count=n)
    # type4 + bbox32 + numParts4 + numPoints4 + parts[1]*4 + 16·pts
    hdr = 48
    lens = hdr + 16 * counts
    offs = np.concatenate([[0], lens.cumsum()])
    buf = np.zeros(int(offs[-1]), dtype=np.uint8)
    s = offs[:-1]
    _wkb._u32_at(buf, s, np.full(n, stype))
    bbox = np.empty((n, 4), dtype="<f8")
    for i, (a, b) in enumerate(zip(xa, ya)):
        bbox[i] = (a.min(), b.min(), a.max(), b.max())
    bb = bbox.view(np.uint8)
    dst = np.repeat(s + 4, 32) + np.tile(np.arange(32), n)
    buf[dst] = bb.ravel()
    _wkb._u32_at(buf, s + 36, np.ones(n))  # numParts
    _wkb._u32_at(buf, s + 40, counts)  # numPoints
    # parts[0] = 0 is already zero-filled
    all_x = np.concatenate(xa) if n else np.empty(0)
    all_y = np.concatenate(ya) if n else np.empty(0)
    _wkb._scatter_coords(buf, s, hdr, counts, _wkb._interleave(all_x, all_y))
    return _wkb._split(buf, offs)


def polygon_record(xs, ys):
    @F.pandas_udf(T.BinaryType())
    def build(a: pd.Series, b: pd.Series) -> pd.Series:
        return _poly_record(a, b, SHP_POLYGON)

    return build(xs, ys)


def polyline_record(xs, ys):
    @F.pandas_udf(T.BinaryType())
    def build(a: pd.Series, b: pd.Series) -> pd.Series:
        return _poly_record(a, b, SHP_POLYLINE)

    return build(xs, ys)


def record_from_wkb(geometry):
    """WKB (Point / LineString / Polygon exterior ring) → shapefile record
    content — lets the same WKB geometry column feed both the GPKG and
    shapefile sinks. Points re-slice in one reshape; rings re-encode
    through the shared batch encoder."""

    @F.pandas_udf(T.BinaryType())
    def build(b: pd.Series) -> pd.Series:
        if len(b) == 0:
            return pd.Series([], dtype=object)
        buf, offs, _ = _wkb._batch(b)
        codes = _wkb._u32_read(buf, offs + 1)
        if (codes == _wkb.WKB_POINT).all():
            xy = _wkb._point_coords(b)
            n = len(xy)
            out = np.zeros((n, 20), dtype=np.uint8)
            out[:, 0] = SHP_POINT
            out[:, 4:20] = np.ascontiguousarray(xy, "<f8").view(
                np.uint8
            ).reshape(n, 16)
            raw = out.tobytes()
            return pd.Series([raw[i * 20:(i + 1) * 20] for i in range(n)])
        if (codes == _wkb.WKB_POLYGON).all() or (
            codes == _wkb.WKB_LINESTRING
        ).all():
            xs, ys = _wkb._ring_coords(b)
            stype = (
                SHP_POLYGON if codes[0] == _wkb.WKB_POLYGON
                else SHP_POLYLINE
            )
            return _poly_record(pd.Series(xs), pd.Series(ys), stype)
        raise ValueError(
            "mixed or unsupported WKB types — one shape type per shapefile"
        )

    return build(geometry)


# --------------------------------------------------------------------------
# writer (driver-stream single-file sink)
# --------------------------------------------------------------------------

def _dbf_fields(df: DataFrame, geometry_col: str) -> list[tuple[str, str, int, int]]:
    """(name, type, width, decimals) per attribute column. Text widths are
    byte widths — sized with one metadata aggregation (OGR's fixed-width
    contract); names truncate to the format's 10-byte limit (must stay
    unique)."""
    fields = []
    text_cols = []
    for f in df.schema.fields:
        if f.name == geometry_col:
            continue
        if isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType,
                                   T.ByteType)):
            fields.append((f.name, "N", 20, 0))
        elif isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            fields.append((f.name, "N", 24, 11))
        elif isinstance(f.dataType, T.StringType):
            fields.append((f.name, "C", -1, 0))
            text_cols.append(f.name)
        else:
            raise ValueError(
                f"attribute {f.name!r}: {f.dataType.simpleString()} has no "
                "DBF mapping (long/int/double/string only)"
            )
    if text_cols:
        widths = df.agg(
            *[
                F.max(F.octet_length(c)).alias(c) for c in text_cols
            ]
        ).collect()[0]
        sized = {}
        for c in text_cols:
            w = int(widths[c] or 1)
            if w > 254:
                raise ValueError(
                    f"text column {c!r} needs {w} bytes; DBF caps fields "
                    "at 254 — use GPKG or parquet"
                )
            sized[c] = max(w, 1)
        fields = [
            (n, t, sized[n] if t == "C" else w, d)
            for n, t, w, d in fields
        ]
    names = [n.encode()[:10] for n, *_ in fields]
    if len(set(names)) != len(names):
        raise ValueError("field names collide at the DBF 10-byte limit")
    return fields


def _dbf_header(fields, n_records: int) -> bytes:
    rec_size = 1 + sum(w for _, _, w, _ in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    head = struct.pack(
        "<BBBBIHH20x", 0x03, 99, 1, 1, n_records, hdr_size, rec_size
    )
    descs = b"".join(
        struct.pack(
            "<11sc4xBB14x", n.encode()[:10], t.encode(), w, d
        )
        for n, t, w, d in fields
    )
    return head + descs + b"\x0d"


def _dbf_value(v, t: str, w: int, d: int) -> bytes:
    if v is None:
        return b" " * w
    if t == "N" and d == 0:
        s = f"{int(v):>{w}d}"
    elif t == "N":
        s = f"{float(v):>{w}.{d}f}"
    else:
        b = str(v).encode("utf-8")
        if len(b) > w:
            raise ValueError(f"text {v!r} exceeds sized width {w}")
        return b + b" " * (w - len(b))
    if len(s) > w:
        raise ValueError(f"numeric {v!r} does not fit N {w}.{d}")
    return s.encode()


def _main_header(shape_type: int, file_bytes: int, bbox) -> bytes:
    return struct.pack(
        ">i5i", 9994, 0, 0, 0, 0, 0
    ) + struct.pack(">i", file_bytes // 2) + struct.pack(
        "<ii4d4d", 1000, shape_type, *bbox, 0.0, 0.0, 0.0, 0.0
    )


def write_shapefile(
    df: DataFrame,
    path: str,
    geometry_col: str = "geometry",
    shape_type: int = SHP_POINT,
) -> int:
    """Write ``df`` as ``path``.shp/.shx/.dbf. ``geometry_col`` holds
    record CONTENT bytes from :func:`point_record` /
    :func:`polygon_record` / :func:`polyline_record` (built executor-side);
    the driver streams records in order, assigning record numbers and
    offsets, then patches the headers (the tiff.py stream-and-patch
    shape). Returns the feature count; raises loudly at the format's
    2 GiB cap."""
    base = path[:-4] if path.lower().endswith(".shp") else path
    # _dbf_fields runs a width aggregation and toLocalIterator streams the
    # records — persist so the upstream lineage computes once, not twice
    # (and the two passes cannot disagree under nondeterministic lineage)
    df = df.persist()
    try:
        fields = _dbf_fields(df, geometry_col)
        attrs = [n for n, *_ in fields]
        it = df.select(
            F.col(geometry_col).alias("__g"), *attrs
        ).toLocalIterator()
        rec_size = 1 + sum(w for _, _, w, _ in fields)
        dbf_hdr = 32 + 32 * len(fields) + 1
        bbox = [np.inf, np.inf, -np.inf, -np.inf]
        n = 0
        with open(base + ".shp", "wb") as shp, \
                open(base + ".shx", "wb") as shx, \
                open(base + ".dbf", "wb") as dbf:
            shp.write(b"\x00" * 100)
            shx.write(b"\x00" * 100)
            dbf.write(_dbf_header(fields, 0))
            off = 100
            for r in it:
                g = r["__g"]
                stype = struct.unpack("<i", g[:4])[0]
                if stype != shape_type:
                    raise ValueError(
                        f"record {n + 1} is shape type {stype}, file is "
                        f"{shape_type} — one shape type per shapefile"
                    )
                if stype == SHP_POINT:
                    x, y = struct.unpack("<2d", g[4:20])
                    bbox = [min(bbox[0], x), min(bbox[1], y),
                            max(bbox[2], x), max(bbox[3], y)]
                else:
                    bx0, by0, bx1, by1 = struct.unpack("<4d", g[4:36])
                    bbox = [min(bbox[0], bx0), min(bbox[1], by0),
                            max(bbox[2], bx1), max(bbox[3], by1)]
                if (off + 8 + len(g) > _MAX_FILE
                        or dbf_hdr + (n + 1) * rec_size + 1 > _MAX_FILE):
                    raise ValueError(
                        "shapefile exceeds the format's 2 GiB cap (.shp or "
                        ".dbf stream) — write GPKG or parquet instead"
                    )
                shp.write(struct.pack(">ii", n + 1, len(g) // 2))
                shp.write(g)
                shx.write(struct.pack(">ii", off // 2, len(g) // 2))
                off += 8 + len(g)
                dbf.write(b" ")  # not-deleted flag
                for (name, t, w, d) in fields:
                    dbf.write(_dbf_value(r[name], t, w, d))
                n += 1
            dbf.write(b"\x1a")
            if not n:
                bbox = [0.0, 0.0, 0.0, 0.0]
            shp.seek(0)
            shp.write(_main_header(shape_type, off, bbox))
            shx.seek(0)
            shx.write(_main_header(shape_type, 100 + 8 * n, bbox))
            dbf.seek(0)
            dbf.write(_dbf_header(fields, n))
        return n
    finally:
        df.unpersist()


# --------------------------------------------------------------------------
# distributed reader
# --------------------------------------------------------------------------

def _read_dbf_meta(base: str):
    with open(base + ".dbf", "rb") as fh:
        head = fh.read(32)
        n_rec, hdr_size, rec_size = struct.unpack_from("<IHH", head, 4)
        fields = []
        off = 1  # deletion flag
        while True:
            d = fh.read(32)
            if not d or d[0] == 0x0D:
                break
            name = d[:11].split(b"\x00")[0].decode("ascii")
            t = chr(d[11])
            w, dec = d[16], d[17]
            fields.append((name, t, off, w, dec))
            off += w
    return n_rec, hdr_size, rec_size, fields


def read_shapefile(
    spark: SparkSession,
    path: str,
    n_tasks: int = 32,
) -> tuple[DataFrame, int]:
    """Distributed shapefile scan → ``(df, shape_type)``. ``df`` carries
    ``fid`` (1-based record number), ``part`` (ring/part index — multi-part
    records explode one row per part, the reference's ``explode_gdf``
    Multi*→parts semantics), ``geometry`` (WKB: Point / LineString /
    per-part Polygon ring) and the DBF attributes. Each task preads its
    ``.shx`` slice, one contiguous ``.shp`` range, and its fixed-width
    ``.dbf`` records — the driver reads only the three headers."""
    base = path[:-4] if path.lower().endswith(".shp") else path
    base = os.path.abspath(base)
    with open(base + ".shp", "rb") as fh:
        head = fh.read(100)
    if struct.unpack(">i", head[:4])[0] != 9994:
        raise ValueError(f"{base}.shp is not a shapefile (bad file code)")
    shape_type = struct.unpack_from("<i", head, 32)[0]
    if shape_type not in (SHP_POINT, SHP_POLYLINE, SHP_POLYGON):
        raise NotImplementedError(
            f"shape type {shape_type} not supported (Point/PolyLine/"
            "Polygon; Z/M variants out of scope)"
        )
    n_rec, hdr_size, rec_size, fields = _read_dbf_meta(base)
    n_shx = (os.path.getsize(base + ".shx") - 100) // 8
    if n_shx != n_rec:
        raise ValueError(f".shx has {n_shx} records, .dbf has {n_rec}")
    decode_num = {
        ("N", True): T.LongType(), ("N", False): T.DoubleType(),
        ("F", False): T.DoubleType(),
    }
    attrs = []
    for name, t, off, w, dec in fields:
        if t in ("N", "F"):
            attrs.append((name, decode_num[(t, dec == 0 and t == "N")]))
        elif t == "C":
            attrs.append((name, T.StringType()))
        else:
            raise NotImplementedError(f"DBF field type {t!r} ({name})")
    schema = T.StructType(
        [T.StructField("fid", T.LongType()),
         T.StructField("part", T.IntegerType()),
         T.StructField("geometry", T.BinaryType())]
        + [T.StructField(a, tt) for a, tt in attrs]
    )
    if n_rec == 0:
        ranges = spark.createDataFrame([], "lo long, hi long")
    else:
        bounds = np.linspace(0, n_rec, min(n_tasks, n_rec) + 1).astype(
            np.int64
        )
        ranges = spark.createDataFrame(
            [(int(bounds[i]), int(bounds[i + 1]))
             for i in range(len(bounds) - 1) if bounds[i] < bounds[i + 1]],
            "lo long, hi long",
        ).repartition(n_tasks, "lo")

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open(base + ".shx", "rb") as shx, \
                open(base + ".shp", "rb") as shp, \
                open(base + ".dbf", "rb") as dbf:
            for b in batches:
                for lo, hi in zip(b["lo"], b["hi"]):
                    lo, hi = int(lo), int(hi)
                    k = hi - lo
                    shx.seek(100 + 8 * lo)
                    idx = np.frombuffer(shx.read(8 * k), ">i4").reshape(k, 2)
                    offs, words = idx[:, 0] * 2, idx[:, 1] * 2
                    lo_byte = int(offs[0])
                    shp.seek(lo_byte)
                    blob = np.frombuffer(
                        shp.read(int(offs[-1] + 8 + words[-1]) - lo_byte),
                        np.uint8,
                    )
                    dbf.seek(hdr_size + rec_size * lo)
                    recs = np.frombuffer(
                        dbf.read(rec_size * k), np.uint8
                    ).reshape(k, rec_size)
                    yield _decode_range(
                        lo, offs - lo_byte + 8, words, blob, recs,
                        shape_type, fields, schema,
                    )

    df = ranges.mapInPandas(scan, schema=schema)
    return df, shape_type


def _decode_range(
    rec0: int, starts: np.ndarray, lens: np.ndarray, blob: np.ndarray,
    dbf_recs: np.ndarray, shape_type: int, fields, schema,
) -> pd.DataFrame:
    """Decode one task's record range. Points decode as one reshape;
    poly parts decode per record via buffer views (O(vertices) C work),
    then re-encode as WKB through the shared batch encoder."""
    k = len(starts)
    fid = np.arange(rec0 + 1, rec0 + k + 1, dtype=np.int64)
    # the spec allows null-shape (type 0, 4-byte content) records in any
    # file — they decode as features with NULL geometry, keeping the
    # positional DBF join aligned (code-review r5 pass 3)
    null = lens == 4
    if shape_type == SHP_POINT:
        if k and not ((lens == 20) | null).all():
            raise ValueError("malformed Point records")
        live = np.nonzero(~null)[0]
        body = np.stack([blob[s:s + 20] for s in starts[live]]) \
            if len(live) else np.zeros((0, 20), np.uint8)
        xy = np.ascontiguousarray(body[:, 4:20]).view("<f8").reshape(-1, 2)
        gl = _wkb._split(
            _point_wkb_np(xy),
            np.arange(len(live) + 1, dtype=np.int64) * 21,
        )
        geom = np.full(k, None, dtype=object)
        geom[live] = gl.to_numpy(dtype=object)
        out = pd.DataFrame({
            "fid": fid, "part": np.zeros(k, np.int32), "geometry": geom,
        })
    else:
        rows_fid, rows_part, rx, ry = [], [], [], []
        null_fid = []
        for i, (s, ln) in enumerate(zip(starts, lens)):
            rec = blob[s:s + ln]
            if null[i]:
                null_fid.append(fid[i])
                continue
            n_parts = int(_wkb._u32_read(rec, np.array([36]))[0])
            n_pts = int(_wkb._u32_read(rec, np.array([40]))[0])
            parts = np.ascontiguousarray(
                rec[44:44 + 4 * n_parts]
            ).view("<i4").astype(np.int64)
            pts = np.ascontiguousarray(
                rec[44 + 4 * n_parts:44 + 4 * n_parts + 16 * n_pts]
            ).view("<f8").reshape(-1, 2)
            ends = np.append(parts[1:], n_pts)
            for p, (a, b) in enumerate(zip(parts, ends)):
                rows_fid.append(fid[i])
                rows_part.append(p)
                rx.append(pts[a:b, 0])
                ry.append(pts[a:b, 1])
        gtype = (
            _wkb.WKB_POLYGON if shape_type == SHP_POLYGON
            else _wkb.WKB_LINESTRING
        )
        geom = _wkb._encode_var(pd.Series(rx), pd.Series(ry), gtype)
        out = pd.DataFrame({
            "fid": np.asarray(rows_fid, np.int64),
            "part": np.asarray(rows_part, np.int32),
            "geometry": geom.to_numpy(dtype=object)
            if len(geom) else np.empty(0, dtype=object),
        })
        if null_fid:
            out = pd.concat(
                [out, pd.DataFrame({
                    "fid": np.asarray(null_fid, np.int64),
                    "part": np.zeros(len(null_fid), np.int32),
                    "geometry": np.full(len(null_fid), None, dtype=object),
                })],
                ignore_index=True,
            ).sort_values(["fid", "part"], ignore_index=True)
    # DBF attributes (joined positionally; poly parts repeat their record)
    take = (out["fid"].to_numpy() - rec0 - 1).astype(np.int64)
    for name, t, off, w, dec in fields:
        col = dbf_recs[:, off:off + w]
        sv = col.reshape(-1).view(f"S{w}").reshape(-1)
        # numeric fields are right-justified (strip both sides); C text is
        # left-justified with right padding only — leading spaces are data
        txt = np.char.strip(sv) if t in ("N", "F") else np.char.rstrip(sv)
        if t in ("N", "F"):
            blank = txt == b""
            if dec == 0 and t == "N":
                vals = np.where(blank, b"0", txt).astype(np.int64)
                ser = pd.Series(vals[take])
                if blank.any():
                    ser = ser.astype("Int64")
                    ser[blank[take]] = None
            else:
                vals = np.where(blank, b"nan", txt).astype(np.float64)
                vals[blank] = np.nan
                ser = pd.Series(vals[take])
        else:
            dec_txt = np.array(
                [v.decode("utf-8") for v in txt], dtype=object
            ) if len(txt) else np.array([], dtype=object)
            ser = pd.Series(dec_txt[take] if len(txt) else [])
        out[name] = ser
    return out[[f.name for f in schema.fields]]


def _point_wkb_np(xy: np.ndarray) -> np.ndarray:
    n = len(xy)
    out = np.zeros((n, 21), dtype=np.uint8)
    out[:, 0] = 1
    out[:, 1] = _wkb.WKB_POINT
    out[:, 5:21] = np.ascontiguousarray(xy, dtype="<f8").view(
        np.uint8
    ).reshape(n, 16)
    return out.reshape(-1)


# --------------------------------------------------------------------------
# .prj sidecar (WKT1 CRS, the ESRI convention)
# --------------------------------------------------------------------------

_GEOGCS_WGS84 = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",'
    '0.0174532925199433],AUTHORITY["EPSG","4326"]]'
)


def prj_wkt(epsg: int) -> "str | None":
    """WKT1 for the CRS surface this engine speaks: 4326, 3857, and the
    WGS84 UTM zones (326xx/327xx — zone parameters are defined by the
    EPSG formulas, so the WKT is exact). None for anything else — there
    is no EPSG database in this environment to synthesize full parameter
    sets from, and a .prj with wrong parameters is worse than none."""
    if epsg == 4326:
        return _GEOGCS_WGS84
    if epsg == 3857:
        return (
            'PROJCS["WGS 84 / Pseudo-Mercator",' + _GEOGCS_WGS84 +
            ',PROJECTION["Mercator_1SP"],PARAMETER["central_meridian",0],'
            'PARAMETER["scale_factor",1],PARAMETER["false_easting",0],'
            'PARAMETER["false_northing",0],UNIT["metre",1],'
            'AUTHORITY["EPSG","3857"]]'
        )
    if 32601 <= epsg <= 32660 or 32701 <= epsg <= 32760:
        zone = epsg % 100
        north = epsg < 32700
        return (
            f'PROJCS["WGS 84 / UTM zone {zone}{"N" if north else "S"}",'
            + _GEOGCS_WGS84 +
            ',PROJECTION["Transverse_Mercator"],'
            'PARAMETER["latitude_of_origin",0],'
            f'PARAMETER["central_meridian",{-183 + 6 * zone}],'
            'PARAMETER["scale_factor",0.9996],'
            'PARAMETER["false_easting",500000],'
            f'PARAMETER["false_northing",{0 if north else 10000000}],'
            f'UNIT["metre",1],AUTHORITY["EPSG","{epsg}"]]'
        )
    return None


def write_prj(path: str, epsg: int) -> bool:
    """Write the ``.prj`` sidecar next to ``path`` when :func:`prj_wkt`
    knows the CRS; returns whether one was written. An unknown CRS
    REMOVES any stale sidecar — overwriting a shapefile must not leave
    the previous dataset's CRS attached."""
    base = path[:-4] if path.lower().endswith(".shp") else path
    wkt = prj_wkt(epsg)
    if wkt is None:
        try:
            os.remove(base + ".prj")
        except FileNotFoundError:
            pass
        return False
    with open(base + ".prj", "w") as fh:
        fh.write(wkt)
    return True


def read_prj(path: str) -> "int | None":
    """EPSG code from the ``.prj`` sidecar (the OUTERMOST
    AUTHORITY["EPSG", ...] entry — the last one in WKT1 text), or None
    when the file is absent or carries no EPSG authority."""
    import re

    base = path[:-4] if path.lower().endswith(".shp") else path
    try:
        with open(base + ".prj") as fh:
            wkt = fh.read()
    except FileNotFoundError:
        return None
    m = re.findall(r'AUTHORITY\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]', wkt)
    return int(m[-1]) if m else None
