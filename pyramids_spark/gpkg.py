"""GeoPackage (OGC GPKG 1.3) vector container on stdlib ``sqlite3``.

Reference surface: ``feature/collection.py:1657-1811`` ``to_file`` with the
``GPKG`` driver (``layer=`` names the table; "writing two layers into the
same GPKG is the canonical multi-layer case"), ``:1240-1326`` ``list_layers``
over multi-layer containers, ``:789-948`` ``read_file`` with
``where``/``columns``/``bbox`` pushdown. The reference delegates to
GDAL/pyogrio; here the container is built directly: a GeoPackage IS a
SQLite database (stdlib ``sqlite3``) whose feature tables store geometries
as a ``GP``-header blob wrapping ISO WKB
(:mod:`pyramids_spark.functions.wkb`).

Scale contract (mirrors the GeoTIFF split):

* ``write_gpkg`` is the SINGLE-FILE sink: geometry blobs and attribute rows
  are built executor-side (vectorized WKB + header assembly), then stream
  through the driver in O(batch) memory into one ``sqlite3`` connection —
  SQLite is a single-writer format, exactly like the one-document
  ``to_geojson`` contract. The distributed sibling for large exports is
  parquet / GeoJSONSeq.
* ``read_gpkg`` is DISTRIBUTED: the driver reads only the catalog tables
  (``gpkg_contents``/``gpkg_geometry_columns``, KB-scale) plus the rowid
  span; executors each open the file read-only/immutable and scan disjoint
  ``fid`` ranges. ``where`` and ``columns`` push INTO the per-task SQL
  (SQLite evaluates them before bytes reach Spark), the reference's
  pushdown semantics re-expressed against the container engine itself.
"""

from __future__ import annotations

import os
import sqlite3
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions import wkb as _wkb

_APPLICATION_ID = 0x47504B47  # 'GPKG'
_USER_VERSION = 10300  # GeoPackage 1.3.0

#: Spark type → SQLite declared type for attribute columns
_SQLITE_TYPES = {
    T.LongType(): "INTEGER", T.IntegerType(): "MEDIUMINT",
    T.ShortType(): "SMALLINT", T.ByteType(): "TINYINT",
    T.DoubleType(): "DOUBLE", T.FloatType(): "FLOAT",
    T.StringType(): "TEXT", T.BooleanType(): "BOOLEAN",
    T.BinaryType(): "BLOB",
}

_WKT_4326 = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",'
    "0.0174532925199433]]"
)


def gpkg_blob(wkb_col: Column, srs_id: int) -> Column:
    """WKB → GeoPackage geometry blob: the 8-byte ``GP`` header (version 0,
    little-endian flags) + xy envelope for non-point types (envelope
    indicator 1; points carry indicator 0, GDAL's convention) + the WKB.
    Vectorized batch assembly — same offset-math discipline as the WKB
    encoders."""

    @F.pandas_udf(T.BinaryType())
    def build(b: pd.Series) -> pd.Series:
        buf, offs, lens = _wkb._batch(b)
        n = len(lens)
        if n == 0:
            return pd.Series([], dtype=object)
        if not (buf[offs] == 1).all():
            raise ValueError("gpkg_blob expects little-endian WKB")
        codes = _wkb._u32_read(buf, offs + 1)
        is_pt = codes == _wkb.WKB_POINT
        hdr = np.where(is_pt, 8, 40)
        out_lens = hdr + lens
        out_offs = np.concatenate([[0], out_lens.cumsum()])
        out = np.zeros(int(out_offs[-1]), dtype=np.uint8)
        s = out_offs[:-1]
        out[s] = 0x47  # 'G'
        out[s + 1] = 0x50  # 'P'
        # byte 2: version 0; byte 3: flags = bit0 LE | env indicator << 1
        out[s + 3] = np.where(is_pt, 0b0000_0001, 0b0000_0011)
        _wkb._u32_at(out, s + 4, np.full(n, srs_id & 0xFFFFFFFF))
        if (~is_pt).any():
            xs, ys = _wkb._ring_coords(
                pd.Series([v for v, p in zip(b, is_pt) if not p])
            )
            env = np.empty((len(xs), 4), dtype="<f8")
            for i, (xa, ya) in enumerate(zip(xs, ys)):
                env[i] = (xa.min(), xa.max(), ya.min(), ya.max())
            eb = env.view(np.uint8)
            dst = np.repeat(s[~is_pt] + 8, 32) + np.tile(
                np.arange(32), int((~is_pt).sum())
            )
            out[dst] = eb.ravel()
        # splice the WKB payloads after each header
        dest = np.repeat(s + hdr, lens) + _wkb._grouped_arange(lens)
        src = np.repeat(offs, lens) + _wkb._grouped_arange(lens)
        out[dest] = buf[src]
        return _wkb._split(out, out_offs)

    return build(wkb_col)


def gpkg_wkb(blob: Column) -> Column:
    """GeoPackage geometry blob → the wrapped WKB (header + envelope
    stripped; envelope size decoded from the flags byte, vectorized)."""

    @F.pandas_udf(T.BinaryType())
    def strip(b: pd.Series) -> pd.Series:
        buf, offs, lens = _wkb._batch(b)
        n = len(lens)
        if n == 0:
            return pd.Series([], dtype=object)
        if not ((buf[offs] == 0x47) & (buf[offs + 1] == 0x50)).all():
            raise ValueError("not a GeoPackage geometry blob (no GP magic)")
        flags = buf[offs + 3]
        env_ind = (flags >> 1) & 0b111
        env_len = np.array([0, 32, 48, 48, 64], dtype=np.int64)
        if (env_ind > 4).any():
            raise ValueError(f"invalid envelope indicator {env_ind.max()}")
        hdr = 8 + env_len[env_ind]
        raw = buf.tobytes()
        return pd.Series(
            [
                raw[int(o + h):int(o + ln)]
                for o, h, ln in zip(offs, hdr, lens)
            ]
        )

    return strip(blob)


def _qi(name: str) -> str:
    """Quote an SQL identifier for SQLite (embedded quotes doubled) — the
    write path must accept the same arbitrary column names the quoted read
    path already does ('order', 'group', names with spaces…)."""
    return '"' + name.replace('"', '""') + '"'



def _env_of(g: bytes) -> "tuple[float, float, float, float]":
    """GP blob → exact (minx, maxx, miny, maxy) from the header bytes:
    the stored envelope when present, else the point's coordinates."""
    if (g[3] >> 1) & 0b111:
        e = np.frombuffer(g[8:40], "<f8")
        return float(e[0]), float(e[1]), float(e[2]), float(e[3])
    x, y = np.frombuffer(g[13:29], "<f8")
    return float(x), float(x), float(y), float(y)


def _attr_cols(df: DataFrame, geometry_col: str) -> list[tuple[str, str]]:
    cols = []
    for f in df.schema.fields:
        if f.name == geometry_col:
            continue
        sql_t = _SQLITE_TYPES.get(f.dataType)
        if sql_t is None:
            raise ValueError(
                f"attribute column {f.name!r}: {f.dataType.simpleString()} "
                "has no GPKG mapping (arrays/structs do not fit a feature "
                "table — serialize to JSON text first)"
            )
        cols.append((f.name, sql_t))
    return cols


def _init_gpkg(con: sqlite3.Connection, srs_id: int) -> None:
    con.execute(f"PRAGMA application_id = {_APPLICATION_ID}")
    con.execute(f"PRAGMA user_version = {_USER_VERSION}")
    con.execute(
        "CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys ("
        "srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY, "
        "organization TEXT NOT NULL, organization_coordsys_id INTEGER "
        "NOT NULL, definition TEXT NOT NULL, description TEXT)"
    )
    base = [
        ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
        ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
        ("WGS 84 geodetic", 4326, "EPSG", 4326, _WKT_4326, None),
    ]
    if srs_id not in (-1, 0, 4326):
        base.append(
            (f"EPSG:{srs_id}", srs_id, "EPSG", srs_id, f"EPSG:{srs_id}",
             None)
        )
    con.executemany(
        "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
        base,
    )
    con.execute(
        "CREATE TABLE IF NOT EXISTS gpkg_contents ("
        "table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL, "
        "identifier TEXT UNIQUE, description TEXT DEFAULT '', "
        "last_change DATETIME NOT NULL DEFAULT "
        "(strftime('%Y-%m-%dT%H:%M:%fZ','now')), "
        "min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, "
        "srs_id INTEGER)"
    )
    con.execute(
        "CREATE TABLE IF NOT EXISTS gpkg_geometry_columns ("
        "table_name TEXT NOT NULL PRIMARY KEY, column_name TEXT NOT NULL, "
        "geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, "
        "z TINYINT NOT NULL, m TINYINT NOT NULL)"
    )


def write_gpkg(
    df: DataFrame,
    path: str,
    layer: str,
    geometry_col: str = "geometry",
    geometry_type: str = "POINT",
    srs_id: int = 4326,
    batch: int = 4096,
    spatial_index: bool = False,
) -> int:
    """Write one feature layer into ``path`` (creating the GeoPackage or
    appending a new layer — the reference's canonical multi-layer write,
    ``collection.py:1681-1693``). ``geometry_col`` must already hold WKB
    (``functions.wkb`` encoders); rows stream through the driver in
    ``batch``-row inserts. ``spatial_index`` builds the spec's
    ``gpkg_rtree_index`` extension (an SQLite R*-tree over the feature
    envelopes, registered in ``gpkg_extensions``) — what makes
    ``read_gpkg(bbox=...)`` pushdown possible. Returns the feature
    count."""
    if not layer.isidentifier():
        raise ValueError(f"layer name {layer!r} must be an identifier")
    attrs = _attr_cols(df, geometry_col)
    blob = gpkg_blob(F.col(geometry_col), srs_id).alias("__geom")
    proj = df.select(blob, *[a for a, _ in attrs])
    con = sqlite3.connect(path)
    try:
        _init_gpkg(con, srs_id)
        adef = "".join(f", {_qi(a)} {t}" for a, t in attrs)
        con.execute(
            f"CREATE TABLE {layer} (fid INTEGER PRIMARY KEY AUTOINCREMENT, "
            f"geom BLOB{adef})"
        )
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', ?, ?, 0, 0)",
            (layer, geometry_type.upper(), srs_id),
        )
        ins = (
            f"INSERT INTO {layer} "
            f"(geom{''.join(', ' + _qi(a) for a, _ in attrs)})"
            f" VALUES (?{', ?' * len(attrs)})"
        )
        rt = _qi(f"rtree_{layer}_geom")
        if spatial_index:
            con.execute(
                f"CREATE VIRTUAL TABLE {rt} USING rtree"
                "(id, minx, maxx, miny, maxy)"
            )
        rt_ins = f"INSERT INTO {rt} VALUES (?, ?, ?, ?, ?)"
        n = 0
        bbox = [np.inf, np.inf, -np.inf, -np.inf]
        rows: list[tuple] = []
        envs: list[tuple] = []
        for r in proj.toLocalIterator():
            g = r["__geom"]
            rows.append((g, *[r[a] for a, _ in attrs]))
            # envelope / point coords sit at fixed offsets — maintain the
            # layer bbox from the header bytes alone
            env = _env_of(g)
            bbox = [min(bbox[0], env[0]), min(bbox[1], env[2]),
                    max(bbox[2], env[1]), max(bbox[3], env[3])]
            n += 1
            if spatial_index:  # fresh AUTOINCREMENT table → fid = 1..n
                envs.append((n, *env))
            if len(rows) >= batch:
                con.executemany(ins, rows)
                rows = []
                if envs:  # index rows flush with the batch: O(batch) driver
                    con.executemany(rt_ins, envs)
                    envs = []
        if rows:
            con.executemany(ins, rows)
        if envs:
            con.executemany(rt_ins, envs)
        if not n:
            bbox = [None, None, None, None]
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier,"
            " min_x, min_y, max_x, max_y, srs_id)"
            " VALUES (?, 'features', ?, ?, ?, ?, ?, ?)",
            (layer, layer, *bbox, srs_id),
        )
        if spatial_index:
            con.execute(
                "CREATE TABLE IF NOT EXISTS gpkg_extensions ("
                "table_name TEXT, column_name TEXT, extension_name TEXT "
                "NOT NULL, definition TEXT NOT NULL, scope TEXT NOT NULL)"
            )
            con.execute(
                "INSERT INTO gpkg_extensions VALUES (?, 'geom', "
                "'gpkg_rtree_index', "
                "'http://www.geopackage.org/spec120/#extension_rtree', "
                "'write-only')",
                (layer,),
            )
        con.commit()
    finally:
        con.close()
    return n


def list_gpkg_layers(path: str) -> list[tuple[str, str, int]]:
    """(layer, geometry_type, srs_id) from the catalog tables — driver-only
    metadata read (≙ ``pyogrio.list_layers``, ``collection.py:1240``)."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        return [
            (r[0], r[1], int(r[2]))
            for r in con.execute(
                "SELECT table_name, geometry_type_name, srs_id "
                "FROM gpkg_geometry_columns ORDER BY table_name"
            )
        ]
    finally:
        con.close()


def read_gpkg(
    spark: SparkSession,
    path: str,
    layer: str,
    columns: "list[str] | None" = None,
    where: "str | None" = None,
    bbox: "tuple[float, float, float, float] | None" = None,
    n_tasks: int = 32,
) -> tuple[DataFrame, str, int]:
    """Distributed GeoPackage layer scan. Returns ``(df, geometry_type,
    srs_id)``; ``df`` carries ``fid``, ``geometry`` (WKB) and the attribute
    columns. ``where``/``columns``/``bbox`` push into the per-task SQLite
    query — filtered rows never leave the container (reference pushdown
    contract, ``collection.py:598-606``). ``bbox`` (xmin, ymin, xmax,
    ymax) probes the layer's ``gpkg_rtree_index`` R*-tree (envelope
    INTERSECTION — the reference/OGR semantics) and requires the layer to
    carry one. Each task opens the file immutable read-only and scans a
    disjoint ``fid`` range, so a 1000-executor cluster splits one file
    without coordination."""
    path = os.path.abspath(path)
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        meta = con.execute(
            "SELECT column_name, geometry_type_name, srs_id "
            "FROM gpkg_geometry_columns WHERE table_name = ?", (layer,)
        ).fetchone()
        if meta is None:
            raise ValueError(f"no layer {layer!r} in {path}")
        geom_col, gtype, srs_id = meta[0], meta[1], int(meta[2])
        info = con.execute(f'PRAGMA table_info("{layer}")').fetchall()
        # the spec allows any pk / geometry column name — take the declared
        # INTEGER PRIMARY KEY, not a hardcoded "fid"
        fid_col = next((r[1] for r in info if r[5]), "fid")
        span = con.execute(
            f'SELECT min("{fid_col}"), max("{fid_col}") FROM "{layer}"'
        ).fetchone()
        rtree = f"rtree_{layer}_{geom_col}"
        if bbox is not None and con.execute(
            "SELECT 1 FROM sqlite_master WHERE type = 'table' AND name = ?",
            (rtree,),
        ).fetchone() is None:
            raise ValueError(
                f"layer {layer!r} has no {rtree!r} spatial index — write "
                "with spatial_index=True (or filter after the scan)"
            )
    finally:
        con.close()
    decl_to_spark = {
        "INTEGER": T.LongType(), "MEDIUMINT": T.IntegerType(),
        "SMALLINT": T.ShortType(), "TINYINT": T.ByteType(),
        "DOUBLE": T.DoubleType(), "FLOAT": T.FloatType(),
        "REAL": T.DoubleType(), "TEXT": T.StringType(),
        "BOOLEAN": T.BooleanType(), "BLOB": T.BinaryType(),
    }
    attrs = [
        (name, decl_to_spark.get(decl.upper(), T.StringType()))
        for _, name, decl, *_ in info
        if name not in (fid_col, geom_col)
    ]
    if columns is not None:
        missing = set(columns) - {a for a, _ in attrs}
        if missing:
            raise ValueError(f"unknown columns {sorted(missing)}")
        attrs = [a for a in attrs if a[0] in columns]
    schema = T.StructType(
        [T.StructField("fid", T.LongType()),
         T.StructField("__blob", T.BinaryType())]
        + [T.StructField(a, t) for a, t in attrs]
    )
    lo, hi = (span or (None, None))
    if lo is None:
        ranges = spark.createDataFrame([], "lo long, hi long")
    else:
        bounds = np.linspace(int(lo), int(hi) + 1, n_tasks + 1).astype(
            np.int64
        )
        ranges = spark.createDataFrame(
            [(int(bounds[i]), int(bounds[i + 1]))
             for i in range(n_tasks) if bounds[i] < bounds[i + 1]],
            "lo long, hi long",
        ).repartition(n_tasks, "lo")
    sel = ", ".join(f'"{c}"' for c in [fid_col, geom_col]
                    + [a for a, _ in attrs])
    cond = f" AND ({where})" if where else ""
    args: tuple = ()
    if bbox is not None:
        # rtree columns are (id, minx, maxx, miny, maxy); intersection =
        # NOT disjoint. The subquery stays inside SQLite, so only index
        # hits are fetched.
        cond += (
            f' AND "{fid_col}" IN (SELECT id FROM "{rtree}" '
            "WHERE maxx >= ? AND minx <= ? AND maxy >= ? AND miny <= ?)"
        )
        args = (float(bbox[0]), float(bbox[2]), float(bbox[1]),
                float(bbox[3]))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = sqlite3.connect(f"file:{path}?mode=ro&immutable=1", uri=True)
        try:
            for b in batches:
                for lo_, hi_ in zip(b["lo"], b["hi"]):
                    cur = c.execute(
                        f'SELECT {sel} FROM "{layer}" '
                        f'WHERE "{fid_col}" >= ? AND "{fid_col}" < ?{cond}',
                        (int(lo_), int(hi_)) + args,
                    )
                    rows = cur.fetchall()
                    if bbox is not None:
                        # the R*-tree stores float32 bounds (rounded
                        # outward) — re-check against the exact envelope
                        # in the GP header, like OGR does
                        rows = [
                            r for r in rows
                            if (e := _env_of(r[1]))[0] <= bbox[2]
                            and e[1] >= bbox[0]
                            and e[2] <= bbox[3] and e[3] >= bbox[1]
                        ]
                    yield pd.DataFrame(
                        rows, columns=["fid", "__blob"] + [a for a, _ in attrs]
                    ) if rows else pd.DataFrame(
                        {f.name: [] for f in schema.fields}
                    )
        finally:
            c.close()

    raw = ranges.mapInPandas(scan, schema=schema)
    out = raw.select(
        "fid", gpkg_wkb(F.col("__blob")).alias("geometry"),
        *[a for a, _ in attrs],
    )
    return out, gtype, srs_id
