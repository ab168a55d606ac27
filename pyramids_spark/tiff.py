"""Real tiled GeoTIFF I/O in pure struct + numpy — no GDAL/libtiff.

Reference surface: ``Dataset.to_file`` / ``to_cog`` / ``read_file``
(GDAL GTiff/COG drivers). Classic TIFF 6.0 + the GeoTIFF tag set are
PUBLIC specs; the tiled case (raw or DEFLATE via stdlib zlib, any storage
dtype from the shared table ``pyramids_spark.dtypes`` — uint8…float64,
the reference's GDAL dtype table) is directly writable:

- header ``II*\\0`` + first-IFD offset;
- one IFD per (band, pyramid level): band 0 full-res first, then its
  overview IFDs (the COG-style embedded pyramid), then band 1, …;
- per IFD: tiled layout tags (TileWidth/Length/Offsets/ByteCounts),
  SampleFormat/BitsPerSample per the storage dtype, Compression
  none/DEFLATE, plus the
  GeoTIFF georeferencing tags (ModelPixelScale, ModelTiepoint,
  GeoKeyDirectory with the EPSG code) and GDAL's ASCII nodata tag;
- tile payloads: raw little-endian storage-dtype bytes, edge tiles padded with
  nodata, ALL tiles materialized (no sparse offset-0 tiles — maximum
  reader compatibility).

Tile blocks (and their optional deflation) are built DISTRIBUTED
(groupBy tile + applyInPandas, same shape as the zarr chunk writer), then
iterated to the driver in (band, level, tile) order via
``toLocalIterator`` — O(tile) driver memory — and appended sequentially;
the offset/count arrays live at layout-time-fixed positions and are
patched once streaming ends. A single .tif is an EXPORT artifact (classic
TIFF caps at 4 GiB; BigTIFF out of scope) — the 100-TB storage paths are
the parquet/zarr cell tables; this exists for interop with the
reference's GDAL world.

The reader parses the IFD chain driver-side (KBs), then ships the tile
(offset, size) table to executors which re-open the file and decode their
tiles in ``mapInPandas`` — a distributed scan of one file by byte range,
the binaryFile-with-offsets pattern.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import _blocks, dtypes as _dt
from .grid import Grid

# TIFF tag ids
_W, _H = 256, 257
_BITS, _COMP, _PHOTO = 258, 259, 262
_SPP, _SFMT = 277, 339
_TW, _TH, _TOFF, _TCNT = 322, 323, 324, 325
_SOFF, _RPS, _SCNT = 273, 278, 279  # strip layout (read side only)
_NEWSUBFILE = 254
_PIXSCALE, _TIEPOINT, _GEOKEYS = 33550, 33922, 34735
_GDAL_NODATA = 42113
_T_SHORT, _T_LONG, _T_DOUBLE, _T_ASCII = 3, 4, 12, 2


def _ntiles(rows: int, cols: int, th: int, tw: int) -> tuple[int, int]:
    return (rows + th - 1) // th, (cols + tw - 1) // tw


def _pack_tag(tag: int, typ: int, count: int, value_or_off: int) -> bytes:
    return struct.pack("<HHII", tag, typ, count, value_or_off)


class _Ifd:
    """One IFD's layout: tags + external arrays + its tile data extent."""

    def __init__(self, rows, cols, th, tw, is_overview: bool, itemsize: int = 8):
        self.rows, self.cols, self.th, self.tw = rows, cols, th, tw
        self.is_overview = is_overview
        self.nty, self.ntx = _ntiles(rows, cols, th, tw)
        self.n_tiles = self.nty * self.ntx
        self.tile_bytes = th * tw * itemsize


def write_geotiff(
    per_level: "list[tuple[DataFrame, Grid]]",
    n_bands: int,
    path: str,
    tile: tuple[int, int] = (256, 256),
    compress: "int | None" = None,
    dtype: str = "float64",
) -> int:
    """Write bands × pyramid levels as one tiled GeoTIFF. ``per_level`` is
    [(cells_df, grid)] — full resolution first, then each overview (all
    levels carry every band). ``compress`` = DEFLATE level 1-9
    (Compression=8, stdlib zlib) or None for raw tiles. ``dtype`` is the
    STORAGE dtype (the reference's GDAL dtype table,
    ``pyramids_spark.dtypes``) — cells stay float64 in the engine; integer
    stores require a representable nodata and integral in-range values
    (loud guards). Raw tiles have a constant size so every offset is
    precomputable; deflated tiles stream sequentially and the offset/count
    arrays (whose POSITIONS are fixed either way) are patched at the end.
    Returns total bytes written."""
    th, tw = int(tile[0]), int(tile[1])
    base_grid = per_level[0][1]
    nodata = base_grid.nodata
    dt_name = _dt.resolve(dtype)
    np_dt, bits, sfmt = (
        _dt.np_dtype(dt_name), _dt.TABLE[dt_name][1], _dt.TABLE[dt_name][2]
    )
    fill = _dt.check_fill(dt_name, nodata)

    ifds: list[_Ifd] = []
    for b in range(n_bands):
        for li, (_, g) in enumerate(per_level):
            ifds.append(
                _Ifd(g.rows, g.cols, th, tw, is_overview=li > 0,
                     itemsize=np_dt.itemsize)
            )

    # ---- layout: [header][IFD+arrays]*[tile data]* ------------------------
    pos = 8
    ifd_pos: list[int] = []
    # first pass sizes: per IFD, tags are fixed-count; external arrays are
    # (tile offsets, tile counts, pixscale, tiepoint, geokeys, nodata ascii)
    nod_ascii = (b"nan" if nodata is None else f"{nodata:g}".encode()) + b"\x00"
    if len(nod_ascii) <= 4:  # force the external-array path: a <=4-byte
        nod_ascii += b"\x00" * (5 - len(nod_ascii))  # ASCII would inline
    for k, f_ in enumerate(ifds):
        n_tags = 15 + (1 if f_.is_overview else 0)
        ifd_pos.append(pos)
        pos += 2 + n_tags * 12 + 4  # count + entries + next-IFD pointer
        f_.ext_at = pos
        ext = 0
        f_.off_arr_at = pos + ext
        ext += 4 * f_.n_tiles if f_.n_tiles > 1 else 0
        f_.cnt_arr_at = pos + ext
        ext += 4 * f_.n_tiles if f_.n_tiles > 1 else 0
        f_.scale_at = pos + ext
        ext += 3 * 8
        f_.tie_at = pos + ext
        ext += 6 * 8
        f_.geo_at = pos + ext
        ext += 4 * 2 * 4  # header + 3 keys, SHORTs
        f_.nod_at = pos + ext
        ext += len(nod_ascii) + (len(nod_ascii) % 2)
        pos += ext
    data_start = pos + (pos % 2)
    bound = data_start + sum(f_.n_tiles * f_.tile_bytes for f_ in ifds)
    if compress is not None:  # deflate worst case adds <0.1% on raw bytes
        bound = int(bound * 1.01) + 4096
    if bound > 2**32 - 1:
        raise ValueError(
            f"raster needs up to {bound} bytes — classic TIFF caps at 4 GiB "
            "(BigTIFF out of scope); use to_zarr/to_parquet for rasters "
            "this size"
        )

    def geokeys(epsg: int) -> bytes:
        model = 2 if epsg == 4326 else 1  # geographic vs projected
        keys = [(1024, 0, 1, model), (1025, 0, 1, 1)]
        keys.append((2048 if model == 2 else 3072, 0, 1, epsg))
        out = struct.pack("<4H", 1, 1, 0, len(keys))
        for kk in keys:
            out += struct.pack("<4H", *kk)
        return out

    with open(path, "wb") as fh:
        fh.write(struct.pack("<2sHI", b"II", 42, ifd_pos[0]))
        for k, f_ in enumerate(ifds):
            b = k // len(per_level)
            li = k % len(per_level)
            g = per_level[li][1]
            tags = []
            if f_.is_overview:
                tags.append((_NEWSUBFILE, _T_LONG, 1, 1))  # reduced-resolution
            tags += [
                (_W, _T_LONG, 1, f_.cols),
                (_H, _T_LONG, 1, f_.rows),
                (_BITS, _T_SHORT, 1, bits),
                (_COMP, _T_SHORT, 1, 1 if compress is None else 8),
                (_PHOTO, _T_SHORT, 1, 1),
                (_SPP, _T_SHORT, 1, 1),
                (_TW, _T_SHORT, 1, tw),
                (_TH, _T_SHORT, 1, th),
                # value 0 for single-tile IFDs: the real offset/count is
                # patched into the tag's value field after streaming
                (_TOFF, _T_LONG, f_.n_tiles, 0 if f_.n_tiles == 1 else f_.off_arr_at),
                (_TCNT, _T_LONG, f_.n_tiles, 0 if f_.n_tiles == 1 else f_.cnt_arr_at),
                (_SFMT, _T_SHORT, 1, sfmt),
                (_PIXSCALE, _T_DOUBLE, 3, f_.scale_at),
                (_TIEPOINT, _T_DOUBLE, 6, f_.tie_at),
                (_GEOKEYS, _T_SHORT, 16, f_.geo_at),  # 4-SHORT header + 3 keys
                (_GDAL_NODATA, _T_ASCII, len(nod_ascii), f_.nod_at),
            ]
            tags.sort(key=lambda t: t[0])
            fh.seek(ifd_pos[k])
            fh.write(struct.pack("<H", len(tags)))
            for idx, t in enumerate(tags):
                if t[0] == _TOFF:
                    f_.toff_val_pos = ifd_pos[k] + 2 + idx * 12 + 8
                if t[0] == _TCNT:
                    f_.tcnt_val_pos = ifd_pos[k] + 2 + idx * 12 + 8
                fh.write(_pack_tag(*t))
            nxt = ifd_pos[k + 1] if k + 1 < len(ifds) else 0
            fh.write(struct.pack("<I", nxt))
            f_.offs, f_.cnts = [], []
            fh.seek(f_.scale_at)
            fh.write(struct.pack("<3d", g.cell, g.cell, 0.0))
            fh.seek(f_.tie_at)
            fh.write(struct.pack("<6d", 0.0, 0.0, 0.0, g.x0, g.y0, 0.0))
            fh.seek(f_.geo_at)
            fh.write(geokeys(g.epsg))
            fh.seek(f_.nod_at)
            fh.write(nod_ascii)

        # ---- tile payloads: distributed block build, streamed in order ----
        import zlib

        raw_fill = _dt.cast_block(
            np.full((th, tw), fill, dtype="<f8"), dt_name
        ).tobytes(order="C")
        fill_tile = raw_fill if compress is None else zlib.compress(raw_fill, compress)
        cur = data_start
        for li, (cdf, g) in enumerate(per_level):
            nty, ntx = _ntiles(g.rows, g.cols, th, tw)

            def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
                bb, ti, tj = int(key[0]), int(key[1]), int(key[2])
                rr, cc = pdf["row"].to_numpy(), pdf["col"].to_numpy()
                if (
                    rr.min() < 0 or rr.max() >= g.rows
                    or cc.min() < 0 or cc.max() >= g.cols
                ):
                    # out-of-extent cells would either wrap via fancy
                    # indexing (negative) or desync the sequential merge
                    # stream (beyond-grid ti/tj) — fail loudly instead
                    raise ValueError(
                        f"cell outside grid extent ({g.rows}x{g.cols}): "
                        f"rows [{rr.min()},{rr.max()}] cols [{cc.min()},{cc.max()}]"
                    )
                block = _blocks.dense_block(pdf, th, tw, ti * th, tj * tw, fill)
                data = _dt.cast_block(block, dt_name).tobytes(order="C")
                if compress is not None:  # deflate in the EXECUTORS — the
                    import zlib  # driver only streams the ready bytes

                    data = zlib.compress(data, compress)
                return pd.DataFrame(
                    {"band": [bb], "ti": [ti], "tj": [tj], "data": [data]}
                )

            keyed = cdf.where(F.col("value").isNotNull()).select(
                "band", "row", "col", "value",
                (F.col("row") / th).cast("long").alias("_ti"),
                (F.col("col") / tw).cast("long").alias("_tj"),
            )
            blocks = (
                keyed.groupBy("band", "_ti", "_tj")
                .applyInPandas(build, "band long, ti long, tj long, data binary")
                .orderBy("band", "ti", "tj")
            )
            it = blocks.toLocalIterator()
            nxt_row = next(it, None)
            for b in range(n_bands):
                f_ = ifds[b * len(per_level) + li]
                for t in range(nty * ntx):
                    ti, tj = t // ntx, t % ntx
                    if (
                        nxt_row is not None
                        and (nxt_row["band"], nxt_row["ti"], nxt_row["tj"]) == (b, ti, tj)
                    ):
                        data = nxt_row["data"]  # already deflated executor-side
                        nxt_row = next(it, None)
                    else:  # empty tile: all nodata
                        data = fill_tile
                    fh.seek(cur)
                    fh.write(data)
                    f_.offs.append(cur)
                    f_.cnts.append(len(data))
                    cur += len(data)
            if nxt_row is not None:
                # a block the merge never matched means its (band, ti, tj)
                # is outside the declared layout — the file written so far
                # is silently fill-padded, so fail loudly
                raise ValueError(
                    "unconsumed tile block after streaming level "
                    f"{li}: band={nxt_row['band']} ti={nxt_row['ti']} "
                    f"tj={nxt_row['tj']} (outside {n_bands}x{nty}x{ntx})"
                )
        # patch offset/count arrays (or single-tile tag value fields)
        for f_ in ifds:
            if f_.n_tiles > 1:
                fh.seek(f_.off_arr_at)
                fh.write(struct.pack(f"<{f_.n_tiles}I", *f_.offs))
                fh.seek(f_.cnt_arr_at)
                fh.write(struct.pack(f"<{f_.n_tiles}I", *f_.cnts))
            else:
                fh.seek(f_.toff_val_pos)
                fh.write(struct.pack("<I", f_.offs[0]))
                fh.seek(f_.tcnt_val_pos)
                fh.write(struct.pack("<I", f_.cnts[0]))
        fh.truncate(cur)
    return cur


def _read_ifds(path: str) -> list[dict]:
    with open(path, "rb") as fh:
        hdr = fh.read(8)
        bo, magic, off = struct.unpack("<2sHI", hdr)
        if bo != b"II" or magic != 42:
            raise NotImplementedError("only little-endian classic TIFF")
        out = []
        while off:
            fh.seek(off)
            (n,) = struct.unpack("<H", fh.read(2))
            tags = {}
            for _ in range(n):
                tag, typ, cnt, val = struct.unpack("<HHII", fh.read(12))
                tags[tag] = (typ, cnt, val)
            (off,) = struct.unpack("<I", fh.read(4))

            def arr(tag, fmt, per):
                typ, cnt, val = tags[tag]
                if fmt == "I" and typ == _T_SHORT:
                    fmt, per = "H", 2  # old writers store strip arrays as SHORT
                if cnt * per <= 4 and fmt in ("I", "H"):
                    # TIFF 6.0: values totalling <= 4 bytes live IN the
                    # value field (e.g. a 2-strip file with SHORT
                    # StripByteCounts inlines both), not at an offset
                    return list(
                        struct.unpack(
                            f"<{cnt}{fmt}", struct.pack("<I", val)[: cnt * per]
                        )
                    )
                cur = fh.tell()
                fh.seek(val)
                vals = list(struct.unpack(f"<{cnt}{fmt}", fh.read(cnt * per)))
                fh.seek(cur)
                return vals

            d = {
                "rows": tags[_H][2], "cols": tags[_W][2],
                "scale": arr(_PIXSCALE, "d", 8) if _PIXSCALE in tags else [1.0, 1.0, 0.0],
                "tie": arr(_TIEPOINT, "d", 8) if _TIEPOINT in tags else [0.0] * 6,
                "geokeys": arr(_GEOKEYS, "H", 2) if _GEOKEYS in tags else [1, 1, 0, 0],
                "overview": _NEWSUBFILE in tags and tags[_NEWSUBFILE][2] == 1,
            }
            if _TW in tags:  # tiled layout (our writer; COGs)
                d["tw"], d["th"] = tags[_TW][2], tags[_TH][2]
                d["offsets"], d["counts"] = arr(_TOFF, "I", 4), arr(_TCNT, "I", 4)
            elif _SOFF in tags:  # strip layout — how most GeoTIFFs in the
                # wild are organized: strips ≙ full-width tiles (the last
                # strip may be SHORT — decode reshapes by actual length)
                d["tw"] = tags[_W][2]
                d["th"] = tags[_RPS][2] if _RPS in tags else tags[_H][2]
                d["offsets"], d["counts"] = arr(_SOFF, "I", 4), arr(_SCNT, "I", 4)
            else:
                raise NotImplementedError("IFD has neither tile nor strip layout")
            d["comp"] = tags[_COMP][2] if _COMP in tags else 1
            bits = tags.get(_BITS, (0, 0, 0))[2]
            sfmt = tags.get(_SFMT, (0, 0, 1))[2]  # absent tag ≙ unsigned int
            spp = tags.get(_SPP, (0, 0, 1))[2]
            d["dtype"] = _dt.FROM_TIFF.get((bits, sfmt))
            if d["comp"] not in (1, 8) or d["dtype"] is None or spp != 1:
                raise NotImplementedError(
                    "only raw/DEFLATE single-sample-per-pixel rasters over "
                    f"the {sorted(_dt.TABLE)} dtype table (multiband ≙ one "
                    "IFD per band, not interleaved samples); got "
                    f"comp={d['comp']} bits={bits} sfmt={sfmt} spp={spp}"
                )
            if _GDAL_NODATA in tags:
                typ, cnt, val = tags[_GDAL_NODATA]
                fh.seek(val)
                s = fh.read(cnt).rstrip(b"\x00").decode()
                d["nodata"] = None if s == "nan" else float(s)
            else:
                d["nodata"] = None
            out.append(d)
        return out


def read_geotiff(
    spark: SparkSession, path: str, overview: int = 0
) -> tuple[DataFrame, Grid, int]:
    """Open a (this-module-shaped) tiled GeoTIFF → (cell table, Grid,
    n_bands). ``overview`` selects the pyramid level (0 = full res). The
    driver parses only the IFD chain; tiles decode distributed by byte
    range."""
    ifds = _read_ifds(path)
    full = [i for i, d in enumerate(ifds) if not d["overview"]]
    n_bands = len(full)
    n_levels = len(ifds) // n_bands
    if overview >= n_levels:
        raise ValueError(f"store has {n_levels} levels (asked for {overview})")
    picked = [ifds[b * n_levels + overview] for b in range(n_bands)]
    d0 = picked[0]
    if any(
        d["comp"] != d0["comp"] or d["dtype"] != d0["dtype"] for d in picked
    ):
        raise NotImplementedError("mixed per-band compression/dtype unsupported")
    gk = d0["geokeys"]
    epsg = 4326
    for i in range(4, len(gk) - 3, 4):  # entries follow the 4-SHORT header
        if gk[i] in (2048, 3072):
            epsg = gk[i + 3]
    grid = Grid(
        x0=d0["tie"][3], y0=d0["tie"][4], cell=d0["scale"][0],
        rows=d0["rows"], cols=d0["cols"], epsg=epsg, nodata=d0["nodata"],
    )
    rows_meta = []
    for b, d in enumerate(picked):
        ntx = (d["cols"] + d["tw"] - 1) // d["tw"]
        for t, (o, c) in enumerate(zip(d["offsets"], d["counts"])):
            rows_meta.append((b, t // ntx, t % ntx, o, c))
    meta_df = spark.createDataFrame(
        rows_meta, "band long, ti long, tj long, off long, cnt long"
    )
    th, tw, rows, cols = d0["th"], d0["tw"], d0["rows"], d0["cols"]
    fill = d0["nodata"]
    comp = d0["comp"]
    np_dt_str = str(_dt.np_dtype(d0["dtype"]).str)

    def decode(batches):
        with open(path, "rb") as fh:
            for pdf in batches:
                frames = []
                for b, ti, tj, o, c in zip(
                    pdf["band"], pdf["ti"], pdf["tj"], pdf["off"], pdf["cnt"]
                ):
                    fh.seek(o)
                    raw = fh.read(c)
                    if comp == 8:
                        import zlib

                        raw = zlib.decompress(raw)
                    # reshape by actual length: tiles are full (th, tw);
                    # a foreign file's LAST STRIP may be short. Decode in
                    # the STORED dtype, widen to the engine's float64
                    block = (
                        np.frombuffer(raw, dtype=np_dt_str)
                        .reshape(-1, tw)
                        .astype("<f8")
                    )
                    frames.append(
                        _blocks.sparse_cells(
                            block, int(b), int(ti) * th, int(tj) * tw, rows, cols, fill
                        )
                    )
                if frames:
                    yield pd.concat(frames, ignore_index=True)

    cells = meta_df.mapInPandas(decode, "band long, row long, col long, value double")
    return cells, grid, n_bands
