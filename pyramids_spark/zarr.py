"""Real Zarr v2 container I/O in pure numpy + json — no zarr library.

Reference surface: ``Dataset.to_zarr`` / zarr ingest (the reference wraps
GDAL's Zarr driver). The v2 on-disk format is a PUBLIC spec simple enough
to implement directly for the raw/zlib case: a store directory holding

- ``.zarray``  — JSON array metadata (shape, chunks, dtype, fill_value,
  ``compressor: null`` = raw chunks, ``order: "C"``),
- ``.zattrs``  — JSON user attributes (the Grid georeferencing rides here:
  x0/y0/cell/epsg/nodata — the same role as GDAL's _CRS attribute),
- one file per chunk named ``b.i.j`` (3-D band/row/col chunk grid), raw
  little-endian C-order bytes in any dtype from the shared storage table
  (``pyramids_spark.dtypes`` — uint8…float64, the reference's GDAL dtype
  table), edge chunks padded to FULL chunk shape with ``fill_value``
  (per spec).

Distributed shape: the WRITE groups cells by chunk id and each task
serializes + writes its own chunk files (one shuffle on the chunk key —
the parquet-writer pattern; on a cluster the store dir is a shared
filesystem). It returns a per-chunk MANIFEST (chunk id, cells, bytes) —
the lineage/metrics table of the checkpoint contract. The READ lists the
store with Spark's ``binaryFile`` source (distributed scan, no driver
loop) and decodes chunks in ``mapInPandas``; cells equal to fill drop,
restoring the engine's absent-row nodata contract.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import _blocks, dtypes as _dt
from .grid import Grid


def write_zarr(
    cells_df: DataFrame, grid: Grid, path: str, chunks: tuple[int, int] = (256, 256),
    compress: "int | None" = None, dtype: str = "float64",
) -> pd.DataFrame:
    """Write the cell table as a zarr v2 array ``[bands, rows, cols]``
    (band chunk size 1). ``compress`` = zlib level 1-9 (numcodecs ``zlib``
    compressor id — stdlib, no dependency) or None for raw chunks.
    ``dtype`` is the STORAGE dtype (``pyramids_spark.dtypes``; reference
    GDAL table ``base/_utils.py:16-56``) — integer stores need a
    representable nodata and integral in-range values. Returns the chunk
    manifest as pandas ``(band, ci, cj, n_cells, n_bytes, file)``."""
    ch, cw = int(chunks[0]), int(chunks[1])
    rows, cols = grid.rows, grid.cols
    dt_name = _dt.resolve(dtype)
    fill = _dt.check_fill(dt_name, grid.nodata)
    os.makedirs(path, exist_ok=True)
    n_bands_row = cells_df.select(F.max("band").alias("m")).collect()[0]
    n_bands = int(n_bands_row["m"]) + 1 if n_bands_row["m"] is not None else 1
    meta = {
        "zarr_format": 2,
        "shape": [n_bands, rows, cols],
        "chunks": [1, ch, cw],
        "dtype": _dt.TO_ZARR[dt_name],
        "compressor": None if compress is None else {"id": "zlib", "level": int(compress)},
        "fill_value": (
            "NaN" if math.isnan(fill)
            else (fill if _dt.is_float(dt_name) else int(fill))
        ),
        "order": "C",
        "filters": None,
    }
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(path, ".zattrs"), "w") as f:
        json.dump(
            {"x0": grid.x0, "y0": grid.y0, "cell": grid.cell,
             "epsg": grid.epsg, "nodata": grid.nodata},
            f,
        )

    def write_chunks(key, pdf: pd.DataFrame) -> pd.DataFrame:
        b, ci, cj = int(key[0]), int(key[1]), int(key[2])
        block = _blocks.dense_block(pdf, ch, cw, ci * ch, cj * cw, fill)
        name = f"{b}.{ci}.{cj}"
        data = _dt.cast_block(block, dt_name).tobytes(order="C")
        if compress is not None:
            import zlib

            data = zlib.compress(data, int(compress))
        with open(os.path.join(path, name), "wb") as f:
            f.write(data)
        return pd.DataFrame(
            {"band": [b], "ci": [ci], "cj": [cj], "n_cells": [len(pdf)],
             "n_bytes": [len(data)], "file": [name]}
        )

    keyed = cells_df.where(F.col("value").isNotNull()).select(
        "band", "row", "col", "value",
        (F.col("row") / ch).cast("long").alias("_ci"),
        (F.col("col") / cw).cast("long").alias("_cj"),
    )
    manifest = (
        keyed.groupBy("band", "_ci", "_cj")
        .applyInPandas(
            write_chunks,
            schema="band long, ci long, cj long, n_cells long, n_bytes long, file string",
        )
        .toPandas()
        .sort_values(["band", "ci", "cj"])
        .reset_index(drop=True)
    )
    return manifest


def read_zarr(spark: SparkSession, path: str) -> tuple[DataFrame, Grid]:
    """Open a (this-module-shaped: raw or zlib chunks, band-chunk 1)
    zarr v2 store → (cell table, Grid). Chunks are scanned with the
    ``binaryFile`` source — a distributed read, no driver loop; fill cells
    drop (absent-row nodata contract)."""
    with open(os.path.join(path, ".zarray")) as f:
        meta = json.load(f)
    comp = meta.get("compressor")
    dt_name = _dt.FROM_ZARR.get(str(meta.get("dtype")))
    if (
        meta.get("zarr_format") != 2
        or (comp is not None and comp.get("id") != "zlib")
        or dt_name is None
        or meta.get("order") != "C"
        or meta.get("chunks", [0])[0] != 1
    ):
        raise NotImplementedError(
            "supported zarr stores: v2, raw or zlib chunks, little-endian "
            f"{sorted(_dt.TABLE)} dtypes, C-order, band-chunk 1 (got {meta})"
        )
    np_dt_str = str(_dt.np_dtype(dt_name).str)
    zlib_chunks = comp is not None
    _, rows, cols = meta["shape"]
    _, ch, cw = meta["chunks"]
    fv = meta.get("fill_value")
    fill = float("nan") if fv in (None, "NaN") else float(fv)
    try:
        with open(os.path.join(path, ".zattrs")) as f:
            attrs = json.load(f)
    except FileNotFoundError:
        attrs = {}
    grid = Grid(
        x0=float(attrs.get("x0", 0.0)), y0=float(attrs.get("y0", 0.0)),
        cell=float(attrs.get("cell", 1.0)), rows=rows, cols=cols,
        epsg=int(attrs.get("epsg", 4326)), nodata=attrs.get("nodata"),
    )

    def decode(batches):
        for pdf in batches:
            frames = []
            for p, content in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(p)
                b, ci, cj = (int(t) for t in name.split("."))
                if zlib_chunks:
                    import zlib

                    content = zlib.decompress(content)
                block = (
                    np.frombuffer(content, dtype=np_dt_str)
                    .reshape(ch, cw)
                    .astype("<f8")  # widen stored dtype → engine float64
                )
                frames.append(
                    _blocks.sparse_cells(block, b, ci * ch, cj * cw, rows, cols, fill)
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "[0-9]*.*.*")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(decode, "band long, row long, col long, value double"), grid
