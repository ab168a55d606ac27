"""Classic NetCDF (CDF-1/CDF-2) container: byte-level golden checks, API
round trips (multi-variable, multi-dtype, record interleaving incl. the
padded-slab case), wild-file reads (lat/lon coords, ascending y,
_FillValue), and loud format guards. Reference surface:
``netcdf/netcdf.py:849-982`` read_file/to_file (GDAL netCDF driver)."""

import struct
from dataclasses import replace

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyramids_spark import netcdf as nc
from pyramids_spark.api import SparkNetCDF
from pyramids_spark.grid import COELLO, Grid, grid_df


def _long_cells(spark, g, variables, n_t):
    base = grid_df(spark, g)
    out = None
    for vi, v in enumerate(variables):
        for t in range(n_t):
            d = base.select(
                F.lit(v).alias("variable"),
                F.lit(t).cast("long").alias("t"),
                F.lit(0).cast("long").alias("band"),
                "row", "col",
                (F.col("value") + vi * 1000 + t * 10).alias("value"),
            )
            out = d if out is None else out.unionByName(d)
    return out


def test_netcdf_header_golden_bytes(spark, tmp_path):
    p = str(tmp_path / "a.nc")
    cells = _long_cells(spark, COELLO, ["precip"], 2)
    SparkNetCDF(cells).to_netcdf(COELLO, p, times=[5.0, 6.0])
    raw = open(p, "rb").read()
    assert raw[:4] == b"CDF\x01"
    (numrecs,) = struct.unpack_from(">I", raw, 4)
    assert numrecs == 2
    tag, ndims = struct.unpack_from(">II", raw, 8)
    assert tag == 10 and ndims == 3
    # first dim: "time", size 0 (the record dim)
    (nlen,) = struct.unpack_from(">I", raw, 16)
    assert raw[20:20 + nlen] == b"time"
    (sz,) = struct.unpack_from(">I", raw, 20 + (nlen + 3) // 4 * 4)
    assert sz == 0


def test_netcdf_roundtrip_multivar_record_interleave(spark, tmp_path):
    """Two record data vars + the time coord var interleave per record;
    read back equals the generator for every (variable, t) slab."""
    p = str(tmp_path / "b.nc")
    cells = _long_cells(spark, COELLO, ["precip", "temp"], 3)
    man = SparkNetCDF(cells).to_netcdf(COELLO, p, times=[10.0, 20.0, 30.0])
    assert man.n_cells.sum() == 2 * 3 * 182
    back, grid, h = SparkNetCDF.read_file(spark, p)
    assert grid == COELLO and h["numrecs"] == 3
    a = {(r.variable, r.t, r.row, r.col): r.value for r in back.df.collect()}
    b = {(r.variable, r.t, r.row, r.col): r.value for r in cells.collect()}
    assert a == b and len(a) == 2 * 3 * 182
    # the sel/variables machinery runs straight off the read table
    assert back.variable_names == ["precip", "temp"]
    assert back.sel(t=1).df.count() == 2 * 182


def test_netcdf_int8_padded_slabs(spark, tmp_path):
    """int8 storage with an odd slab size (5×5 = 25 bytes → vsize pads to
    28): record striding must use the PADDED size or every later record
    decodes shifted."""
    g = Grid(x0=0.0, y0=5.0, cell=1.0, rows=5, cols=5, epsg=4326, nodata=-1.0)
    base = grid_df(spark, g, "CAST((row * 5 + col) % 100 AS DOUBLE)")
    cells = None
    for v in ("a", "b"):
        for t in range(2):
            d = base.select(
                F.lit(v).alias("variable"), F.lit(t).cast("long").alias("t"),
                F.lit(0).cast("long").alias("band"), "row", "col",
                (F.col("value") + t).alias("value"),
            )
            cells = d if cells is None else cells.unionByName(d)
    p = str(tmp_path / "c.nc")
    SparkNetCDF(cells).to_netcdf(g, p, times=[0.0, 1.0], dtype="int8")
    back, grid, _ = SparkNetCDF.read_file(spark, p)
    assert grid == g
    a = {(r.variable, r.t, r.row, r.col): r.value for r in back.df.collect()}
    b = {(r.variable, r.t, r.row, r.col): r.value
         for r in cells.where(F.col("value") != -1.0).collect()}
    assert a == b


def test_netcdf_cdf2_and_int16(spark, tmp_path):
    p = str(tmp_path / "d.nc")
    cells = _long_cells(spark, COELLO, ["v"], 2)
    SparkNetCDF(cells).to_netcdf(COELLO, p, times=[1.0, 2.0], dtype="int16",
                                 version=2)
    raw = open(p, "rb").read()
    assert raw[:4] == b"CDF\x02"
    back, grid, h = SparkNetCDF.read_file(spark, p)
    assert grid == COELLO
    var = next(v for v in h["vars"] if v["name"] == "v")
    assert var["type"] == 3 and var["atts"]["_FillValue"] == -9999
    a = {(r.t, r.row, r.col): r.value for r in back.df.collect()}
    b = {(r.t, r.row, r.col): r.value for r in cells.collect()}
    assert a == b


def test_netcdf_reads_wild_cf_file(spark, tmp_path):
    """Hand-built foreign classic file: lat/lon coordinate variables
    (no x0/y0 attrs), ASCENDING latitude, float32 data with _FillValue,
    fixed (no record) dims — grid derives from the coords, rows flip so
    row 0 is the northernmost, fill cells drop."""
    rows, cols = 4, 3
    lat = np.array([10.5, 11.5, 12.5, 13.5])  # ascending (southmost first)
    lon = np.array([100.5, 101.5, 102.5])
    data = np.arange(rows * cols, dtype=">f4").reshape(rows, cols)
    data[0, 0] = -99.0  # fill → must drop

    def name_b(s):
        b = s.encode()
        return struct.pack(">I", len(b)) + b + b"\x00" * (-len(b) % 4)

    hdr = b"CDF\x01" + struct.pack(">I", 0)  # numrecs 0, no record dim
    hdr += struct.pack(">II", 10, 2)  # NC_DIMENSION, 2 dims
    hdr += name_b("lat") + struct.pack(">I", rows)
    hdr += name_b("lon") + struct.pack(">I", cols)
    hdr += b"\x00" * 8  # no global attrs

    # var list: lat(f8), lon(f8), tas(f4 with _FillValue)
    def var_b(nm, dimids, typ, atts, vsize, begin):
        out = name_b(nm) + struct.pack(">I", len(dimids))
        out += struct.pack(f">{len(dimids)}I", *dimids)
        out += atts
        out += struct.pack(">II", typ, vsize)
        out += struct.pack(">I", begin)
        return out

    fill_att = (
        struct.pack(">II", 12, 1) + name_b("_FillValue")
        + struct.pack(">II", 5, 1) + struct.pack(">f", -99.0)
    )
    # layout: header | lat | lon | tas
    body = [("lat", [0], 6, b"\x00" * 8, rows * 8),
            ("lon", [1], 6, b"\x00" * 8, cols * 8),
            ("tas", [0, 1], 5, fill_att, rows * cols * 4)]
    hdr_len = len(hdr) + struct.pack(">II", 11, 3).__len__()
    for nm, dimids, typ, atts, vsize in body:
        hdr_len += len(var_b(nm, dimids, typ, atts, vsize, 0))
    begins, cur = [], (hdr_len + 3) // 4 * 4
    for nm, dimids, typ, atts, vsize in body:
        begins.append(cur)
        cur += vsize
    buf = hdr + struct.pack(">II", 11, 3)
    for (nm, dimids, typ, atts, vsize), bg in zip(body, begins):
        buf += var_b(nm, dimids, typ, atts, vsize, bg)
    buf += b"\x00" * (begins[0] - len(buf))
    buf += lat.astype(">f8").tobytes() + lon.astype(">f8").tobytes()
    buf += data.tobytes()
    p = tmp_path / "wild.nc"
    p.write_bytes(buf)

    back, grid, h = SparkNetCDF.read_file(spark, str(p))
    assert grid.rows == rows and grid.cols == cols and grid.cell == 1.0
    assert grid.x0 == 100.0 and grid.y0 == 14.0  # top-left corner
    got = {(r.row, r.col): r.value for r in back.df.collect()}
    # ascending lat → file row i is grid row rows-1-i; fill cell dropped
    exp = {}
    for i in range(rows):
        for j in range(cols):
            if (i, j) != (0, 0):
                exp[(rows - 1 - i, j)] = float(data[i, j])
    assert got == exp


def test_netcdf_guards(spark, tmp_path):
    cells = _long_cells(spark, COELLO, ["v"], 1)
    with pytest.raises(NotImplementedError, match="no external type"):
        SparkNetCDF(cells).to_netcdf(
            COELLO, str(tmp_path / "x.nc"), times=[0.0], dtype="uint16"
        )
    big = Grid(x0=0.0, y0=0.0, cell=1.0, rows=20000, cols=20000, epsg=4326,
               nodata=-1.0)
    with pytest.raises(ValueError, match="CDF-1 caps"):
        nc.write_netcdf(
            cells.select("variable", "t", "row", "col", "value"),
            big, str(tmp_path / "y.nc"), times=[0.0], variables=["v"],
        )
    huge = Grid(x0=0.0, y0=0.0, cell=1.0, rows=40000, cols=40000, epsg=4326,
                nodata=-1.0)
    with pytest.raises(ValueError, match="vsize"):
        nc.write_netcdf(
            cells.select("variable", "t", "row", "col", "value"),
            huge, str(tmp_path / "y2.nc"), times=[0.0], variables=["v"],
            version=2,
        )
    # HDF5 magic now dispatches to the netCDF-4 reader (pyramids_spark
    # .hdf5); a file that is only magic + zeros is a truncated container
    hdf = tmp_path / "z.nc"
    hdf.write_bytes(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(Exception):
        SparkNetCDF.read_file(spark, str(hdf))


def test_netcdf_t_outside_times_rejects(spark, tmp_path):
    """A cell whose t index is outside range(len(times)) must fail loudly
    instead of silently vanishing from the file (code-review r5: the slab
    join was LEFT, so unmatched cells never reached a build group)."""
    cells = _long_cells(spark, COELLO, ["v"], 2)
    with pytest.raises(Exception, match="outside file dimensions"):
        nc.write_netcdf(
            cells.select("variable", "t", "row", "col", "value"),
            COELLO, str(tmp_path / "t.nc"), times=[0.0], variables=["v"],
        )


def test_netcdf_time_only_single_recvar(spark, tmp_path):
    """Zero data variables → `time` is the ONLY record variable, hitting
    the spec's single-record-var special case: its on-disk stride is the
    unpadded per-record size (8 bytes, one double), NOT the data slab.
    Regression: the writer used to stamp the slab size here, exploding the
    file to rows*cols*8 per record."""
    p = str(tmp_path / "tonly.nc")
    empty = spark.createDataFrame(
        [], "variable string, t long, row long, col long, value double"
    )
    nc.write_netcdf(empty, COELLO, p, times=[1.0, 2.5, 4.0], variables=[])
    h = nc._read_header(p)
    assert h["numrecs"] == 3 and h["recsize"] == 8
    tv = next(v for v in h["vars"] if v["name"] == "time")
    assert tv["vsize"] == 8
    raw = open(p, "rb").read()
    got = np.frombuffer(raw[tv["begin"]:tv["begin"] + 24], ">f8").tolist()
    assert got == [1.0, 2.5, 4.0]
    # the whole file is header + y + x + 3 records of one double
    assert len(raw) == tv["begin"] + 24


def test_netcdf_derive_grid_rejects_descending_x():
    """Descending x coordinates would silently mirror the raster (the
    reader has no column flip) — must reject loudly, not misregister."""
    yv = np.array([3.5, 2.5, 1.5])
    xv = np.array([5.0, 4.0, 3.0])
    with pytest.raises(NotImplementedError, match="descending x"):
        nc.derive_grid({}, yv, xv, 3, 3)


def test_netcdf_cdf5_roundtrip_uint16_and_streaming(spark, tmp_path):
    """CDF-5 (PnetCDF 64-bit data): 8-byte NON_NEG header fields, the
    unsigned external types CDF-1/2 lack, and the 64-bit STREAMING
    numrecs sentinel all round-trip."""
    import struct as _struct

    from dataclasses import replace

    g = replace(COELLO, nodata=60000.0)
    p = str(tmp_path / "c5.nc")
    cells = _long_cells(spark, g, ["u"], 2)
    SparkNetCDF(cells).to_netcdf(g, p, times=[1.0, 2.0], dtype="uint16",
                                 version=5)
    raw = open(p, "rb").read()
    assert raw[:4] == b"CDF\x05"
    (numrecs,) = _struct.unpack_from(">Q", raw, 4)  # 8-byte numrecs
    assert numrecs == 2
    back, grid, h = SparkNetCDF.read_file(spark, p)
    assert grid == g and h["version"] == 5
    var = next(v for v in h["vars"] if v["name"] == "u")
    assert var["type"] == 8  # NC_USHORT
    assert var["atts"]["_FillValue"] == 60000
    a = {(r.t, r.row, r.col): r.value for r in back.df.collect()}
    b = {(r.t, r.row, r.col): r.value for r in cells.collect()}
    assert a == b
    # 64-bit STREAMING sentinel: numrecs recovers from the file size
    patched = bytearray(raw)
    patched[4:12] = b"\xff" * 8
    p2 = str(tmp_path / "c5s.nc")
    open(p2, "wb").write(bytes(patched))
    back2, _, h2 = SparkNetCDF.read_file(spark, p2)
    assert h2["numrecs"] == 2
    assert {(r.t, r.row, r.col): r.value for r in back2.df.collect()} == b
    # unsigned dtypes still reject on CDF-1/2 with a pointer to v5
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="version=5"):
        SparkNetCDF(cells).to_netcdf(g, str(tmp_path / "bad.nc"),
                                     times=[1.0, 2.0], dtype="uint16",
                                     version=2)


def test_bounded_concat_unit():
    """Direct boundary tests of the shared reader batch bound: flush at
    the threshold, remainder flush, whale-frame slicing, empty frames
    skipped, order preserved, single-frame passthrough."""
    import pandas as pd

    from pyramids_spark import _blocks

    def f(a, b):
        return pd.DataFrame({"v": range(a, b)})

    # order + flush-at-threshold + remainder
    out = list(_blocks.bounded_concat([f(0, 3), f(3, 5), f(5, 6)],
                                      max_cells=4))
    assert [len(o) for o in out] == [5, 1]
    assert pd.concat(out)["v"].tolist() == list(range(6))
    # whale frame slices to <= max_cells pieces, nothing lost
    out = list(_blocks.bounded_concat([f(0, 10)], max_cells=3))
    assert all(len(o) <= 3 for o in out)
    assert pd.concat(out)["v"].tolist() == list(range(10))
    # empties skipped entirely
    assert list(_blocks.bounded_concat([f(0, 0), f(0, 0)])) == []
    # single small frame passes through without a copy
    one = f(0, 2)
    out = list(_blocks.bounded_concat([one], max_cells=10))
    assert len(out) == 1 and out[0] is one


def test_netcdf_missing_fillvalue_falls_back_to_grid_nodata(spark, tmp_path):
    """A classic-NetCDF variable WITHOUT _FillValue read into a grid
    whose nodata is set must still drop nodata-valued cells (the
    absent-row contract). Regression: the Arrow 'fill double' column
    turns a driver-side None into NaN, so an `is not None` test kept
    sentinel cells as real data."""
    from pyramids_spark import netcdf as nc
    from pyramids_spark.grid import Grid

    g = Grid(x0=0.0, y0=4.0, cell=1.0, rows=4, cols=4, epsg=4326,
             nodata=-9.0)
    rows = [("z", 0, r, c, -9.0 if (r, c) == (1, 1) else float(r * 4 + c))
            for r in range(4) for c in range(4)]
    df = spark.createDataFrame(
        rows, "variable string, t long, row long, col long, value double")
    p = str(tmp_path / "nofill.nc")
    nc.write_netcdf(df, g, p, times=[0.0])
    raw = (tmp_path / "nofill.nc").read_bytes()
    assert raw.count(b"_FillValue") >= 1
    # same-length rename makes the variable carry NO _FillValue attr
    (tmp_path / "nofill.nc").write_bytes(
        raw.replace(b"_FillValue", b"_NotAFillV"))
    cells, g2, _ = nc.read_netcdf(spark, p)
    got = {(r.row, r.col): r.value for r in cells.collect()}
    assert (1, 1) not in got  # sentinel dropped via grid nodata
    assert got[(0, 1)] == 1.0 and len(got) == 15
