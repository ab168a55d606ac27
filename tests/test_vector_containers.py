"""WKB codec + GeoPackage + Shapefile containers.

Reference parity: ``feature/collection.py:1657-1811`` to_file with the
GPKG / "ESRI Shapefile" drivers (layer=, multi-layer GPKG), ``:789-948``
read_file pushdown, ``:1240`` list_layers; WKB per
``dataset/ops/_zonal.py:88`` (OGR WKB round trips).
"""

import sqlite3
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyramids_spark import gpkg, shp
from pyramids_spark.functions import wkb as B


def _pts(spark, n=50):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") * 1.5 - 2.0).alias("x"),
        (F.col("id") * -0.25 + 1.0).alias("y"),
    )


# --------------------------------------------------------------------- WKB

def test_wkb_point_roundtrip_exact(spark):
    out = (
        _pts(spark)
        .select("x", "y", B.point_wkb("x", "y").alias("g"))
        .select(
            "x", "y",
            B.wkb_geometry_type("g").alias("t"),
            B.wkb_point_x("g").alias("bx"),
            B.wkb_point_y("g").alias("by"),
            F.length("g").alias("len"),
        )
        .collect()
    )
    assert len(out) == 50
    for r in out:
        assert r["t"] == "Point" and r["len"] == 21
        assert r["bx"] == r["x"] and r["by"] == r["y"]  # bit-exact IEEE


def _rings(spark, n=7):
    return spark.range(n).select(
        F.col("id"),
        F.array(
            F.col("id") * 1.0, F.col("id") + 2.0, F.col("id") + 2.0,
            F.col("id") * 1.0,
        ).alias("xs"),
        F.array(F.lit(0.0), F.lit(0.0), F.lit(3.0), F.lit(3.0)).alias("ys"),
    )


def test_wkb_polygon_closes_linestring_does_not(spark):
    rows = (
        _rings(spark)
        .select(
            "xs", "ys",
            B.polygon_wkb("xs", "ys").alias("pg"),
            B.linestring_wkb("xs", "ys").alias("ls"),
        )
        .select(
            "xs", "ys",
            B.wkb_geometry_type("pg").alias("pt"),
            B.wkb_geometry_type("ls").alias("lt"),
            B.wkb_ring_xs("pg").alias("pxs"),
            B.wkb_ring_ys("pg").alias("pys"),
            B.wkb_ring_xs("ls").alias("lxs"),
        )
        .collect()
    )
    for r in rows:
        assert r["pt"] == "Polygon" and r["lt"] == "LineString"
        assert r["pxs"] == r["xs"] + [r["xs"][0]]  # closed on write
        assert r["pys"] == r["ys"] + [r["ys"][0]]
        assert r["lxs"] == r["xs"]  # linestring untouched


def test_wkb_decoder_guards(spark):
    pg = _rings(spark, 3).select(B.polygon_wkb("xs", "ys").alias("g"))
    with pytest.raises(Exception, match="21 bytes|Point"):
        pg.select(B.wkb_point_x("g")).collect()
    bad = spark.createDataFrame(
        [(bytes([0, 0, 0, 0, 1]),)], "g binary"
    )  # big-endian byte order marker
    with pytest.raises(Exception, match="big-endian"):
        bad.select(B.wkb_ring_xs("g")).collect()


# --------------------------------------------------------------- GeoPackage

def test_gpkg_two_layers_roundtrip(spark, tmp_path):
    p = str(tmp_path / "two.gpkg")
    pts = _pts(spark).select(
        B.point_wkb("x", "y").alias("geometry"),
        "id",
        F.concat(F.lit("n-"), F.col("id")).alias("name"),
        (F.col("id") * 0.5).alias("score"),
    )
    assert gpkg.write_gpkg(pts, p, "pts", geometry_type="POINT") == 50
    polys = _rings(spark).select(
        B.polygon_wkb("xs", "ys").alias("geometry"),
        F.col("id").alias("pid"),
    )
    assert gpkg.write_gpkg(polys, p, "polys", geometry_type="POLYGON") == 7

    assert gpkg.list_gpkg_layers(p) == [
        ("polys", "POLYGON", 4326), ("pts", "POINT", 4326),
    ]
    back, gt, srs = gpkg.read_gpkg(spark, p, "pts")
    assert (gt, srs) == ("POINT", 4326)
    rows = (
        back.select(
            "id", "name", "score",
            B.wkb_point_x("geometry").alias("bx"),
        )
        .orderBy("id")
        .collect()
    )
    assert len(rows) == 50
    for r in rows:
        assert r["bx"] == r["id"] * 1.5 - 2.0
        assert r["name"] == f"n-{r['id']}" and r["score"] == r["id"] * 0.5

    backp, gt2, _ = gpkg.read_gpkg(spark, p, "polys")
    assert gt2 == "POLYGON"
    pr = (
        backp.select("pid", B.wkb_ring_xs("geometry").alias("xs"))
        .orderBy("pid")
        .collect()
    )
    assert pr[2]["xs"] == [2.0, 4.0, 4.0, 2.0, 2.0]


def test_gpkg_container_is_valid_sqlite(spark, tmp_path):
    """The file must be readable by ANY GeoPackage client: application_id,
    required catalog tables, GP blob magic, envelope in gpkg_contents."""
    p = str(tmp_path / "valid.gpkg")
    pts = _pts(spark, 10).select(
        B.point_wkb("x", "y").alias("geometry"), "id"
    )
    gpkg.write_gpkg(pts, p, "layer1")
    con = sqlite3.connect(p)
    try:
        app_id = con.execute("PRAGMA application_id").fetchone()[0]
        assert app_id == 0x47504B47  # 'GPKG'
        srs = dict(
            (r[0], r[1])
            for r in con.execute(
                "SELECT srs_id, organization FROM gpkg_spatial_ref_sys"
            )
        )
        assert {-1: "NONE", 0: "NONE", 4326: "EPSG"}.items() <= srs.items()
        row = con.execute(
            "SELECT data_type, min_x, min_y, max_x, max_y FROM "
            "gpkg_contents WHERE table_name='layer1'"
        ).fetchone()
        assert row[0] == "features"
        assert (row[1], row[2]) == (-2.0, -1.25)  # min x/y of the 10 points
        assert (row[3], row[4]) == (11.5, 1.0)
        blob = con.execute("SELECT geom FROM layer1 LIMIT 1").fetchone()[0]
        assert blob[:2] == b"GP" and blob[2] == 0
        assert struct.unpack_from("<i", blob, 4)[0] == 4326
    finally:
        con.close()


def test_gpkg_polygon_blob_carries_envelope(spark, tmp_path):
    p = str(tmp_path / "env.gpkg")
    polys = _rings(spark, 1).select(
        B.polygon_wkb("xs", "ys").alias("geometry")
    )
    gpkg.write_gpkg(polys, p, "pg", geometry_type="POLYGON")
    con = sqlite3.connect(p)
    blob = con.execute("SELECT geom FROM pg").fetchone()[0]
    con.close()
    assert (blob[3] >> 1) & 0b111 == 1  # envelope indicator: xy
    env = np.frombuffer(blob[8:40], "<f8")
    assert list(env) == [0.0, 2.0, 0.0, 3.0]  # minx, maxx, miny, maxy


def test_gpkg_pushdown_and_guards(spark, tmp_path):
    p = str(tmp_path / "push.gpkg")
    pts = _pts(spark).select(
        B.point_wkb("x", "y").alias("geometry"), "id",
        (F.col("id") % 5).alias("grp"),
    )
    gpkg.write_gpkg(pts, p, "pts")
    sub, _, _ = gpkg.read_gpkg(
        spark, p, "pts", columns=["id"], where="grp = 2"
    )
    assert sub.columns == ["fid", "geometry", "id"]
    assert sub.count() == 10
    with pytest.raises(ValueError, match="no layer"):
        gpkg.read_gpkg(spark, p, "nope")
    with pytest.raises(ValueError, match="unknown columns"):
        gpkg.read_gpkg(spark, p, "pts", columns=["zzz"])
    arr = _rings(spark, 2).select(
        B.polygon_wkb("xs", "ys").alias("geometry"), "xs"
    )
    with pytest.raises(ValueError, match="no GPKG mapping"):
        gpkg.write_gpkg(arr, p, "bad")


# ---------------------------------------------------------------- Shapefile

def test_shp_points_attrs_nulls(spark, tmp_path):
    base = str(tmp_path / "pts.shp")
    df = _pts(spark, 40).select(
        shp.point_record("x", "y").alias("geometry"),
        "id",
        F.when(F.col("id") % 7 == 0, F.lit(None))
        .otherwise(F.concat(F.lit("nm-"), F.col("id")))
        .alias("name"),
        (F.col("id") * 0.015625).alias("score"),
    )
    assert shp.write_shapefile(df, base, shape_type=shp.SHP_POINT) == 40
    back, st = shp.read_shapefile(spark, base)
    assert st == shp.SHP_POINT
    rows = (
        back.select(
            "fid", "id", "name", "score",
            B.wkb_point_x("geometry").alias("bx"),
        )
        .orderBy("id")
        .collect()
    )
    assert len(rows) == 40 and rows[0]["fid"] == 1
    for r in rows:
        assert r["bx"] == r["id"] * 1.5 - 2.0  # geometry is binary-exact
        want = None if r["id"] % 7 == 0 else f"nm-{r['id']}"
        assert (r["name"] or None) == want
        assert r["score"] == r["id"] * 0.015625


def test_shp_polygon_cw_enforced(spark, tmp_path):
    """A counter-clockwise input ring must come back clockwise (the spec's
    outer-ring winding) — same vertex set, reversed walk."""
    base = str(tmp_path / "pg.shp")
    ccw = spark.createDataFrame(
        [(0, [0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 3.0, 3.0])],
        "pid long, xs array<double>, ys array<double>",
    )
    df = ccw.select(shp.polygon_record("xs", "ys").alias("geometry"), "pid")
    shp.write_shapefile(df, base, shape_type=shp.SHP_POLYGON)
    back, _ = shp.read_shapefile(spark, base)
    r = back.select(
        B.wkb_ring_xs("geometry").alias("xs"),
        B.wkb_ring_ys("geometry").alias("ys"),
    ).collect()[0]
    assert r["xs"] == [0.0, 0.0, 4.0, 4.0, 0.0]  # reversed (CW)
    assert r["ys"] == [0.0, 3.0, 3.0, 0.0, 0.0]


def test_shp_multipart_explodes_per_part(spark, tmp_path):
    """Hand-craft a 2-part polygon record (outer + island) — the reader
    must emit one row per part, both carrying the record's attributes."""
    base = str(tmp_path / "mp")
    ring1 = [(0.0, 0.0), (0.0, 8.0), (8.0, 8.0), (8.0, 0.0), (0.0, 0.0)]
    ring2 = [(20.0, 0.0), (20.0, 2.0), (22.0, 2.0), (20.0, 0.0)]
    pts = ring1 + ring2
    content = struct.pack("<i", shp.SHP_POLYGON)
    content += struct.pack("<4d", 0.0, 0.0, 22.0, 8.0)
    content += struct.pack("<ii", 2, len(pts))
    content += struct.pack("<2i", 0, len(ring1))
    for x, y in pts:
        content += struct.pack("<2d", x, y)
    hdr = struct.pack(">i5i", 9994, 0, 0, 0, 0, 0)
    hdr += struct.pack(">i", (100 + 8 + len(content)) // 2)
    hdr += struct.pack("<ii4d4d", 1000, shp.SHP_POLYGON,
                       0.0, 0.0, 22.0, 8.0, 0.0, 0.0, 0.0, 0.0)
    with open(base + ".shp", "wb") as fh:
        fh.write(hdr)
        fh.write(struct.pack(">ii", 1, len(content) // 2))
        fh.write(content)
    shx_hdr = hdr[:24] + struct.pack(">i", (100 + 8) // 2) + hdr[28:]
    with open(base + ".shx", "wb") as fh:
        fh.write(shx_hdr)
        fh.write(struct.pack(">ii", 50, len(content) // 2))
    with open(base + ".dbf", "wb") as fh:
        fh.write(shp._dbf_header([("tag", "C", 4, 0)], 1))
        fh.write(b" abcd\x1a")
    back, _ = shp.read_shapefile(spark, base + ".shp")
    rows = back.select(
        "fid", "part", "tag", B.wkb_ring_xs("geometry").alias("xs")
    ).orderBy("part").collect()
    assert [(r["fid"], r["part"], r["tag"]) for r in rows] == [
        (1, 0, "abcd"), (1, 1, "abcd"),
    ]
    assert rows[0]["xs"] == [p[0] for p in ring1]
    assert rows[1]["xs"] == [p[0] for p in ring2]


def test_shp_guards(spark, tmp_path):
    base = str(tmp_path / "g.shp")
    pts = _pts(spark, 3).select(
        shp.point_record("x", "y").alias("geometry"),
        F.array(F.lit(1.0)).alias("arr"),
    )
    with pytest.raises(ValueError, match="no DBF mapping"):
        shp.write_shapefile(pts, base)
    mixed = _rings(spark, 2).select(
        shp.polygon_record("xs", "ys").alias("geometry")
    )
    with pytest.raises(Exception, match="one shape type"):
        shp.write_shapefile(mixed, base, shape_type=shp.SHP_POINT)


def test_fc_api_wiring(spark, tmp_path):
    from pyramids_spark.api import SparkFeatureCollection

    fc = SparkFeatureCollection(
        _pts(spark, 12).select(
            B.point_wkb("x", "y").alias("geometry"), "id"
        ),
        4326,
    )
    p = str(tmp_path / "api.gpkg")
    assert fc.to_gpkg(p, "lyr") == 12
    assert SparkFeatureCollection.read_gpkg(spark, p, "lyr").df.count() == 12
    s = str(tmp_path / "api.shp")
    assert fc.to_shapefile(s, shape_type=shp.SHP_POINT) == 12
    assert SparkFeatureCollection.read_shapefile(spark, s).df.count() == 12


def test_wkb_empty_polygon_and_truncation_guard(spark):
    """POLYGON EMPTY (numRings=0, 9 bytes) decodes to empty rings instead
    of reading the next blob's bytes; a vertex count pointing past the
    blob rejects loudly (code-review r5 findings)."""
    empty = struct.pack("<BII", 1, 3, 0)
    pts = [(0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (0.0, 0.0)]
    valid = (struct.pack("<BII", 1, 3, 1) + struct.pack("<I", len(pts))
             + b"".join(struct.pack("<dd", x, y) for x, y in pts))
    df = spark.createDataFrame(
        [(0, empty), (1, valid)], "i long, g binary"
    )
    rows = (
        df.select("i", B.wkb_ring_xs("g").alias("xs"),
                  B.wkb_ring_ys("g").alias("ys"))
        .orderBy("i").collect()
    )
    assert list(rows[0].xs) == [] and list(rows[0].ys) == []
    assert list(rows[1].xs) == [0.0, 4.0, 4.0, 0.0]
    assert list(rows[1].ys) == [0.0, 0.0, 2.0, 0.0]
    # declared 10 vertices, payload holds 4 → loud reject
    trunc = (struct.pack("<BII", 1, 3, 1) + struct.pack("<I", 10)
             + b"".join(struct.pack("<dd", x, y) for x, y in pts))
    bad = spark.createDataFrame([(trunc,)], "g binary")
    with pytest.raises(Exception, match="exceeds blob length"):
        bad.select(B.wkb_ring_xs("g")).collect()


def test_gpkg_foreign_column_names(spark, tmp_path):
    """The spec allows any pk / geometry column name; the reader must take
    them from gpkg_geometry_columns.column_name and the table's declared
    INTEGER PRIMARY KEY, not hardcode fid/geom (code-review r5 finding)."""
    p = str(tmp_path / "foreign.gpkg")
    con = sqlite3.connect(p)
    con.execute(
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT, "
        "column_name TEXT, geometry_type_name TEXT, srs_id INTEGER, "
        "z TINYINT, m TINYINT)"
    )
    con.execute(
        "INSERT INTO gpkg_geometry_columns VALUES "
        "('pts', 'shape', 'POINT', 4326, 0, 0)"
    )
    con.execute(
        "CREATE TABLE pts (objectid INTEGER PRIMARY KEY, shape BLOB, "
        "name TEXT)"
    )
    for i in range(5):
        wkb = struct.pack("<BIdd", 1, 1, float(i), float(-i))
        blob = (b"GP" + bytes([0, 0b0000_0001])
                + struct.pack("<i", 4326) + wkb)
        con.execute("INSERT INTO pts VALUES (?, ?, ?)",
                    (i + 1, blob, f"n{i}"))
    con.commit()
    con.close()
    df, gtype, srs = gpkg.read_gpkg(spark, p, "pts")
    assert gtype == "POINT" and srs == 4326
    rows = df.select(
        "fid", B.wkb_point_x("geometry").alias("x"),
        B.wkb_point_y("geometry").alias("y"), "name",
    ).orderBy("fid").collect()
    assert [r.fid for r in rows] == [1, 2, 3, 4, 5]
    assert [r.x for r in rows] == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert [r.y for r in rows] == [0.0, -1.0, -2.0, -3.0, -4.0]
    assert [r.name for r in rows] == [f"n{i}" for i in range(5)]


def test_gpkg_write_quotes_attribute_names(spark, tmp_path):
    """code-review r5 pass 2: the write path must accept the same
    arbitrary attribute names the quoted read path already does —
    SQL keywords and names with spaces."""
    p = str(tmp_path / "kw.gpkg")
    df = _pts(spark, 4).select(
        B.point_wkb("x", "y").alias("geometry"),
        F.col("id").alias("order"),
        (F.col("id") * 2).alias("group by"),
    )
    n = gpkg.write_gpkg(df, p, "kw")
    assert n == 4
    back, gtype, srs = gpkg.read_gpkg(spark, p, "kw")
    rows = back.select("order", "`group by`").orderBy("order").collect()
    assert [r["order"] for r in rows] == [0, 1, 2, 3]
    assert [r["group by"] for r in rows] == [0, 2, 4, 6]


def _craft_shp(tmp_path, shape_type, contents, ids):
    """Hand-assemble a minimal .shp/.shx/.dbf triple from raw record
    contents (the writer never emits null shapes, so the wild-file read
    path needs crafted bytes)."""
    base = str(tmp_path / "crafted.shp")[:-4]
    fields = [("id", "N", 20, 0)]
    shp_body, shx_body = b"", b""
    off = 100
    for i, c in enumerate(contents):
        shp_body += struct.pack(">ii", i + 1, len(c) // 2) + c
        shx_body += struct.pack(">ii", off // 2, len(c) // 2)
        off += 8 + len(c)
    bbox = [0.0, 0.0, 9.0, 9.0]
    with open(base + ".shp", "wb") as fh:
        fh.write(shp._main_header(shape_type, off, bbox) + shp_body)
    with open(base + ".shx", "wb") as fh:
        fh.write(
            shp._main_header(shape_type, 100 + 8 * len(contents), bbox)
            + shx_body
        )
    with open(base + ".dbf", "wb") as fh:
        fh.write(shp._dbf_header(fields, len(contents)))
        for v in ids:
            fh.write(b" " + shp._dbf_value(v, "N", 20, 0))
        fh.write(b"\x1a")
    return base + ".shp"


def test_shp_null_shape_point_records(spark, tmp_path):
    """The spec allows null-shape (type 0) records interleaved in any
    file; they must decode as NULL-geometry features that keep the
    positional DBF join aligned — not crash or shift attributes."""
    recs = [
        struct.pack("<i2d", shp.SHP_POINT, 1.0, 2.0),
        struct.pack("<i", 0),  # null shape
        struct.pack("<i2d", shp.SHP_POINT, 3.0, 4.0),
    ]
    p = _craft_shp(tmp_path, shp.SHP_POINT, recs, [10, 20, 30])
    back, st = shp.read_shapefile(spark, p)
    assert st == shp.SHP_POINT
    rows = back.orderBy("fid").collect()
    assert [r["fid"] for r in rows] == [1, 2, 3]
    assert [r["id"] for r in rows] == [10, 20, 30]
    assert rows[1]["geometry"] is None
    live = back.filter(F.col("geometry").isNotNull()).select(
        "fid", B.wkb_point_x("geometry").alias("bx"),
        B.wkb_point_y("geometry").alias("by"),
    ).orderBy("fid").collect()
    assert [(r["bx"], r["by"]) for r in live] == [(1.0, 2.0), (3.0, 4.0)]


def test_shp_null_shape_polyline_record(spark, tmp_path):
    """Null shapes in a PolyLine file take the variable-length decode
    branch: one NULL-geometry row (part 0), attributes still aligned."""
    def line(x0, y0, x1, y1):
        return (
            struct.pack("<i4d", shp.SHP_POLYLINE, min(x0, x1), min(y0, y1),
                        max(x0, x1), max(y0, y1))
            + struct.pack("<2i", 1, 2)
            + struct.pack("<i", 0)
            + struct.pack("<4d", x0, y0, x1, y1)
        )
    recs = [line(0.0, 0.0, 1.0, 1.0), struct.pack("<i", 0),
            line(2.0, 2.0, 3.0, 3.0)]
    p = _craft_shp(tmp_path, shp.SHP_POLYLINE, recs, [7, 8, 9])
    back, st = shp.read_shapefile(spark, p)
    assert st == shp.SHP_POLYLINE
    rows = back.orderBy("fid").collect()
    assert [(r["fid"], r["part"], r["id"]) for r in rows] == [
        (1, 0, 7), (2, 0, 8), (3, 0, 9)
    ]
    assert rows[1]["geometry"] is None
    assert rows[0]["geometry"] is not None and rows[2]["geometry"] is not None


def test_shp_dbf_leading_spaces_preserved(spark, tmp_path):
    """C fields are left-justified with right padding ONLY — leading
    spaces are data. Regression: the reader used to strip() both sides."""
    base = str(tmp_path / "lead.shp")
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, "  two-lead"), (2, 1.0, 1.0, "plain")],
        "id long, x double, y double, name string",
    ).select(shp.point_record("x", "y").alias("geometry"), "id", "name")
    shp.write_shapefile(df, base, shape_type=shp.SHP_POINT)
    back, _ = shp.read_shapefile(spark, base)
    got = {r["id"]: r["name"] for r in back.collect()}
    assert got == {1: "  two-lead", 2: "plain"}


def test_gpkg_spatial_index_and_bbox_pushdown(spark, tmp_path):
    """spatial_index=True builds the spec's gpkg_rtree_index (R*-tree +
    gpkg_extensions row); read_gpkg(bbox=...) probes it inside SQLite —
    result equals the brute-force envelope filter; bbox without an index
    rejects loudly."""
    import sqlite3 as _sql

    p = str(tmp_path / "si.gpkg")
    df = _pts(spark, 60).select(
        B.point_wkb("x", "y").alias("geometry"), "id"
    )
    n = gpkg.write_gpkg(df, p, "pts", spatial_index=True)
    assert n == 60
    con = _sql.connect(p)
    assert con.execute("SELECT count(*) FROM rtree_pts_geom").fetchone()[0] == 60
    ext = con.execute(
        "SELECT extension_name FROM gpkg_extensions WHERE table_name='pts'"
    ).fetchone()
    con.close()
    assert ext == ("gpkg_rtree_index",)
    # x = id*1.5-2, y = id*-0.25+1 → pick a window and compare to brute force
    bb = (10.0, -10.0, 40.0, 0.0)
    got, _, _ = gpkg.read_gpkg(spark, p, "pts", bbox=bb)
    ids = sorted(r["id"] for r in got.collect())
    exp = sorted(
        i for i in range(60)
        if bb[0] <= i * 1.5 - 2.0 <= bb[2] and bb[1] <= i * -0.25 + 1.0 <= bb[3]
    )
    assert ids == exp and len(ids) > 0
    # bbox composes with where= pushdown
    got, _, _ = gpkg.read_gpkg(spark, p, "pts", where="id % 2 = 0", bbox=bb)
    assert sorted(r["id"] for r in got.collect()) == [i for i in exp if i % 2 == 0]
    # no index → loud
    p2 = str(tmp_path / "noidx.gpkg")
    gpkg.write_gpkg(df, p2, "pts")
    with pytest.raises(ValueError, match="no 'rtree_pts_geom' spatial index"):
        gpkg.read_gpkg(spark, p2, "pts", bbox=bb)


def test_gpkg_bbox_exact_recheck_beats_rtree_rounding(spark, tmp_path):
    """SQLite R*-trees store float32 bounds rounded OUTWARD: a point at
    2^24+1 (not float32-representable) gets minx rounded down to 2^24, so
    a bbox ending between them hits the index but not the true envelope.
    The exact GP-header re-check must drop it."""
    p = str(tmp_path / "f32.gpkg")
    df = spark.createDataFrame(
        [(1, 16777217.0, 0.0), (2, 16777210.0, 0.0)],
        "id long, x double, y double",
    ).select(B.point_wkb("x", "y").alias("geometry"), "id")
    gpkg.write_gpkg(df, p, "pts", spatial_index=True)
    bb = (16777200.0, -1.0, 16777216.5, 1.0)  # excludes 2^24+1 exactly
    got, _, _ = gpkg.read_gpkg(spark, p, "pts", bbox=bb)
    assert [r["id"] for r in got.collect()] == [2]


def test_shp_prj_sidecar_roundtrip(spark, tmp_path):
    """to_shapefile writes a .prj for the CRSes the engine speaks; the
    read side recovers the EPSG from the outermost AUTHORITY entry, and
    the WKT parses back through the engine's own parse_wkt_crs."""
    from pyramids_spark.api import SparkFeatureCollection
    from pyramids_spark.operators import reproject

    base = str(tmp_path / "crs.shp")
    fc = SparkFeatureCollection(
        _pts(spark, 5).select(B.point_wkb("x", "y").alias("geometry"), "id"),
        32636,
    )
    assert fc.to_shapefile(base) == 5
    wkt = open(str(tmp_path / "crs.prj")).read()
    assert reproject.parse_wkt_crs(wkt) == ("utm", 32636)
    back = SparkFeatureCollection.read_shapefile(spark, base)
    assert back.epsg == 32636 and back.df.count() == 5
    # explicit epsg overrides the sidecar; absent sidecar defaults 4326
    assert SparkFeatureCollection.read_shapefile(spark, base, 2154).epsg == 2154
    import os as _os

    _os.remove(str(tmp_path / "crs.prj"))
    assert SparkFeatureCollection.read_shapefile(spark, base).epsg == 4326
    # wild GDAL-style .prj (conic, no template of ours): authority parses
    (tmp_path / "crs.prj").write_text(
        'PROJCS["RGF93 / Lambert-93",GEOGCS["RGF93",DATUM["D",SPHEROID['
        '"GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],UNIT['
        '"degree",0.0174532925199433],AUTHORITY["EPSG","4171"]],PROJECTION['
        '"Lambert_Conformal_Conic_2SP"],UNIT["metre",1],'
        'AUTHORITY["EPSG","2154"]]'
    )
    assert shp.read_prj(base) == 2154
    # unknown-template EPSG: no sidecar written, loudly documented False
    assert shp.write_prj(str(tmp_path / "x.shp"), 27572) is False
