"""WKT constructors/extractors, change_no_data_value, list_layers."""

import numpy as np
from pyspark.sql import functions as F

from pyramids_spark.functions import wkt as W
from pyramids_spark.grid import COELLO, grid_df
from pyramids_spark.operators import raster
from pyramids_spark import api


def test_wkt_point_roundtrip_exact(spark):
    df = spark.range(200).select(
        (F.col("id") * 0.731 - 73.0).alias("x"),
        (F.col("id") * -0.173 + 17.0).alias("y"),
    )
    out = (
        df.withColumn("wkt", W.point_wkt(F.col("x"), F.col("y")))
        .select(
            "x", "y", "wkt",
            W.wkt_point_x(F.col("wkt")).alias("px"),
            W.wkt_point_y(F.col("wkt")).alias("py"),
            W.wkt_geometry_type(F.col("wkt")).alias("t"),
        )
        .collect()
    )
    for r in out:
        assert r["t"] == "POINT"
        assert r["wkt"].startswith("POINT (")
        assert abs(r["px"] - round(r["x"], 6)) < 1e-9
        assert abs(r["py"] - round(r["y"], 6)) < 1e-9


def test_wkt_negative_zero_normalized(spark):
    df = spark.createDataFrame([(-1e-9, -0.0)], "x double, y double")
    wkt = df.select(W.point_wkt(F.col("x"), F.col("y")).alias("w")).collect()[0]["w"]
    assert wkt == "POINT (0.000000 0.000000)"  # no "-0.000000"


def test_box_wkt_ring_closed_ccw(spark):
    df = spark.createDataFrame([(0.0, 1.0, 2.0, 3.5)], "x0 double, y0 double, x1 double, y1 double")
    w = df.select(
        W.box_wkt(F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1")).alias("w")
    ).collect()[0]["w"]
    assert w == (
        "POLYGON ((0.000000 1.000000, 2.000000 1.000000, "
        "2.000000 3.500000, 0.000000 3.500000, 0.000000 1.000000))"
    )


def test_wkt_parse_non_point_is_null(spark):
    df = spark.createDataFrame([("POLYGON ((0 0, 1 0, 1 1, 0 0))",)], "wkt string")
    r = df.select(
        W.wkt_point_x(F.col("wkt")).alias("px"),
        W.wkt_geometry_type(F.col("wkt")).alias("t"),
    ).collect()[0]
    assert r["px"] is None
    assert r["t"] == "POLYGON"


def test_polygon_wkt_closes_open_ring(spark):
    df = spark.createDataFrame(
        [([0.0, 2.0, 2.0], [0.0, 0.0, 1.5])], "xs array<double>, ys array<double>"
    )
    w = df.select(W.polygon_wkt(F.col("xs"), F.col("ys")).alias("w")).first()["w"]
    assert w == (
        "POLYGON ((0.000000 0.000000, 2.000000 0.000000, "
        "2.000000 1.500000, 0.000000 0.000000))"
    )
    # already-closed input is left alone
    df2 = spark.createDataFrame(
        [([0.0, 2.0, 2.0, 0.0], [0.0, 0.0, 1.5, 0.0])],
        "xs array<double>, ys array<double>",
    )
    assert df2.select(W.polygon_wkt(F.col("xs"), F.col("ys")).alias("w")).first()["w"] == w


def test_linestring_wkt_and_ring_parsers(spark):
    df = spark.createDataFrame(
        [([1.25, -3.0], [4.0, 5.5])], "xs array<double>, ys array<double>"
    )
    r = df.select(
        W.linestring_wkt(F.col("xs"), F.col("ys")).alias("w")
    ).select(
        "w",
        W.wkt_ring_xs(F.col("w")).alias("xs"),
        W.wkt_ring_ys(F.col("w")).alias("ys"),
        W.wkt_geometry_type(F.col("w")).alias("t"),
    ).first()
    assert r["w"] == "LINESTRING (1.250000 4.000000, -3.000000 5.500000)"
    assert r["t"] == "LINESTRING" and r["xs"] == [1.25, -3.0] and r["ys"] == [4.0, 5.5]


def test_multipolygon_and_multilinestring_parts(spark):
    mp = ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), "
          "((5 5, 9 5, 9 9, 5 5), (6 6, 7 6, 7 7, 6 6)))")
    ml = "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))"
    df = spark.createDataFrame([(mp, ml)], "mp string, ml string")
    r = df.select(
        W.multipolygon_parts(F.col("mp")).alias("ps"),
        W.multilinestring_parts(F.col("ml")).alias("ls"),
    ).first()
    assert r["ps"] == [
        "POLYGON ((0 0, 1 0, 1 1, 0 0))",
        "POLYGON ((5 5, 9 5, 9 9, 5 5), (6 6, 7 6, 7 7, 6 6))",  # hole kept
    ]
    assert r["ls"] == ["LINESTRING (0 0, 1 1)", "LINESTRING (2 2, 3 3, 4 4)"]
    # parsed exterior ring of the hole-bearing part is just the exterior
    xs = df.select(
        W.wkt_ring_xs(F.element_at(W.multipolygon_parts(F.col("mp")), 2)).alias("xs")
    ).first()["xs"]
    assert xs == [5.0, 9.0, 9.0, 5.0]


def test_geometrycollection_parts_mixed_and_nested(spark):
    gc = ("GEOMETRYCOLLECTION (POINT (1.5 -2.0), "
          "LINESTRING (0.0 0.0, 1.0 1.0), "
          "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5))), "
          "GEOMETRYCOLLECTION (POINT (9.0 9.0), POINT (8.0 8.0)))")
    df = spark.createDataFrame([(gc,)], "gc string")
    parts = df.select(W.geometrycollection_parts(F.col("gc")).alias("p")).collect()[0]["p"]
    # nested collections flatten recursively (reference
    # geometry_collection_coords semantics): members surface, header gone
    assert parts == [
        "POINT (1.5 -2.0)",
        "LINESTRING (0.0 0.0, 1.0 1.0)",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
        "POINT (9.0 9.0)",
        "POINT (8.0 8.0)",
    ]
    # Multi* parts split onward with the existing part splitters
    polys = (
        df.select(F.explode(W.geometrycollection_parts(F.col("gc"))).alias("part"))
        .where(F.col("part").startswith("MULTIPOLYGON"))
        .select(W.multipolygon_parts(F.col("part")).alias("p"))
        .collect()[0]["p"]
    )
    assert polys == ["POLYGON ((0 0, 1 0, 1 1, 0 0))", "POLYGON ((5 5, 6 5, 6 6, 5 5))"]


def test_change_no_data_value_sentinel_and_null(spark):
    g = grid_df(
        spark, COELLO,
        "CASE WHEN (row * {cols} + col) % 5 = 0 THEN -9.0 "
        "WHEN (row * {cols} + col) % 3 = 0 THEN NULL "
        "ELSE CAST(row * {cols} + col AS DOUBLE) END",
    )
    out = raster.change_no_data_value(g, new_value=-999.0, old_value=-9.0)
    pdf = out.toPandas()
    assert (pdf["value"].notna()).all()  # NULLs rewritten to the sentinel
    assert not np.isclose(pdf["value"], -9.0, rtol=0.001).any()
    # isclose semantics: -9.004 is within rtol of -9 and must be rewritten
    g2 = spark.createDataFrame([(0, 0, 0, -9.004), (0, 0, 1, -9.2)],
                               "band int, row long, col long, value double")
    v = {(r["col"]): r["value"] for r in raster.change_no_data_value(
        g2, -999.0, -9.0).collect()}
    assert v[0] == -999.0 and v[1] == -9.2


def test_list_layers_names_and_counts(spark, tmp_path):
    base = str(tmp_path)
    spark.range(7).write.parquet(f"{base}/alpha.parquet")
    spark.range(3).write.parquet(f"{base}/beta.parquet")
    api._list_layer_names_cached.cache_clear()  # C15-style cache invalidation
    names = api.SparkFeatureCollection.list_layer_names(base)
    assert names == ["alpha", "beta"]
    rows = {r["layer"]: r["n_features"]
            for r in api.SparkFeatureCollection.list_layers(spark, base).collect()}
    assert rows == {"alpha": 7, "beta": 3}


def test_band_metadata_names_and_colors(spark):
    """Band names + color interpretation dict surface
    (reference band_metadata.py:441-595)."""
    from pyramids_spark.api import SparkDataset
    from pyramids_spark.grid import COELLO

    ds = SparkDataset.create(spark, COELLO, "CAST(1 AS DOUBLE)", bands=3)
    ds2 = ds.with_band_metadata(
        names=["red band", "green band", "blue band"],
        colors={0: "Red", 1: "Green", 2: "Blue"},
    )
    assert ds2.band_names == ("red band", "green band", "blue band")
    assert ds2.get_band_by_color("green") == 1
    assert ds2.get_band_by_color("alpha") is None
    # metadata is immutable plan-side state; the cell table is untouched
    assert ds2.df is ds.df


def test_lzw_codec_properties():
    """TIFF-LZW codec invariants: round trip across width changes (>510
    entries), table resets (>4094), the KwKwK case, and high-compression
    runs; corrupt stream rejects loudly."""
    import numpy as np
    import pytest

    from pyramids_spark import lzw

    rng = np.random.default_rng(11)
    cases = [
        b"", b"A", b"ababababab",  # KwKwK territory
        bytes(rng.integers(0, 256, 262144, dtype=np.uint8)),  # resets
        bytes(np.zeros(100000, np.uint8)),
        np.arange(20000, dtype="<i2").tobytes(),
    ]
    for c in cases:
        assert lzw.decode(lzw.encode(c)) == c
    with pytest.raises(ValueError, match="corrupt"):
        # 9-bit code 300 right after CLEAR: beyond the fresh table
        bits = (256 << 9) | 300
        lzw.decode(int.to_bytes(bits << 6, 3, "big"))
