"""CF-convention machinery vs the reference's cf.py contracts."""

import pandas as pd
from pyspark.sql import functions as F

from pyramids_spark import cf


def test_detect_axis_priority_order(spark):
    rows = [
        # explicit axis wins over everything
        ("lat", "T", "longitude", "degrees_east"),
        # standard_name beats units and name
        ("foo", None, "air_pressure", "degrees_north"),
        # units beat name pattern
        ("depth", None, None, "degrees_east"),
        # 'since' units → T
        ("foo2", None, None, "days since 2000-01-01"),
        # name pattern as last resort
        ("level", None, None, "m"),
        ("nothing", None, None, "kg"),
    ]
    df = spark.createDataFrame(
        rows, "name string, axis string, standard_name string, units string"
    )
    got = {
        r["name"]: r["ax"]
        for r in df.select(
            "name",
            cf.detect_axis_col(
                F.col("name"), F.col("axis"), F.col("standard_name"), F.col("units")
            ).alias("ax"),
        ).collect()
    }
    assert got == {
        "lat": "T", "foo": "Z", "depth": "X", "foo2": "T",
        "level": "Z", "nothing": None,
    }


def test_decode_flags_three_cf_modes(spark):
    df = spark.createDataFrame([(0,), (1,), (3,), (5,), (9,)], "v int")
    sel = df.select(
        "v",
        cf.decode_flags_col(
            F.col("v"), flag_values=[1, 3, 5], flag_meanings=["a", "b", "c"]
        ).alias("excl"),
        cf.decode_flags_col(
            F.col("v"), flag_masks=[1, 2, 4], flag_meanings=["x", "y", "z"]
        ).alias("bits"),
        cf.decode_flags_col(
            F.col("v"), flag_masks=[3, 12], flag_values=[1, 8],
            flag_meanings=["m1", "m2"],
        ).alias("comb"),
    )
    got = {r["v"]: (r["excl"], r["bits"], r["comb"]) for r in sel.collect()}
    assert got[0] == (["unknown"], ["unknown"], ["unknown"])
    assert got[1] == (["a"], ["x"], ["m1"])
    assert got[3] == (["b"], ["x", "y"], ["unknown"])  # 3&3=3≠1
    assert got[5] == (["c"], ["x", "z"], ["m1"])  # 5&3=1, 5&12=4≠8
    assert got[9] == (["unknown"], ["x"], ["m1", "m2"])  # 9&3=1, 9&12=8
    # no meanings at all → unknown
    assert df.select(cf.decode_flags_col(F.col("v")).alias("u")).first()["u"] == ["unknown"]


def test_decode_cf_value_pipeline(spark):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([-999.0, 0.0, 10.0, 100.0, 140.0])],
        "i long, raw double",
    )
    out = df.select(
        "i",
        cf.decode_cf_value(
            F.col("raw"),
            {"_FillValue": -999.0, "scale_factor": 0.5, "add_offset": 5.0,
             "valid_min": 5.0, "valid_max": 60.0},
        ).alias("v"),
    ).toPandas().set_index("i")["v"]
    assert pd.isna(out[0])           # fill
    assert out[1] == 5.0             # 0*0.5+5, at valid_min
    assert out[2] == 10.0
    assert out[3] == 55.0
    assert pd.isna(out[4])           # 75 > valid_max


def test_netcdf_decode_variable_facade(spark):
    """SparkNetCDF.decode_variable: CF value pipeline + time decode on the
    tall table surface."""
    from pyspark.sql import functions as F  # noqa: F811

    from pyramids_spark.api import SparkNetCDF

    rows = [
        ("temp", t, 0, r, c, v)
        for t, r, c, v in [
            (0, 0, 0, -999.0), (0, 0, 1, 10.0), (6, 0, 0, 100.0), (6, 0, 1, 300.0),
        ]
    ]
    nc = SparkNetCDF(spark.createDataFrame(
        rows, "variable string, t long, band int, row long, col long, value double"
    ))
    out = nc.decode_variable(
        "temp",
        {"_FillValue": -999.0, "scale_factor": 0.1, "add_offset": 0.0,
         "valid_max": 20.0},
        time_units="hours since 2021-06-01 00:00:00",
    ).df.toPandas().sort_values(["t", "col"]).reset_index(drop=True)
    assert pd.isna(out.loc[0, "value"])        # fill
    assert out.loc[1, "value"] == 1.0          # scaled
    assert out.loc[2, "value"] == 10.0
    assert pd.isna(out.loc[3, "value"])        # 30 > valid_max
    assert str(out.loc[2, "time"]) == "2021-06-01 06:00:00"


def test_classify_variables_precedence(spark):
    # a variable that is BOTH a dimension name and referenced as bounds:
    # bounds wins (reference precedence, cf.py:652-676)
    attrs = spark.createDataFrame(
        [
            ("time", "bounds", "lat"),
            ("lat", "units", "degrees_north"),
            ("plain", "units", "K"),
        ],
        "variable string, attr string, value string",
    )
    dims = spark.createDataFrame([("lat",), ("time",)], "name string")
    got = {r["variable"]: r["cf_role"] for r in cf.classify_variables(attrs, dims).collect()}
    assert got == {"time": "coordinate", "lat": "bounds", "plain": "data"}
