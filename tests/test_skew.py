"""Skew-handling correctness: salted aggregation and skewed PIP joins must be
exact under pathological key distributions (the north rule's explicit
partitioning/skew mandate)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyramids_spark import synth
from pyramids_spark.operators import pip
from pyramids_spark.operators.zonal import salted_agg


def test_salted_agg_equals_plain_agg_under_extreme_skew(spark):
    """99% of rows share one key; salted two-stage must recompose exactly."""
    n = 200_000
    df = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 100 < 99, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
    )
    got = salted_agg(df, "k", "v", n_salt=32).toPandas().sort_values("k").reset_index(drop=True)
    exp = (
        df.groupBy("k")
        .agg(
            F.avg("v").alias("mean"), F.sum("v").alias("sum"), F.min("v").alias("min"),
            F.max("v").alias("max"), F.stddev_pop("v").alias("std"),
            F.var_pop("v").alias("var"), F.count("v").alias("count"),
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert (got.k == exp.k).all()
    for c in ("sum", "min", "max", "count"):
        np.testing.assert_allclose(got[c].astype(float), exp[c].astype(float), rtol=0)
    for c in ("mean", "std", "var"):
        np.testing.assert_allclose(got[c], exp[c], rtol=1e-9)


def test_salt_col_spreads_hot_key(spark):
    """All rows share one key; the per-row salt must spread them across all
    salt buckets with no bucket dominating (the partial-agg stage then has
    no hot reducer)."""
    df = spark.range(100_000).select(F.lit(7).alias("k"))
    spread = (
        df.withColumn("s", pip.salt_col(16))
        .groupBy("s").count().toPandas()
    )
    assert len(spread) == 16
    assert spread["count"].max() < 100_000 * 0.2


def test_pip_join_udf_path_under_extreme_skew(spark):
    """Force the numpy refinement path with 90% of points in one cell."""
    pts = synth.doc_points(spark, 30_000, hot_frac=0.9)
    zones = synth.zone_polygons(4, "hull")
    a = pip.pip_join(pts, zones, zoom=6, refine="udf").count()
    b = pip.pip_join(pts, zones, zoom=6, refine="expr").count()
    assert a == b and a > 0
