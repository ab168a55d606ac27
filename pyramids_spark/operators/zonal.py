"""Zonal statistics: per-zone aggregates over raster cells or point values.

Reference: ``zonal_stats`` (``/root/reference/src/pyramids/dataset/ops/
_zonal.py:210-271``): rasterize the zones to a label grid with
ALL_TOUCHED=FALSE (cell-centre inside, ``:52-107``), then aggregate values
per label — mean/sum/min/max/std/var/count, std/var POPULATION (ddof=0),
empty zone → NULL row (``:191-207``), CRS mismatch → error.

Spark plan: zone-cover cells (broadcast) ⋈ cell table on (row, col) →
groupBy(zone). The shuffle carries only (zone_id, partial-agg) thanks to
hash-aggregate partial/final split — the reference's single-pass bincount
(``_zonal.py:152-188``) IS Spark's map-side combine. Hot zones (a zone
covering a dense region) are handled by two-stage salted aggregation:
partial by (zone, salt), final by zone — see ``salted_agg``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import cells
from ..grid import Grid
from .pip import pip_join, salt_col

STAT_EXPRS = {
    "mean": lambda c: F.avg(c),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "std": lambda c: F.stddev_pop(c),
    "var": lambda c: F.var_pop(c),
    "count": lambda c: F.count(c),
}


def zone_label_cells(zones: list[dict], grid: Grid) -> pd.DataFrame:
    """Rasterize zone polygons to grid-cell labels, centre-inside, first zone
    wins on overlap (gdal burn order ≙ ascending zone_id; unassigned cells
    absent ≙ label −1)."""
    rows, cols, zids = [], [], []
    for z in zones:
        for poly in z["parts"]:
            p = np.asarray(poly, dtype=np.float64)
            # candidate rows/cols from bbox
            c0 = max(0, int(np.floor((p[:, 0].min() - grid.x0) / grid.cell)))
            c1 = min(grid.cols - 1, int(np.floor((p[:, 0].max() - grid.x0) / grid.cell)))
            r0 = max(0, int(np.floor((grid.y0 - p[:, 1].max()) / grid.cell)))
            r1 = min(grid.rows - 1, int(np.floor((grid.y0 - p[:, 1].min()) / grid.cell)))
            if c1 < c0 or r1 < r0:
                continue
            gc, gr = np.meshgrid(np.arange(c0, c1 + 1), np.arange(r0, r1 + 1))
            gc, gr = gc.ravel(), gr.ravel()
            cx = grid.x0 + gc * grid.cell + grid.cell / 2
            cy = grid.y0 - gr * grid.cell - grid.cell / 2
            m = cells.points_in_polygon(cx, cy, p)
            rows.append(gr[m])
            cols.append(gc[m])
            zids.append(np.full(int(m.sum()), z["zone_id"], dtype=np.int64))
    if not rows:
        return pd.DataFrame({"row": [], "col": [], "zone_id": []})
    df = pd.DataFrame(
        {"row": np.concatenate(rows), "col": np.concatenate(cols),
         "zone_id": np.concatenate(zids)}
    )
    # first zone wins where polygons overlap (stable: lowest zone_id)
    return (
        df.sort_values(["row", "col", "zone_id"])
        .drop_duplicates(["row", "col"])
        .reset_index(drop=True)
    )


def zone_label_cells_df(spark, zones: list[dict], grid: Grid) -> DataFrame:
    """Distributed twin of :func:`zone_label_cells` (VERDICT r1 noted the
    driver-side numpy rasterize as a bottleneck for zones covering huge
    areas at fine grids): per-(zone, part) bbox cell ranges explode across
    the cluster, the centre-inside test runs as the same vectorized
    ray-cast in an Arrow-batched UDF, and first-zone-wins is a
    ``min(zone_id)`` aggregation — bit-identical rows to the driver path,
    O(total bbox cells) distributed work, nothing driver-side but the tiny
    per-part bbox table."""
    from pyspark.sql import types as T

    meta_rows, polys = [], {}
    for z in zones:
        for pi, poly in enumerate(z["parts"]):
            p = np.asarray(poly, dtype=np.float64)
            c0 = max(0, int(np.floor((p[:, 0].min() - grid.x0) / grid.cell)))
            c1 = min(grid.cols - 1, int(np.floor((p[:, 0].max() - grid.x0) / grid.cell)))
            r0 = max(0, int(np.floor((grid.y0 - p[:, 1].max()) / grid.cell)))
            r1 = min(grid.rows - 1, int(np.floor((grid.y0 - p[:, 1].min()) / grid.cell)))
            if c1 < c0 or r1 < r0:
                continue
            meta_rows.append((int(z["zone_id"]), pi, r0, r1, c0, c1))
            polys[(int(z["zone_id"]), pi)] = p
    if not meta_rows:
        return spark.createDataFrame([], schema="row long, col long, zone_id long")
    meta = spark.createDataFrame(
        meta_rows, schema="zone_id long, part long, r0 long, r1 long, c0 long, c1 long"
    )
    par = spark.sparkContext.defaultParallelism
    cand = (
        meta.select(
            "zone_id", "part", "c0", "c1",
            F.explode(F.sequence("r0", "r1")).alias("row"),
        )
        .repartition(par * 2)  # spread row-strips before the wide explode
        .select(
            "zone_id", "part", "row",
            F.explode(F.sequence("c0", "c1")).alias("col"),
        )
    )
    cx = F.lit(grid.x0) + F.col("col") * grid.cell + F.lit(grid.cell / 2)
    cy = F.lit(grid.y0) - F.col("row") * grid.cell - F.lit(grid.cell / 2)
    cand = cand.withColumn("_cx", cx).withColumn("_cy", cy)
    polys_b = spark.sparkContext.broadcast(polys)

    @F.pandas_udf(T.BooleanType())
    def _inside(zone: pd.Series, part: pd.Series, px: pd.Series, py: pd.Series) -> pd.Series:
        zs = zone.to_numpy()
        ps = part.to_numpy()
        xs = px.to_numpy()
        ys = py.to_numpy()
        out = np.zeros(len(zs), dtype=bool)
        key = zs * 1000 + ps
        for kk in np.unique(key):
            m = key == kk
            poly = polys_b.value[(int(kk // 1000), int(kk % 1000))]
            out[m] = cells.points_in_polygon(xs[m], ys[m], poly)
        return pd.Series(out)

    return (
        cand.where(_inside("zone_id", "part", "_cx", "_cy"))
        .groupBy("row", "col")
        .agg(F.min("zone_id").alias("zone_id"))
        .select("row", "col", "zone_id")
    )


#: above this many candidate bbox cells the labels build runs distributed
ZONE_LABEL_DRIVER_MAX = 2_000_000


def zonal_stats_raster(
    cells_df: DataFrame, grid: Grid, zones: list[dict],
    stat_names: tuple[str, ...] = ("mean", "sum", "min", "max", "std", "var", "count"),
) -> DataFrame:
    """Per-zone stats over raster cells; empty zones present with NULL stats."""
    spark = cells_df.sparkSession
    bbox_cells = 0
    for z in zones:
        for poly in z["parts"]:
            p = np.asarray(poly, dtype=np.float64)
            bbox_cells += max(0, int((p[:, 0].max() - p[:, 0].min()) / grid.cell) + 1) * max(
                0, int((p[:, 1].max() - p[:, 1].min()) / grid.cell) + 1
            )
    if bbox_cells > ZONE_LABEL_DRIVER_MAX:
        # huge zone footprint: build labels distributed; AQE broadcasts the
        # join side only if it turns out small
        ldf = zone_label_cells_df(spark, zones, grid)
    else:
        labels = zone_label_cells(zones, grid)
        ldf = F.broadcast(spark.createDataFrame(labels, schema="row long, col long, zone_id long"))
    zdf = F.broadcast(
        spark.createDataFrame(
            pd.DataFrame({"zone_id": [z["zone_id"] for z in zones]}), schema="zone_id long"
        )
    )
    per_zone = (
        cells_df.join(ldf, ["row", "col"])
        .groupBy("zone_id")
        .agg(*[STAT_EXPRS[s]("value").alias(s) for s in stat_names])
    )
    return zdf.join(per_zone, "zone_id", "left")


def zonal_stats_points(
    points: DataFrame, zones: list[dict], value: str, zoom: int = 8,
    stat_names: tuple[str, ...] = ("mean", "sum", "min", "max", "std", "var", "count"),
    x: str = "x", y: str = "y",
) -> DataFrame:
    """Per-zone stats over point values — PIP join then aggregate; the
    10^12-row path (cells prune, broadcast join, partial agg)."""
    spark = points.sparkSession
    zdf = F.broadcast(
        spark.createDataFrame(
            pd.DataFrame({"zone_id": [z["zone_id"] for z in zones]}), schema="zone_id long"
        )
    )
    hits = pip_join(points, zones, zoom=zoom, x=x, y=y)
    per_zone = hits.groupBy("zone_id").agg(
        *[STAT_EXPRS[s](value).alias(s) for s in stat_names]
    )
    return zdf.join(per_zone, "zone_id", "left")


def zonal_stats_points_df(
    points: DataFrame, zones_df: DataFrame, value: str, zoom: int = 8,
    stat_names: tuple[str, ...] = ("mean", "sum", "min", "max", "std", "var", "count"),
    x: str = "x", y: str = "y",
) -> DataFrame:
    """Per-zone stats where the zone side is a DATAFRAME of ring parts
    (``pip.pip_join_df`` composition): the zonal twin of ``locate_faces``
    at 10^7 zones — cover distributed, aggregate map-side partial, zones
    with no hits kept as NULL rows via the left join on the (small,
    distinct) zone-id projection."""
    from .pip import pip_join_df

    zids = zones_df.select("zone_id").distinct()
    hits = pip_join_df(points, zones_df, zoom=zoom, x=x, y=y)
    per_zone = hits.groupBy("zone_id").agg(
        *[STAT_EXPRS[s](value).alias(s) for s in stat_names]
    )
    return zids.join(per_zone, "zone_id", "left")


def salted_agg(
    df: DataFrame, group: str, value: str, n_salt: int = 16
) -> DataFrame:
    """Two-stage skew-proof aggregation: partial by (group, salt) → final by
    group. Decomposable stats only (sum/count/min/max → mean/std_pop/var_pop
    recomposed exactly from Σx, Σx², n). This is the explicit hot-key
    handling of the north rule; AQE skew-split remains on as backstop."""
    part = (
        df.withColumn("_salt", salt_col(n_salt))
        .groupBy(group, "_salt")
        .agg(
            F.sum(value).alias("_s"),
            F.sum(F.col(value) * F.col(value)).alias("_s2"),
            F.count(value).alias("_n"),
            F.min(value).alias("_mn"),
            F.max(value).alias("_mx"),
        )
    )
    return part.groupBy(group).agg(
        (F.sum("_s") / F.sum("_n")).alias("mean"),
        F.sum("_s").alias("sum"),
        F.min("_mn").alias("min"),
        F.max("_mx").alias("max"),
        F.sqrt(F.sum("_s2") / F.sum("_n") - (F.sum("_s") / F.sum("_n")) ** 2).alias("std"),
        (F.sum("_s2") / F.sum("_n") - (F.sum("_s") / F.sum("_n")) ** 2).alias("var"),
        F.sum("_n").alias("count"),
    )


def overlay(src: DataFrame, classes: DataFrame) -> DataFrame:
    """Group-join: class raster × value raster (aligned grids) → per-class
    value stats (reference ``Dataset.overlay``, ``analysis.py:439-521``,
    which returns {class: [values]}; we return the grouped table)."""
    c = classes.select("row", "col", F.col("value").alias("class"))
    return (
        src.where(F.col("value").isNotNull())
        .join(c.where(F.col("class").isNotNull()), ["row", "col"])
        .groupBy("class")
        .agg(
            F.count("value").alias("count"),
            F.sum("value").alias("sum"),
            F.avg("value").alias("mean"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
        )
    )
