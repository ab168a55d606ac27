"""Unstructured mesh (UGRID) operators: locate/kNN/interpolate on node and
face tables.

Reference: ``/root/reference/src/pyramids/netcdf/ugrid/`` —
``Mesh2d`` (mesh.py:20-119: node_x/node_y/face_node_connectivity),
``MeshSpatialIndex`` (spatial.py): locate_faces (PIP), locate_nearest_node
(kNN), subset_by_bounds (range); ``interpolation.py:20-182`` mesh_to_grid
(nearest with max_distance=2·cell cutoff; linear needs a Delaunay — scipy is
absent here, so linear is a documented stub).

Spark model (SURVEY §1.1): ``nodes(node_id, x, y[, data])`` and
``faces(face_id, node_ids array<int>, centroid_x, centroid_y[, data])``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..grid import Grid
from .knn import knn_join


def face_centroids(nodes: DataFrame, faces: DataFrame) -> DataFrame:
    """Vertex-average centroids from ragged connectivity (fill −1 dropped) —
    mesh.py:20-119 connectivity contract."""
    f = faces.select(
        "face_id", F.explode("node_ids").alias("node_id")
    ).where(F.col("node_id") >= 0)
    j = f.join(nodes.select("node_id", "x", "y"), "node_id")
    return j.groupBy("face_id").agg(
        F.avg("x").alias("centroid_x"), F.avg("y").alias("centroid_y"),
        F.count("node_id").alias("n_nodes"),
    )


def subset_by_bounds(df: DataFrame, bounds: tuple[float, float, float, float],
                     x: str = "x", y: str = "y") -> DataFrame:
    """spatial.py:145-193 — plain range predicate (Catalyst pushdown)."""
    x0, y0, x1, y1 = bounds
    return df.where(
        (F.col(x) >= x0) & (F.col(x) <= x1) & (F.col(y) >= y0) & (F.col(y) <= y1)
    )


def locate_nearest_node(nodes: DataFrame, queries: list[tuple[int, float, float]],
                        k: int = 1) -> DataFrame:
    """spatial.py:101-143 — kNN via the partial-top-k engine."""
    return knn_join(nodes.withColumnRenamed("node_id", "key"), queries, k=k)


def mesh_to_grid_nearest(
    nodes: DataFrame, grid: Grid, value: str = "data",
    max_distance: float | None = None,
) -> DataFrame:
    """interpolation.py:20-182 nearest path: every grid cell centre takes the
    value of the nearest mesh node, NULL beyond ``max_distance`` (reference
    default cutoff 2·cell). Distributed as nodes→cell rasterize + ring-1
    gap fill is NOT exact; instead we do the exact join: grid centres ×
    nodes partial-top-1 (scan nodes once; shuffle O(cells)). Grid centres
    are generated, not materialized."""
    spark = nodes.sparkSession
    max_distance = 2 * grid.cell if max_distance is None else max_distance
    ncells = grid.rows * grid.cols
    centres = (
        spark.range(ncells)
        .select(
            (F.col("id") / grid.cols).cast("long").alias("row"),
            (F.col("id") % grid.cols).cast("long").alias("col"),
        )
        .withColumn("qx", grid.x_center_col(F.col("col")))
        .withColumn("qy", grid.y_center_col(F.col("row")))
    )
    # exact nearest per centre: join nodes by coarse cell rings would need a
    # zoom; for mesh≪grid the broadcast-nodes variant is the right plan
    n = F.broadcast(nodes.select(F.col("node_id"), F.col("x"), F.col("y"), F.col(value)))
    j = centres.join(n)
    d2 = (F.col("qx") - F.col("x")) ** 2 + (F.col("qy") - F.col("y")) ** 2
    from pyspark.sql import Window

    w = Window.partitionBy("row", "col").orderBy(d2.asc(), F.col("node_id").asc())
    best = (
        j.withColumn("_d2", d2)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
    )
    return best.select(
        "row", "col",
        F.when(F.col("_d2") <= max_distance * max_distance, F.col(value)).alias("value"),
    )


def mesh_to_grid_linear(
    nodes: DataFrame, faces: DataFrame, grid: Grid, value: str = "data"
) -> DataFrame:
    """Linear mesh→grid interpolation without scipy: barycentric weights on
    the mesh's OWN triangular faces (UGRID ``face_node_connectivity``)
    replace the reference's node-Delaunay (``LinearNDInterpolator``,
    ``ugrid/interpolation.py:97-182``); NULL outside every face = the
    NaN-outside-hull contract.

    Plan: 3 equi-joins assemble face vertices; generated grid centres pair
    with faces under a bbox prefilter inside the join condition (broadcast
    here — at scale, swap for a cell-indexed equi-join on face bbox cover);
    barycentric test + weights are pure column algebra (codegen,
    SQL-twinnable); a centre on a shared edge matches 2 faces → dedup to
    the smallest face_id (deterministic).
    """
    spark = nodes.sparkSession
    tri = faces.select(
        "face_id",
        F.element_at("node_ids", 1).alias("_n0"),
        F.element_at("node_ids", 2).alias("_n1"),
        F.element_at("node_ids", 3).alias("_n2"),
    )
    for i in (0, 1, 2):
        nd = nodes.select(
            F.col("node_id").alias(f"_n{i}"),
            F.col("x").alias(f"_x{i}"), F.col("y").alias(f"_y{i}"),
            F.col(value).alias(f"_v{i}"),
        )
        tri = tri.join(nd, f"_n{i}")
    ncells = grid.rows * grid.cols
    centres = (
        spark.range(ncells)
        .select(
            (F.col("id") / grid.cols).cast("long").alias("row"),
            (F.col("id") % grid.cols).cast("long").alias("col"),
        )
        .withColumn("qx", grid.x_center_col(F.col("col")))
        .withColumn("qy", grid.y_center_col(F.col("row")))
    )
    c = lambda s: F.col(s)  # noqa: E731
    bbox = (
        (c("qx") >= F.least(c("_x0"), c("_x1"), c("_x2")))
        & (c("qx") <= F.greatest(c("_x0"), c("_x1"), c("_x2")))
        & (c("qy") >= F.least(c("_y0"), c("_y1"), c("_y2")))
        & (c("qy") <= F.greatest(c("_y0"), c("_y1"), c("_y2")))
    )
    j = centres.join(F.broadcast(tri), bbox)
    det = (c("_y1") - c("_y2")) * (c("_x0") - c("_x2")) + (c("_x2") - c("_x1")) * (c("_y0") - c("_y2"))
    w0 = ((c("_y1") - c("_y2")) * (c("qx") - c("_x2")) + (c("_x2") - c("_x1")) * (c("qy") - c("_y2"))) / det
    w1 = ((c("_y2") - c("_y0")) * (c("qx") - c("_x2")) + (c("_x0") - c("_x2")) * (c("qy") - c("_y2"))) / det
    w2 = F.lit(1.0) - w0 - w1
    cand = (
        j.where(det != 0.0)
        .withColumn("_w0", w0).withColumn("_w1", w1).withColumn("_w2", w2)
        .where((c("_w0") >= 0.0) & (c("_w1") >= 0.0) & (c("_w2") >= 0.0))
        .withColumn(
            "_val",
            c("_w0") * c("_v0") + c("_w1") * c("_v1") + c("_w2") * c("_v2"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("row", "col").orderBy(F.col("face_id").asc())
    best = cand.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    return centres.join(
        best.select("row", "col", "_val"), ["row", "col"], "left"
    ).select("row", "col", F.col("_val").alias("value"))
