"""Streaming operators: tile-count rollups and streaming dedup."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import cells


def stream_tile_counts(
    stream: DataFrame,
    zoom: int = 8,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
    ts: str = "ts",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Event stream with (ts, x, y) → per-(event-time window, tile) counts.

    Watermark bounds state for late data; the aggregation is the streaming
    twin of ``rasterize_points`` + the temporal groupby (SURVEY §2.4): at
    scale this runs with shuffle partitions sized to the cluster and RocksDB
    state store, emitting append-mode rows once windows close.
    """
    cx, cy = cells.geo_cell_col(F.col(x), F.col(y), zoom)
    d = stream.withColumn("tile_id", cells.cell_id_col(cx, cy, zoom))
    return (
        d.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), window).alias("win"), "tile_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "tile_id",
            "n",
        )
    )


def stream_zone_counts(
    stream: DataFrame,
    zones: list[dict],
    zoom: int = 8,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
    ts: str = "ts",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """The flagship PIP join on a STREAM: (ts, x, y) events → per-(event-
    time window, zone) counts. ``pip_join`` is stateless (cell encode +
    broadcast cover join + codegen refine), so it applies to a streaming
    DataFrame unchanged as a stream-static broadcast join — the document
    side is never shuffled pre-aggregation, identical to the batch plan;
    only the windowed count keeps (watermark-bounded) state."""
    from ..operators import pip

    # watermark BEFORE the join: pip_join drops zone misses, and a dropped
    # row must still advance event time (otherwise a quiet zone stalls the
    # watermark at the last HIT, not the last EVENT)
    hits = pip.pip_join(stream.withWatermark(ts, watermark), zones, zoom=zoom, x=x, y=y)
    return (
        hits
        .groupBy(F.window(F.col(ts), window).alias("win"), "zone_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "zone_id",
            "n",
        )
    )


def streaming_dedup(stream: DataFrame, key: str = "doc_id", ts: str = "ts",
                    watermark: str = "1 minute") -> DataFrame:
    """Exactly-once streaming dedup by content key within the watermark
    horizon — ``dropDuplicatesWithinWatermark`` (state-bounded), the
    streaming twin of exact_dedup."""
    return stream.withWatermark(ts, watermark).dropDuplicatesWithinWatermark([key])
