"""Structured Streaming ingest for the tiling engine.

The reference has NO streaming engine (SURVEY §2.10 — its nearest analogues
are the chunked ``iter_features`` scan and dask deferred writes), so there
are no reference semantics to match; this module is the Spark-first ingest
path the task brief calls for: ``readStream`` → cell/tile assignment →
watermarked windowed aggregation → ``writeStream``, with exactly-once sinks
via checkpointLocation.
"""

from .ingest import stream_tile_counts, stream_zone_counts, streaming_dedup
from .sessionize import stream_sessionize

__all__ = ["stream_tile_counts", "stream_zone_counts", "streaming_dedup", "stream_sessionize"]
