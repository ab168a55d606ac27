"""pyramids_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the query/data-processing capabilities of
Serapieum-of-alex/pyramids (reference at /root/reference) on Spark:

- hierarchical cell index (quadkey/Morton, H3-style API) — :mod:`pyramids_spark.cells`
- raster grid model (tile/cell tables + affine math)    — :mod:`pyramids_spark.grid`
- cell-pruned spatial joins (PIP, kNN, crop, zonal)     — :mod:`pyramids_spark.operators`
- text/dedup/similarity pipeline ops                    — :mod:`pyramids_spark.text`,
                                                          :mod:`pyramids_spark.ann`
- deterministic synthetic data (documents-with-spans)   — :mod:`pyramids_spark.synth`

Design rules (BASELINE.json input_hint):
- DataFrame/SQL first; Catalyst does pushdown/pruning; no RDDs.
- All per-row logic is vectorized (built-in functions or pandas/Arrow UDFs);
  no Python row loops.
- All derived geometry comes from pure int64 hash arithmetic so that DuckDB
  oracles reproduce it bit-for-bit.
"""

__version__ = "0.1.0"
