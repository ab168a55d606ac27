"""Shared plumbing for the TWO-PHASE staged parallel single-file sinks
(netCDF-4 in ``hdf5.py``, GeoTIFF in ``tiff.py``): atomic executor-side
staging of encoded chunks/tiles, and the distributed ``pwrite`` copy of
the staged bytes into the laid-out target. One implementation so a
robustness fix (full-write loop, retry atomicity) cannot diverge
between the containers.

Filesystem model (same as every pwrite sink here): the target path and
the scratch directory must be reachable from all executors — local fs
in this sandbox, NFS/Lustre on a real cluster."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def write_staged(fn: str, data: bytes) -> None:
    """Write one staged file atomically against CONCURRENT task attempts
    (speculation, zombie tasks): a pid-unique tmp name, then
    ``os.replace``. A fixed ``.tmp`` suffix would let attempt B truncate
    the inode attempt A is mid-write on."""
    tmp = f"{fn}.tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, fn)


def _pwrite_all(fd: int, raw: bytes, at: int) -> None:
    """``os.pwrite`` is one syscall and may write SHORT (NFS rsize/wsize,
    signal interruption, >2 GiB buffers) — loop until every byte lands,
    like buffered ``fh.write`` does."""
    view = memoryview(raw)
    done = 0
    while done < len(raw):
        n = os.pwrite(fd, view[done:], at + done)
        if n <= 0:
            raise OSError(f"pwrite returned {n} at offset {at + done}")
        done += n


def copy_staged(
    spark: SparkSession, path: str,
    triples: "list[tuple[str, int, int]]", what: str,
) -> None:
    """Distributed copy of staged files into ``path``: ``triples`` =
    [(staged file, target offset, expected nbytes)] — metadata scale.
    Verifies per-file sizes and the total copied count; ``what`` names
    the unit ("chunks"/"tiles") in errors."""
    if not triples:
        return

    def copy_parts(pdfs):
        fd = os.open(path, os.O_WRONLY)
        n = 0
        try:
            for pdf in pdfs:
                for fn, at, nb in zip(pdf["file"], pdf["addr"],
                                      pdf["nbytes"]):
                    with open(str(fn), "rb") as f:
                        raw = f.read()
                    if len(raw) != int(nb):
                        raise ValueError(
                            f"staged file {fn} is {len(raw)} bytes, "
                            f"manifest says {int(nb)}")
                    _pwrite_all(fd, raw, int(at))
                    n += 1
        finally:
            os.close(fd)
        yield pd.DataFrame({"n": [n]})

    pairs = spark.createDataFrame(
        triples, "file string, addr long, nbytes long")
    par = spark.sparkContext.defaultParallelism
    wrote = (pairs.repartition(min(par, len(triples)))
             .mapInPandas(copy_parts, "n long")
             .agg(F.sum("n").alias("n")).collect()[0]["n"])
    if wrote != len(triples):
        raise ValueError(
            f"staged copy wrote {wrote} {what}, expected {len(triples)}")
