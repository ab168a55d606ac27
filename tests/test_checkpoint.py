"""Checkpoint/resume: crash mid-job → resume skips committed chunks; final
result equals the single-shot run; lineage/metrics tables populated."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyramids_spark import synth
from pyramids_spark.checkpoint import CheckpointedJob, key_range_chunks
from pyramids_spark.operators import pip as pip_op


def _job(zones):
    def run(spark, chunk):
        pts = synth.doc_points(spark, chunk["hi"]).where(
            (F.col("key") >= chunk["lo"]) & (F.col("key") < chunk["hi"])
        )
        return pip_op.pip_join(pts, zones, zoom=7).select("key", "zone_id")

    return run


def test_resume_skips_committed_and_matches_single_shot(spark, tmp_path):
    zones = synth.zone_polygons(5, "hex")
    chunks = key_range_chunks(4000, 4)
    job = _job(zones)

    # crash after 2 chunks
    cp = CheckpointedJob(spark, str(tmp_path), "pipjob")
    boom = {"n": 0}

    def crashing(spark_, chunk):
        if boom["n"] >= 2:
            raise RuntimeError("simulated executor loss")
        boom["n"] += 1
        return job(spark_, chunk)

    with pytest.raises(RuntimeError):
        cp.run(chunks, crashing)
    assert len(cp.committed()) == 2

    # resume with the healthy job
    cp2 = CheckpointedJob(spark, str(tmp_path), "pipjob")
    lineage = cp2.run(chunks, job)
    assert len(cp2.committed()) == 4
    assert lineage["0"]["skipped"] and lineage["1"]["skipped"]
    assert not lineage["2"].get("skipped") and not lineage["3"].get("skipped")

    # equals single-shot
    got = cp2.result().toPandas().sort_values(["key", "zone_id"]).reset_index(drop=True)
    pts = synth.doc_points(spark, 4000)
    exp = (
        pip_op.pip_join(pts, zones, zoom=7)
        .select("key", "zone_id")
        .toPandas()
        .sort_values(["key", "zone_id"])
        .reset_index(drop=True)
    )
    assert got.equals(exp)

    # lineage + metrics tables
    ldf = cp2.lineage_df().toPandas()
    assert set(ldf.chunk) == {"0", "1", "2", "3"}
    assert (ldf.rows_out >= 0).all() and (ldf.attempt >= 1).all()
    mdf = cp2.metrics_df().toPandas()
    assert "rows_per_sec" in mdf.columns and len(mdf) == 4

    # snapshot pins the chunk set
    v = cp2.snapshot()
    assert v == 1


def test_rerun_is_idempotent(spark, tmp_path):
    zones = synth.zone_polygons(3, "box")
    chunks = key_range_chunks(1000, 3)
    job = _job(zones)
    cp = CheckpointedJob(spark, str(tmp_path), "j2")
    cp.run(chunks, job)
    n1 = cp.result().count()
    r2 = cp.run(chunks, job)  # all skipped
    assert all(v.get("skipped") for v in r2.values())
    assert cp.result().count() == n1


def test_writer_lock_blocks_second_live_writer(spark, tmp_path):
    import os
    import pytest

    cp = CheckpointedJob(spark, str(tmp_path), "locked")
    # same process re-opening is allowed (resume flow)
    CheckpointedJob(spark, str(tmp_path), "locked")
    # a DIFFERENT live pid holding the lock must be refused
    lock = os.path.join(str(tmp_path), "locked", "_writer.lock")
    with open(lock, "w") as f:
        f.write("1")  # pid 1 is always alive
    with pytest.raises(RuntimeError, match="locked by live writer"):
        CheckpointedJob(spark, str(tmp_path), "locked")
    # stale lock (dead pid) is taken over silently
    with open(lock, "w") as f:
        f.write("999999999")
    CheckpointedJob(spark, str(tmp_path), "locked")
    cp.close()


def test_snapshot_sorts_chunk_ids_numerically(spark, tmp_path):
    import json
    import os

    cp = CheckpointedJob(spark, str(tmp_path), "snapsort")
    for cid in ["2", "10", "1"]:
        cp._commit(cid, {"chunk": cid, "rows_out": 0, "wall_s": 0.0,
                         "attempt": 1, "committed_at": 0.0})
    v = cp.snapshot()
    with open(os.path.join(str(tmp_path), "snapsort", "snapshots", f"v{v}.json")) as f:
        snap = json.load(f)
    assert snap["chunks"] == ["1", "2", "10"]
    cp.close()
