"""Single-writer mutation lock: concurrent adds are REFUSED, crashed
writers self-heal, the lock is re-entrant within one process, and the
`unlock` / `compact` CLI maintenance subcommands work end-to-end.

The manifest-based add commit admits exactly one writer by design (the
reference has the same property implicitly: one process owns the
memory-mapped HNSW during ``add``, gsearch src/bin/gsearch.rs:488-505).
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from gsearch_spark.config import PipelineConfig
from gsearch_spark.fs import CheckpointFS
from gsearch_spark.operators.pipeline import (ADD_LOCK, ConcurrentAddError,
                                              NearDupPipeline,
                                              acquire_add_lock,
                                              add_writer_lock,
                                              incremental_add,
                                              release_add_lock)

CFG = PipelineConfig()
CKPT = "/tmp/gsearch_spark_ckpt_lock"


@pytest.fixture(scope="module")
def lock_build(spark, small_fixture_dir):
    """Base build over 80% of the small fixture; the rest is the add."""
    images = spark.read.parquet(f"{small_fixture_dir}/images.parquet")
    ids = sorted(r["image_id"] for r in images.select("image_id").collect())
    cut = ids[int(len(ids) * 0.8)]
    old = images.filter(F.col("image_id") < cut)
    new = images.filter(F.col("image_id") >= cut)
    shutil.rmtree(CKPT, ignore_errors=True)
    NearDupPipeline(spark, CFG, CKPT).run(old, resume=False)
    return {"images": images, "new": new}


def _lock_path() -> str:
    return os.path.join(CKPT, ADD_LOCK)


def _write_lock(pid: int) -> None:
    with open(_lock_path(), "w") as f:
        json.dump({"pid": pid, "host": os.uname().nodename,
                   "ts": 0.0}, f)


def test_live_writer_refused(spark, lock_build):
    """A lock held by a LIVE foreign process refuses the add before any
    state is read (pid 1 is always alive)."""
    _write_lock(1)
    try:
        with pytest.raises(ConcurrentAddError, match="locked by another"):
            incremental_add(spark, CFG, CKPT, lock_build["new"],
                            lock_build["images"])
    finally:
        os.remove(_lock_path())


def test_acquire_is_reentrant_and_released_once(spark, lock_build):
    fs = CheckpointFS(spark, CKPT)
    assert acquire_add_lock(fs, CKPT) is True     # outer takes ownership
    assert acquire_add_lock(fs, CKPT) is False    # same process re-enters
    assert os.path.exists(_lock_path())
    release_add_lock(fs, CKPT)
    assert not os.path.exists(_lock_path())


def test_dead_writer_self_heals_under_enclosing_lock(spark, lock_build):
    """A crash residue lock (dead same-host pid) must NOT wedge the
    build: the next add breaks it and proceeds.  The add runs inside an
    enclosing add_writer_lock (the CLI/streaming shape), covering the
    re-entrant path end-to-end; the lock is gone once the outer context
    exits, and the add's results are the rebuilt-from-scratch clusters."""
    _write_lock(2_000_000_000)  # pid space max is < 2^31; certainly dead
    with add_writer_lock(spark, CKPT):
        added = incremental_add(spark, CFG, CKPT, lock_build["new"],
                                lock_build["images"])
        got = {r["image_id"]: r["cluster_id"] for r in added.collect()}
        assert os.path.exists(_lock_path())  # held across the with-block
    assert not os.path.exists(_lock_path())
    assert len(got) == lock_build["images"].count()


def test_unlock_and_compact_cli(spark, lock_build):
    """`unlock` removes a stale lock; `compact` rewrites id_index to one
    latest row per image and subsequent reads still resolve labels."""
    from gsearch_spark.__main__ import main as cli_main
    _write_lock(1)  # live foreign holder: only unlock may remove it
    assert cli_main(["--cores", "8", "unlock", "-b", CKPT]) == 0
    assert not os.path.exists(_lock_path())

    idx = spark.read.parquet(os.path.join(CKPT, "id_index"))
    n_images = idx.select("image_id").distinct().count()
    assert cli_main(["--cores", "8", "compact", "-b", CKPT]) == 0
    spark.catalog.refreshByPath(os.path.join(CKPT, "id_index"))
    after = spark.read.parquet(os.path.join(CKPT, "id_index"))
    assert after.count() == n_images  # one row per image
    assert not os.path.exists(_lock_path())  # compact released its lock
    # labels still resolve identically to the clusters checkpoint
    clusters = spark.read.parquet(os.path.join(CKPT, "clusters"))
    joined = (after.select("image_id", "cluster_id")
              .join(clusters.select("image_id",
                                    F.col("cluster_id").alias("want")),
                    "image_id"))
    assert joined.filter(F.col("cluster_id") != F.col("want")).count() == 0
