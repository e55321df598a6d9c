"""Incremental add: append rows to a built pipeline; clusters must equal
a from-scratch run over the union (reference add-mode semantics)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from gsearch_spark.config import PipelineConfig
from gsearch_spark.operators.pipeline import NearDupPipeline, incremental_add

CFG = PipelineConfig()
CKPT_ADD = "/tmp/gsearch_spark_ckpt_add"
CKPT_FULL = "/tmp/gsearch_spark_ckpt_addfull"


def _assign(df):
    return {r["image_id"]: r["cluster_id"] for r in df.collect()}


def test_incremental_add_matches_full_run(spark, small_fixture_dir):
    images = spark.read.parquet(f"{small_fixture_dir}/images.parquet")
    # split: first 80% of ids are the initial build, last 20% are added;
    # dup rows live at the END of the fixture (generator layout), so the
    # added batch contains duplicates OF old rows -> clusters must merge
    ids = sorted(r["image_id"] for r in images.select("image_id").collect())
    cut = ids[int(len(ids) * 0.8)]
    old = images.filter(F.col("image_id") < cut)
    new = images.filter(F.col("image_id") >= cut)
    assert new.count() > 0 and old.count() > 0

    shutil.rmtree(CKPT_ADD, ignore_errors=True)
    NearDupPipeline(spark, CFG, CKPT_ADD).run(old, resume=False)
    added = _assign(incremental_add(spark, CFG, CKPT_ADD, new, images))

    shutil.rmtree(CKPT_FULL, ignore_errors=True)
    full = _assign(NearDupPipeline(spark, CFG, CKPT_FULL).run(
        images, resume=False))
    assert added == full


def test_incremental_add_refuses_other_config(spark, small_fixture_dir):
    import dataclasses
    images = spark.read.parquet(f"{small_fixture_dir}/images.parquet")
    other = dataclasses.replace(CFG, sketch_size=64, bands=8)
    with pytest.raises(ValueError, match="different pipeline config"):
        incremental_add(spark, other, CKPT_ADD, images, images)
