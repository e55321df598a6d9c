"""CheckpointFS adapter + pipeline-under-URI-root tests.

The checkpoint discipline must behave identically whether the root is a
plain local path or a filesystem URI (the production case is hdfs:// or
s3a:// — file:/ is the URI scheme this sandbox can actually exercise).
"""

from __future__ import annotations

import shutil

import pytest

from gsearch_spark.config import PipelineConfig
from gsearch_spark.fs import CheckpointFS
from gsearch_spark.operators.pipeline import NearDupPipeline

ROOT = "/tmp/gsearch_spark_fs_test"


def test_checkpointfs_primitives(spark):
    shutil.rmtree(ROOT, ignore_errors=True)
    fs = CheckpointFS(spark, f"file:{ROOT}")
    assert not fs.exists(f"file:{ROOT}/a")
    fs.mkdirs(f"file:{ROOT}/a")
    assert fs.exists(f"file:{ROOT}/a")
    fs.write_text(f"file:{ROOT}/a/x.json", '{"k": 1}')
    assert fs.read_text(f"file:{ROOT}/a/x.json") == '{"k": 1}'
    fs.rename(f"file:{ROOT}/a", f"file:{ROOT}/b")
    assert fs.exists(f"file:{ROOT}/b/x.json")
    assert not fs.exists(f"file:{ROOT}/a")
    fs.delete(f"file:{ROOT}/b")
    assert not fs.exists(f"file:{ROOT}/b")


def test_pipeline_under_file_uri_with_reliable_cc(spark, small_fixture_dir):
    """Full pipeline with a file:/ URI checkpoint root and Parquet-based
    CC lineage cuts == the plain-path localCheckpoint run, row for row."""
    shutil.rmtree(f"{ROOT}_plain", ignore_errors=True)
    shutil.rmtree(f"{ROOT}_uri", ignore_errors=True)
    images = spark.read.parquet(f"{small_fixture_dir}/images.parquet")

    plain = NearDupPipeline(spark, PipelineConfig(),
                            f"{ROOT}_plain").run(images, resume=False)
    cfg = PipelineConfig(cc_reliable_checkpoints=True)
    uri = NearDupPipeline(spark, cfg,
                          f"file:{ROOT}_uri").run(images, resume=False)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, uri.collect()))
    assert a == b

    # mixed-config refusal must work through the FS path too
    with pytest.raises(ValueError, match="different pipeline config"):
        NearDupPipeline(spark, PipelineConfig(caption_kgram=4),
                        f"file:{ROOT}_uri").run(images, resume=True)
