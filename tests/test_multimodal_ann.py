"""Multimodal plumbing + report operator tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gsearch_spark.operators.multimodal import (decode_resize_thumbnails,
                                                extract_features,
                                                sample_video_frames)
from gsearch_spark.operators.report import (best_hit, knn_adjacency,
                                            topk_neighbors)


@pytest.fixture(scope="module")
def images(spark, small_fixture_dir):
    return spark.read.parquet(f"{small_fixture_dir}/images.parquet")


def test_thumbnails(spark, images):
    from gsearch_spark.codec import decode_image
    out = decode_resize_thumbnails(images, size=16)
    rows = out.limit(5).collect()
    assert len(rows) == 5
    for r in rows:
        px = decode_image(r["thumb"])
        assert px.shape == (16, 16, 3)
        assert 0.0 <= r["mean_luma"] <= 255.0


def test_features_deterministic(spark, images):
    f1 = {r["image_id"]: r["feat"]
          for r in extract_features(images.limit(20), dim=64).collect()}
    f2 = {r["image_id"]: r["feat"]
          for r in extract_features(images.limit(20).repartition(3),
                                    dim=64).collect()}
    assert f1.keys() == f2.keys()
    for k in f1:
        assert np.allclose(f1[k], f2[k])
        assert len(f1[k]) == 64


def test_video_stub_raises(spark):
    videos = spark.createDataFrame([("v1", b"\x00\x01")],
                                   "video_id string, bytes binary")
    with pytest.raises(Exception, match="ffmpeg|NotImplementedError"):
        sample_video_frames(videos).collect()


def test_report_operators(spark):
    edges = spark.createDataFrame(
        [("a", "b", "minhash", 45.0, True),
         ("a", "c", "simhash", 50.0, True),
         ("b", "d", "suffix", 42.0, False)],
        "a string, b string, src string, psnr double, caption_eq boolean")
    top = topk_neighbors(edges, k=2)
    got = {(r["query"], r["rank"]): r["neighbor"] for r in top.collect()}
    assert got[("a", 1)] == "c"      # highest psnr first
    assert got[("a", 2)] == "b"
    assert got[("c", 1)] == "a"      # bidirectional
    adj = {r["query"]: r["neighbors"] for r in knn_adjacency(edges).collect()}
    assert adj["a"] == ["b", "c"]
    bh = {r["query"]: r["neighbor"] for r in best_hit(edges).collect()}
    assert bh["a"] == "c" and bh["d"] == "b"
