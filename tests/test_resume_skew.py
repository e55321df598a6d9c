"""Resume-from-checkpoint semantics + hot-band skew handling."""

from __future__ import annotations

import dataclasses
import os
import shutil

import pytest
from pyspark.sql import functions as F

from gsearch_spark.config import PipelineConfig
from gsearch_spark.generator import KIND_SKEW, make_plan, write_fixture_local
from gsearch_spark.operators.banding import build_bands
from gsearch_spark.operators.candidates import bucket_stats, emit_bucket_pairs
from gsearch_spark.operators.pipeline import NearDupPipeline
from gsearch_spark.operators.signatures import compute_signatures

CFG = PipelineConfig()
CKPT = "/tmp/gsearch_spark_ckpt_resume"


def _assign(df):
    return {r["image_id"]: r["cluster_id"] for r in df.collect()}


def test_resume_after_kill_is_byte_identical(spark, small_fixture_dir):
    """Kill after any stage boundary; resume must produce identical
    clusters (north_rule resumability; reference add-mode reload,
    gsearch src/dna/dnasketch.rs:106-134)."""
    shutil.rmtree(CKPT, ignore_errors=True)
    images = spark.read.parquet(f"{small_fixture_dir}/images.parquet")
    full = _assign(NearDupPipeline(spark, CFG, CKPT).run(images))

    # simulate a kill after the bands stage: drop every later checkpoint
    for stage in ("candidate_pairs", "verified_edges", "clusters"):
        shutil.rmtree(os.path.join(CKPT, stage), ignore_errors=True)
    pipe2 = NearDupPipeline(spark, CFG, CKPT)
    resumed = _assign(pipe2.run(images, resume=True))
    assert resumed == full
    skipped = {r.stage for r in pipe2.records if r.skipped}
    assert {"signatures", "bands"} <= skipped


def test_resume_refuses_config_mismatch(spark, small_fixture_dir):
    """parameters.json discipline: different config hash must refuse
    (gsearch src/bin/gsearch.rs:714-742)."""
    images = spark.read.parquet(f"{small_fixture_dir}/images.parquet")
    other = dataclasses.replace(CFG, caption_kgram=7)
    with pytest.raises(ValueError, match="different pipeline config"):
        NearDupPipeline(spark, other, CKPT).run(images, resume=True)


def _bomb_ids(n_base: int, seed: int, skew_fraction: float) -> "list[str]":
    plan = make_plan(n_base, seed=seed, skew_fraction=skew_fraction)
    return [f"img_{i:08d}" for i in range(plan.n_total)
            if plan.kind[i] == KIND_SKEW]


@pytest.fixture(scope="module")
def skew_fixture_dir():
    """Bench-style adversarial fixture: 20% identical black images
    (stronger than FIXTURES.md's 10% bench profile, to force salting)."""
    out = "/tmp/gsearch_spark_fixtures/skew_1000"
    if not os.path.exists(os.path.join(out, "images.parquet")):
        shutil.rmtree(out, ignore_errors=True)
        write_fixture_local(out, n_base=1000, seed=43, skew_fraction=0.20)
    return out


def test_hot_buckets_are_salted(spark, skew_fixture_dir):
    """Skew bombs (identical signature) must be split into sub-buckets and
    pair volume stays near-linear in the group size, not quadratic."""
    images = spark.read.parquet(f"{skew_fixture_dir}/images.parquet")
    sigs = compute_signatures(images, CFG)
    bands = build_bands(sigs, CFG)
    stats = bucket_stats(bands).collect()[0]
    # 200 identical skew bombs; salting must split their buckets
    n_bomb = 200
    assert stats["max_bucket"] < n_bomb
    assert stats["n_star_policy"] > 0  # star policy active, and logged
    pairs = emit_bucket_pairs(bands).cache()
    bomb_ids = _bomb_ids(1000, 43, 0.20)
    assert len(bomb_ids) == n_bomb
    skew_pairs = pairs.filter(F.col("a").isin(bomb_ids)
                              & F.col("b").isin(bomb_ids)).count()
    clique = n_bomb * (n_bomb - 1) / 2
    # star policy: O(m * bands), far below the m^2/2 clique
    assert skew_pairs < clique / 2, (skew_pairs, clique)
    assert skew_pairs >= n_bomb - 1  # still spanning-connected material
    pairs.unpersist()


def test_skew_cluster_stays_connected(spark, skew_fixture_dir):
    """Salting must not split the skew-bomb component (cross-band salt
    diversity keeps it spanning-connected)."""
    images = spark.read.parquet(f"{skew_fixture_dir}/images.parquet")
    ckpt = "/tmp/gsearch_spark_ckpt_skew"
    shutil.rmtree(ckpt, ignore_errors=True)
    clusters = NearDupPipeline(spark, CFG, ckpt).run(images, resume=False)
    skew_ids = _bomb_ids(1000, 43, 0.20)
    assign = _assign(clusters)
    skew_clusters = {assign[i] for i in skew_ids}
    assert len(skew_clusters) == 1, f"skew split into {len(skew_clusters)}"
