"""t1-scale (1000 base rows, FIXTURES.md smoke profile) oracle gate."""

from __future__ import annotations

import shutil

import pyarrow.parquet as pq
import pytest

from gsearch_spark.config import PipelineConfig
from gsearch_spark.operators.pipeline import NearDupPipeline
from gsearch_spark.oracle import (cluster_pair_recall, oracle_clusters,
                                  oracle_pairs_bruteforce)

CFG = PipelineConfig()
CKPT = "/tmp/gsearch_spark_ckpt_t1"


@pytest.fixture(scope="module")
def t1_rows(t1_fixture_dir):
    return pq.read_table(f"{t1_fixture_dir}/images.parquet").to_pylist()


def test_t1_recall_and_precision(spark, t1_fixture_dir, t1_rows):
    shutil.rmtree(CKPT, ignore_errors=True)
    images = spark.read.parquet(f"{t1_fixture_dir}/images.parquet")
    clusters = NearDupPipeline(spark, CFG, CKPT).run(images, resume=False)
    assign = {r["image_id"]: r["cluster_id"] for r in clusters.collect()}
    assert len(assign) == len(t1_rows)

    oracle_p = oracle_pairs_bruteforce(t1_rows, CFG)
    assert len(oracle_p) > 100  # fixture really contains dups
    recall = cluster_pair_recall(assign, oracle_p)
    assert recall >= 0.99, f"t1 recall {recall:.4f} < 0.99"

    # precision: pipeline clusters refine oracle components
    oracle_assign = oracle_clusters([r["image_id"] for r in t1_rows],
                                    oracle_p)
    by_cluster: "dict[str, set]" = {}
    for img, cid in assign.items():
        by_cluster.setdefault(cid, set()).add(oracle_assign[img])
    bad = {c: roots for c, roots in by_cluster.items() if len(roots) > 1}
    assert not bad, f"over-merged clusters: {list(bad)[:3]}"

    truth = pq.read_table(
        f"{t1_fixture_dir}/truth_pairs.parquet").to_pylist()
    planted = {(p["a"], p["b"]) for p in truth}
    per_kind: "dict[str, list]" = {}
    for p in truth:
        ok = assign[p["a"]] == assign[p["b"]]
        per_kind.setdefault(p["kind"], []).append(ok)
    summary = {k: f"{sum(v)}/{len(v)}" for k, v in per_kind.items()}
    assert cluster_pair_recall(assign, planted) >= 0.99, summary
