"""`ann` subcommand analog (operators/graphstats.py) vs brute-force
numpy oracles: the k-NN sketch graph, hubness moments, and the 2-D
spectral layout's semantics (neighbors embed close; disconnected
components separate; deterministic across runs).

Reference anchors: k-NN graph + stats + hubness src/utils/embed.rs:14-32,
embedding :34-70, CLI wiring src/bin/gsearch.rs:784-852."""

from __future__ import annotations

import itertools
import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from gsearch_spark.config import PipelineConfig
from gsearch_spark.operators.graphstats import (KNN_K, graph_stats,
                                                hubness_histogram,
                                                knn_sketch_graph,
                                                spectral_embed2d)
from gsearch_spark.operators.pipeline import NearDupPipeline

CFG = PipelineConfig()
CKPT = "/tmp/gsearch_spark_ckpt_graphstats"


@pytest.fixture(scope="module")
def built(spark, small_fixture_dir):
    if not os.path.exists(os.path.join(CKPT, "clusters", "_SUCCESS")):
        shutil.rmtree(CKPT, ignore_errors=True)
        images = spark.read.parquet(f"{small_fixture_dir}/images.parquet")
        NearDupPipeline(spark, CFG, CKPT).run(images, resume=False)
    return CKPT


@pytest.fixture(scope="module")
def oracle_knn(spark, built):
    """Brute-force numpy k-NN over the same candidates + signatures."""
    sigs = {r["image_id"]: np.array(r["minhash"], dtype=np.int64)
            for r in spark.read.parquet(f"{built}/signatures")
            .select("image_id", "minhash").collect()}
    pairs = [(r["a"], r["b"]) for r in
             spark.read.parquet(f"{built}/candidate_pairs")
             .select("a", "b").collect()]
    nbrs: "dict[str, list[tuple[float, str]]]" = {}
    for a, b in pairs:
        d = float((sigs[a] != sigs[b]).sum()) / CFG.sketch_size
        nbrs.setdefault(a, []).append((d, b))
        nbrs.setdefault(b, []).append((d, a))
    knn = {}
    for s, lst in nbrs.items():
        knn[s] = sorted(lst)[:KNN_K]
    return {"sigs": sigs, "knn": knn}


def test_knn_graph_matches_numpy(spark, built, oracle_knn):
    got = {}
    for r in knn_sketch_graph(spark, built, CFG.sketch_size).collect():
        got.setdefault(r["src"], []).append(
            (r["rank"], r["dst"], r["dist"]))
    want = oracle_knn["knn"]
    assert set(got) == set(want)
    for s in got:
        got_ranked = [(d, t) for _, t, d in sorted(got[s])]
        assert got_ranked == want[s], s


def test_graph_stats_match_numpy(spark, built, oracle_knn):
    row = graph_stats(spark, built, CFG.sketch_size).collect()[0]
    knn = oracle_knn["knn"]
    n_nodes = len(oracle_knn["sigs"])
    indeg = {i: 0 for i in oracle_knn["sigs"]}
    for s, lst in knn.items():
        for _, t in lst:
            indeg[t] += 1
    x = np.array(sorted(indeg.values()), dtype=np.float64)
    mu, m2 = x.mean(), ((x - x.mean()) ** 2).mean()
    m3 = ((x - x.mean()) ** 3).mean()
    d1 = np.array([lst[0][0] for lst in knn.values()])
    assert row["n_nodes"] == n_nodes
    assert row["n_edges"] == sum(len(v) for v in knn.values())
    assert row["n_sources"] == len(knn)
    assert row["max_indeg"] == int(x.max())
    assert abs(row["hubness_s3"] - m3 / m2 ** 1.5) < 1e-9
    assert row["d1_min"] == d1.min() and row["d1_max"] == d1.max()
    assert abs(row["d1_avg"] - d1.mean()) < 1e-12
    assert abs(row["d1_median"] - float(np.percentile(d1, 50))) < 1e-12
    hist = {r["in_degree"]: r["n_nodes"] for r in
            hubness_histogram(spark, built, CFG.sketch_size).collect()}
    want_hist: "dict[int, int]" = {}
    for v in indeg.values():
        want_hist[v] = want_hist.get(v, 0) + 1
    assert hist == want_hist


def test_embed2d_semantics(spark, built):
    """The layout must (a) cover every node with finite unit-scaled
    coords, (b) be deterministic across runs, and (c) place k-NN
    neighbors closer together than random pairs (the reference's
    edge-length quality estimate, embed.rs:69)."""
    emb = {r["image_id"]: (r["x"], r["y"])
           for r in spectral_embed2d(spark, built,
                                     CFG.sketch_size).collect()}
    n_nodes = spark.read.parquet(f"{built}/signatures").count()
    assert len(emb) == n_nodes
    assert all(np.isfinite(v).all() for v in map(np.array, emb.values()))

    emb2 = {r["image_id"]: (r["x"], r["y"])
            for r in spectral_embed2d(spark, built,
                                      CFG.sketch_size).collect()}
    for k in emb:
        assert emb[k] == pytest.approx(emb2[k], abs=1e-9), k

    knn = knn_sketch_graph(spark, built, CFG.sketch_size).collect()
    edge_d = [np.hypot(emb[r["src"]][0] - emb[r["dst"]][0],
                       emb[r["src"]][1] - emb[r["dst"]][1]) for r in knn]
    rng = np.random.default_rng(7)
    ids = sorted(emb)
    rand_d = [np.hypot(emb[a][0] - emb[b][0], emb[a][1] - emb[b][1])
              for a, b in zip(rng.choice(ids, 2000), rng.choice(ids, 2000))
              if a != b]
    assert np.mean(edge_d) < 0.5 * np.mean(rand_d), \
        (np.mean(edge_d), np.mean(rand_d))


def test_embed2d_separates_components(spark):
    """Two disjoint cliques must separate along a coordinate: build a
    tiny synthetic checkpoint (signatures + candidate_pairs parquet)
    and check the layout splits it."""
    root = "/tmp/gsearch_graphstats_cliques"
    shutil.rmtree(root, ignore_errors=True)
    mh_a = list(range(CFG.sketch_size))
    mh_b = [x + 7 for x in range(CFG.sketch_size)]
    rows = ([(f"a{i}", mh_a) for i in range(6)]
            + [(f"b{i}", mh_b) for i in range(6)])
    spark.createDataFrame(rows, "image_id string, minhash array<bigint>") \
        .write.parquet(f"{root}/signatures")
    pairs = ([(f"a{i}", f"a{j}", "t") for i, j in
              itertools.combinations(range(6), 2)]
             + [(f"b{i}", f"b{j}", "t") for i, j in
                itertools.combinations(range(6), 2)])
    spark.createDataFrame(pairs, "a string, b string, src string") \
        .write.parquet(f"{root}/candidate_pairs")
    emb = {r["image_id"]: (r["x"], r["y"])
           for r in spectral_embed2d(spark, root,
                                     CFG.sketch_size).collect()}
    assert len(emb) == 12
    # some coordinate must linearly separate the two cliques
    for dim in (0, 1):
        a_vals = sorted(emb[f"a{i}"][dim] for i in range(6))
        b_vals = sorted(emb[f"b{i}"][dim] for i in range(6))
        if a_vals[-1] < b_vals[0] or b_vals[-1] < a_vals[0]:
            break
    else:
        pytest.fail(f"cliques not separated: {emb}")
