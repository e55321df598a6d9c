"""IVF coarse-quantizer ANN (operators/ivf.py).

DuckDB hash parity runs in test_entry_parity (ann_ivf_topk is oracled);
here: deterministic training invariants and a planted-cluster recall
test — the property an IVF index must deliver (a tight near-duplicate
cluster maps into one inverted list, so every member's top-1 is an
in-cluster twin at high cosine).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gsearch_spark.operators import ivf  # noqa: E402

DIM = 16
N_CLUSTERS = 8
PER_CLUSTER = 6


def _planted(tmp_path) -> str:
    """8 tight cosine clusters (in-cluster cos > 0.99, cross < ~0.6)."""
    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for c in range(N_CLUSTERS):
        base = rng.normal(size=DIM)
        base /= np.linalg.norm(base)
        for _ in range(PER_CLUSTER):
            v = base + rng.normal(scale=0.01, size=DIM)
            rows.append((vid, v.astype(np.float32).tolist(), c))
            vid += 1
    sf_dir = str(tmp_path / "planted_sf")
    os.makedirs(sf_dir, exist_ok=True)
    tbl = pa.table({
        "vec_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "embedding": pa.array([r[1] for r in rows],
                              type=pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], type=pa.int32()),
    })
    pq.write_table(tbl, os.path.join(sf_dir, "embeddings.parquet"))
    return sf_dir


def test_train_centroids_deterministic_unit_norm():
    rng = np.random.default_rng(3)
    sample = rng.normal(size=(200, DIM))
    c1 = ivf.train_centroids(sample, k=ivf.K_LISTS)
    c2 = ivf.train_centroids(sample.copy(), k=ivf.K_LISTS)
    assert c1.shape == (ivf.K_LISTS, DIM)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-9)


def test_train_centroids_rejects_tiny_sample():
    with pytest.raises(ValueError):
        ivf.train_centroids(np.zeros((3, DIM)), k=ivf.K_LISTS)


def test_ivf_topk_planted_clusters(spark, tmp_path):
    sf_dir = _planted(tmp_path)
    cpath = str(tmp_path / "centroids.parquet")
    res = ivf.q_ann_ivf_topk(spark, sf_dir, centroids_path=cpath).toPandas()
    cluster = {vid: vid // PER_CLUSTER
               for vid in range(N_CLUSTERS * PER_CLUSTER)}
    top1 = res[res["rank"] == 1].set_index("vec_id")
    # every vector found a top-1, it is an in-cluster twin, at high cosine
    assert len(top1) == N_CLUSTERS * PER_CLUSTER
    for vid, row in top1.iterrows():
        assert cluster[vid] == cluster[row.nbr_id], (
            f"vec {vid} top-1 {row.nbr_id} crosses planted clusters")
        assert row.cos_sim > 0.99
    # answer shape: at most TOP_K rows per query, ranks contiguous from 1
    per = res.groupby("vec_id")["rank"].agg(["min", "max", "count"])
    assert (per["min"] == 1).all()
    assert (per["max"] == per["count"]).all()
    assert (per["count"] <= ivf.TOP_K).all()
    # checkpoint reuse: a second run reads the same centroids (no retrain)
    mtime = os.path.getmtime(cpath)
    ivf.q_ann_ivf_topk(spark, sf_dir, centroids_path=cpath).collect()
    assert os.path.getmtime(cpath) == mtime
