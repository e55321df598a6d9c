"""Fixture generator + brute-force oracle tests (no Spark)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from gsearch_spark.codec import decode_image, psnr
from gsearch_spark.config import PipelineConfig
from gsearch_spark.generator import (KIND_NAMES, _vocab, generate_row,
                                     make_plan)
from gsearch_spark.oracle import (cluster_pair_recall, oracle_clusters,
                                  oracle_minhash, oracle_pairs_bruteforce,
                                  verify_pair_np)
from gsearch_spark.shingles import normalize_caption

CFG = PipelineConfig()


@pytest.fixture(scope="module")
def rows(small_fixture_dir):
    tbl = pq.read_table(f"{small_fixture_dir}/images.parquet")
    return tbl.to_pylist()


@pytest.fixture(scope="module")
def truth(small_fixture_dir):
    pairs = pq.read_table(f"{small_fixture_dir}/truth_pairs.parquet").to_pylist()
    negs = pq.read_table(
        f"{small_fixture_dir}/truth_negatives.parquet").to_pylist()
    clusters = pq.read_table(
        f"{small_fixture_dir}/truth_clusters.parquet").to_pylist()
    return pairs, negs, clusters


def test_generator_deterministic():
    plan = make_plan(50, seed=42)
    vocab = _vocab(42)
    r1 = generate_row(7, int(plan.kind[7]), int(plan.src[7]), 42, vocab)
    r2 = generate_row(7, int(plan.kind[7]), int(plan.src[7]), 42, vocab)
    assert r1["bytes"] == r2["bytes"] and r1["phash"] == r2["phash"]


def test_fixture_shape(rows):
    assert len(rows) > 300
    ids = [r["image_id"] for r in rows]
    assert len(set(ids)) == len(ids)
    for r in rows[:5]:
        px = decode_image(r["bytes"])
        assert px.shape == (r["h"], r["w"], 3)


def test_planted_pairs_satisfy_invariant(rows, truth):
    """Every planted dup pair passes the per-row verification invariant;
    every hard negative fails it (the BASELINE.json input_hint contract)."""
    pairs, negs, _ = truth
    by_id = {r["image_id"]: r for r in rows}
    for p in pairs:
        a, b = by_id[p["a"]], by_id[p["b"]]
        ok, db, cap_ok = verify_pair_np(a["bytes"], b["bytes"],
                                        a["caption"], b["caption"],
                                        a["fmt"], b["fmt"], CFG)
        assert ok, (p, db, cap_ok)
        if p["kind"] in ("reencoded", "neardup"):
            assert db >= CFG.psnr_min_db
    for p in negs:
        a, b = by_id[p["a"]], by_id[p["b"]]
        ok, db, cap_ok = verify_pair_np(a["bytes"], b["bytes"],
                                        a["caption"], b["caption"],
                                        a["fmt"], b["fmt"], CFG)
        assert not ok and cap_ok  # same caption, pixels reject


def test_oracle_pairs_cover_planted(rows, truth):
    pairs, negs, _ = truth
    found = oracle_pairs_bruteforce(rows, CFG)
    planted = {(min(p["a"], p["b"]), max(p["a"], p["b"])) for p in pairs}
    missing = planted - found
    assert not missing, f"oracle missed planted pairs: {sorted(missing)[:5]}"
    neg_pairs = {(min(p["a"], p["b"]), max(p["a"], p["b"])) for p in negs}
    assert not (neg_pairs & found)


def test_oracle_clusters_match_truth(rows, truth):
    """Union-find over oracle pairs reproduces planted components."""
    pairs, _, clusters = truth
    found = oracle_pairs_bruteforce(rows, CFG)
    assign = oracle_clusters([r["image_id"] for r in rows], found)
    planted = {(p["a"], p["b"]) for p in pairs}
    assert cluster_pair_recall(assign, planted) == 1.0
    truth_map = {c["image_id"]: c["cluster_id"] for c in clusters}
    # every truth cluster must be (a subset of) one oracle cluster
    for img, cid in truth_map.items():
        assert assign[img] == assign[cid], (img, cid)


def test_minhash_high_jaccard_for_dups(rows, truth):
    """Planted exact/re-encoded dups share >= 90% of minhash slots."""
    pairs, _, _ = truth
    by_id = {r["image_id"]: r for r in rows}
    ph = np.array([r["phash"] for r in rows], dtype=np.int64)
    caps = [r["caption"] for r in rows]
    idx = {r["image_id"]: i for i, r in enumerate(rows)}
    sk = oracle_minhash(ph, caps, CFG)
    for p in pairs:
        if p["kind"] in ("exact", "skew"):
            i, j = idx[p["a"]], idx[p["b"]]
            assert (sk[i] == sk[j]).all(), p
        elif p["kind"] in ("reencoded", "neardup"):
            i, j = idx[p["a"]], idx[p["b"]]
            frac = float(np.mean(sk[i] == sk[j]))
            assert frac >= 0.5, (p, frac)
