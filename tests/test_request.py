"""Build-vs-probe ``request`` API vs a brute-force numpy oracle.

The reference's request semantics (gsearch ``src/dna/dnarequest.rs``):
sketch new queries with the stored config, probe the stored index, return
per-query top-k by sketch distance under a threshold.  The oracle here
recomputes the SAME sketch distances exhaustively (every query x every
indexed item) and the probe must agree.
"""

from __future__ import annotations

import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from gsearch_spark.config import PipelineConfig
from gsearch_spark.operators.pipeline import NearDupPipeline
from gsearch_spark.operators.request import request
from gsearch_spark.oracle import oracle_minhash

CFG = PipelineConfig()
CKPT = "/tmp/gsearch_spark_ckpt_request"
K = 3
MAX_DIST = 0.6


@pytest.fixture(scope="module")
def rows(small_fixture_dir):
    return pq.read_table(f"{small_fixture_dir}/images.parquet").to_pylist()


@pytest.fixture(scope="module")
def built(spark, small_fixture_dir):
    shutil.rmtree(CKPT, ignore_errors=True)
    images = spark.read.parquet(f"{small_fixture_dir}/images.parquet")
    NearDupPipeline(spark, CFG, CKPT).run(images, resume=False)
    return CKPT


@pytest.fixture(scope="module")
def query_rows(rows):
    # every 7th row, re-identified — probes whose exact content IS indexed
    return [dict(r, image_id="q_" + r["image_id"]) for r in rows[::7]]


@pytest.fixture(scope="module")
def query_df(spark, query_rows):
    return spark.createDataFrame(
        [(r["image_id"], r["bytes"], r["caption"], r["phash"])
         for r in query_rows],
        schema="image_id string, bytes binary, caption string, phash bigint")


def _oracle_topk(query_rows, index_rows, k, max_dist):
    """Exhaustive sketch-distance top-k with the request's exact rules:
    phash-Hamming prefilter, dist = 1 - slot-agreement, tie-break on
    target_id."""
    q_mh = oracle_minhash(
        np.array([r["phash"] for r in query_rows], dtype=np.int64),
        [r["caption"] for r in query_rows], CFG).view(np.int64)
    t_mh = oracle_minhash(
        np.array([r["phash"] for r in index_rows], dtype=np.int64),
        [r["caption"] for r in index_rows], CFG).view(np.int64)
    q_ph = np.array([r["phash"] for r in query_rows],
                    dtype=np.int64).view(np.uint64)
    t_ph = np.array([r["phash"] for r in index_rows],
                    dtype=np.int64).view(np.uint64)
    out = {}
    for qi, q in enumerate(query_rows):
        ham = np.array([bin(int(q_ph[qi] ^ t)).count("1") for t in t_ph])
        eq = (t_mh == q_mh[qi]).sum(axis=1)
        dist = np.round(1.0 - np.round(eq / CFG.sketch_size, 6), 6)
        cands = [(float(dist[ti]), index_rows[ti]["image_id"])
                 for ti in range(len(index_rows))
                 if ham[ti] <= CFG.prefilter_max_phash_hamming
                 and dist[ti] <= max_dist]
        cands.sort()
        out[q["image_id"]] = cands[:k]
    return out


def test_request_matches_oracle(spark, built, rows, query_rows, query_df):
    got = request(spark, built, query_df, k=K, max_distance=MAX_DIST)
    by_query: "dict[str, list]" = {}
    for r in sorted(got.collect(), key=lambda r: (r["query_id"], r["rank"])):
        by_query.setdefault(r["query_id"], []).append(
            (r["distance"], r["target_id"]))
    want = _oracle_topk(query_rows, rows, K, MAX_DIST)

    # every query's exact-content source is indexed => oracle top-1 has
    # distance 0.0 and identical signatures guarantee band candidacy:
    # top-1 must agree exactly (distance AND target id)
    for q, truth in want.items():
        assert truth and truth[0][0] == 0.0, f"{q}: fixture assumption broke"
        assert q in by_query, f"{q}: no answers returned"
        assert by_query[q][0] == truth[0], (
            f"{q}: top-1 {by_query[q][0]} != oracle {truth[0]}")

    # full top-k: the LSH probe may miss borderline candidates that share
    # no band; demand >= 0.9 pair recall overall (observed 1.0 locally)
    truth_pairs = {(q, t) for q, tk in want.items() for _, t in tk}
    got_pairs = {(q, t) for q, tk in by_query.items() for _, t in tk}
    recall = len(got_pairs & truth_pairs) / len(truth_pairs)
    assert recall >= 0.9, f"top-{K} pair recall {recall:.3f}"


def test_request_deterministic(spark, built, query_df):
    a = sorted(map(tuple, request(spark, built, query_df, k=K,
                                  max_distance=MAX_DIST).collect()))
    b = sorted(map(tuple, request(spark, built, query_df, k=K,
                                  max_distance=MAX_DIST,
                                  broadcast_probe=False).collect()))
    assert a == b  # same answers with and without the broadcast plan


def test_request_refuses_mismatched_config(spark, built, query_df):
    other = PipelineConfig(caption_kgram=4)
    with pytest.raises(ValueError, match="does not match"):
        request(spark, built, query_df, cfg=other)


def test_request_sketches_probes_once(spark, built, query_df):
    """The probe decode+sketch UDF must appear ZERO times in the answer
    plan: compute_signatures runs once at the localCheckpoint cut, and
    both consumers (band explode, answer ranking) read the checkpointed
    blocks — without the cut the plan contained the MapInPandas node
    twice and the expensive probe sketch executed once per consumer."""
    answers = request(spark, built, query_df, k=K, max_distance=MAX_DIST)
    plan = answers._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan, plan[:2000]
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


def test_request_answers_carry_ani(spark, built, query_df):
    """Reformat-analog columns (gsearch src/bin/reformat.rs:80-86):
    ANI model 1 = (1+ln(2j/(1+j))/k)*100, model 2 = (2j/(1+j))^(1/k)*100,
    k = caption_kgram; exact-content top-1 answers (j=1) give ANI 100."""
    import math
    got = request(spark, built, query_df, k=K,
                  max_distance=MAX_DIST).collect()
    assert got
    k = CFG.caption_kgram
    for r in got:
        j = r["j_est"]
        if j > 0:
            want1 = round((1.0 + math.log(2 * j / (1 + j)) / k) * 100.0, 6)
            want2 = round((2 * j / (1 + j)) ** (1.0 / k) * 100.0, 6)
            assert abs(r["ani"] - want1) < 1e-6, (r["ani"], want1)
            assert abs(r["ani_m2"] - want2) < 1e-6
        if r["rank"] == 1 and r["distance"] == 0.0:
            assert r["ani"] == 100.0 and r["ani_m2"] == 100.0


def test_probe_candidates_viral_bucket_cap(spark):
    """Viral-bucket guard: with max_bucket_probe set, a probe landing in
    a huge stored bucket joins only the capped xxhash64-ordered heads —
    never the whole bucket — while small buckets match in full and the
    default (None) stays exact."""
    from gsearch_spark.operators.request import probe_candidates
    stored = spark.createDataFrame(
        [(1, 777, 0, f"v_{i:05d}") for i in range(500)]     # viral
        + [(2, 888, 0, f"s_{i}") for i in range(3)],        # small
        schema="band_id int, band_hash bigint, salt int, image_id string")
    probe = spark.createDataFrame(
        [("q1", 1, 777), ("q1", 2, 888)],
        schema="image_id string, band_id int, band_hash bigint")

    exact = probe_candidates(probe, stored)
    assert exact.count() == 503

    capped = probe_candidates(probe, stored, max_bucket_probe=16)
    got = {r["target_id"] for r in capped.collect()}
    ranked = spark.createDataFrame(
        [(f"v_{i:05d}",) for i in range(500)], schema="image_id string")
    heads = {r["image_id"] for r in ranked.selectExpr(
        "image_id", "xxhash64(image_id) AS h")
        .orderBy("h", "image_id").limit(16).collect()}
    assert got == heads | {f"s_{i}" for i in range(3)}


def test_default_cap_recall_neutral_and_exact_here(spark, built, query_df,
                                                   query_rows):
    """The production default (PipelineConfig.max_bucket_probe=1024,
    applied when request() gets max_bucket_probe=None) must (a) be
    recall-neutral at fixture scale — answers identical to forced-exact
    — and (b) keep every re-identified probe's distance-0 duplicate as
    its rank-1 answer even under a far tighter cap (the bounded-heads
    policy leaves >= cap members per touched bucket across every band
    family, so a true byte-identical duplicate stays reachable)."""
    assert CFG.max_bucket_probe == 1024  # documented production default

    def key(rows):
        return sorted((r["query_id"], r["target_id"], r["rank"],
                       r["distance"]) for r in rows)

    default = request(spark, built, query_df, k=K,
                      max_distance=MAX_DIST).collect()
    exact = request(spark, built, query_df, k=K, max_distance=MAX_DIST,
                    max_bucket_probe=0).collect()
    assert key(default) == key(exact) and default

    tight = request(spark, built, query_df, k=K, max_distance=MAX_DIST,
                    max_bucket_probe=8).collect()
    top1 = {r["query_id"]: r for r in tight if r["rank"] == 1}
    for q in query_rows:
        orig = q["image_id"][2:]  # strip the re-identifying "q_" prefix
        r = top1[q["image_id"]]
        assert r["distance"] == 0.0, (q["image_id"], r)
        # the distance-0 hit may be the original's exact-group REP
        # (byte-identical content collapses upstream), so assert on
        # distance, and on identity when the original is its own rep
        if r["target_id"] != orig:
            assert r["j_est"] == 1.0
