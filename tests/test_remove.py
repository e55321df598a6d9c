"""Takedown path (operators/remove.py): after any mix of removes the
clusters table must equal a from-scratch rebuild over the surviving
images — label renames, rep promotion, whole-group death and cluster
SPLITS included — and the add/request surfaces must keep matching
rebuild behavior on top of merge-on-read removal state.

The reference's index is insert-only (src/bin/gsearch.rs:488-505); this
is deliberate beyond-reference surface for the training-data pipeline
(takedown/right-to-be-forgotten), built as the mirror image of the
append path's manifest commit."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from gsearch_spark.codec import encode_image
from gsearch_spark.config import PipelineConfig
from gsearch_spark.operators.pipeline import (NearDupPipeline,
                                              incremental_add,
                                              recover_add_commit)
from gsearch_spark.operators.remove import (read_dead_groups,
                                            read_rep_remap,
                                            read_tombstones, remove_images)
from gsearch_spark.phash import phash64

CFG = PipelineConfig()
IMG_SCHEMA = ("image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")


def _assign(df) -> dict:
    return {r["image_id"]: r["cluster_id"] for r in df.collect()}


def _clusters(spark, ckpt) -> dict:
    return _assign(spark.read.parquet(f"{ckpt}/clusters")
                   .select("image_id", "cluster_id"))


def _rebuild(spark, images, ckpt) -> dict:
    shutil.rmtree(ckpt, ignore_errors=True)
    return _assign(NearDupPipeline(spark, CFG, ckpt)
                   .run(images, resume=False))


def _row(image_id: str, pixels: np.ndarray, caption: str):
    data = encode_image(pixels, "png")
    h, w = pixels.shape[:2]
    return (image_id, bytearray(data), w, h, "png", caption,
            phash64(pixels))


def _pixels(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def removal_build(spark, small_fixture_dir):
    """Fixture build + a removal batch covering the three removal
    shapes: a non-rep member, a founding rep with surviving exact-dup
    members, and one whole (small) cluster."""
    images = spark.read.parquet(f"{small_fixture_dir}/images.parquet")
    ckpt = "/tmp/gsearch_spark_ckpt_remove"
    shutil.rmtree(ckpt, ignore_errors=True)
    NearDupPipeline(spark, CFG, ckpt).run(images, resume=False)
    groups = spark.read.parquet(f"{ckpt}/exact_groups")
    clusters = spark.read.parquet(f"{ckpt}/clusters")
    nonrep = [r[0] for r in groups
              .filter(F.col("image_id") != F.col("rep_id"))
              .select("image_id").orderBy("image_id").limit(1).collect()]
    rep = [r[0] for r in groups.groupBy("rep_id")
           .agg(F.count(F.lit(1)).alias("n")).filter("n >= 2")
           .select("rep_id").orderBy("rep_id").limit(1).collect()]
    # a whole small cluster (2-4 members), disjoint from the picks above
    rows = (clusters.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.collect_list("image_id").alias("m"))
            .filter("n between 2 and 4").orderBy("cluster_id")
            .limit(3).collect())
    picked = set(nonrep + rep)
    whole_members: "list[str]" = []
    for r in rows:
        if not (set(r["m"]) & picked):
            whole_members = sorted(r["m"])
            break
    rm_ids = sorted(set(nonrep + rep + whole_members))
    assert nonrep and rep and whole_members, (nonrep, rep, whole_members)
    rm = spark.createDataFrame([(i,) for i in rm_ids], "image_id string")
    remove_images(spark, CFG, ckpt, rm)
    return {"images": images, "ckpt": ckpt, "rm_ids": rm_ids,
            "rep_removed": rep[0]}


def test_remove_matches_rebuild_on_survivors(spark, removal_build):
    b = removal_build
    surv = b["images"].join(
        spark.createDataFrame([(i,) for i in b["rm_ids"]],
                              "image_id string"), "image_id", "left_anti")
    want = _rebuild(spark, surv, "/tmp/gsearch_spark_ckpt_remove_truth")
    got = _clusters(spark, b["ckpt"])
    assert got == want
    assert not set(b["rm_ids"]) & set(got)


def test_remove_sidecars_recorded(spark, removal_build):
    b = removal_build
    tomb = {r["image_id"] for r in
            read_tombstones(spark, b["ckpt"]).collect()}
    assert tomb == set(b["rm_ids"])
    remap = {r["old_rep"]: r["new_rep"] for r in
             read_rep_remap(spark, b["ckpt"]).collect()}
    # the removed founding rep with survivors points at its minimum
    # surviving member
    assert b["rep_removed"] in remap
    groups = spark.read.parquet(f"{b['ckpt']}/exact_groups")
    members = sorted(r["image_id"] for r in groups
                     .filter(F.col("rep_id") == b["rep_removed"])
                     .collect() if r["image_id"] not in set(b["rm_ids"]))
    assert remap[b["rep_removed"]] == members[0]


def test_remove_refusals(spark, removal_build):
    b = removal_build
    with pytest.raises(ValueError, match="unknown image_ids"):
        remove_images(spark, CFG, b["ckpt"], spark.createDataFrame(
            [("no_such_id",)], "image_id string"))
    with pytest.raises(ValueError, match="already removed"):
        remove_images(spark, CFG, b["ckpt"], spark.createDataFrame(
            [(b["rm_ids"][0],)], "image_id string"))


def test_request_after_remove_remaps_and_excludes(spark, removal_build):
    """A probe identical to a tombstoned-but-surviving group's content
    must come back pointing at the promoted surviving member; no
    tombstoned id may appear in any answer."""
    from gsearch_spark.operators.request import request
    b = removal_build
    remap = {r["old_rep"]: r["new_rep"] for r in
             read_rep_remap(spark, b["ckpt"]).collect()}
    promoted = remap[b["rep_removed"]]
    probe_src = (b["images"]
                 .filter(F.col("image_id") == b["rep_removed"])
                 .select(F.lit("q_probe").alias("image_id"), "bytes",
                         "caption", "phash"))
    ans = request(spark, b["ckpt"], probe_src, k=5,
                  max_distance=0.6).collect()
    assert ans, "probe found nothing"
    targets = [r["target_id"] for r in ans]
    assert not (set(targets) & set(b["rm_ids"])), targets
    assert targets[0] == promoted or promoted in targets, (targets,
                                                           promoted)


def test_remove_splits_cluster(spark):
    """Bridge removal: a--b near-dup (caption containment), b--c
    near-dup, a--c NOT a dup (incompatible captions) — all three share
    pixels so LSH proposes every pair, verify accepts only the chain.
    Removing b's whole group must SPLIT {a,b,c} into {a}, {c}, exactly
    like a rebuild on the survivors."""
    px = _pixels(7)
    rows = [_row("s_a", px, "red cat"),
            _row("s_b", px, "red cat on mat"),
            _row("s_c", px, "on mat"),
            _row("s_d", _pixels(8), "something else entirely")]
    images = spark.createDataFrame(rows, IMG_SCHEMA)
    ckpt = "/tmp/gsearch_spark_ckpt_split"
    shutil.rmtree(ckpt, ignore_errors=True)
    before = _assign(NearDupPipeline(spark, CFG, ckpt)
                     .run(images, resume=False))
    assert before["s_a"] == before["s_b"] == before["s_c"] == "s_a"
    out = remove_images(spark, CFG, ckpt, spark.createDataFrame(
        [("s_b",)], "image_id string"))
    got = _assign(out)
    want = _rebuild(spark,
                    images.filter(F.col("image_id") != "s_b"),
                    "/tmp/gsearch_spark_ckpt_split_truth")
    assert got == want
    assert got["s_a"] == "s_a" and got["s_c"] == "s_c"
    assert got["s_a"] != got["s_c"], "cluster did not split"


def test_add_after_remove_matches_rebuild(spark, small_fixture_dir):
    """Append after takedown: the add must neither resurrect removed
    content nor lose near-dup edges to groups whose founding rep was
    tombstoned (probe pairs remap to the promoted member)."""
    images = spark.read.parquet(f"{small_fixture_dir}/images.parquet")
    ids = sorted(r["image_id"] for r in images.select("image_id")
                 .collect())
    cut = ids[int(len(ids) * 0.8)]
    base = images.filter(F.col("image_id") < cut)
    later = images.filter(F.col("image_id") >= cut)
    ckpt = "/tmp/gsearch_spark_ckpt_rm_add"
    shutil.rmtree(ckpt, ignore_errors=True)
    NearDupPipeline(spark, CFG, ckpt).run(base, resume=False)
    groups = spark.read.parquet(f"{ckpt}/exact_groups")
    rep = [r[0] for r in groups.groupBy("rep_id")
           .agg(F.count(F.lit(1)).alias("n")).filter("n >= 2")
           .select("rep_id").orderBy("rep_id").limit(1).collect()]
    nonrep = [r[0] for r in groups
              .filter(F.col("image_id") != F.col("rep_id"))
              .filter(~F.col("image_id").isin(rep))
              .select("image_id").orderBy("image_id").limit(2).collect()]
    rm_ids = sorted(set(rep + nonrep))
    rm = spark.createDataFrame([(i,) for i in rm_ids], "image_id string")
    remove_images(spark, CFG, ckpt, rm)
    surv_base = base.join(rm, "image_id", "left_anti")
    all_after = surv_base.unionByName(later)
    got = _assign(incremental_add(spark, CFG, ckpt, later, all_after))
    want = _rebuild(spark, all_after, "/tmp/gsearch_spark_ckpt_rm_add_t")
    assert got == want


def test_dead_group_content_readds_fresh(spark):
    """Removing a group's last member kills the group; re-adding
    byte-and-caption-identical content under a NEW id must build a
    fresh group (no resurrection through the lingering ck_index row),
    while re-using the REMOVED id stays refused."""
    px = _pixels(21)
    images = spark.createDataFrame(
        [_row("d_a", px, "dead content"),
         _row("d_b", _pixels(22), "bystander row")], IMG_SCHEMA)
    ckpt = "/tmp/gsearch_spark_ckpt_dead"
    shutil.rmtree(ckpt, ignore_errors=True)
    NearDupPipeline(spark, CFG, ckpt).run(images, resume=False)
    remove_images(spark, CFG, ckpt, spark.createDataFrame(
        [("d_a",)], "image_id string"))
    assert [r["rep_id"] for r in
            read_dead_groups(spark, ckpt).collect()] == ["d_a"]
    reborn = spark.createDataFrame([_row("d_new", px, "dead content")],
                                   IMG_SCHEMA)
    surv = images.filter(F.col("image_id") != "d_a")
    got = _assign(incremental_add(spark, CFG, ckpt, reborn,
                                  surv.unionByName(reborn)))
    assert got == {"d_b": "d_b", "d_new": "d_new"}
    # id reuse is refused forever (lineage discipline)
    with pytest.raises(ValueError, match="already in the build"):
        incremental_add(spark, CFG, ckpt,
                        spark.createDataFrame([_row("d_a", px, "x")],
                                              IMG_SCHEMA),
                        surv.unionByName(reborn).unionByName(
                            spark.createDataFrame([_row("d_a", px, "x")],
                                                  IMG_SCHEMA)))


def test_remove_commit_crash_rolls_forward(spark, monkeypatch):
    """Kill the remove mid-commit (first clusters-partition swap
    rename); recover_add_commit must roll the manifest forward to the
    exact state of an uninterrupted remove."""
    from gsearch_spark.fs import CheckpointFS
    px1, px2 = _pixels(31), _pixels(32)
    rows = [_row("c_a", px1, "crash cap"), _row("c_b", px1, "crash cap"),
            _row("c_c", px2, "other")]
    images = spark.createDataFrame(rows, IMG_SCHEMA)
    clean, crash = ("/tmp/gsearch_spark_ckpt_rmc_clean",
                    "/tmp/gsearch_spark_ckpt_rmc_crash")
    for ckpt in (clean, crash):
        shutil.rmtree(ckpt, ignore_errors=True)
        NearDupPipeline(spark, CFG, ckpt).run(images, resume=False)
    rm = spark.createDataFrame([("c_a",)], "image_id string")
    remove_images(spark, CFG, clean, rm)

    real_rename = CheckpointFS.rename
    calls = {"n": 0}

    def exploding(self, src, dst):
        calls["n"] += 1
        if calls["n"] == 1 and "/clusters/pbucket=" in str(src):
            raise RuntimeError("injected crash mid-remove-commit")
        return real_rename(self, src, dst)

    monkeypatch.setattr(CheckpointFS, "rename", exploding)
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            remove_images(spark, CFG, crash, rm)
    finally:
        monkeypatch.setattr(CheckpointFS, "rename", real_rename)
    assert recover_add_commit(spark, crash) is True
    assert _clusters(spark, crash) == _clusters(spark, clean)
    assert ({r["image_id"] for r in read_tombstones(spark, crash)
             .collect()}
            == {r["image_id"] for r in read_tombstones(spark, clean)
                .collect()})
    # and the healed build keeps mutating normally
    out = remove_images(spark, CFG, crash, spark.createDataFrame(
        [("c_c",)], "image_id string"))
    assert _assign(out) == {"c_b": "c_b"}


def test_purge_restores_zero_removal_build(spark, removal_build):
    """After purge_removed the build must BEHAVE byte-identically to one
    that never held the removed rows: sidecars gone, no tombstoned id in
    any stage table, promoted reps re-keyed (is_rep restored), and a
    subsequent add still equals a rebuild."""
    from gsearch_spark.operators.keyidx import (lookup_id_index,
                                                read_edge_index)
    from gsearch_spark.operators.remove import (has_removals,
                                                purge_removed)
    b = removal_build
    ckpt = b["ckpt"]
    before = _clusters(spark, ckpt)
    remap = {r["old_rep"]: r["new_rep"] for r in
             read_rep_remap(spark, ckpt).collect()}
    stats = purge_removed(spark, CFG, ckpt)
    assert stats["tombstones_purged"] == len(b["rm_ids"])
    assert not has_removals(spark, ckpt)
    assert _clusters(spark, ckpt) == before  # purge never moves clusters
    rm_set = set(b["rm_ids"])
    for name, col in (("exact_groups", "image_id"),
                      ("signatures", "image_id"), ("bands", "image_id"),
                      ("ck_index", "rep_id")):
        vals = {r[0] for r in spark.read.parquet(f"{ckpt}/{name}")
                .select(col).distinct().collect()}
        assert not (vals & rm_set), (name, vals & rm_set)
    ei = read_edge_index(spark, f"{ckpt}/edge_index")
    for col in ("a", "b"):
        vals = {r[0] for r in ei.select(col).distinct().collect()}
        assert not (vals & rm_set), ("edge_index", col)
    # promoted rep carries is_rep again and owns its group in the index
    promoted = remap[b["rep_removed"]]
    probe = spark.createDataFrame([(promoted,)], "image_id string")
    row = lookup_id_index(spark, f"{ckpt}/id_index", probe, CFG).collect()
    assert row and row[0]["is_rep"] and row[0]["rep_id"] == promoted
    # purge is idempotent / re-runnable
    assert purge_removed(spark, CFG, ckpt)["tombstones_purged"] == 0


def test_add_and_request_after_purge_match_rebuild(spark,
                                                   small_fixture_dir):
    """End-to-end lifecycle: build -> remove (incl. a whole group and a
    rep with survivors) -> purge -> add; clusters equal a rebuild and a
    request against the purged+added build returns the same answers as
    against the rebuild."""
    from gsearch_spark.operators.remove import purge_removed
    from gsearch_spark.operators.request import request
    images = spark.read.parquet(f"{small_fixture_dir}/images.parquet")
    ids = sorted(r["image_id"] for r in images.select("image_id")
                 .collect())
    cut = ids[int(len(ids) * 0.8)]
    base = images.filter(F.col("image_id") < cut)
    later = images.filter(F.col("image_id") >= cut)
    ckpt = "/tmp/gsearch_spark_ckpt_purge_add"
    shutil.rmtree(ckpt, ignore_errors=True)
    NearDupPipeline(spark, CFG, ckpt).run(base, resume=False)
    groups = spark.read.parquet(f"{ckpt}/exact_groups")
    rep = [r[0] for r in groups.groupBy("rep_id")
           .agg(F.count(F.lit(1)).alias("n")).filter("n >= 2")
           .select("rep_id").orderBy("rep_id").limit(1).collect()]
    solo = [r[0] for r in groups.groupBy("rep_id")
            .agg(F.count(F.lit(1)).alias("n")).filter("n = 1")
            .select("rep_id").orderBy("rep_id").limit(1).collect()]
    rm_ids = sorted(set(rep + solo))
    rm = spark.createDataFrame([(i,) for i in rm_ids], "image_id string")
    remove_images(spark, CFG, ckpt, rm)
    purge_removed(spark, CFG, ckpt)
    surv = base.join(rm, "image_id", "left_anti")
    all_after = surv.unionByName(later)
    got = _assign(incremental_add(spark, CFG, ckpt, later, all_after))
    truth_ckpt = "/tmp/gsearch_spark_ckpt_purge_add_t"
    want = _rebuild(spark, all_after, truth_ckpt)
    assert got == want
    probes = (all_after.orderBy("image_id").limit(8)
              .select(F.concat(F.lit("q_"), "image_id").alias("image_id"),
                      "bytes", "caption", "phash"))
    def _ans(ck):
        return sorted((r["query_id"], r["target_id"], r["rank"])
                      for r in request(spark, ck, probes, k=3,
                                       max_distance=0.6).collect())
    assert _ans(ckpt) == _ans(truth_ckpt)
