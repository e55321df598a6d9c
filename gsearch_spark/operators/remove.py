"""Takedown / GDPR-delete path: remove images from a stored build.

The reference's index is insert-only (``add`` appends to the persisted
HNSW, src/bin/gsearch.rs:488-505; there is no delete), but a web-scale
training-data pipeline cannot be: copyright takedowns and
right-to-be-forgotten requests arrive daily and must leave the CLUSTER
ASSIGNMENTS — this engine's product — exactly as if the removed images
had never been ingested.  This module adds that operation Spark-first,
as the mirror image of the append path:

* **merge-on-read, not rewrite** (the Iceberg delete-file analog):
  corpus-sized stages (signatures, bands, exact_groups, ck_index, the
  verified_edges checkpoint) are NOT rewritten per remove.  Three small
  sidecars carry the delete state instead —

  ``tombstones``  (image_id, gen), hive-partitioned on
      ``tb = xxhash64(image_id) % key_buckets``: every removed image.
  ``dead_groups``  (rep_id, gen), flat: founding group nodes whose
      exact-content group lost its LAST member; the add path's
      ck-membership probe and request's candidate probe veto these so
      fully-removed content reads as fresh / gone.
  ``rep_remap``  (old_rep, new_rep, gen), flat, latest ``gen`` wins:
      founding reps that are themselves tombstoned while their group
      survives, mapped to the group's minimum surviving member.  The
      stored signatures/bands stay keyed by the founding node (the
      surviving member is byte-and-caption identical, so they remain
      VALID); consumers translate at the edges — request remaps its
      answers, the add path remaps probe pairs — and
      :func:`purge_removed`-style compaction re-keys physically.

* **only clusters are eagerly correct**: the affected clusters are
  recomputed and their pbucket partitions rewritten under partition
  pruning (same Iceberg partition-MERGE analog as the append path).
  Removing a non-rep member can at most rename a cluster label (min
  surviving member); removing a founding rep whose group survives
  changes NOTHING about connectivity (survivors are content-identical,
  every verified edge transfers); only a group's LAST member dying can
  SPLIT a cluster — recomputed from the ``edge_index`` sidecar under
  partition pruning, O(affected), never a corpus scan.

* **same single-writer lock + manifest commit** as the append path:
  every delta is staged, then committed via the identical
  roll-forward-recoverable manifest protocol (``recover_add_commit``
  completes a torn remove exactly as it completes a torn add).

Parity contract (pinned by tests/test_remove.py): after any sequence of
builds, adds and removes, the clusters table equals a from-scratch
rebuild over the surviving images — including label renames and splits.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from gsearch_spark.config import PipelineConfig

TOMBSTONES = "tombstones"
DEAD_GROUPS = "dead_groups"
REP_REMAP = "rep_remap"

TOMBSTONE_SCHEMA = "image_id string, gen int, tb int"
DEAD_SCHEMA = "rep_id string, gen int"
REMAP_SCHEMA = "old_rep string, new_rep string, gen int"


# ------------------------------------------------------- sidecar readers

def _read_or_empty(spark: SparkSession, checkpoint_dir: str, name: str,
                   schema: str) -> DataFrame:
    """Explicit-schema read; a build with no removes yet has no sidecar
    — read as empty instead of failing (and instead of inferring, which
    an all-empty partitioned table cannot support)."""
    path = f"{checkpoint_dir}/{name}"
    from gsearch_spark.fs import CheckpointFS
    if not CheckpointFS(spark, path).exists(path):
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(path)


def read_tombstones(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    return _read_or_empty(spark, checkpoint_dir, TOMBSTONES,
                          TOMBSTONE_SCHEMA)


def read_dead_groups(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    return _read_or_empty(spark, checkpoint_dir, DEAD_GROUPS, DEAD_SCHEMA)


def read_rep_remap(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """(old_rep, new_rep): the RESOLVED remap — latest generation wins
    per founding rep (a promoted survivor removed by a later batch gets
    a fresh row at a higher gen)."""
    raw = _read_or_empty(spark, checkpoint_dir, REP_REMAP, REMAP_SCHEMA)
    return (raw.groupBy("old_rep")
            .agg(F.max_by("new_rep", "gen").alias("new_rep")))


def count_tombstones(spark: SparkSession, checkpoint_dir: str) -> int:
    return read_tombstones(spark, checkpoint_dir).count()


def has_removals(spark: SparkSession, checkpoint_dir: str) -> bool:
    """Cheap gate so the zero-removal fast paths keep their exact
    pre-remove plans (no extra joins when the sidecars don't exist)."""
    from gsearch_spark.fs import CheckpointFS
    path = f"{checkpoint_dir}/{TOMBSTONES}"
    return CheckpointFS(spark, path).exists(path)


# tables the purge pass swaps atomically (and whose torn swaps every
# mutation entry point heals before touching the build)
SWAP_TABLES = ("exact_groups", "signatures", "bands", "candidate_pairs",
               "verified_edges", "edge_index", "ck_index", "id_index")


def recover_all_swaps(fs, checkpoint_dir: str) -> bool:
    """Heal any torn staged-table swap (purge / id_index compaction)
    across every swappable table — a handful of existence probes when
    nothing is torn.  Called at the start of every add, remove and
    purge."""
    from gsearch_spark.operators.keyidx import recover_table_swap
    hit = False
    for name in SWAP_TABLES:
        hit = recover_table_swap(fs, f"{checkpoint_dir}/{name}") or hit
    return hit


# --------------------------------------------------------------- removal

def remove_images(spark: SparkSession, cfg: PipelineConfig,
                  checkpoint_dir: str, remove_ids: DataFrame) -> DataFrame:
    """Remove the given image_ids from the build (single-column
    DataFrame ``image_id``).  Refuses unknown and already-removed ids.
    Returns the post-remove clusters table.  Holds the build's
    single-writer mutation lock; commit is manifest-protected and
    crash-roll-forward-recoverable (shared with the append path)."""
    from gsearch_spark.operators.pipeline import (NearDupPipeline,
                                                  acquire_add_lock,
                                                  release_add_lock)
    pipe = NearDupPipeline(spark, cfg, checkpoint_dir)
    lock_owner = acquire_add_lock(pipe.fs, checkpoint_dir)
    try:
        return _remove_locked(spark, cfg, checkpoint_dir, remove_ids, pipe)
    finally:
        if lock_owner:
            release_add_lock(pipe.fs, checkpoint_dir)


def _remove_locked(spark: SparkSession, cfg: PipelineConfig,
                   checkpoint_dir: str, remove_ids: DataFrame,
                   pipe) -> DataFrame:
    from gsearch_spark.operators.cc import connected_components, union_find
    from gsearch_spark.operators.keyidx import (lookup_edges_among,
                                                lookup_id_index,
                                                stage_id_append)
    from gsearch_spark.operators.pipeline import (ADD_MANIFEST, ID_GEN_FILE,
                                                  _apply_add_commit,
                                                  recover_add_commit)

    cfg.assert_matches_via(pipe.fs, checkpoint_dir)
    recover_add_commit(spark, checkpoint_dir)
    recover_all_swaps(pipe.fs, checkpoint_dir)
    id_path = pipe._path("id_index")
    edge_path = pipe._path("edge_index")
    if not (pipe.fs.exists(f"{id_path}/_SUCCESS")
            and pipe.fs.exists(f"{edge_path}/_SUCCESS")):
        raise ValueError(
            "checkpoint predates key-addressed lookup layouts (no "
            "id_index/edge_index); rebuild with tohnsw first")
    id_idx_df = spark.read.parquet(id_path)
    clusters_stored = spark.read.parquet(pipe._path("clusters"))

    from gsearch_spark.operators.pipeline import _run_parallel
    rm = remove_ids.select("image_id").distinct().localCheckpoint()
    n_rm = rm.count()
    if n_rm == 0:
        return clusters_stored.select("image_id", "cluster_id")

    # -- resolve + refuse: every id must exist and not be removed
    #    already.  The two refusal probes are independent small jobs and
    #    run concurrently (guide §2.6)
    def _lk_info():
        t0 = time.time()
        info = lookup_id_index(spark, id_path, rm, cfg,
                               idx_df=id_idx_df).localCheckpoint()
        pipe._record("rm_lookup_ids", info, t0, skipped=False)
        return info, next(r for r in pipe.records
                          if r.stage == "rm_lookup_ids").rows_out

    def _chk_already():
        already = rm.join(read_tombstones(spark, checkpoint_dir),
                          "image_id", "left_semi")
        return None if already.isEmpty() else \
            [r[0] for r in already.limit(5).collect()]

    (info, n_info), already_ids = _run_parallel(_lk_info, _chk_already)
    if n_info != n_rm:
        missing = rm.join(info.select("image_id"), "image_id", "left_anti")
        raise ValueError(
            "remove_images: unknown image_ids (not in this build), e.g. "
            f"{[r[0] for r in missing.limit(5).collect()]}")
    if already_ids is not None:
        raise ValueError(
            "remove_images: ids already removed, e.g. "
            f"{already_ids}")

    # tombstone staging needs only the (already-checkpointed) rm list
    # and the next generation number — start it NOW on a side thread so
    # it overlaps the whole members/CC/delta chain below (guide §2.6)
    from gsearch_spark.operators.pipeline import _spawn
    staging = pipe._path("_add_staging")
    pipe.fs.delete(staging)
    gen_file = os.path.join(checkpoint_dir, ID_GEN_FILE)
    new_gen = (int(pipe.fs.read_text(gen_file))
               if pipe.fs.exists(gen_file) else 0) + 1

    def _st_tomb():
        (rm.withColumn("gen", F.lit(new_gen))
         .withColumn("tb", F.pmod(F.xxhash64("image_id"),
                                  F.lit(cfg.key_buckets)).cast("int"))
         .repartition(1)
         .write.mode("overwrite").partitionBy("tb")
         .parquet(f"{staging}/{TOMBSTONES}"))

    tomb_future = _spawn(_st_tomb)

    # -- affected clusters: members read under pbucket pruning ----------
    def _pb(col: str) -> "F.Column":
        return F.pmod(F.xxhash64(col), F.lit(cfg.cluster_buckets)) \
                .cast("int")

    t0 = time.time()
    if n_rm <= cfg.add_lookup_max_literals:
        # the affected-label set is bounded by the remove batch: ONE
        # collect resolves the labels AND their bucket set (instead of
        # a localCheckpoint job + a buckets-only collect job)
        aff_rows = (info.select("cluster_id").distinct()
                    .select("cluster_id", _pb("cluster_id").alias("pb"))
                    .collect())
        aff_buckets = sorted({r["pb"] for r in aff_rows})
        aff = spark.createDataFrame([(r["cluster_id"],) for r in aff_rows],
                                    schema="cluster_id string")
    else:
        aff = info.select("cluster_id").distinct().localCheckpoint()
        aff_buckets = sorted(r[0] for r in
                             aff.select(_pb("cluster_id").alias("pb"))
                             .distinct().collect())
    members = (clusters_stored
               .filter(F.col("pbucket").isin(aff_buckets))
               .join(F.broadcast(aff), "cluster_id")
               .select("image_id", "cluster_id").localCheckpoint())
    # founding group node of every affected member: pruned point lookup,
    # O(affected members) — never a scan of exact_groups
    minfo = (lookup_id_index(spark, id_path, members.select("image_id"),
                             cfg, idx_df=id_idx_df)
             .select("image_id", "rep_id"))
    mem = members.join(minfo, "image_id").localCheckpoint()
    pipe._record("rm_members", mem, t0, skipped=False)

    # PREFETCH the dedup-graph edge read (guide §2.6): the surviving
    # nodes are a subset of ALL affected founding nodes, which are known
    # the moment mem lands — so the pruned edge_index lookup runs on a
    # side thread over the affected-node superset, overlapping the
    # survivor cut and the sidecar chain; the CC step below restricts
    # to edges with BOTH endpoints surviving, which is exactly
    # lookup(surviving nodes) since surviving ⊆ affected.
    def _edges_prefetch():
        all_nodes = (mem.select(F.col("rep_id").alias("a")).distinct()
                     .localCheckpoint())
        return lookup_edges_among(spark, edge_path, all_nodes,
                                  cfg).localCheckpoint()

    edges_future = _spawn(_edges_prefetch)

    surv = mem.join(rm, "image_id", "left_anti").localCheckpoint()
    # cut once: surv_groups serves the sidecar chain's anti-join AND
    # both broadcast build sides of the CC edge restriction below —
    # lazy, the distinct would recompute per consumer (3x)
    surv_groups = surv.select("rep_id").distinct().localCheckpoint()

    # the dead-group / rep-remap sidecar chain consumes only mem + surv
    # (both checkpointed) — nothing from the CC recompute — so the whole
    # chain INCLUDING its staging writes runs on a side thread under the
    # edge-lookup/CC/delta work below (guide §2.6)
    def _st_sidecars():
        gone_groups = (mem.join(rm, "image_id", "left_semi")
                       .select("rep_id").distinct()
                       .join(surv_groups, "rep_id", "left_anti")
                       .localCheckpoint())
        # remap refresh: every surviving group whose FOUNDING rep is not
        # among the survivors points at its minimum surviving member
        # (also re-points groups remapped by earlier batches whose
        # target just died — the recompute is total over the affected
        # slice)
        founders_alive = (surv.filter(F.col("image_id") == F.col("rep_id"))
                          .select("rep_id"))
        remap_delta = (surv.groupBy("rep_id")
                       .agg(F.min("image_id").alias("new_rep"))
                       .join(founders_alive, "rep_id", "left_anti")
                       .select(F.col("rep_id").alias("old_rep"),
                               "new_rep"))
        if not gone_groups.isEmpty():
            (gone_groups.withColumn("gen", F.lit(new_gen)).repartition(1)
             .write.mode("overwrite").parquet(f"{staging}/{DEAD_GROUPS}"))
        if not remap_delta.isEmpty():
            (remap_delta.withColumn("gen", F.lit(new_gen)).repartition(1)
             .write.mode("overwrite").parquet(f"{staging}/{REP_REMAP}"))

    sidecars_future = _spawn(_st_sidecars)

    # -- connectivity: CC over surviving group nodes ---------------------
    # (a dying group's edges vanish — only then can a cluster split; the
    # edge read was prefetched over the affected-node superset above and
    # is restricted here to both-endpoints-surviving — identical to
    # looking up the surviving nodes directly)
    t0 = time.time()
    e_sup = edges_future.result()
    sn_a = surv_groups.withColumnRenamed("rep_id", "a")
    sn_b = surv_groups.withColumnRenamed("rep_id", "b")
    edges = (e_sup.join(F.broadcast(sn_a), "a", "left_semi")
             .join(F.broadcast(sn_b), "b", "left_semi")
             .localCheckpoint())
    pipe._record("rm_cc_edges", edges, t0, skipped=False)
    n_edges = pipe.records[-1].rows_out
    if n_edges <= cfg.add_cc_local_max_edges:
        mapping = union_find([(r["a"], r["b"]) for r in edges.collect()])
        roots_df = spark.createDataFrame(
            sorted(mapping.items()), schema="rep_id string, root string")
    else:
        roots_df = (connected_components(edges)
                    .select(F.col("image_id").alias("rep_id"),
                            F.col("cluster_id").alias("root"))
                    .localCheckpoint())
    t0 = time.time()
    relab = (surv.select("image_id", "rep_id")
             .join(F.broadcast(roots_df), "rep_id", "left")
             .withColumn("root", F.coalesce("root", "rep_id")))
    norm = relab.groupBy("root").agg(F.min("image_id").alias("cluster_id"))
    delta = (relab.join(F.broadcast(norm), "root")
             .select("image_id", "cluster_id").localCheckpoint())
    pipe._record("rm_clusters", delta, t0, skipped=False)

    # -- stage the remaining deltas, then the shared manifest commit.
    #    Tombstones and the dead-group/remap sidecars have been staging
    #    on side threads since their inputs were cut; the clusters
    #    rewrite and id_index delta run CONCURRENTLY here (guide §2.6)
    def _st_clusters():
        t0 = time.time()
        delta_buckets = {r[0] for r in
                         delta.select(_pb("cluster_id").alias("pb"))
                         .distinct().collect()}
        touched = sorted(set(aff_buckets) | delta_buckets)
        kept = (clusters_stored.filter(F.col("pbucket").isin(touched))
                .join(F.broadcast(aff), "cluster_id", "left_anti")
                .select("image_id", "cluster_id"))
        (kept.unionByName(delta)
         .withColumn("pbucket", _pb("cluster_id"))
         .repartition(max(len(touched), 1), F.col("pbucket"))
         .write.mode("overwrite").partitionBy("pbucket")
         .parquet(f"{staging}/clusters"))
        # explicit schema: a remove that kills every cluster in its
        # touched buckets stages an EMPTY dir, which inference cannot
        # read
        staged_clusters = (spark.read
                           .schema("image_id string, cluster_id string, "
                                   "pbucket int")
                           .parquet(f"{staging}/clusters"))
        pipe._record("rm_clusters_rewrite", staged_clusters, t0,
                     skipped=False)
        present = {r[0] for r in staged_clusters.select("pbucket")
                   .distinct().collect()}
        return {str(p): bool(p in present) for p in touched}

    def _st_id():
        # id_index delta: survivors at their new label; removed ids at
        # a NULL label (the dead marker — membership/tombstone-ness
        # lives in the tombstones table, label resolution of a removed
        # id is null)
        null_s = F.lit(None).cast("string")
        id_delta = (delta
                    .withColumn("is_rep", F.lit(False))
                    .withColumn("rep_id", null_s)
                    .unionByName(rm.select("image_id",
                                           null_s.alias("cluster_id"),
                                           F.lit(False).alias("is_rep"),
                                           null_s.alias("rep_id"))))
        stage_id_append(id_delta, new_gen, staging, cfg)

    swap, _ = _run_parallel(_st_clusters, _st_id)
    tomb_future.result()      # staged since the refusal checks passed
    sidecars_future.result()  # staged since surv was cut

    manifest = {"version": 2, "staging": staging,
                "append_stages": [DEAD_GROUPS, REP_REMAP],
                "partitioned_appends": ["id_index", TOMBSTONES],
                "id_index_gen": new_gen,
                "clusters_swap": swap}
    mpath = os.path.join(checkpoint_dir, ADD_MANIFEST)
    pipe.fs.write_text(mpath, json.dumps(manifest))
    _apply_add_commit(pipe.fs, checkpoint_dir, manifest)
    pipe.fs.delete(mpath)

    # post-commit housekeeping overlaps (same shape as the add path):
    # staging wipe ∥ lineage flush ∥ file-status cache refresh
    def _refresh():
        for name in ("clusters", "id_index", TOMBSTONES, DEAD_GROUPS,
                     REP_REMAP):
            spark.catalog.refreshByPath(pipe._path(name))

    _run_parallel(lambda: pipe.fs.delete(staging),
                  pipe._flush_state,
                  _refresh)
    return (spark.read.parquet(pipe._path("clusters"))
            .select("image_id", "cluster_id"))


# ----------------------------------------------------------------- purge

def purge_removed(spark: SparkSession, cfg: PipelineConfig,
                  checkpoint_dir: str) -> dict:
    """Physically apply the merge-on-read removal state — the Iceberg
    rewrite-data-files half of the delete lifecycle.  Rewrites every
    corpus-sized stage dropping dead-group rows and re-keying remapped
    founding reps to their promoted surviving members, rebuilds id_index
    from the purged clusters+groups (restoring is_rep for promoted
    reps), then drops the three sidecars.  After a purge the build is
    byte-level indistinguishable in BEHAVIOR from one that never held
    the removed rows: adds, requests and reports run their exact
    zero-removal plans again.

    Crash-safety: each table swap is individually atomic (staged write
    + the two-rename protocol of ``keyidx.recover_table_swap``), the
    pass is idempotent and re-runnable, and the sidecars are deleted
    LAST — a crash anywhere leaves a build that is still correct under
    merge-on-read and a purge that can simply run again.  Readers
    without the writer lock can observe a mid-purge mix of rewritten
    and pending tables (momentarily degraded recall, never resurrected
    ids — the sidecar vetoes stay in force until the final step); run
    it in a maintenance window like any rewrite-data-files job.
    """
    from gsearch_spark.operators.keyidx import (read_edge_index,
                                                swap_table_in)
    from gsearch_spark.operators.pipeline import (NearDupPipeline,
                                                  add_writer_lock,
                                                  recover_add_commit)
    pipe = NearDupPipeline(spark, cfg, checkpoint_dir)
    with add_writer_lock(spark, checkpoint_dir):
        cfg.assert_matches_via(pipe.fs, checkpoint_dir)
        recover_add_commit(spark, checkpoint_dir)
        recover_all_swaps(pipe.fs, checkpoint_dir)
        if not has_removals(spark, checkpoint_dir):
            return {"tombstones_purged": 0, "dead_groups_purged": 0,
                    "reps_rekeyed": 0}
        T = (read_tombstones(spark, checkpoint_dir)
             .select("image_id").localCheckpoint())
        D = (read_dead_groups(spark, checkpoint_dir)
             .select("rep_id").localCheckpoint())
        R = read_rep_remap(spark, checkpoint_dir).localCheckpoint()
        stats = {"tombstones_purged": T.count(),
                 "dead_groups_purged": D.count(),
                 "reps_rekeyed": R.count()}

        def _swap(name: str, df: DataFrame,
                  partition_col: "str | None" = None) -> None:
            path = pipe._path(name)
            tmp = f"{path}__compact"
            if partition_col:
                (df.repartition(cfg.key_buckets, F.col(partition_col))
                 .sortWithinPartitions(df.columns[0])
                 .write.mode("overwrite").partitionBy(partition_col)
                 .parquet(tmp))
            else:
                df.write.mode("overwrite").parquet(tmp)
            swap_table_in(pipe.fs, path, tmp)
            spark.catalog.refreshByPath(path)

        def remap_col(df: DataFrame, col: str) -> DataFrame:
            rr = R.select(F.col("old_rep").alias(col),
                          F.col("new_rep").alias("__nr"))
            return (df.join(F.broadcast(rr), col, "left")
                    .withColumn(col, F.coalesce("__nr", F.col(col)))
                    .drop("__nr"))

        def drop_dead(df: DataFrame, col: str) -> DataFrame:
            return df.join(
                F.broadcast(D.withColumnRenamed("rep_id", col)),
                col, "left_anti")

        def pair_fix(df: DataFrame, extra: "list[str]") -> DataFrame:
            d = remap_col(remap_col(drop_dead(drop_dead(df, "a"), "b"),
                                    "a"), "b")
            return d.select(F.least("a", "b").alias("a"),
                            F.greatest("a", "b").alias("b"), *extra)

        # member-level table: drop tombstoned rows, re-key group reps
        eg = spark.read.parquet(pipe._path("exact_groups"))
        _swap("exact_groups",
              remap_col(eg.join(F.broadcast(T), "image_id", "left_anti"),
                        "rep_id"))
        # rep-keyed tables: dead groups vanish, remapped reps re-key
        # (the promoted member is byte-and-caption identical, so the
        # signature/band/sketch VALUES are already its own)
        sigs = spark.read.parquet(pipe._path("signatures"))
        _swap("signatures", remap_col(drop_dead(sigs, "image_id"),
                                      "image_id"))
        bands = spark.read.parquet(pipe._path("bands"))
        _swap("bands", remap_col(drop_dead(bands, "image_id"),
                                 "image_id"))
        cp = spark.read.parquet(pipe._path("candidate_pairs"))
        _swap("candidate_pairs", pair_fix(cp, ["src"]))
        ve = spark.read.parquet(pipe._path("verified_edges"))
        _swap("verified_edges",
              pair_fix(ve, [c for c in ve.columns if c not in ("a", "b")]))
        ei = read_edge_index(spark, pipe._path("edge_index"))
        ei2 = (pair_fix(ei.select("a", "b"), [])
               .withColumn("eb", F.pmod(F.xxhash64("a"),
                                        F.lit(cfg.key_buckets))
                           .cast("int")))
        _swap("edge_index", ei2, partition_col="eb")
        ck = spark.read.parquet(pipe._path("ck_index"))
        _swap("ck_index",
              remap_col(drop_dead(ck, "rep_id"), "rep_id")
              .select("ck", "rep_id", "kb"), partition_col="kb")
        # id_index: rebuild one gen-0 row per surviving image from the
        # purged clusters+groups (restores is_rep on promoted reps; the
        # generation counter file is untouched, so future mutations'
        # deltas still win lookups)
        eg2 = spark.read.parquet(pipe._path("exact_groups"))
        clusters = (spark.read.parquet(pipe._path("clusters"))
                    .select("image_id", "cluster_id"))
        flags = eg2.select("image_id",
                           (F.col("image_id") == F.col("rep_id"))
                           .alias("is_rep"), "rep_id")
        idx = (clusters.join(flags, "image_id")
               .withColumn("gen", F.lit(0))
               .withColumn("ib", F.pmod(F.xxhash64("image_id"),
                                        F.lit(cfg.key_buckets))
                           .cast("int")))
        _swap("id_index", idx, partition_col="ib")
        # sidecars go LAST: until here every reader stayed correct under
        # merge-on-read; after, the zero-removal fast paths re-engage
        for name in (TOMBSTONES, DEAD_GROUPS, REP_REMAP):
            pipe.fs.delete(pipe._path(name))
            spark.catalog.refreshByPath(pipe._path(name))
        return stats
