"""End-to-end pipeline with per-stage checkpoints, lineage and resume.

The checkpoint/resume discipline mirrors the reference exactly
(SURVEY §2.1 S6/S7): every stage writes a Parquet checkpoint (analog of
``dumpall``, gsearch ``src/utils/dumpload.rs:15-62``); the pipeline
config is persisted as ``parameters.json`` beside the checkpoints and a
resume with a different config hash REFUSES to run (gsearch
``src/bin/gsearch.rs:714-742``); per-stage/per-partition row counts and
timings land in a ``pipeline_state`` table (analog of
``processing_state.json``, ``src/utils/files.rs:52-110``) including the
reference's sent==received reconciliation invariant
(``src/dna/dnasketch.rs:458-464``).

Stages:  images -> signatures -> bands -> candidate_pairs
                -> verified_edges -> clusters
Resume = skip any stage whose checkpoint already exists under a matching
config hash; kill the job at any boundary and rerun — outputs are
byte-identical (deterministic signatures + min-based CC).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from gsearch_spark.config import PipelineConfig
from gsearch_spark.fs import CheckpointFS
from gsearch_spark.operators.banding import build_bands
from gsearch_spark.operators.candidates import bucket_stats, emit_bucket_pairs
from gsearch_spark.operators.cc import assign_clusters
from gsearch_spark.operators.exact import (exact_groups, expand_clusters,
                                           representatives)
from gsearch_spark.operators.signatures import compute_signatures
from gsearch_spark.operators.suffix import suffix_candidate_pairs
from gsearch_spark.operators.verify import verified_edges

STAGES = ("exact_groups", "signatures", "bands", "candidate_pairs",
          "verified_edges", "clusters")


@dataclass
class StageRecord:
    stage: str
    rows_out: int
    seconds: float
    skipped: bool
    rows_in: int = -1
    t_start: float = 0.0
    t_end: float = 0.0


class NearDupPipeline:
    def __init__(self, spark: SparkSession, cfg: PipelineConfig,
                 checkpoint_dir: str):
        self.spark = spark
        self.cfg = cfg
        self.dir = checkpoint_dir
        # all checkpoint metadata IO goes through the Hadoop FS of the
        # checkpoint root, so file:/, hdfs:// and s3a:// behave the same
        self.fs = CheckpointFS(spark, checkpoint_dir)
        self.records: "list[StageRecord]" = []

    # ------------------------------------------------------------ plumbing

    def _path(self, stage: str) -> str:
        return os.path.join(self.dir, stage)

    def _done(self, stage: str) -> bool:
        return self.fs.exists(os.path.join(self._path(stage), "_SUCCESS"))

    def _write_stage(self, stage: str, df: DataFrame) -> DataFrame:
        path = self._path(stage)
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    def _record(self, stage: str, out: DataFrame, t0: float,
                skipped: bool) -> DataFrame:
        n = out.count()
        rows_in = self.records[-1].rows_out if self.records else -1
        rec = StageRecord(stage, n, time.time() - t0, skipped,
                          rows_in=rows_in, t_start=t0, t_end=time.time())
        self.records.append(rec)
        self._append_state(stage, out, rec)
        return out

    def _append_state(self, stage: str, out: DataFrame,
                      rec: StageRecord) -> None:
        """pipeline_state: per-partition lineage rows (FIXTURES.md §4
        contract: stage, part_id, rows_in, rows_out, t_start, t_end,
        config_hash — the processing_state.json analog, per partition)."""
        per_part = (out.groupBy(F.spark_partition_id().alias("part_id"))
                    .agg(F.count(F.lit(1)).alias("rows_out"))
                    .withColumn("stage", F.lit(stage))
                    .withColumn("rows_in", F.lit(rec.rows_in))
                    .withColumn("t_start",
                                F.timestamp_seconds(F.lit(rec.t_start)))
                    .withColumn("t_end",
                                F.timestamp_seconds(F.lit(rec.t_end)))
                    .withColumn("seconds", F.lit(rec.seconds))
                    .withColumn("skipped", F.lit(rec.skipped))
                    .withColumn("config_hash",
                                F.lit(self.cfg.config_hash()))
                    .select("stage", "part_id", "rows_in", "rows_out",
                            "t_start", "t_end", "seconds", "skipped",
                            "config_hash"))
        per_part.write.mode("append").parquet(
            os.path.join(self.dir, "pipeline_state"))

    # ------------------------------------------------------------ stages

    def run(self, images: DataFrame, resume: bool = True) -> DataFrame:
        self.fs.mkdirs(self.dir)
        params = os.path.join(self.dir, "parameters.json")
        if self.fs.exists(params):
            # reference parameters.json discipline: refuse mixed-config
            self.cfg.assert_matches_via(self.fs, self.dir)
        else:
            self.cfg.dump_via(self.fs, self.dir)

        n_images = images.count()

        # -- stage 0: exact-duplicate collapse (identity short-circuit,
        #    gsearch src/bin/bindash.rs:139-153) ---------------------------
        t0 = time.time()
        if resume and self._done("exact_groups"):
            groups = self.spark.read.parquet(self._path("exact_groups"))
            groups = self._record("exact_groups", groups, t0, skipped=True)
        else:
            groups = self._write_stage("exact_groups", exact_groups(images))
            groups = self._record("exact_groups", groups, t0, skipped=False)
        if self.records[-1].rows_out != n_images:
            raise RuntimeError("exact_groups row count != image count")
        images_rep = representatives(images, groups)
        n_reps = images_rep.count()

        # -- stage 1: signatures (representatives only) --------------------
        t0 = time.time()
        if resume and self._done("signatures"):
            sigs = self.spark.read.parquet(self._path("signatures"))
            sigs = self._record("signatures", sigs, t0, skipped=True)
        else:
            sigs = self._write_stage("signatures",
                                     compute_signatures(images_rep,
                                                        self.cfg))
            sigs = self._record("signatures", sigs, t0, skipped=False)
        # sent == received invariant (gsearch src/dna/dnasketch.rs:458-464)
        n_sigs = self.records[-1].rows_out
        if n_sigs != n_reps:
            raise RuntimeError(
                f"signature count {n_sigs} != representative count "
                f"{n_reps} (sent/received reconciliation failed)")

        # -- stage 2: bands ------------------------------------------------
        t0 = time.time()
        if resume and self._done("bands"):
            bands = self.spark.read.parquet(self._path("bands"))
            bands = self._record("bands", bands, t0, skipped=True)
        else:
            bands = self._write_stage("bands", build_bands(sigs, self.cfg))
            bands = self._record("bands", bands, t0, skipped=False)

        # -- stage 3: candidate pairs (LSH buckets ∪ suffix pass) ----------
        t0 = time.time()
        if resume and self._done("candidate_pairs"):
            pairs = self.spark.read.parquet(self._path("candidate_pairs"))
            pairs = self._record("candidate_pairs", pairs, t0, skipped=True)
        else:
            lsh_pairs = emit_bucket_pairs(bands)
            sfx_pairs = suffix_candidate_pairs(images_rep)
            # min(src) dedup => deterministic winner per pair
            pairs = (lsh_pairs.unionByName(sfx_pairs)
                     .groupBy("a", "b")
                     .agg(F.min("src").alias("src")))
            pairs = self._write_stage("candidate_pairs", pairs)
            pairs = self._record("candidate_pairs", pairs, t0, skipped=False)
            # no silent caps: surface bucket policy stats in the log
            stats = bucket_stats(bands).collect()[0].asDict()
            self.fs.write_text(
                os.path.join(self.dir, "bucket_stats.json"),
                json.dumps({k: (float(v) if v is not None else None)
                            for k, v in stats.items()}))

        # -- stage 4: verified edges --------------------------------------
        t0 = time.time()
        if resume and self._done("verified_edges"):
            edges = self.spark.read.parquet(self._path("verified_edges"))
            edges = self._record("verified_edges", edges, t0, skipped=True)
        else:
            edges = self._write_stage("verified_edges",
                                      verified_edges(pairs, images_rep,
                                                     self.cfg))
            edges = self._record("verified_edges", edges, t0, skipped=False)

        # -- stage 5: clusters (small-star / large-star CC over reps,
        #    then expand exact-group members onto their rep's cluster) -----
        t0 = time.time()
        if resume and self._done("clusters"):
            clusters = self.spark.read.parquet(self._path("clusters"))
            clusters = self._record("clusters", clusters, t0, skipped=True)
        else:
            cc_dir = (os.path.join(self.dir, "cc_work")
                      if self.cfg.cc_reliable_checkpoints else None)
            rep_clusters = assign_clusters(edges, images_rep,
                                           checkpoint_dir=cc_dir)
            clusters = self._write_stage(
                "clusters", expand_clusters(rep_clusters, groups))
            clusters = self._record("clusters", clusters, t0, skipped=False)
        return clusters


def run_pipeline(spark: SparkSession, images_path: str, checkpoint_dir: str,
                 cfg: PipelineConfig | None = None,
                 resume: bool = True) -> DataFrame:
    cfg = cfg or PipelineConfig()
    images = spark.read.parquet(images_path)
    return NearDupPipeline(spark, cfg, checkpoint_dir).run(images,
                                                           resume=resume)


def incremental_add(spark: SparkSession, cfg: PipelineConfig,
                    checkpoint_dir: str, new_images: DataFrame,
                    all_images: DataFrame) -> DataFrame:
    """The reference's ``add`` subcommand analog (gsearch
    ``src/bin/gsearch.rs:488-505``, pipeline reload at
    ``src/dna/dnasketch.rs:106-134``): append new items to an existing
    build WITHOUT re-sketching the old ones.

    * config is reloaded from the checkpoint and must match (the
      reference re-sketches new data with the ORIGINAL parameters);
    * signatures of existing rows are reused from the checkpoint — only
      ``new_images`` pay the decode+sketch cost (the expensive stage);
    * banding/candidates/verify/CC re-run over the union (cluster
      membership is global — new edges can merge old clusters, exactly
      why the reference re-runs search over the merged index).

    ``all_images`` must be old ∪ new (verification needs both payloads).
    Returns the new clusters DataFrame.
    """
    pipe = NearDupPipeline(spark, cfg, checkpoint_dir)
    cfg.assert_matches_via(pipe.fs, checkpoint_dir)
    old_sigs = spark.read.parquet(pipe._path("signatures"))

    # exact groups over the union: a new row can even displace an old
    # representative (smaller id, identical content) — recompute the cheap
    # grouping globally and sketch only reps that lack a signature
    groups = exact_groups(all_images)
    reps_all = groups.filter(F.col("image_id") == F.col("rep_id")) \
                     .select("image_id")
    have = old_sigs.select("image_id")
    need = reps_all.join(have, "image_id", "left_anti")
    to_sketch = all_images.join(need, "image_id", "left_semi")
    new_sigs = compute_signatures(to_sketch, cfg)
    merged = (old_sigs.join(reps_all, "image_id", "left_semi")
              .unionByName(new_sigs))

    # stage atomically, then invalidate downstream (FS-routed: works the
    # same on file:/, hdfs://, s3a:// checkpoint roots)
    tmp = pipe._path("signatures") + "_adding"
    merged.write.mode("overwrite").parquet(tmp)
    tmp_g = pipe._path("exact_groups") + "_adding"
    groups.write.mode("overwrite").parquet(tmp_g)
    pipe.fs.delete(pipe._path("signatures"))
    pipe.fs.rename(tmp, pipe._path("signatures"))
    pipe.fs.delete(pipe._path("exact_groups"))
    pipe.fs.rename(tmp_g, pipe._path("exact_groups"))
    for stage in ("bands", "candidate_pairs", "verified_edges", "clusters"):
        pipe.fs.delete(pipe._path(stage))
    return pipe.run(all_images, resume=True)
