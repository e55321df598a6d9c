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
from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from gsearch_spark.config import PipelineConfig
from gsearch_spark.fs import CheckpointFS
from gsearch_spark.operators.banding import build_bands
from gsearch_spark.operators.candidates import bucket_stats, emit_bucket_pairs
from gsearch_spark.operators.cc import (assign_clusters,
                                        connected_components, union_find)
from gsearch_spark.operators.exact import (exact_groups, expand_clusters,
                                           representatives)
from gsearch_spark.operators.signatures import compute_signatures
from gsearch_spark.operators.suffix import suffix_candidate_pairs
from gsearch_spark.operators.verify import verified_edges

STAGES = ("exact_groups", "signatures", "bands", "candidate_pairs",
          "verified_edges", "clusters", "ck_index", "id_index")

ADD_MANIFEST = "_add_commit_manifest.json"
# current id_index generation (monotone add counter); bumped inside the
# manifest-protected commit so torn commits roll the counter forward too
ID_GEN_FILE = "_id_index_gen"
# single-writer mutation lock (append-only add / streaming append /
# id_index compaction).  The manifest commit protocol is single-writer
# by design — two interleaved adds could stage conflicting cluster
# partition swaps — so concurrent writers must be REFUSED, not raced.
# The reference has the same property implicitly (one process owns the
# memory-mapped HNSW during add, src/bin/gsearch.rs:488-505).
ADD_LOCK = "_add_lock"


class ConcurrentAddError(RuntimeError):
    """Another writer holds the build's mutation lock."""


_TRACE_T0 = time.time()


def _trace(msg: str) -> None:
    """Mutation-path step tracing (no-op unless GSEARCH_TRACE_MUTATIONS
    is set): prints wall-clock offsets of the concurrent add/remove
    chains so a profiler can attribute time between stage records."""
    if os.environ.get("GSEARCH_TRACE_MUTATIONS"):
        print(f"[trace {time.time() - _TRACE_T0:9.2f}] {msg}",
              flush=True)


def _run_parallel(*thunks):
    """Run independent Spark job chains concurrently (guide §2.6,
    overlap independent jobs): the mutation paths are long sequences of
    SMALL jobs whose per-job latency — not data volume — dominates at
    append/remove sizes, and independent chains (new-vs-new bands,
    new-vs-old probe, suffix pass; the three sidecar staging writes)
    back-fill each other's task tails instead of serializing.  Results
    return in call order; the first exception is re-raised.  Threads
    use pyspark's inheritable_thread_target so job-group/description
    properties propagate."""
    if len(thunks) == 1:
        return [thunks[0]()]
    from concurrent.futures import ThreadPoolExecutor
    from pyspark import inheritable_thread_target
    from pyspark.sql import SparkSession
    session = SparkSession.getActiveSession()
    wrap = (inheritable_thread_target(session) if session is not None
            else inheritable_thread_target)
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futs = [pool.submit(wrap(t)) for t in thunks]
        return [f.result() for f in futs]


def _fanout(fn, items, workers: int = 16):
    """Apply ``fn`` to every item on a bounded thread pool and wait.
    Pure driver-side FS-metadata fan-out (no Spark jobs): the add/remove
    commit's per-partition-dir rename loops are hundreds of sequential
    py4j round trips at 1-3 ms each — independent of one another, so
    latency, not work, is the cost.  The first exception is re-raised."""
    items = list(items)
    if len(items) <= 1:
        for it in items:
            fn(it)
        return
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=min(workers, len(items))) as pool:
        futs = [pool.submit(fn, it) for it in items]
        for f in futs:
            f.result()


def _spawn(thunk):
    """Start ONE job chain on a side thread and return its Future —
    the overlap primitive behind :func:`_run_parallel` when the caller
    needs to keep doing its own Spark work on the main thread while the
    side chain runs (e.g. the build's suffix pass overlapping the
    decode-bound signatures stage).  The caller must ``.result()`` the
    future (which re-raises any exception) before depending on its
    output; the single-thread pool shuts down with the future."""
    from concurrent.futures import ThreadPoolExecutor
    from pyspark import inheritable_thread_target
    from pyspark.sql import SparkSession
    session = SparkSession.getActiveSession()
    wrap = (inheritable_thread_target(session) if session is not None
            else inheritable_thread_target)
    pool = ThreadPoolExecutor(max_workers=1)
    fut = pool.submit(wrap(thunk))
    pool.shutdown(wait=False)
    return fut


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(int(pid), 0)
    except (ProcessLookupError, ValueError):
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def acquire_add_lock(fs: "CheckpointFS", checkpoint_dir: str) -> bool:
    """Take the build's single-writer mutation lock.

    Returns True when THIS call took ownership (the caller must release)
    and False when the current process already holds it (re-entrant:
    ``add_writer_lock`` around a payload-append + ``incremental_add``
    sequence, with the inner add a no-op acquire).  A lock whose
    recorded pid is dead on this host is crash residue and self-heals;
    a live holder (or one on another host, where liveness can't be
    probed) raises :class:`ConcurrentAddError` — break a known-stale
    cross-host lock explicitly with ``python -m gsearch_spark unlock``.
    """
    import socket
    path = f"{checkpoint_dir}/{ADD_LOCK}"
    me = {"pid": os.getpid(), "host": socket.gethostname(),
          "ts": time.time()}
    for attempt in (0, 1):
        if fs.create_atomic(path, json.dumps(me)):
            return True
        try:
            held = json.loads(fs.read_text(path))
        except Exception:
            held = {}
        same_host = held.get("host") == me["host"]
        if same_host and held.get("pid") == me["pid"]:
            return False  # re-entrant: we already own it
        if (attempt == 0 and same_host and held.get("pid")
                and not _pid_alive(held["pid"])):
            fs.delete(path)  # dead writer on this host: self-heal
            continue
        raise ConcurrentAddError(
            f"build is locked by another writer (pid {held.get('pid')} "
            f"on {held.get('host')}, since ts={held.get('ts')}); if that "
            "writer is known dead, run `python -m gsearch_spark unlock "
            f"-b {checkpoint_dir}`")
    raise ConcurrentAddError(f"could not acquire {path}")  # pragma: no cover


def release_add_lock(fs: "CheckpointFS", checkpoint_dir: str) -> None:
    fs.delete(f"{checkpoint_dir}/{ADD_LOCK}")


@contextmanager
def add_writer_lock(spark: SparkSession, checkpoint_dir: str):
    """Hold the build's single-writer mutation lock for a multi-step
    mutation (payload append + add, per-microbatch streaming append,
    compaction).  Re-entrant within one process; released only by the
    outermost holder."""
    fs = CheckpointFS(spark, checkpoint_dir)
    owner = acquire_add_lock(fs, checkpoint_dir)
    try:
        yield
    finally:
        if owner:
            release_add_lock(fs, checkpoint_dir)


def cluster_pbucket(cfg: PipelineConfig) -> "F.Column":
    """Hive-partition key of the clusters checkpoint: which partition a
    cluster's rows live in.  Pure function of cluster_id so an
    incremental add can prune reads AND rewrites to touched partitions
    (the Iceberg bucket-transform analog for the output table)."""
    return F.pmod(F.xxhash64("cluster_id"),
                  F.lit(cfg.cluster_buckets)).cast("int")


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
        # buffered pipeline_state rows: one parquet append per pipeline/
        # add invocation (flushed at the end), not one write job per
        # stage — 13 sub-second write jobs per small append were pure
        # scheduler overhead, and deferring also means a FAILED add
        # leaves no state rows for work that never committed
        self._state_buf: "list[tuple]" = []
        # mutation paths record stages from concurrent driver threads
        # (guide §2.6); the record buffers are the only shared state
        import threading
        self._rec_lock = threading.Lock()

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
        """ONE job per stage: the per-partition row counts are collected
        (their sum IS the stage row count — no separate count() job) and
        buffered as pipeline_state rows for a single flush at the end
        (FIXTURES.md §4 contract: stage, part_id, rows_in, rows_out,
        t_start, t_end, config_hash — the processing_state.json analog,
        per partition; the collect is bounded by the partition count)."""
        parts = (out.groupBy(F.spark_partition_id().alias("part_id"))
                 .agg(F.count(F.lit(1)).alias("rows_out")).collect())
        n = sum(p["rows_out"] for p in parts)
        with self._rec_lock:
            rows_in = self.records[-1].rows_out if self.records else -1
            rec = StageRecord(stage, n, time.time() - t0, skipped,
                              rows_in=rows_in, t_start=t0,
                              t_end=time.time())
            self.records.append(rec)
            if not parts:
                # an empty stage still gets a lineage row (part_id -1):
                # zero-row probes (e.g. a clean id-clash check) must
                # appear in pipeline_state for the sent==received
                # reconciliation
                parts = [{"part_id": -1, "rows_out": 0}]
            self._state_buf.extend(
                (stage, int(p["part_id"]), rows_in, int(p["rows_out"]),
                 rec.t_start, rec.t_end, rec.seconds, skipped,
                 self.cfg.config_hash()) for p in parts)
        return out

    def _flush_state(self) -> None:
        if not self._state_buf:
            return
        df = self.spark.createDataFrame(
            self._state_buf,
            schema="stage string, part_id int, rows_in bigint, "
                   "rows_out bigint, ts double, te double, "
                   "seconds double, skipped boolean, config_hash string")
        (df.withColumn("t_start", F.timestamp_seconds(F.col("ts")))
         .withColumn("t_end", F.timestamp_seconds(F.col("te")))
         .select("stage", "part_id", "rows_in", "rows_out",
                 "t_start", "t_end", "seconds", "skipped", "config_hash")
         .write.mode("append").parquet(
             os.path.join(self.dir, "pipeline_state")))
        self._state_buf.clear()

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
        # rep count from the (keys-only, checkpointed) groups table — the
        # same number as images_rep.count() by construction (rep_id =
        # min image_id of its group, always a row of images) without
        # paying the images⋈reps semi-join a count over images_rep runs.
        # Only the sent==received check AFTER signatures consumes it, so
        # the count job runs on a side thread under the decode-bound
        # signatures stage (guide §2.6) instead of on the critical path
        nreps_future = _spawn(
            lambda: groups.filter(F.col("image_id") == F.col("rep_id"))
            .count())

        # the suffix pass consumes only images_rep (captions + phash) —
        # no signatures, no bands — so it overlaps the decode-bound
        # signatures stage and the bands stage on a side thread
        # (guide §2.6) instead of serializing inside candidate_pairs.
        # Only started when candidate_pairs will actually be computed.
        sfx_future = None
        if not (resume and self._done("candidate_pairs")):
            sfx_future = _spawn(
                lambda: suffix_candidate_pairs(images_rep).localCheckpoint())

        from gsearch_spark.operators.keyidx import (read_edge_index,
                                                    write_ck_index,
                                                    write_edge_index,
                                                    write_id_index)

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
        # (by-name lookup: the concurrently-recording ck_index thread may
        # interleave records, so records[-1] is no longer this stage's)
        n_sigs = next(r.rows_out for r in reversed(self.records)
                      if r.stage == "signatures")
        n_reps = nreps_future.result()
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
        stats_future = None
        t0 = time.time()
        if resume and self._done("candidate_pairs"):
            pairs = self.spark.read.parquet(self._path("candidate_pairs"))
            pairs = self._record("candidate_pairs", pairs, t0, skipped=True)
        else:
            lsh_pairs = emit_bucket_pairs(bands)
            sfx_pairs = sfx_future.result()  # overlapped since stage 1
            # min(src) dedup => deterministic winner per pair
            pairs = (lsh_pairs.unionByName(sfx_pairs)
                     .groupBy("a", "b")
                     .agg(F.min("src").alias("src")))
            pairs = self._write_stage("candidate_pairs", pairs)
            pairs = self._record("candidate_pairs", pairs, t0, skipped=False)
            # no silent caps: surface bucket policy stats in the log.
            # The stats aggregation is observability-only (nothing
            # downstream reads it), so it runs on a side thread under
            # the verify stage and is joined before the final flush.
            def _stats():
                stats = bucket_stats(bands).collect()[0].asDict()
                self.fs.write_text(
                    os.path.join(self.dir, "bucket_stats.json"),
                    json.dumps({k: (float(v) if v is not None else None)
                                for k, v in stats.items()}))
            stats_future = _spawn(_stats)

        # -- stage 4: verified edges --------------------------------------
        t0 = time.time()
        if resume and self._done("verified_edges"):
            edges = self.spark.read.parquet(self._path("verified_edges"))
            edges = self._record("verified_edges", edges, t0, skipped=True)
        else:
            # the candidate_pairs stage record bounds the pair count, so
            # the attach strategy resolves WITHOUT the auto id-count job
            n_pairs = next(r.rows_out for r in reversed(self.records)
                           if r.stage == "candidate_pairs")
            edges = self._write_stage("verified_edges",
                                      verified_edges(pairs, images_rep,
                                                     self.cfg,
                                                     n_pairs_hint=n_pairs))
            edges = self._record("verified_edges", edges, t0, skipped=False)

        # ck_index depends only on the stage-0 exact_groups checkpoint and
        # edge_index only on the verified_edges checkpoint just written —
        # both writes overlap the clusters stage below (guide §2.6), whose
        # union-find fast path is driver-heavy and leaves executor slots
        # idle.  (Spawning ck_index earlier — under the decode-bound
        # signatures stage — was measured WORSE per-stage: all 32 task
        # slots are busy there, so the sidecar job just queued and its
        # recorded wall inflated 1.6 s → 3.7 s.)
        def _w_ck():
            t0 = time.time()
            if resume and self._done("ck_index"):
                df = self.spark.read.parquet(self._path("ck_index"))
                self._record("ck_index", df, t0, skipped=True)
            else:
                write_ck_index(groups, self._path("ck_index"), self.cfg)
                df = self.spark.read.parquet(self._path("ck_index"))
                self._record("ck_index", df, t0, skipped=False)

        def _w_edge():
            t0 = time.time()
            if resume and self._done("edge_index"):
                df = read_edge_index(self.spark, self._path("edge_index"))
                self._record("edge_index", df, t0, skipped=True)
            else:
                write_edge_index(edges, self._path("edge_index"), self.cfg)
                df = read_edge_index(self.spark, self._path("edge_index"))
                self._record("edge_index", df, t0, skipped=False)

        ck_future = _spawn(_w_ck)
        edge_future = _spawn(_w_edge)

        # -- stage 5: clusters (small-star / large-star CC over reps,
        #    then expand exact-group members onto their rep's cluster).
        #    Written hive-partitioned on pbucket(cluster_id) so the
        #    append path can prune its partition-level rewrite ---------
        t0 = time.time()
        if resume and self._done("clusters"):
            clusters = self.spark.read.parquet(self._path("clusters"))
            clusters = self._record("clusters", clusters, t0, skipped=True)
        else:
            # small-graph fast path (same contract as the append path's
            # contraction CC): below cfg.add_cc_local_max_edges the
            # O(log^2 n) distributed star rounds are pure per-job
            # latency — driver union-find produces IDENTICAL min-member
            # labels (pinned by the parity/invariance tests).  The edge
            # count is already known from the verified_edges record (no
            # extra job); the reliable-checkpoint mode keeps the
            # distributed path (its point is surviving executor loss).
            # By-name lookup: the ck/edge sidecar threads record
            # concurrently, so records[-1] may not be verified_edges.
            n_edges = next(r.rows_out for r in reversed(self.records)
                           if r.stage == "verified_edges")
            if (not self.cfg.cc_reliable_checkpoints
                    and n_edges <= self.cfg.add_cc_local_max_edges):
                mapping = union_find([(r["a"], r["b"]) for r in
                                      edges.select("a", "b").collect()])
                comp = self.spark.createDataFrame(
                    sorted(mapping.items()),
                    schema="image_id string, cluster_id string")
                ids = images_rep.select("image_id")
                rep_clusters = (ids.join(F.broadcast(comp), "image_id",
                                         "left")
                                .select("image_id",
                                        F.coalesce("cluster_id",
                                                   "image_id")
                                        .alias("cluster_id")))
            else:
                cc_dir = (os.path.join(self.dir, "cc_work")
                          if self.cfg.cc_reliable_checkpoints else None)
                rep_clusters = assign_clusters(edges, images_rep,
                                               checkpoint_dir=cc_dir)
            path = self._path("clusters")
            # repartition ON the partition column first: without it every
            # task writes a file into every pbucket dir (tasks x buckets
            # small files — measured 3x stage cost at 213k rows); with it
            # each bucket is one task writing one file
            (expand_clusters(rep_clusters, groups)
             .withColumn("pbucket", cluster_pbucket(self.cfg))
             .repartition(self.cfg.cluster_buckets, F.col("pbucket"))
             .write.mode("overwrite").partitionBy("pbucket").parquet(path))
            clusters = self.spark.read.parquet(path)
            clusters = self._record("clusters", clusters, t0, skipped=False)

        # -- stage 6: key-addressed lookup layouts (operators/keyidx.py).
        #    Sidecar tables whose partitioning + in-file sort make the
        #    append path's membership / label / id-clash probes prune to
        #    O(probed keys) IO instead of scanning corpus-sized key
        #    columns (reference: add addresses its persisted index by
        #    rank, never rescans it — src/dna/dnasketch.rs:106-134).
        #    ck_index has been writing since stage 0 and edge_index since
        #    the verify stage (side threads, guide §2.6) — only the
        #    clusters-dependent id_index remains on the critical path.
        def _w_id():
            t0 = time.time()
            if resume and self._done("id_index"):
                df = self.spark.read.parquet(self._path("id_index"))
                self._record("id_index", df, t0, skipped=True)
            else:
                write_id_index(clusters, groups, self._path("id_index"),
                               self.cfg)
                df = self.spark.read.parquet(self._path("id_index"))
                self._record("id_index", df, t0, skipped=False)

        _w_id()
        ck_future.result()
        edge_future.result()
        if stats_future is not None:
            stats_future.result()
        gen_path = os.path.join(self.dir, ID_GEN_FILE)
        if not self.fs.exists(gen_path):
            self.fs.write_text(gen_path, "0")
        self._flush_state()
        return clusters.select("image_id", "cluster_id")


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
    """APPEND-ONLY add: insert new items into an existing build without
    re-sketching, re-banding or re-verifying the old corpus.

    The reference's ``add`` subcommand analog (gsearch
    ``src/bin/gsearch.rs:488-505``): it reloads the persisted index and
    parameters, inserts ONLY the new items into the existing HNSW with
    continuing ranks (``src/dna/dnasketch.rs:106-134``, rank continuation
    ``:405,427-433``) — old nodes are never rebuilt.  Mirrored here:

    * config reloads from the checkpoint and must hash-match (the
      reference re-sketches new data with the ORIGINAL parameters);
    * every stored-metadata probe (id-clash refusal, ck membership,
      suffix-group rep-ness, endpoint labels) is a PRUNED point lookup
      into the key-addressed ck_index / id_index layouts
      (operators/keyidx.py): partition filter from the probe keys'
      bucket set + IN-list row-group pruning on key-sorted files — the
      stored corpus' key columns are never scanned, closing the last
      linear-in-corpus term in the append story (reference anchor: add
      addresses its persisted index by rank, src/dna/dnasketch.rs:106-134);
    * exact grouping keys new rows against the stored content keys via
      that ck_index probe — old payload bytes are never rescanned;
      a new row whose content matches an existing group becomes a MEMBER
      of that group's existing representative (rank continuation: a rep
      keeps its identity even if a lexicographically smaller duplicate
      arrives later — output labels are normalized below so clusters still
      equal a from-scratch rebuild's);
    * only genuinely new representatives are decoded + sketched + banded;
    * candidates = new-vs-new (the standard salted bucket self-join over
      the new slice only) ∪ new-vs-old (bounded probe join against the
      stored bands, :func:`probe_pairs_vs_stored`) ∪ the suffix pass over
      ONLY the phash groups a new rep touches;
    * verify decodes only new-touching pairs, capped per new item
      (cfg.add_max_candidates_per_item) after the phash prefilter;
    * clusters update INCREMENTALLY by contraction: the stored clusters
      checkpoint IS the connected components of all stored edges, so
      contracting every old component to its label preserves
      connectivity exactly — CC runs over LABEL-level edges induced by
      the new verified edges only (O(|new edges|) input, recorded as
      ``add_cc_edges``), never over the stored edge set (which this
      path no longer even reads).  Affected clusters = merged labels ∪
      clusters whose exact-groups received new members; only their
      member rows are re-read (partition-pruned via the clusters
      checkpoint's pbucket hive partitioning), re-labelled and
      min-member-normalized (``add_clusters`` = that delta);
    * commit is manifest-protected: every delta (including the touched
      clusters partitions) is fully staged first, then a commit manifest
      is written, then files move/swap by rename.  A crash at ANY point
      either leaves a pre-manifest staging dir (the add never happened;
      wiped and re-runnable) or a torn post-manifest commit that
      :func:`recover_add_commit` — called automatically at the start of
      the next add — rolls FORWARD to completion.  Appends are file
      renames; clusters swaps only the partitions in the manifest, so
      per-add clusters IO is O(affected), not O(corpus).

    Per-add IO and decode cost are O(new); per-stage delta row counts
    land in pipeline_state under ``add_*`` stage names (the O(new)
    contract is asserted in tests/test_incremental_add.py).  The
    reference's ``add`` is likewise insert-only into the persisted HNSW
    with no corpus-sized post-pass (src/dna/dnasketch.rs:106-134) but
    offers no torn-commit recovery.

    Mutation is SINGLE-WRITER: the add takes the build's ``_add_lock``
    before reading any state and refuses (:class:`ConcurrentAddError`)
    while another writer holds it — the manifest commit protocol admits
    one writer by design.  Dead same-host holders self-heal; a stale
    cross-host lock is broken explicitly with the ``unlock`` subcommand.
    Re-entrant under an enclosing :func:`add_writer_lock` (how the CLI
    and the streaming sink hold one lock across payload-append + add).

    ``all_images`` must be old ∪ new (verify needs both sides' payloads;
    at scale, back it with a table whose layout supports id lookups —
    Iceberg bucket pruning — so the payload attach reads only candidate
    row groups).  Returns the new clusters DataFrame.
    """
    pipe = NearDupPipeline(spark, cfg, checkpoint_dir)
    # single-writer refusal BEFORE any state is read: the manifest
    # commit protocol admits exactly one writer (re-entrant under an
    # enclosing add_writer_lock; dead same-host holders self-heal)
    lock_owner = acquire_add_lock(pipe.fs, checkpoint_dir)
    try:
        return _incremental_add_locked(spark, cfg, checkpoint_dir,
                                       new_images, all_images, pipe)
    finally:
        if lock_owner:
            release_add_lock(pipe.fs, checkpoint_dir)


def _incremental_add_locked(spark: SparkSession, cfg: PipelineConfig,
                            checkpoint_dir: str, new_images: DataFrame,
                            all_images: DataFrame,
                            pipe: NearDupPipeline) -> DataFrame:
    from pyspark.sql import Window
    from gsearch_spark.operators.banding import explode_all_bands
    from gsearch_spark.operators.candidates import (emit_bucket_pairs,
                                                    probe_pairs_vs_stored)
    from gsearch_spark.operators.exact import content_keys
    from gsearch_spark.operators.keyidx import (lookup_ck_index,
                                                lookup_id_index,
                                                stage_ck_append,
                                                stage_edge_append,
                                                stage_id_append)
    from gsearch_spark.operators.suffix import suffix_candidate_pairs
    from gsearch_spark.operators.verify import (attach_payloads,
                                                prefilter_pairs, verify_pairs)

    cfg.assert_matches_via(pipe.fs, checkpoint_dir)
    recover_add_commit(spark, checkpoint_dir)  # finish any torn commit
    # a torn staged-table swap (offline id_index compaction or a purge
    # pass killed between its two renames) rolls forward here too,
    # before the layout checks below
    from gsearch_spark.operators.remove import recover_all_swaps
    recover_all_swaps(pipe.fs, checkpoint_dir)

    ck_path = pipe._path("ck_index")
    id_path = pipe._path("id_index")
    if not (pipe.fs.exists(f"{ck_path}/_SUCCESS")
            and pipe.fs.exists(f"{id_path}/_SUCCESS")
            and pipe.fs.exists(f"{pipe._path('edge_index')}/_SUCCESS")):
        raise ValueError(
            "checkpoint predates key-addressed lookup layouts (no "
            "ck_index/id_index/edge_index); rebuild with tohnsw first")
    from gsearch_spark.operators.remove import (count_tombstones,
                                                has_removals,
                                                read_dead_groups,
                                                read_rep_remap)

    # the stored-table handles are driver-side FILE-INDEX LISTINGS (the
    # partitioned sidecars list ~key_buckets dirs each), the removal
    # gate is more FS probes, and the new slice's one-time lineage cut
    # is a small job — all independent, so the whole setup runs as ONE
    # concurrent wave (guide §2.6; measured ~4 s serial at bench scale).
    # One listing per lookup table serves the whole add (the tables
    # don't change until this add's own commit).  The new-slice cut is
    # localCheckpoint (NOT persist; the documented plan-cache-over-
    # rewritten-path pitfall), O(new) bytes, consumed by ~8 downstream
    # plans.
    new_in = new_images

    def _rm_state():
        # merge-on-read removal sidecars (operators/remove.py).  Gated
        # on the tombstones table's existence so a build that never saw
        # a remove keeps its exact pre-remove plans (no extra joins).
        removals = has_removals(spark, checkpoint_dir)
        dead = (read_dead_groups(spark, checkpoint_dir)
                .select("rep_id").localCheckpoint()) if removals else None
        remap = (read_rep_remap(spark, checkpoint_dir)
                 .localCheckpoint()) if removals else None
        return removals, dead, remap

    (old_groups, old_bands, clusters_stored, ck_idx_df, id_idx_df,
     (removals, dead_df, remap_df), new_images) = _run_parallel(
        lambda: spark.read.parquet(pipe._path("exact_groups")),
        lambda: spark.read.parquet(pipe._path("bands")),
        lambda: spark.read.parquet(pipe._path("clusters")),
        lambda: spark.read.parquet(ck_path),
        lambda: spark.read.parquet(id_path),
        _rm_state,
        lambda: new_in.localCheckpoint())
    if "ck" not in old_groups.columns:
        raise ValueError(
            "checkpoint predates append-only add (exact_groups has no "
            "content-key column); rebuild with tohnsw first")
    if "pbucket" not in clusters_stored.columns:
        raise ValueError(
            "checkpoint predates bucketed clusters (no pbucket "
            "partitioning); rebuild with tohnsw first")

    # three independent probe chains run CONCURRENTLY (guide §2.6): the
    # union sanity counts, the id-clash refusal lookup and the new
    # slice's content keys share nothing and are each a couple of small
    # jobs whose latency would otherwise serialize
    def _chk_counts():
        n_new = new_images.count()
        n_old = old_groups.count()
        # exact_groups is merge-on-read historical state: removed rows
        # stay until compaction, so the live count subtracts tombstones
        n_dead = count_tombstones(spark, checkpoint_dir) if removals \
            else 0
        return n_new, n_old, n_dead, all_images.count()

    def _chk_clash():
        # id-clash refusal via the id-keyed layout: O(new) pruned point
        # lookup, not a corpus scan of stored image_ids
        t0 = time.time()
        clash = lookup_id_index(spark, id_path,
                                new_images.select("image_id"), cfg,
                                idx_df=id_idx_df)
        pipe._record("add_lookup_idclash", clash, t0, skipped=False)
        return next(r for r in pipe.records
                    if r.stage == "add_lookup_idclash").rows_out

    def _mk_old_keys():
        # content keys of the new slice, then the ck-membership probe —
        # a read-only pruned point lookup, safe to overlap the refusal
        # checks (staging mutation only starts after both validate)
        nk = content_keys(new_images).localCheckpoint()
        t0 = time.time()
        old_keys = lookup_ck_index(spark, ck_path, nk.select("ck"), cfg,
                                   idx_df=ck_idx_df)
        if removals:
            # a fully-removed exact-group's ck row lingers until
            # compaction; re-added identical content must read as
            # FRESH, not resurrect the dead group node
            old_keys = old_keys.join(F.broadcast(dead_df), "rep_id",
                                     "left_anti")
        old_keys = old_keys.localCheckpoint()  # O(new) rows
        pipe._record("add_lookup_ck", old_keys, t0, skipped=False)
        return nk, old_keys

    def _touched_prefix():
        # touched phash groups for the suffix pass: the slice is keyed
        # by the NEW images' phashes — a superset of the new REPS'
        # phashes (a new non-rep's pixels equal its dup's pixels, hence
        # its phash), and the suffix tail filters pairs to new-rep
        # endpoints, so using the superset changes nothing downstream
        # while letting this chain overlap the setup lookups instead of
        # waiting for exact grouping.  When the touched set is small
        # enough to ship as literals, push it down as an isin() filter
        # so parquet row-group stats prune the payload scan (on a
        # phash-sorted / z-ordered Iceberg table this turns the per-add
        # suffix input read into O(touched groups) IO); bulk appends
        # past the cap fall back to the semi join.
        _trace("touched: start")
        ph_vals = [r[0] for r in new_images.select("phash").distinct()
                   .limit(10_001).collect()]
        _trace("touched: ph_vals collected")
        if len(ph_vals) <= 10_000:
            touched_imgs = all_images.filter(F.col("phash").isin(ph_vals))
        else:
            touched_imgs = all_images.join(
                new_images.select("phash").distinct(), "phash",
                "left_semi")
        # eager cut — O(touched) keys+caption rows: the slice feeds the
        # rep-ness lookup's key collect AND the suffix input join, which
        # otherwise re-scan the corpus metadata once each
        touched_imgs = (touched_imgs.select("phash", "image_id",
                                            "caption")
                        .localCheckpoint())
        _trace("touched: touched_imgs cut")
        # rep-ness of the touched slice comes from a pruned id_index
        # point lookup (is_rep flag), not a corpus scan of the stored
        # group keys; new reps aren't in id_index yet and union in
        # explicitly
        t0 = time.time()
        touched_lk = lookup_id_index(spark, id_path,
                                     touched_imgs.select("image_id"),
                                     cfg, idx_df=id_idx_df)
        old_touched_reps = touched_lk.filter(F.col("is_rep")) \
            .select("image_id")
        if removals:
            # a group whose founding rep was removed has NO live is_rep
            # row; its promoted surviving member (rep_remap target)
            # stands in as the group's suffix-pass node so the group
            # isn't skipped
            promoted = touched_lk.join(
                F.broadcast(remap_df.select(F.col("new_rep")
                                            .alias("image_id"))),
                "image_id", "left_semi").select("image_id")
            old_touched_reps = old_touched_reps.unionByName(promoted) \
                .distinct()
        old_touched_reps = old_touched_reps.localCheckpoint()
        pipe._record("add_lookup_touched_reps", old_touched_reps, t0,
                     skipped=False)
        _trace("touched: prefix done")
        return touched_imgs, old_touched_reps

    # the touched-phash chain is the LONGEST of the setup chains (three
    # serial jobs) yet its outputs are consumed only by the suffix
    # branch in the NEXT wave — so it runs as a detached future joined
    # there, and the main thread proceeds to exact grouping as soon as
    # the three chains it actually needs are done (guide §2.6)
    touched_future = _spawn(_touched_prefix)
    ((n_new, n_old, n_dead, n_all), n_clash,
     (nk, old_keys)) = _run_parallel(_chk_counts, _chk_clash,
                                     _mk_old_keys)
    if n_all != n_old - n_dead + n_new or n_clash:
        # refusal path: don't leave the detached touched chain's jobs
        # running into whatever the caller does after catching — join
        # it best-effort before raising (its own error is secondary)
        try:
            touched_future.result()
        except Exception:
            pass
        if n_all != n_old - n_dead + n_new:
            raise ValueError("all_images must be exactly old ∪ new "
                             "(minus removed rows)")
        raise ValueError("new_images contains ids already in the build")

    staging = pipe._path("_add_staging")
    pipe.fs.delete(staging)

    def stage(name: str, df: DataFrame) -> DataFrame:
        """Materialize a delta under staging; record rows/secs as add_*."""
        t0 = time.time()
        df.write.mode("overwrite").parquet(f"{staging}/{name}")
        out = spark.read.parquet(f"{staging}/{name}")
        pipe._record(f"add_{name}", out, t0, skipped=False)
        return out

    # -- exact grouping of the new slice (no old bytes touched; the
    #    membership probe was a pruned point lookup into ck_index in
    #    the parallel setup block above — the stored corpus' key
    #    columns are never scanned) --------------------------------------
    matched = (nk.join(F.broadcast(old_keys), "ck")
               .select("image_id", "rep_id", "ck"))
    # same skew-immune form as the full build's exact_groups (a bulk
    # append can carry a viral bomb too): min-per-ck via groupBy gets
    # map-side combine, the join-back is AQE-skew-splittable; the
    # anti-join re-runs per consumer but over the localCheckpointed
    # keys-only nk — no byte rescan
    fresh_keys = nk.join(F.broadcast(old_keys.select("ck")), "ck",
                         "left_anti")
    fresh_reps = (fresh_keys.groupBy("ck")
                  .agg(F.min("image_id").alias("rep_id")))
    fresh = (fresh_keys.join(fresh_reps, "ck")
             .select("image_id", "rep_id", "ck"))
    new_groups = stage("exact_groups", matched.unionByName(fresh))

    # -- sketch only brand-new representatives ---------------------------
    new_rep_ids = (new_groups
                   .filter(F.col("image_id") == F.col("rep_id"))
                   .select("image_id"))
    to_sketch = new_images.join(new_rep_ids, "image_id", "left_semi")

    # matched reps (old groups gaining members) depend only on the
    # just-staged exact groups; the fused small-add tail needs them as a
    # driver list, so the collect runs on a side thread under the whole
    # sketch/band/verify phase (guide §2.6).
    mr_expr = (new_groups
               .join(new_images.select(F.col("image_id").alias("rep_id")),
                     "rep_id", "left_anti")
               .select("rep_id").distinct())
    def _mr_collect():
        mr = sorted(r["rep_id"] for r in mr_expr.collect())
        rmp = ({r["old_rep"]: r["new_rep"] for r in remap_df.collect()}
               if removals else {})
        return mr, rmp

    # spawn gate bounds the COLLECT (mr_list <= n_new rows), not the
    # fused decision itself — if the posterior gate still picks the
    # distributed tail (edge blow-up), the side collect was bounded and
    # merely unused
    mr_future = _spawn(_mr_collect) \
        if n_new <= cfg.add_cc_local_max_edges else None

    # -- candidates: new-vs-new ∪ new-vs-old ∪ touched suffix groups -----
    # Each branch is cut with an eager localCheckpoint before the union:
    # the branches build near-identical exchanges over the same staged
    # inputs (bands keys), and Spark's AQE exchange reuse across union
    # arms produced mismatched coalesced partitionings inside one
    # codegen'd join ("Can't zip RDDs with unequal numbers of
    # partitions", reproduced at 32 cores / 213k rows).  The cut
    # materializes each (small) pair list independently; localCheckpoint,
    # not persist — the documented plan-cache-over-rewritten-path
    # pitfall.  The three branches below (sketch -> banding/probe,
    # touched-suffix chain, ck_index staging) depend only on
    # new_groups/to_sketch and run CONCURRENTLY (guide §2.6) — each is
    # a chain of small jobs, so overlapping them converts serial
    # per-job latency into one wave; the suffix chain does not need the
    # new signatures, so it overlaps the decode+sketch stage too.
    def _br_sig_chain():
        _trace("sig_chain: start")
        new_sigs = stage("signatures", compute_signatures(to_sketch, cfg))
        _trace("sig_chain: signatures staged")

        def bands_nn():
            df = build_bands(new_sigs, cfg)
            _trace("sig_chain: band salt stats done")
            nb = stage("bands", df)
            _trace("sig_chain: bands staged")
            nn = emit_bucket_pairs(nb).localCheckpoint()
            _trace("sig_chain: nn_pairs cut")
            return nb, nn

        (nb, nn), no_p = _run_parallel(
            bands_nn, lambda: _probe_old_pairs(new_sigs))
        return nb, nn, no_p

    def _br_ck_stage():
        _trace("ck_stage: start")
        stage_ck_append(new_groups, staging, cfg)
        _trace("ck_stage: done")

    def _probe_old_pairs(new_sigs):
        _trace("probe: start")
        no_pairs = probe_pairs_vs_stored(explode_all_bands(new_sigs, cfg),
                                         old_bands)
        if not removals:
            out = no_pairs.localCheckpoint()
            _trace("probe: no_pairs cut")
            return out
        # stored bands stay keyed by founding group nodes until
        # compaction: pairs against a DEAD group's node are content
        # that no longer exists (drop), and pairs against a tombstoned
        # founding whose group survives re-point at the promoted
        # surviving member so the verify stage attaches live payloads.
        # The stored endpoint can sit in EITHER column (pairs are
        # least/greatest-canonicalized), so both sides are treated and
        # the pair re-canonicalized.
        rm_a = remap_df.select(F.col("old_rep").alias("a"),
                               F.col("new_rep").alias("na"))
        rm_b = remap_df.select(F.col("old_rep").alias("b"),
                               F.col("new_rep").alias("nb"))
        no_pairs = (no_pairs
                    .join(F.broadcast(dead_df.withColumnRenamed(
                        "rep_id", "a")), "a", "left_anti")
                    .join(F.broadcast(dead_df.withColumnRenamed(
                        "rep_id", "b")), "b", "left_anti")
                    .join(F.broadcast(rm_a), "a", "left")
                    .join(F.broadcast(rm_b), "b", "left")
                    .select(F.coalesce("na", F.col("a")).alias("pa"),
                            F.coalesce("nb", F.col("b")).alias("pb"),
                            "src")
                    .filter(F.col("pa") != F.col("pb"))
                    .select(F.least("pa", "pb").alias("a"),
                            F.greatest("pa", "pb").alias("b"), "src")
                    .groupBy("a", "b").agg(F.min("src").alias("src")))
        return no_pairs.localCheckpoint()

    def _br_touched():
        # prefix results were computed on the detached setup-wave future
        # (overlapping the setup lookups AND exact grouping — the
        # touched-slice selection only needs the NEW slice's phashes);
        # here only the parts that need new_rep_ids remain.
        touched_imgs, old_touched_reps = touched_future.result()
        # eager cut before the suffix pass: at bulk append sizes the
        # rep-ness lookup takes the semi-join fallback and this
        # subtree's exchanges get reused by both arms of the sfx_new
        # union below — the documented AQE exchange-reuse zip bug
        # ("Can't zip RDDs with unequal numbers of partitions",
        # reproduced at a 10% append)
        touched_reps = (touched_imgs.join(
            old_touched_reps.unionByName(new_rep_ids), "image_id",
            "left_semi").localCheckpoint())
        _trace("touched: touched_reps cut")
        # sfx feeds BOTH union arms below — cut it first, or the shared
        # exchange under the two consumers trips the AQE reuse bug
        sfx = suffix_candidate_pairs(touched_reps).localCheckpoint()
        _trace("touched: sfx cut")
        return (sfx.join(new_rep_ids.withColumnRenamed("image_id", "a"),
                         "a", "left_semi")
                .unionByName(
                    sfx.join(new_rep_ids.withColumnRenamed("image_id",
                                                           "b"),
                             "b", "left_semi"))
                .dropDuplicates(["a", "b"])).localCheckpoint()

    (new_bands, nn_pairs, no_pairs), sfx_new, _ = _run_parallel(
        _br_sig_chain, _br_touched, _br_ck_stage)
    new_pairs = stage("candidate_pairs",
                      nn_pairs.unionByName(no_pairs).unionByName(sfx_new)
                      .groupBy("a", "b").agg(F.min("src").alias("src")))

    # -- verify only new-touching pairs, capped per new item -------------
    plausible = prefilter_pairs(new_pairs, all_images,
                                cfg.prefilter_max_phash_hamming,
                                cfg.prefilter_max_phash_hamming_phash_src)
    flag_a = new_rep_ids.select(F.col("image_id").alias("a"),
                                F.lit(True).alias("a_new"))
    keyed = (plausible
             .join(flag_a, "a", "left")
             .withColumn("key",
                         F.when(F.coalesce("a_new", F.lit(False)),
                                F.col("a")).otherwise(F.col("b")))
             .withColumn("other",
                         F.when(F.coalesce("a_new", F.lit(False)),
                                F.col("b")).otherwise(F.col("a"))))
    w_cap = Window.partitionBy("key").orderBy("other")
    # eager cut: O(new x cap) keys-only rows.  The capped-pair subtree
    # (meta joins + window) otherwise evaluates THREE times — once for
    # attach's auto-strategy id count, once as the candidate-id semi
    # build side, once as the pair probe side (guide §2.4: duplicated
    # subtrees in the plan)
    capped = (keyed.withColumn("rn", F.row_number().over(w_cap))
              .filter(F.col("rn") <= cfg.add_max_candidates_per_item)
              .select("a", "b", "src")).localCheckpoint()
    # materialize_slim: the candidate payload slice is O(new x cap) ids
    # out of the whole corpus — one eager cut replaces TWO full payload
    # scans in the pair-attach plan (guide §8: move heavy bytes once).
    # The "auto" strategy's id-count job is SKIPPED when the algebraic
    # bound already proves broadcast fits: every capped pair has a new
    # endpoint, so distinct ids <= 2 x new x cap — no count needed.
    # Bulk adds past the bound keep the counted auto path.
    attach_strategy = cfg.verify_attach
    if (attach_strategy == "auto"
            and 2 * n_new * cfg.add_max_candidates_per_item
            <= cfg.verify_broadcast_max_ids):
        attach_strategy = "broadcast"
    attached = attach_payloads(capped, all_images,
                               strategy=attach_strategy,
                               broadcast_max_ids=cfg.verify_broadcast_max_ids,
                               materialize_slim=True)

    # PREFETCH the endpoint-label lookup under the verify stage (guide
    # §2.6): every verified edge endpoint is an endpoint of `capped`
    # (edges = verify(capped) filtered), and the matched reps' promoted
    # members are known from the mr collect — so the pruned id_index
    # lookup the fused tail needs can run NOW, off the critical path,
    # on the (slightly larger) capped-endpoint superset.  The side
    # thread self-gates on the driver budget: past the bound it returns
    # None and the tail falls back to the inline lookup / distributed
    # path.  Probing a superset only ADDS rows for ids the tail then
    # filters out — labels for non-edge endpoints are never read.
    def _ep_prefetch():
        if mr_future is None:
            return None
        mr_l, rmp = mr_future.result()
        n_cap = capped.count()
        if (2 * n_cap + n_new) > cfg.add_cc_local_max_edges:
            return None  # collect would blow the driver budget
        lreps = sorted({rmp.get(r, r) for r in mr_l})
        cap_ids = (capped.select(F.col("a").alias("image_id"))
                   .unionByName(capped.select(F.col("b")
                                              .alias("image_id")))
                   .distinct())
        probe = cap_ids
        if lreps:
            probe = probe.unionByName(spark.createDataFrame(
                [(i,) for i in lreps],
                schema="image_id string")).distinct()
        rows = lookup_id_index(spark, id_path, probe, cfg,
                               idx_df=id_idx_df).collect()
        _trace("fused: ep prefetch done")
        return mr_l, rmp, rows

    ep_future = _spawn(_ep_prefetch)
    new_edges = stage("verified_edges",
                      verify_pairs(attached, cfg).filter(F.col("dup"))
                      .select("a", "b", "src", "psnr", "caption_eq"))

    # -- INCREMENTAL clusters: CC by contraction ------------------------
    # Stored clusters are exactly CC(stored edges), so contracting each
    # old component to its label preserves connectivity when the new
    # edges arrive: CC input is the label-level image of the NEW edges
    # only — O(|new edges|), independent of the stored edge count (which
    # is never read).  Endpoint labels come from a pruned id_index point
    # lookup (partition filter + IN-list row-group pruning) — neither
    # the stored clusters table nor any other corpus-sized relation is
    # scanned on this path.
    gen_file = os.path.join(checkpoint_dir, ID_GEN_FILE)
    new_gen = (int(pipe.fs.read_text(gen_file))
               if pipe.fs.exists(gen_file) else 0) + 1

    def _c_edge_for(ep_info):
        # dedup-graph edge delta for the remove path's split
        # recomputation: endpoints translated to their FOUNDING group
        # nodes (old endpoints via the ep_info point lookup, new reps
        # are their own founding node), canonical a < b, intra-group
        # self-loops dropped
        ef_a = ep_info.select(F.col("image_id").alias("a"),
                              F.col("rep_id").alias("fa"))
        ef_b = ep_info.select(F.col("image_id").alias("b"),
                              F.col("rep_id").alias("fb"))
        fedges = (new_edges.select("a", "b")
                  .join(F.broadcast(ef_a), "a", "left")
                  .join(F.broadcast(ef_b), "b", "left")
                  .select(F.coalesce("fa", F.col("a")).alias("na"),
                          F.coalesce("fb", F.col("b")).alias("nb"))
                  .filter(F.col("na") != F.col("nb"))
                  .select(F.least("na", "nb").alias("a"),
                          F.greatest("na", "nb").alias("b"))
                  .distinct())
        stage_edge_append(fedges, staging, cfg)

    def _pb(col: str) -> "F.Column":
        return F.pmod(F.xxhash64(col), F.lit(cfg.cluster_buckets)) \
                .cast("int")

    # FUSED small-add tail (guide §2.6 taken to its limit): the whole
    # labels -> contracted-CC -> affected-set algebra operates on sets
    # bounded by O(new edges + new rows) — the SAME magnitude the
    # union-find fast path has always collected — yet the DataFrame form
    # paid ~5 small jobs of latency (mr_map cut, ep_info cut, labels
    # record, label_edges cut, affected collect).  When that bound fits
    # the existing driver-CC budget, three collects (matched reps, the
    # staged edge list, the pruned ep_info lookup) bring the inputs to
    # the driver and plain dict/set algebra replaces the join chain —
    # provably the same maps: get(x, x) IS coalesce over a left join,
    # the set comprehension IS the distinct union.  Bulk adds past the
    # bound keep the distributed DataFrame path verbatim below.
    n_edges_rec = next(r.rows_out for r in reversed(pipe.records)
                       if r.stage == "add_verified_edges")
    fused_small = (n_edges_rec + n_new) <= cfg.add_cc_local_max_edges
    if fused_small:
        t0 = time.time()
        prefetch = ep_future.result()
        if prefetch is not None:
            mr_list, remap, super_rows = prefetch
        else:
            # fused_small implies n_new <= add_cc_local_max_edges — the
            # exact mr_future spawn gate — so the future always exists
            # here; only the ep prefetch may have self-gated out
            mr_list, remap = mr_future.result()
            super_rows = None
        _trace("fused: mr joined")
        # a matched group's founding rep may be tombstoned (group
        # alive): its own id_index label is a stale null-or-old row, so
        # the LABEL is read through the promoted surviving member
        # (lrep), while group identity stays the founding node
        mr_pairs = [(r, remap.get(r, r)) for r in mr_list]
        edge_rows = [(r["a"], r["b"]) for r in
                     new_edges.select("a", "b").collect()]
        _trace("fused: edges collected")
        ep_ids = ({a for a, _ in edge_rows} | {b for _, b in edge_rows}
                  | {l for _, l in mr_pairs})
        if super_rows is not None:
            # prefetched superset (capped endpoints ∪ lreps) ⊇ ep_ids:
            # restricting the collected rows IS the direct lookup
            ep_rows = [r for r in super_rows if r["image_id"] in ep_ids]
        else:
            ep_probe = spark.createDataFrame(
                [(i,) for i in sorted(ep_ids)], schema="image_id string")
            ep_rows = lookup_id_index(spark, id_path, ep_probe, cfg,
                                      idx_df=id_idx_df).collect()
        _trace("fused: ep_info collected")
        ep_info = spark.createDataFrame(
            [(r["image_id"], r["cluster_id"], r["is_rep"], r["rep_id"])
             for r in ep_rows],
            schema="image_id string, cluster_id string, "
                   "is_rep boolean, rep_id string")
        edge_future = _spawn(lambda: _c_edge_for(ep_info))
        # defensive None-guard: a NULL cluster_id (a "stale null-or-old
        # row") must behave like an ABSENT label — the DataFrame path's
        # coalesce(label, id) rescues it, so the dict must not store
        # None (get(x, x) then rescues identically, and a None could
        # never equi-join in the stored-label set either).  ep_info
        # keeps the full row: its rep_id still serves the edge delta.
        labels_live = {r["image_id"]: r["cluster_id"] for r in ep_rows
                       if r["cluster_id"] is not None}
        labels_map = dict(labels_live)
        if removals:
            for rep, lrep in mr_pairs:
                if lrep in labels_live:  # inner-join semantics
                    labels_map[rep] = labels_live[lrep]
        labels = spark.createDataFrame(
            sorted(labels_map.items()),
            schema="image_id string, label string")
        pipe._record("add_lookup_labels", labels, t0, skipped=False)
        t0 = time.time()
        le_set = set()
        for a, b in edge_rows:
            la = labels_map.get(a, a)
            lb = labels_map.get(b, b)
            if la != lb:
                le_set.add((la, lb))
        label_edges = spark.createDataFrame(
            sorted(le_set), schema="a string, b string")
        pipe._record("add_cc_edges", label_edges, t0, skipped=False)
        mapping = union_find(sorted(le_set))
        rep_cc = spark.createDataFrame(
            sorted(mapping.items()),
            schema="image_id string, cluster_id string")
        # affected clusters: merged old labels ∪ clusters whose
        # exact-groups gained members (their min MEMBER id — the label
        # under the from-scratch normalization contract — may change)
        t0 = time.time()
        stored_label_set = set(labels_map.values())
        aff_set = {l for l in mapping if l in stored_label_set}
        aff_set |= {labels_map[r] for r in mr_list if r in labels_map}
        aff_cl = spark.createDataFrame(
            [(l,) for l in sorted(aff_set)], schema="cluster_id string")
        # bucket ids via the SAME Spark hash expression the layout uses
        # (xxhash64 is not reimplemented driver-side) — one LocalRelation
        # job over O(affected) rows
        aff_buckets = sorted(
            {r["pb"] for r in
             aff_cl.select(_pb("cluster_id").alias("pb")).collect()})
    else:
        # the advisory prefetch future must not outlive this call (its
        # detached jobs would run past commit/lock release and any
        # exception would vanish): join it best-effort — for bulk adds
        # it either never spawned the lookup (mr gate) or self-gated
        # out after a cheap count, so this waits ~0 in practice
        try:
            ep_future.result()
        except Exception:
            pass  # advisory only; the inline path below is authoritative
        t0 = time.time()
        matched_reps = mr_expr  # old reps gaining members
        # a matched group's founding rep may be tombstoned (group
        # alive): label read through the promoted surviving member
        if removals:
            mr_map = (matched_reps
                      .join(F.broadcast(remap_df.withColumnRenamed(
                          "old_rep", "rep_id")), "rep_id", "left")
                      .select("rep_id",
                              F.coalesce("new_rep", "rep_id")
                              .alias("lrep"))
                      .localCheckpoint())
        else:
            mr_map = matched_reps.select("rep_id",
                                         F.col("rep_id").alias("lrep"))
        endpoint_ids = (new_edges.select(F.col("a").alias("image_id"))
                        .unionByName(new_edges.select(F.col("b")
                                                      .alias("image_id")))
                        .unionByName(mr_map.select(F.col("lrep")
                                                   .alias("image_id")))
                        .distinct())
        # endpoint labels via the id-keyed layout: pruned point lookup,
        # O(new edges + matched reps) rows read.  The same lookup also
        # resolves each old endpoint's FOUNDING group node (rep_id) for
        # the edge_index delta.
        ep_info = (lookup_id_index(spark, id_path, endpoint_ids, cfg,
                                   idx_df=id_idx_df)
                   .localCheckpoint())  # O(new edges + matched reps)
        # the edge_index delta needs only ep_info + the staged
        # new_edges — its staging write overlaps the labels->CC->delta
        # chain on a side thread (guide §2.6)
        edge_future = _spawn(lambda: _c_edge_for(ep_info))
        labels_live = ep_info.select("image_id",
                                     F.col("cluster_id").alias("label"))
        if removals:
            # founding reps resolve their label via their promoted
            # member
            labels = (labels_live.unionByName(
                mr_map.join(labels_live.withColumnRenamed("image_id",
                                                          "lrep"),
                            "lrep")
                .select(F.col("rep_id").alias("image_id"), "label"))
                .distinct())
        else:
            labels = labels_live
        pipe._record("add_lookup_labels", labels, t0, skipped=False)
        t0 = time.time()
        lab_a = labels.select(F.col("image_id").alias("a"),
                              F.col("label").alias("la"))
        lab_b = labels.select(F.col("image_id").alias("b"),
                              F.col("label").alias("lb"))
        label_edges = (new_edges.select("a", "b")
                       .join(F.broadcast(lab_a), "a", "left")
                       .join(F.broadcast(lab_b), "b", "left")
                       .select(F.coalesce("la", F.col("a")).alias("a"),
                               F.coalesce("lb", F.col("b")).alias("b"))
                       .filter(F.col("a") != F.col("b"))
                       .distinct().localCheckpoint())
        pipe._record("add_cc_edges", label_edges, t0, skipped=False)
        n_label_edges = next(r.rows_out for r in reversed(pipe.records)
                             if r.stage == "add_cc_edges")
        small_graph = n_label_edges <= cfg.add_cc_local_max_edges
        if small_graph:
            # small contracted graph: driver union-find beats
            # O(log^2 n) distributed rounds of per-job latency
            # (identical min-member labels)
            mapping = union_find([(r["a"], r["b"])
                                  for r in label_edges.collect()])
            rep_cc = spark.createDataFrame(
                sorted(mapping.items()),
                schema="image_id string, cluster_id string")
        else:
            rep_cc = connected_components(label_edges).localCheckpoint()

        # affected clusters: merged old labels ∪ clusters whose
        # exact-groups gained members
        t0 = time.time()
        stored_labels = labels.select("label").distinct()
        matched_rep_labels = (matched_reps
                              .join(labels.withColumnRenamed("image_id",
                                                             "rep_id"),
                                    "rep_id")
                              .select("label"))
        aff_expr = (rep_cc.select(F.col("image_id").alias("label"))
                    .join(stored_labels, "label", "left_semi")
                    .unionByName(matched_rep_labels)
                    .distinct())
        if small_graph:
            # ONE collect resolves labels AND their bucket set
            aff_rows = (aff_expr.select("label", _pb("label").alias("pb"))
                        .collect())
            aff_buckets = sorted({r["pb"] for r in aff_rows})
            aff_cl = spark.createDataFrame(
                [(r["label"],) for r in aff_rows],
                schema="cluster_id string")
        else:
            aff = aff_expr.localCheckpoint()
            aff_buckets = sorted(r[0] for r in
                                 aff.select(_pb("label").alias("pb"))
                                 .distinct().collect())
            aff_cl = aff.withColumnRenamed("label", "cluster_id")
    # member rows of affected clusters ONLY, read under pbucket pruning
    aff_members = (clusters_stored
                   .filter(F.col("pbucket").isin(aff_buckets))
                   .join(F.broadcast(aff_cl), "cluster_id")
                   .select("image_id", "cluster_id"))
    Rm = rep_cc.select(F.col("image_id").alias("cluster_id"),
                       F.col("cluster_id").alias("root"))
    # is_rep rides along so the id_index delta rows keep the flag's
    # bool_or-across-generations contract: re-labelled OLD members append
    # is_rep=false (their first-appearance row already carries the truth,
    # and rep-ness is immutable); NEW members carry their actual flag
    relab_old = (aff_members.join(F.broadcast(Rm), "cluster_id", "left")
                 .select("image_id",
                         F.coalesce("root", "cluster_id").alias("root"),
                         F.lit(False).alias("is_rep"),
                         F.lit(None).cast("string").alias("rep_id")))
    # every NEW member routes through its rep's label to the merged root
    rep_lab = (new_groups.select("image_id", "rep_id",
                                 (F.col("image_id") == F.col("rep_id"))
                                 .alias("is_rep"))
               .join(F.broadcast(labels.withColumnRenamed("image_id",
                                                          "rep_id")),
                     "rep_id", "left")
               .select("image_id",
                       F.coalesce("label", F.col("rep_id"))
                       .alias("cluster_id"), "is_rep", "rep_id"))
    relab_new = (rep_lab.join(F.broadcast(Rm), "cluster_id", "left")
                 .select("image_id",
                         F.coalesce("root", "cluster_id").alias("root"),
                         "is_rep", "rep_id"))
    # min-member normalization over the affected slice only (the rest of
    # the corpus already satisfies cluster_id == min member by induction)
    members = relab_old.unionByName(relab_new)
    norm = members.groupBy("root").agg(F.min("image_id")
                                       .alias("cluster_id"))
    delta = (members.join(F.broadcast(norm), "root")
             .select("image_id", "cluster_id", "is_rep", "rep_id")
             .localCheckpoint())
    pipe._record("add_clusters", delta, t0, skipped=False)

    # -- stage the rewritten clusters partitions (touched buckets only)
    #    and the id_index delta — the ck_index delta was staged in the
    #    parallel candidate block and the edge_index delta has been
    #    staging on a side thread since ep_info was cut --------------
    def _c_clusters():
        t0 = time.time()
        delta_buckets = {r[0] for r in
                         delta.select(_pb("cluster_id").alias("pb"))
                         .distinct().collect()}
        touched = sorted(set(aff_buckets) | delta_buckets)
        kept = (clusters_stored.filter(F.col("pbucket").isin(touched))
                .join(F.broadcast(aff_cl.select("cluster_id")),
                      "cluster_id", "left_anti")
                .select("image_id", "cluster_id"))
        (kept.unionByName(delta.select("image_id", "cluster_id"))
         .withColumn("pbucket", _pb("cluster_id"))
         .repartition(max(len(touched), 1), F.col("pbucket"))
         .write.mode("overwrite").partitionBy("pbucket")
         .parquet(f"{staging}/clusters"))
        staged_clusters = spark.read.parquet(f"{staging}/clusters")
        pipe._record("add_clusters_rewrite", staged_clusters, t0,
                     skipped=False)
        present = {r[0] for r in staged_clusters.select("pbucket")
                   .distinct().collect()}
        # a touched bucket with no staged rows (all its clusters merged
        # away into other buckets) must be DELETED at commit, not stale
        return {str(p): bool(p in present) for p in touched}

    # key-index deltas: brand-new (ck, rep_id) rows were staged in the
    # candidate block; the re-labelled/new member rows stage at the next
    # id_index generation (LSM append, latest-gen-wins — no stored index
    # rows are read or rewritten)
    def _c_id():
        stage_id_append(delta, new_gen, staging, cfg)

    t0 = time.time()
    swap, _ = _run_parallel(_c_clusters, _c_id)
    edge_future.result()  # staged since ep_info; must land pre-manifest
    pipe._record("add_index_delta",
                 spark.read.parquet(f"{staging}/id_index"), t0,
                 skipped=False)

    # -- commit: manifest first, then renames; crash => roll-forward -----
    manifest = {"version": 2, "staging": staging,
                "append_stages": ["exact_groups", "signatures", "bands",
                                  "candidate_pairs", "verified_edges"],
                "partitioned_appends": ["ck_index", "id_index",
                                        "edge_index"],
                "id_index_gen": new_gen,
                "clusters_swap": swap}
    mpath = os.path.join(checkpoint_dir, ADD_MANIFEST)
    _trace("commit: manifest")
    pipe.fs.write_text(mpath, json.dumps(manifest))
    _apply_add_commit(pipe.fs, checkpoint_dir, manifest)
    pipe.fs.delete(mpath)
    _trace("commit: applied")

    # post-commit housekeeping: the staging wipe (recursive FS delete),
    # the lineage flush (one parquet append job) and the file-status
    # cache refresh (the swap happened via raw FS renames, invisible to
    # Spark's shared cache — the documented plan-cache-over-rewritten-
    # path pitfall, FS-metadata edition) touch disjoint state and run
    # CONCURRENTLY (guide §2.6)
    def _refresh():
        for name in ("exact_groups", "signatures", "bands",
                     "candidate_pairs", "verified_edges", "clusters",
                     "ck_index", "id_index", "edge_index"):
            spark.catalog.refreshByPath(pipe._path(name))

    _run_parallel(lambda: pipe.fs.delete(staging),
                  pipe._flush_state,  # one lineage append for the add
                  _refresh)
    _trace("commit: housekeeping done")
    return (spark.read.parquet(pipe._path("clusters"))
            .select("image_id", "cluster_id"))


def _apply_add_commit(fs: CheckpointFS, root: str, manifest: dict) -> None:
    """Execute (or RESUME) a staged add commit.  Idempotent: every step
    checks what already happened, so it can re-run after a crash at any
    point — staged stage dirs are deleted once their files move (a
    re-run skips them), and a clusters partition swap re-runs only while
    its staged dir still exists."""
    staging = manifest["staging"]

    def _move_flat(name: str) -> None:
        src = f"{staging}/{name}"
        if fs.exists(src):
            fs.move_children(src, f"{root}/{name}")
            fs.delete(src)

    # hive-partitioned appends (ck_index/id_index): move each staged
    # partition dir's files into the live partition dir, then drop the
    # staged dir so a crashed re-run skips it (same idempotence contract
    # as the flat appends above).  The ~key_buckets partition dirs are
    # independent of each other and each move is 3-4 py4j FS round
    # trips, so the per-dir moves fan out over a small thread pool
    # (guide §2.6 applied to driver-side FS metadata latency); a crash
    # mid-fan-out recovers exactly as before — surviving staged dirs
    # re-move, finished ones were deleted
    def _move_partitioned(name: str) -> None:
        src = f"{staging}/{name}"
        if fs.exists(src):
            def _mv(child: str) -> None:
                cname = child.rsplit("/", 1)[-1]
                if not cname or "=" not in cname:
                    return  # _SUCCESS / hidden markers
                fs.move_children(child, f"{root}/{name}/{cname}")
                fs.delete(child)

            _fanout(_mv, fs.list_children(src))
            fs.delete(src)

    # tables are independent and each move is idempotent, so the
    # per-table rename loops (hundreds of FS metadata calls for the
    # key_buckets-partitioned sidecars) run concurrently; a crash
    # mid-commit recovers exactly as before, table by table
    _run_parallel(*[(lambda n=n: _move_flat(n))
                    for n in manifest["append_stages"]],
                  *[(lambda n=n: _move_partitioned(n))
                    for n in manifest.get("partitioned_appends", [])])
    _trace("commit: table moves done")
    if "id_index_gen" in manifest:
        fs.write_text(f"{root}/{ID_GEN_FILE}",
                      str(manifest["id_index_gen"]))
    live = f"{root}/clusters"

    def _swap_bucket(item) -> None:
        p, has_rows = item
        staged_p = f"{staging}/clusters/pbucket={p}"
        live_p = f"{live}/pbucket={p}"
        if has_rows:
            if fs.exists(staged_p):      # not yet swapped
                fs.delete(live_p)
                fs.rename(staged_p, live_p)
        else:
            fs.delete(live_p)

    # bucket swaps are independent (distinct dirs) and each is 2-3 FS
    # metadata calls; same fan-out as the partitioned moves above, same
    # per-bucket crash idempotence (a staged dir present => not swapped)
    _fanout(_swap_bucket, manifest["clusters_swap"].items())


def recover_add_commit(spark: SparkSession, checkpoint_dir: str) -> bool:
    """Roll FORWARD a torn append-only-add commit (crash after the
    manifest was written but before the commit finished).  Called
    automatically at the start of every :func:`incremental_add`; safe to
    call any time.  Returns True iff a torn commit was found and
    completed.  A staging dir WITHOUT a manifest is pre-commit garbage
    (the add never logically happened) and is left for the next add to
    wipe."""
    fs = CheckpointFS(spark, checkpoint_dir)
    mpath = f"{checkpoint_dir}/{ADD_MANIFEST}"
    if not fs.exists(mpath):
        return False
    manifest = json.loads(fs.read_text(mpath))
    _apply_add_commit(fs, checkpoint_dir, manifest)
    fs.delete(mpath)
    fs.delete(manifest["staging"])
    for name in (manifest["append_stages"]
                 + manifest.get("partitioned_appends", [])
                 + ["clusters"]):
        spark.catalog.refreshByPath(f"{checkpoint_dir}/{name}")
    return True
