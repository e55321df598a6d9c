"""Key-addressed lookup layouts for the append-only add path.

The reference's ``add`` subcommand reloads a persisted index that is
O(1)-addressable by rank and NEVER rescans it when inserting new items
(gsearch ``src/dna/dnasketch.rs:106-134``).  Through round 4 our add
path was compute-O(new) but still performed two keys-only scans of the
WHOLE stored corpus per append (the ck-membership probe and the
endpoint-label lookup) — at 10^12 rows that is tens of TB of metadata
read per daily append.  This module is the columnar analog of the
reference's addressable index: two small sidecar tables written beside
the build whose LAYOUT makes point lookups prune to O(probed keys) IO.

``ck_index``  (ck string, rep_id string)
    One row per exact-content group, hive-partitioned on
    ``kb = xxhash64(ck) % key_buckets`` and sorted by ``ck`` within
    files.  Append-only: a group's representative never changes (rank
    continuation), so adds only ever insert rows for brand-new content
    keys.

``id_index``  (image_id string, cluster_id string, is_rep boolean,
               rep_id string, gen int)
    One row per (image, generation), hive-partitioned on
    ``ib = xxhash64(image_id) % key_buckets`` and sorted by
    ``image_id`` within files.  Cluster labels change when components
    merge, so the table is LSM-style append-only with latest-``gen``
    wins (the Iceberg merge-on-read analog): each add appends one row
    per re-labelled / new member at ``gen = <add number>``; lookups
    resolve ``max_by(cluster_id, gen)``.  ``is_rep`` is immutable and
    set only on a row's first appearance, so it resolves as
    ``bool_or`` across generations.  ``rep_id`` is the image's FOUNDING
    exact-group node (the group's first representative — the stable
    node name of the dedup graph, immutable even if that image is later
    tombstoned by ``remove_images``): written on first appearance, null
    on relabel rows, resolved as ``max()`` (SQL aggregates skip nulls).
    :func:`compact_id_index` rewrites the table down to one row per
    image (run it offline when the stale fraction grows; at 10^12 scale
    this is the routine Iceberg rewrite-data-files maintenance job).

Both probes follow one pattern (:func:`_pruned`): the touched partition
list is computed from the probe keys (at most ``min(|keys|,
key_buckets)`` values — always driver-collectable) and applied as a
partition filter; when the probe key set fits
``cfg.add_lookup_max_literals`` it additionally ships as an IN-list so
parquet row-group stats on the key-sorted files prune inside each
partition.  Larger probe sets degrade to a semi join over the
partition-pruned slice — still never a full-table scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from gsearch_spark.config import PipelineConfig

CK_INDEX = "ck_index"
ID_INDEX = "id_index"
EDGE_INDEX = "edge_index"
# explicit read schema: a build with no verified edges writes a LEGAL
# empty edge_index (only _SUCCESS), which parquet schema inference
# cannot read back — every edge_index read declares this instead
EDGE_SCHEMA = "a string, b string, eb int"


def read_edge_index(spark: SparkSession, path: str) -> DataFrame:
    """Read the edge sidecar with its declared schema (an edge-free
    build's table is empty — inference would fail)."""
    return spark.read.schema(EDGE_SCHEMA).parquet(path)

# Key-filter strategy switch inside a partition-pruned lookup.  Up to
# this many probe keys ship as an IN-list: parquet's in-filter pushdown
# (spark.sql.parquet.pushdown.inFilterThreshold) evaluates each literal
# against row-group stats on the key-sorted files — a true point lookup
# (the streaming / single-image add case).  Past it the pushdown
# silently degrades to a min/max RANGE filter, which on arbitrary probe
# keys covers every row group — all the IN-list then buys is a per-row
# O(|keys|)-ish predicate that measured 1.85 s vs 0.47 s for a
# broadcast left-semi join against the same 2,196-key probe at 213k
# stored rows.  So larger probe sets join instead: a LocalRelation
# built from the already-collected keys, explicitly broadcast — same
# partition pruning, no literal-evaluation tax.  Execution strategy
# only (never signature-affecting), hence a constant and not a
# PipelineConfig field.
INLIST_MAX = 32


def _kb(col: str, buckets: int) -> "F.Column":
    return F.pmod(F.xxhash64(col), F.lit(buckets)).cast("int")


# --------------------------------------------------------------- writers

def write_ck_index(groups: DataFrame, path: str,
                   cfg: PipelineConfig) -> None:
    """Full build: one (ck, rep_id) row per exact-content group.

    repartition ON the partition column before partitionBy (each bucket
    = one task writing one file, not tasks x buckets small files), then
    sort by ck within the partition so every file's row groups carry
    tight ck min/max stats for the IN-list probes."""
    (groups.filter(F.col("image_id") == F.col("rep_id"))
     .select("ck", "rep_id")
     .withColumn("kb", _kb("ck", cfg.key_buckets))
     .repartition(cfg.key_buckets, F.col("kb"))
     .sortWithinPartitions("ck")
     .write.mode("overwrite").partitionBy("kb").parquet(path))


def write_id_index(clusters: DataFrame, groups: DataFrame, path: str,
                   cfg: PipelineConfig) -> None:
    """Full build: one (image_id, cluster_id, is_rep, rep_id, gen=0)
    row per image.  ``clusters`` is the expanded (image_id, cluster_id)
    table; rep-ness and the founding group node join in from the exact
    groups."""
    flags = groups.select("image_id",
                          (F.col("image_id") == F.col("rep_id"))
                          .alias("is_rep"), "rep_id")
    (clusters.select("image_id", "cluster_id")
     .join(flags, "image_id")
     .withColumn("gen", F.lit(0))
     .withColumn("ib", _kb("image_id", cfg.key_buckets))
     .repartition(cfg.key_buckets, F.col("ib"))
     .sortWithinPartitions("image_id")
     .write.mode("overwrite").partitionBy("ib").parquet(path))


def stage_ck_append(fresh_groups: DataFrame, staging_dir: str,
                    cfg: PipelineConfig) -> None:
    """Stage the add's NEW content-key rows (reps of fresh groups) as a
    partitioned delta; the commit renames each ``kb=`` dir's files into
    the live table (parquet part names embed a UUID — no collisions)."""
    (fresh_groups.filter(F.col("image_id") == F.col("rep_id"))
     .select("ck", "rep_id")
     .withColumn("kb", _kb("ck", cfg.key_buckets))
     .repartition(cfg.key_buckets, F.col("kb"))
     .sortWithinPartitions("ck")
     .write.mode("overwrite").partitionBy("kb")
     .parquet(f"{staging_dir}/{CK_INDEX}"))


def stage_id_append(delta: DataFrame, gen: int, staging_dir: str,
                    cfg: PipelineConfig) -> None:
    """Stage a mutation's (image_id, cluster_id, is_rep, rep_id) delta
    rows at generation ``gen`` (strictly increasing per mutation,
    carried in the commit manifest so a torn commit can roll forward
    idempotently).  ``rep_id`` must be null on relabel rows (founding
    group nodes are first-appearance-immutable)."""
    (delta.select("image_id", "cluster_id", "is_rep", "rep_id")
     .withColumn("gen", F.lit(gen))
     .withColumn("ib", _kb("image_id", cfg.key_buckets))
     .repartition(cfg.key_buckets, F.col("ib"))
     .sortWithinPartitions("image_id")
     .write.mode("overwrite").partitionBy("ib")
     .parquet(f"{staging_dir}/{ID_INDEX}"))


def write_edge_index(edges: DataFrame, path: str,
                     cfg: PipelineConfig) -> None:
    """Full build: the dedup graph's edge list keyed by FOUNDING group
    nodes — (a, b) with a < b, hive-partitioned on
    ``eb = xxhash64(a) % key_buckets`` and sorted by ``a`` within files.
    At build time every verified-edge endpoint is its own group's
    founding rep, so the checkpoint edges pass through untranslated.

    This sidecar exists for :func:`~gsearch_spark.operators.remove.\
remove_images`: a delete that kills an entire exact-group can SPLIT a
    cluster, and recomputing the affected components needs the edges
    among the affected clusters' group nodes — with this layout that
    read partition-prunes to the affected nodes' buckets (every
    intra-cluster edge has BOTH endpoints in the affected set, so
    pruning on ``a`` alone is lossless).  The reports/oracle surface
    keeps reading the flat ``verified_edges`` checkpoint; this is a
    connectivity-only (a, b) projection."""
    (edges.select("a", "b")
     .withColumn("eb", _kb("a", cfg.key_buckets))
     .repartition(cfg.key_buckets, F.col("eb"))
     .sortWithinPartitions("a")
     .write.mode("overwrite").partitionBy("eb").parquet(path))


def stage_edge_append(edges: DataFrame, staging_dir: str,
                      cfg: PipelineConfig) -> None:
    """Stage a mutation's new dedup-graph edges (already translated to
    founding-node endpoints, self-loops dropped) as a partitioned
    delta; committed by the same manifest machinery as the other
    partitioned appends."""
    (edges.select("a", "b")
     .withColumn("eb", _kb("a", cfg.key_buckets))
     .repartition(cfg.key_buckets, F.col("eb"))
     .sortWithinPartitions("a")
     .write.mode("overwrite").partitionBy("eb")
     .parquet(f"{staging_dir}/{EDGE_INDEX}"))


def lookup_edges_among(spark: SparkSession, path: str, nodes: DataFrame,
                       cfg: PipelineConfig,
                       idx_df: "DataFrame | None" = None) -> DataFrame:
    """(a, b) edges with BOTH endpoints in ``nodes`` (a single-column
    DataFrame named ``a`` of founding group ids).  Partition-prunes on
    the nodes' bucket set via the shared point-lookup plan, then keeps
    only edges whose far endpoint is also in the set (broadcast semi on
    the same already-small node list)."""
    if idx_df is None:
        idx_df = read_edge_index(spark, path)  # inference-safe when empty
    hits = _pruned(spark, path, "eb", "a", nodes, cfg, idx_df=idx_df)
    far = nodes.select(F.col("a").alias("b")).distinct()
    return (hits.join(F.broadcast(far), "b", "left_semi")
            .select("a", "b"))


# --------------------------------------------------------------- lookups

def _pruned(spark: SparkSession, path: str, part_col: str, key_col: str,
            keys: DataFrame, cfg: PipelineConfig,
            idx_df: "DataFrame | None" = None) -> DataFrame:
    """The shared pruned-point-lookup plan: partition filter from the
    probe keys' bucket set + IN-list (or partition-pruned semi join)
    on the key column.  ONE collect resolves both the literal list and
    its bucket set (the bucket is a pure function of the key); only a
    probe set past the literal cap pays a second, buckets-only collect
    for the semi-join fallback.  ``idx_df`` lets a caller issuing
    several lookups against the same table reuse one file-index listing
    (each fresh ``spark.read.parquet`` over the partition dirs costs
    ~2 s of driver-side listing at 64 buckets)."""
    kb = _kb(key_col, cfg.key_buckets)
    pairs = (keys.select(F.col(key_col).alias("k"), kb.alias("pb"))
             .distinct().limit(cfg.add_lookup_max_literals + 1).collect())
    idx = idx_df if idx_df is not None else spark.read.parquet(path)
    if len(pairs) <= cfg.add_lookup_max_literals:
        buckets = sorted({p["pb"] for p in pairs})
        sliced = idx.filter(F.col(part_col).isin(buckets))
        if len(pairs) <= INLIST_MAX:
            # few enough literals for parquet's in-filter row-group
            # pruning: the genuine point-lookup path
            return sliced.filter(
                F.col(key_col).isin([p["k"] for p in pairs]))
        # reuse the one collect as a broadcast LocalRelation probe —
        # no second job over `keys`, no large-IN-list evaluation tax
        probe = spark.createDataFrame(
            [(p["k"],) for p in pairs],
            schema=keys.select(key_col).schema)
        return sliced.join(F.broadcast(probe), key_col, "left_semi")
    buckets = sorted(r[0] for r in
                     keys.select(kb.alias("pb")).distinct().collect())
    return (idx.filter(F.col(part_col).isin(buckets))
            .join(keys.select(key_col).distinct(), key_col, "left_semi"))


def lookup_ck_index(spark: SparkSession, path: str, cks: DataFrame,
                    cfg: PipelineConfig,
                    idx_df: "DataFrame | None" = None) -> DataFrame:
    """(ck, rep_id) for exactly the probed cks present in the build."""
    return (_pruned(spark, path, "kb", "ck", cks, cfg, idx_df=idx_df)
            .select("ck", "rep_id"))


def lookup_id_index(spark: SparkSession, path: str, ids: DataFrame,
                    cfg: PipelineConfig,
                    idx_df: "DataFrame | None" = None) -> DataFrame:
    """(image_id, cluster_id, is_rep, rep_id) — latest generation wins
    (rep_id: the single non-null first-appearance value, via null-
    skipping max) — for exactly the probed ids present in the build."""
    return (_pruned(spark, path, "ib", "image_id", ids, cfg, idx_df=idx_df)
            .groupBy("image_id")
            .agg(F.max_by("cluster_id", "gen").alias("cluster_id"),
                 F.bool_or("is_rep").alias("is_rep"),
                 F.max("rep_id").alias("rep_id")))


# ----------------------------------------------------------- maintenance

def recover_table_swap(fs, path: str) -> bool:
    """Roll a torn staged-table swap forward (or discard its pre-commit
    staging) — used by :func:`compact_id_index` and the purge pass of
    ``operators/remove.py``.  The swap protocol is: write
    ``path__compact`` fully, rename live ``path`` -> ``path__old``,
    rename ``path__compact`` -> ``path``, delete ``path__old`` — so
    every crash window is distinguishable from the directories alone:

    * live ``path`` present: anything left over is pre-swap staging or
      a post-swap old copy — both droppable garbage;
    * ``path`` missing, staged ``path__compact`` present: crashed
      between the two renames — finish the swap;
    * ``path`` missing, only ``path__old`` present (staging lost, which
      the protocol cannot itself produce): restore the old copy.

    Idempotent, callable any time under the writer lock.  Returns True
    iff anything was repaired/cleaned.  Called automatically at the
    start of every ``incremental_add`` and ``compact_id_index``."""
    old, tmp = f"{path}__old", f"{path}__compact"
    if fs.exists(path):
        dropped_tmp = fs.delete(tmp)
        dropped_old = fs.delete(old)
        return bool(dropped_tmp or dropped_old)
    if fs.exists(tmp):
        if not fs.rename(tmp, path):
            raise IOError(f"compaction roll-forward rename failed: "
                          f"{tmp} -> {path}")
        fs.delete(old)
        return True
    if fs.exists(old):
        if not fs.rename(old, path):
            raise IOError(f"compaction roll-back rename failed: "
                          f"{old} -> {path}")
        return True
    return False


# established call sites (pipeline add entry, tests) use the original,
# id_index-specific name
recover_id_index_compaction = recover_table_swap


def swap_table_in(fs, path: str, staged: str) -> None:
    """Atomically swap a fully-staged replacement directory into
    ``path`` via the two-rename protocol :func:`recover_table_swap`
    understands (``staged`` must be ``path + '__compact'``)."""
    old = f"{path}__old"
    if staged != f"{path}__compact":
        raise ValueError(f"staged dir must be {path}__compact")
    if not fs.rename(path, old):
        raise IOError(f"table swap rename failed: {path} -> {old}")
    if not fs.rename(staged, path):
        raise IOError(f"table swap rename failed: {staged} -> {path}")
    fs.delete(old)


def compact_id_index(spark: SparkSession, path: str,
                     cfg: PipelineConfig) -> None:
    """Rewrite id_index down to one latest row per image (offline
    maintenance; the Iceberg rewrite-data-files analog).  Keeps each
    image's max gen so subsequent adds (whose gens come from the
    monotonically increasing commit counter) still win lookups.

    Takes the build's single-writer mutation lock (re-entrant): a
    compaction racing an add could drop the add's freshly appended
    generation rows.  The swap is crash-safe: the compacted table is
    fully staged, then swapped in via two renames (never a delete of
    the live table before its replacement is in place);
    :func:`recover_id_index_compaction` rolls any torn window forward."""
    from gsearch_spark.operators.pipeline import add_writer_lock
    from gsearch_spark.fs import CheckpointFS
    ckpt_dir = path.rsplit("/", 1)[0]
    with add_writer_lock(spark, ckpt_dir):
        fs = CheckpointFS(spark, path)
        recover_id_index_compaction(fs, path)  # clear any prior torn swap
        compacted = (spark.read.parquet(path)
                     .groupBy("image_id")
                     .agg(F.max_by("cluster_id", "gen").alias("cluster_id"),
                          F.bool_or("is_rep").alias("is_rep"),
                          F.max("rep_id").alias("rep_id"),
                          F.max("gen").alias("gen"))
                     .withColumn("ib", _kb("image_id", cfg.key_buckets))
                     .repartition(cfg.key_buckets, F.col("ib"))
                     .sortWithinPartitions("image_id"))
        tmp = f"{path}__compact"
        compacted.write.mode("overwrite").partitionBy("ib").parquet(tmp)
        swap_table_in(fs, path, tmp)
        spark.catalog.refreshByPath(path)
