"""Stage 0: exact-duplicate collapse (identity short-circuit).

The reference short-circuits identical items before metric comparison
(equal-basename pairs forced to distance 0, gsearch
``src/bin/bindash.rs:139-153``, SURVEY J5).  At web scale this is the
single most important skew defense: viral/black images are BYTE-identical
in the millions, and letting them into LSH produces quadratic bucket
blowups and terabytes of redundant pixel verification.

Rows are grouped by (md5(bytes), md5(normalized caption)) — both computed
JVM-side, no decode — and each group elects its minimum image_id as
representative.  Only representatives are sketched, banded, paired and
verified; members inherit their representative's cluster at the end.
Because rep = min(id) of its group and CC cluster ids are min-of-
component, the expanded cluster_id is already the global minimum member —
no recomputation needed.

Member->rep equality is exact by construction (identical bytes => decoded
pixels identical; identical normalized caption), so the per-row
verification invariant holds for the implicit member edges without
decoding anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EXACT_GROUPS_SCHEMA = "image_id string, rep_id string, ck string"


def content_keys(images: DataFrame) -> DataFrame:
    """images -> (image_id, ck): the 2x128-bit exact-content key, computed
    JVM-side with no decode.  md5 keeps collisions out of reach even at
    10^12 rows.  Exposed separately so the append-only ``add`` path can
    key NEW rows without rescanning old payload bytes (the stored
    exact_groups checkpoint carries every old row's ck)."""
    ncap = F.lower(F.regexp_replace(F.trim(F.coalesce(
        F.col("caption"), F.lit(""))), r"\s+", " "))
    return images.select(
        "image_id",
        F.concat(F.md5("bytes"), F.lit("|"), F.md5(ncap)).alias("ck"))


def exact_groups(images: DataFrame) -> DataFrame:
    """images -> (image_id, rep_id, ck): one row per image, rep = min id
    of its exact-content group.

    ONE scan of the payload bytes (the md5-over-bytes is the heavy part
    of this stage), materialized as keys-only rows, then a skew-immune
    two-step: min-per-ck via groupBy (map-side partial aggregation
    collapses a 10^6-copy viral key to one row per map task BEFORE the
    shuffle) and a join-back of the tiny (ck, rep_id) relation onto the
    keys.  ck is kept in the output so incremental adds can group new
    rows against old groups without touching old bytes.

    History: rounds 1-4 used ``min over (partition by ck)`` — one
    shuffle, but a window gives every row of one ck to a single task
    with no partial aggregation and no AQE help, which the sf0.5 arm
    measured as an 11x straggler (20 s flat across runs at 1.06M rows
    with 10% skew bombs).  The groupBy form was originally rejected
    because referencing the keys subtree twice re-scanned (and re-
    md5'd) the payload bytes; ``localCheckpoint`` removes that — the
    ~100 B/row key rows are materialized once and both consumers read
    the materialization.  (At a real 10^12 deployment the same role is
    played by the exact_groups checkpoint write itself: stage the keys
    to distributed storage, then aggregate+join over the staged table.)
    The join-back is skew-safe where the window was not: the bomb's
    rows still co-locate, but sort-merge-join partitions are splittable
    by AQE's skew-join rule (spark.sql.adaptive.skewJoin), and the
    build side is one row per distinct ck."""
    keys = content_keys(images).localCheckpoint()
    reps = keys.groupBy("ck").agg(F.min("image_id").alias("rep_id"))
    return keys.join(reps, "ck").select("image_id", "rep_id", "ck")


def representatives(images: DataFrame, groups: DataFrame) -> DataFrame:
    """Filter images down to group representatives (the sketch set)."""
    reps = (groups.filter(F.col("image_id") == F.col("rep_id"))
            .select("image_id"))
    return images.join(reps, "image_id", "left_semi")


def expand_clusters(rep_clusters: DataFrame, groups: DataFrame) -> DataFrame:
    """rep-level clusters + groups -> full (image_id, cluster_id).

    rep_clusters: (image_id=rep, cluster_id); groups: (image_id, rep_id).
    """
    return (groups
            .join(rep_clusters.withColumnRenamed("image_id", "rep_id"),
                  "rep_id")
            .select("image_id", "cluster_id"))
