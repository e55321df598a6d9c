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

from pyspark.sql import DataFrame, Window, functions as F

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

    ONE scan of the payload bytes (the md5-over-bytes is the heavy part of
    this stage) and ONE shuffle: the min-per-group is a window over ck, so
    the groupBy + re-join form — which scanned (and md5'd) the images
    twice — is gone.  ck is kept in the output so incremental adds can
    group new rows against old groups without touching old bytes.

    Skew tradeoff (deliberate): the window lands every row of one ck in a
    single task with no partial aggregation, so a viral key with 10^6
    byte-identical copies becomes one straggler task — whereas the
    groupBy form got map-side combine but md5'd the bytes twice.  The
    window wins because the shuffled rows are (image_id, ck) KEYS only
    (~100 B/row: a 10^6-copy bomb is ~100 MB in one task — slow, not
    fatal, and AQE's skew-split does not apply to windows), while the
    groupBy form's second byte scan is corpus-sized IO on every run.  If
    a real corpus shows hotter keys than that, compute min via groupBy
    (partial agg) and broadcast-join the (small) hot-key reps back."""
    w = Window.partitionBy("ck")
    return (content_keys(images)
            .select("image_id",
                    F.min("image_id").over(w).alias("rep_id"), "ck"))


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
