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

EXACT_GROUPS_SCHEMA = "image_id string, rep_id string"


def exact_groups(images: DataFrame) -> DataFrame:
    """images -> (image_id, rep_id): one row per image, rep = min id of
    its exact-content group.  One shuffle on the content key; md5 (128
    bit) keeps collisions out of reach even at 10^12 rows."""
    ncap = F.lower(F.regexp_replace(F.trim(F.coalesce(
        F.col("caption"), F.lit(""))), r"\s+", " "))
    keyed = images.select(
        "image_id",
        F.concat(F.md5("bytes"), F.lit("|"), F.md5(ncap)).alias("ck"))
    w_min = (keyed.groupBy("ck")
             .agg(F.min("image_id").alias("rep_id")))
    return (keyed.join(w_min, "ck")
            .select("image_id", "rep_id"))


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
