"""Stage 3: band buckets -> candidate pairs (the "search").

Replaces the reference's ``hnsw.parallel_search`` (gsearch
``src/dna/dnarequest.rs:349-364``): instead of graph traversal, items
sharing a salted (band_id, band_hash, salt) bucket become candidate
pairs — LSH's equi-join trick (SURVEY §2.5 J1: metric proximity turned
into an equi-join).

Execution shape (100 TB-minded): ONE shuffle (the groupBy on bucket
keys), then pair expansion entirely in JVM whole-stage codegen via array
higher-order functions — no Python, no second join.  Salting (upstream)
caps each bucket's size, so the per-bucket ``collect_list`` is bounded.

Pair-explosion guard (10^12-scale failure mode, SURVEY §7.3): a bucket of
m items yields m(m-1)/2 pairs.  Policy per bucket:

  * m <= ALL_PAIRS_MAX: emit ALL pairs (small buckets, exact recall).
  * m >  ALL_PAIRS_MAX: emit STAR edges from the 2 lexicographically
    smallest members to everyone (2m - 3 edges).  Connected components
    only needs a spanning edge set; near-identical buckets are cliques
    after verify anyway, and the second representative covers the case
    where the first fails verification against part of the bucket.  A
    dup-group of size m therefore costs O(m * bands) candidates total,
    never O(m^2) — at 10^12 rows a viral image with 10^6 copies must not
    produce 10^12 pairs.  No silent loss: bucket_stats() surfaces how
    many buckets hit the star policy.

Pairs are canonically ordered a < b (reference J5: self-pair suppression
+ halved join, ``src/bin/bindash.rs:139-153``) and deduplicated across
buckets/band sets with min(src) so the output is deterministic under any
input partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PAIRS_SCHEMA = "a string, b string, src string"
PHASH_BAND_OFFSET = 2000
CAPTION_BAND_OFFSET = 3000
ALL_PAIRS_MAX = 16
STAR_REPS = 2
SIMHASH_BAND_OFFSET = 1000

# all unordered pairs (i < j) from the sorted id array
_ALL_PAIRS = ("flatten(transform(ids, (x, i) -> "
              "transform(slice(ids, i + 2, size(ids)), "
              "y -> named_struct('a', x, 'b', y))))")
# star: the first STAR_REPS ids pair with every later id
_STAR = (f"flatten(transform(slice(ids, 1, {STAR_REPS}), (x, i) -> "
         "transform(slice(ids, i + 2, size(ids)), "
         "y -> named_struct('a', x, 'b', y))))")


def band_src() -> "F.Column":
    """band_id -> source tag (shared by the self-join and probe paths)."""
    return (F.when(F.col("band_id") < SIMHASH_BAND_OFFSET, F.lit("minhash"))
            .when(F.col("band_id") < PHASH_BAND_OFFSET, F.lit("simhash"))
            .when(F.col("band_id") < CAPTION_BAND_OFFSET, F.lit("phash"))
            .otherwise(F.lit("caption")))


def emit_bucket_pairs(bands_df: DataFrame,
                      all_pairs_max: int = ALL_PAIRS_MAX) -> DataFrame:
    """bands -> deduplicated candidate pairs with source tags (pure JVM)."""
    # collect_list, not collect_set: the bands table carries one row per
    # (band_id, image_id), so a (band, hash, salt) bucket can never hold
    # the same image twice — sort_array(list) == sort_array(set), and
    # the list buffer skips the per-element hash-set work (measured
    # ~0.5 s at 5.7M band rows)
    grouped = (bands_df
               .groupBy("band_id", "band_hash", "salt")
               .agg(F.sort_array(F.collect_list("image_id")).alias("ids"))
               .filter(F.size("ids") >= 2))
    pairs = (grouped
             .select("band_id",
                     F.explode(F.when(F.size("ids") <= all_pairs_max,
                                      F.expr(_ALL_PAIRS))
                               .otherwise(F.expr(_STAR))).alias("p"))
             .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"),
                     band_src().alias("src")))
    return pairs.groupBy("a", "b").agg(F.min("src").alias("src"))


def probe_pairs_vs_stored(new_exploded: DataFrame, stored_bands: DataFrame,
                          heads_per_bucket: int = ALL_PAIRS_MAX) -> DataFrame:
    """New-vs-OLD candidate pairs for the append-only ``add`` path.

    Joins the UNSALTED exploded band keys of the new slice against the
    stored bands checkpoint on (band_id, band_hash) — salt is ignored on
    purpose: salting exists to bound the build-time self-join, while a
    probe only needs SOME member of each co-bucketed old cluster
    (reference analog: ``add`` inserts new items into the persisted HNSW
    and searches existing nodes, gsearch src/dna/dnasketch.rs:106-134).

    Skew guard (the 10^12-scale failure mode): a viral bucket holds 10^6
    old members, and joining every new dup against all of them re-creates
    the quadratic blow-up salting killed.  So the stored side is first
    pruned to TOUCHED buckets (semi join on the new slice's keys — only
    buckets a new row can land in are ever read past the scan), then cut
    to ``heads_per_bucket`` members per bucket (window row_number,
    spillable — no driver collect, no giant collect_set).  Heads are
    picked in xxhash64(image_id) order, NOT lexicographic: appended ids
    often sort before (or after) the original corpus's ids wholesale, so
    id order would systematically bias heads toward one append
    generation; hash order is deterministic but generation-blind (ties
    broken by id for full determinism).
    Connectivity only needs one verified edge into the bucket's existing
    cluster; the heads give ``heads_per_bucket`` independent verify shots,
    the same budget the build-time star policy grants (ALL_PAIRS_MAX),
    and every band family contributes its own heads.

    RECALL CAVEAT (probabilistic, like the star policy): a new duplicate
    whose only co-bucketed true match sits outside the heads in EVERY
    band family gets no edge a full rebuild would find — clusters ==
    rebuild is then violated for that row.  This needs the true match to
    lose the hash-order draw in all ~27 band families at once while
    >= heads_per_bucket unrelated collisions beat it in each, which at
    default settings is vanishingly rare for real near-dups (they share
    most bands) — but it is a bound, not a guarantee, and the tradeoff
    is what keeps per-add probe cost O(new), the same deal
    ``add_max_candidates_per_item`` makes on the verify side.
    """
    from pyspark.sql import Window
    keys = new_exploded.select("band_id", "band_hash").distinct()
    touched = stored_bands.join(keys, ["band_id", "band_hash"], "left_semi")
    wk = (Window.partitionBy("band_id", "band_hash")
          .orderBy(F.xxhash64("image_id"), "image_id"))
    heads = (touched
             .withColumn("rn", F.row_number().over(wk))
             .filter(F.col("rn") <= heads_per_bucket)
             .select("band_id", "band_hash",
                     F.col("image_id").alias("old_id")))
    q = new_exploded.select("band_id", "band_hash",
                            F.col("image_id").alias("new_id"))
    pairs = (heads.join(q, ["band_id", "band_hash"])
             .filter(F.col("old_id") != F.col("new_id"))
             .select(F.least("old_id", "new_id").alias("a"),
                     F.greatest("old_id", "new_id").alias("b"),
                     band_src().alias("src")))
    return pairs.groupBy("a", "b").agg(F.min("src").alias("src"))


def bucket_stats(bands_df: DataFrame, all_pairs_max: int = ALL_PAIRS_MAX
                 ) -> DataFrame:
    """Metrics: bucket-size histogram + how many buckets hit star policy
    (no silent caps — this is surfaced in pipeline_state / logs)."""
    sizes = (bands_df.groupBy("band_id", "band_hash", "salt")
             .agg(F.count(F.lit(1)).alias("m")))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.when(F.col("m") > 1, 1).otherwise(0)).alias("n_nontrivial"),
        F.sum(F.when(F.col("m") > all_pairs_max, 1).otherwise(0))
        .alias("n_star_policy"),
        F.max("m").alias("max_bucket"),
        F.sum(F.when(F.col("m") <= all_pairs_max,
                     F.col("m") * (F.col("m") - 1) / 2)
              .otherwise(2 * F.col("m") - 3)).alias("pairs_emitted_approx"))
