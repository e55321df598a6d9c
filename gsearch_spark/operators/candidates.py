"""Stage 3: band buckets -> candidate pairs (the "search").

Replaces the reference's ``hnsw.parallel_search`` (gsearch
``src/dna/dnarequest.rs:349-364``): instead of graph traversal, items
sharing a salted (band_id, band_hash, salt) bucket become candidate
pairs via a grouped pair-emission — LSH's equi-join trick (SURVEY §2.5 J1
— metric proximity turned into an equi-join).

Pair-explosion guard (10^12-scale failure mode, SURVEY §7.3): a bucket of
m items yields m(m-1)/2 pairs.  Policy per bucket:

  * m <= all_pairs_max: emit ALL pairs (small buckets, exact recall).
  * m >  all_pairs_max: emit STAR edges to the 2 lexicographically
    smallest members (2m - 3 edges).  Connected components only needs a
    spanning edge set; near-identical buckets are cliques after verify
    anyway, and the second representative covers the case where the first
    fails verification against part of the bucket.  No silent loss: the
    bucket count and policy are reported in the stage metrics.

Pairs are canonically ordered a < b (reference J5: self-pair suppression +
halved join, ``src/bin/bindash.rs:139-153``) and deduplicated across
buckets/band sets.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

PAIRS_SCHEMA = "a string, b string, src string"
# All-pairs only for small buckets: a dup-group of size m must cost
# O(m * bands) candidates, never O(m^2) — at 10^12 rows a single viral
# image can have 10^6 copies, and 10^12 pairs from one bucket is fatal.
ALL_PAIRS_MAX = 16
STAR_REPS = 2
SIMHASH_BAND_OFFSET = 1000


def emit_bucket_pairs(bands_df: DataFrame,
                      all_pairs_max: int = ALL_PAIRS_MAX) -> DataFrame:
    """bands -> deduplicated candidate pairs with source tags."""

    def per_bucket(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(pdf["image_id"].unique())
        m = len(ids)
        if m < 2:
            return pd.DataFrame({"a": [], "b": [], "src": []})
        src = "minhash" if key[0] < SIMHASH_BAND_OFFSET else "simhash"
        a, b = [], []
        if m <= all_pairs_max:
            for i in range(m):
                for j in range(i + 1, m):
                    a.append(ids[i]); b.append(ids[j])
        else:
            reps = ids[:STAR_REPS]
            for r_i in range(len(reps)):
                for x in ids[r_i + 1:]:
                    a.append(reps[r_i]); b.append(x)
        return pd.DataFrame({"a": a, "b": b, "src": src})

    pairs = (bands_df
             .groupBy("band_id", "band_hash", "salt")
             .applyInPandas(per_bucket, schema=PAIRS_SCHEMA))
    return pairs.dropDuplicates(["a", "b"])


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
