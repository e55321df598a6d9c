"""Answer-shaping operators: per-query top-k neighbor reports.

The analogs of the reference's post-processing binaries:

  * ``topk_neighbors``  — reformat: global (query, distance) sort with
    similarity transforms per neighbor (gsearch
    ``src/bin/reformat.rs:45-86``; O1/O2 + C2-C4).
  * ``knn_adjacency``   — hnsw2knn: per-node neighbor list capped at k
    (gsearch ``src/bin/hnsw2knn.rs:101-171``; O4).
  * ``best_hit``        — documented best-hit-per-query awk recipe
    (gsearch ``README.md:247``; G5).

All operate on the ``verified_edges`` table; 'distance' here is derived
from PSNR (similarity) as d = 1 / (1 + psnr) so lower = closer, keeping
the reference's lower-is-better convention without inventing fake ANI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _bidirect(edges: DataFrame) -> DataFrame:
    fwd = edges.select(F.col("a").alias("query"),
                       F.col("b").alias("neighbor"), "psnr", "src")
    rev = edges.select(F.col("b").alias("query"),
                       F.col("a").alias("neighbor"), "psnr", "src")
    return fwd.union(rev)


def topk_neighbors(edges: DataFrame, k: int = 5,
                   rounded: bool = True) -> DataFrame:
    """Per-query top-k verified neighbors, highest PSNR (closest) first,
    deterministic tie-break on neighbor id.

    ``rounded=False`` emits full-precision doubles — the cross-engine
    hash-gate mode: Spark's round() goes through BigDecimal-of-
    shortest-string semantics that can differ from another engine's on
    values whose shortest repr lands exactly on the rounding grid,
    while raw IEEE doubles compare bit-identical."""
    w = Window.partitionBy("query").orderBy(F.desc("psnr"), F.col("neighbor"))
    psnr_db = (F.round("psnr", 2) if rounded else F.col("psnr"))
    dist = 1.0 / (1.0 + F.greatest(F.col("psnr"), F.lit(0.0)))
    return (_bidirect(edges)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query", "neighbor",
                    psnr_db.alias("psnr_db"),
                    (F.round(dist, 6) if rounded else dist)
                    .alias("distance"),
                    "src", F.col("rank").cast("int").alias("rank")))


def knn_adjacency(edges: DataFrame, k: int = 32) -> DataFrame:
    """Per-node adjacency list (array column), capped at k neighbors."""
    w = Window.partitionBy("query").orderBy(F.desc("psnr"), F.col("neighbor"))
    return (_bidirect(edges)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .groupBy("query")
            .agg(F.sort_array(F.collect_list("neighbor")).alias("neighbors"),
                 F.count(F.lit(1)).cast("int").alias("degree")))


def best_hit(edges: DataFrame) -> DataFrame:
    """Single best neighbor per query (G5)."""
    return topk_neighbors(edges, k=1).drop("rank")
