"""k-NN-graph statistics + 2-D embedding — the ``ann`` subcommand analog.

The reference's ``ann`` entry point (gsearch ``src/bin/gsearch.rs:784-852``)
reloads the stored index, extracts the k-NN graph (k = 8,
``src/utils/embed.rs:21-22``), and reports (1) quantile statistics on
first-neighbor distances (``kgraph.get_kraph_stats``), (2) a hubness
summary — the standardized third moment of the in-degree distribution
plus its histogram (``embed.rs:28-32``), and (3) optionally a 2-D
embedding of the graph written to CSV with an edge-length quality
estimate (``embed.rs:34-70``).

Spark-first re-expression over the stored build:

* the k-NN graph comes from the SAME retrieval structure the engine
  uses everywhere (the candidate_pairs checkpoint = LSH-band
  neighborhood), exact-ranked by MinHash sketch distance — exactly
  "what the HNSW would return" with banding standing in for graph
  traversal (SURVEY §1.3);
* graph + hubness statistics are pure relational aggregates (DuckDB-
  oracle-able): distances are exact dyadic rationals (multiples of
  1/sketch_size) so their sums/averages are order-independent in IEEE
  doubles, and the skewness is derived from exact INTEGER moment sums
  in one identical closing expression — both engines hash-match
  bit-for-bit;
* the 2-D embedding is a deterministic anchor-plus-contraction layout
  (hash-anchored init, then iterated neighbor-mean attraction — the
  attraction half of annembed's gradient with anchors as the repulsion
  term; see :func:`spectral_embed2d` for why a global spectral drawing
  is deliberately not used on a many-component near-dup graph).  Each
  iteration is ONE shuffle (group the edge list by destination) plus
  driver-side scalar reductions, so the layout runs at any scale the
  edge list itself fits; lineage is cut per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

KNN_K = 8  # reference knbn, src/utils/embed.rs:21


# ------------------------------------------------------------- kNN graph

def knn_sketch_graph(spark: SparkSession, ckpt: str,
                     sketch_size: int = 128, k: int = KNN_K) -> DataFrame:
    """(src, dst, dist, rank): per-image top-k neighbors by MinHash
    sketch distance among the build's LSH candidates.

    dist = (sketch_size - equal slots) / sketch_size — the reference's
    DistHamming over sketch slots (1 - Jaccard estimate).  Ties break
    on dst id, so the graph is fully deterministic."""
    pairs = (spark.read.parquet(f"{ckpt}/candidate_pairs")
             .select("a", "b"))
    sigs = (spark.read.parquet(f"{ckpt}/signatures")
            .select("image_id", "minhash"))
    edges = (pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
             .unionByName(pairs.select(F.col("b").alias("src"),
                                       F.col("a").alias("dst"))))
    s = sigs.select(F.col("image_id").alias("src"),
                    F.col("minhash").alias("s_mh"))
    t = sigs.select(F.col("image_id").alias("dst"),
                    F.col("minhash").alias("t_mh"))
    eq = F.aggregate(
        F.zip_with("s_mh", "t_mh",
                   lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0), lambda acc, x: acc + x)
    w = Window.partitionBy("src").orderBy("dist", "dst")
    return (edges.join(s, "src").join(t, "dst")
            .withColumn("eq", eq)
            .withColumn("dist",
                        (F.lit(sketch_size) - F.col("eq")).cast("double")
                        / F.lit(float(sketch_size)))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("src", "dst", "dist", "rank"))


# ---------------------------------------------------------- graph stats

def graph_stats(spark: SparkSession, ckpt: str,
                sketch_size: int = 128, k: int = KNN_K) -> DataFrame:
    """One-row summary: node/edge counts, first-neighbor distance
    quantile stats (kgraph.get_kraph_stats analog) and the hubness
    standardized third moment (Hubness::get_standard3m analog,
    annembed's hubness measure over the k-NN in-degree distribution,
    zero-degree nodes included).

    Cross-engine determinism: distances are dyadic rationals (exact
    double sums); skewness derives from exact bigint moment sums in a
    single closed-form double expression mirrored verbatim in the
    DuckDB twin."""
    knn = knn_sketch_graph(spark, ckpt, sketch_size, k)
    sigs = spark.read.parquet(f"{ckpt}/signatures").select("image_id")
    first = knn.filter(F.col("rank") == 1)
    indeg = (sigs.join(knn.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
                       .withColumnRenamed("dst", "image_id"),
                       "image_id", "left")
             .select(F.coalesce("d", F.lit(0)).alias("d")))
    moments = indeg.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d").alias("s1"),
        F.sum(F.col("d") * F.col("d")).alias("s2"),
        F.sum(F.col("d") * F.col("d") * F.col("d")).alias("s3"),
        F.max("d").alias("max_indeg"))
    dstats = first.agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.min("dist").alias("d1_min"),
        F.expr("percentile(dist, 0.5)").alias("d1_median"),
        F.avg("dist").alias("d1_avg"),
        F.max("dist").alias("d1_max"))
    n_edges = knn.agg(F.count(F.lit(1)).alias("n_edges"))
    nD = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / nD
    m2 = F.col("s2").cast("double") / nD - mu * mu
    m3 = (F.col("s3").cast("double") / nD
          - F.lit(3.0) * mu * (F.col("s2").cast("double") / nD)
          + F.lit(2.0) * mu * mu * mu)
    return (moments.crossJoin(dstats).crossJoin(n_edges)
            .select(F.col("n").alias("n_nodes"), "n_edges", "n_sources",
                    "d1_min", "d1_median", "d1_avg", "d1_max",
                    F.col("max_indeg").cast("int").alias("max_indeg"),
                    F.when(m2 > 0, m3 / F.pow(m2, F.lit(1.5)))
                    .alias("hubness_s3")))


def hubness_histogram(spark: SparkSession, ckpt: str,
                      sketch_size: int = 128, k: int = KNN_K) -> DataFrame:
    """(in_degree, n_nodes): the hubness histogram
    (``Hubness::get_hubness_histogram``, embed.rs:32), zero-degree
    nodes included."""
    knn = knn_sketch_graph(spark, ckpt, sketch_size, k)
    sigs = spark.read.parquet(f"{ckpt}/signatures").select("image_id")
    indeg = (sigs.join(knn.groupBy("dst").agg(F.count(F.lit(1)).alias("d"))
                       .withColumnRenamed("dst", "image_id"),
                       "image_id", "left")
             .select(F.coalesce("d", F.lit(0)).alias("in_degree")))
    return (indeg.groupBy("in_degree")
            .agg(F.count(F.lit(1)).alias("n_nodes")))


# ----------------------------------------------------- DuckDB SQL twins

def _sql_knn_cte(ckpt: str, sketch_size: int = 128, k: int = KNN_K) -> str:
    return f"""
pairs AS (SELECT a, b FROM read_parquet('{ckpt}/candidate_pairs/*.parquet')),
sigs AS (SELECT image_id, minhash
         FROM read_parquet('{ckpt}/signatures/*.parquet')),
edges AS (SELECT a AS src, b AS dst FROM pairs
          UNION ALL SELECT b AS src, a AS dst FROM pairs),
scored AS (
  SELECT e.src, e.dst,
         len(list_filter(list_zip(s.minhash, t.minhash),
                         x -> x[1] = x[2])) AS eq
  FROM edges e
  JOIN sigs s ON e.src = s.image_id
  JOIN sigs t ON e.dst = t.image_id
),
knn AS (
  SELECT src, dst,
         CAST({sketch_size} - eq AS DOUBLE) / {sketch_size}.0 AS dist,
         row_number() OVER (PARTITION BY src
                            ORDER BY CAST({sketch_size} - eq AS DOUBLE)
                                     / {sketch_size}.0, dst) AS rank
  FROM scored
  QUALIFY rank <= {k}
),
indeg AS (
  SELECT g.image_id, COALESCE(c.d, 0) AS d
  FROM sigs g
  LEFT JOIN (SELECT dst, count(*) AS d FROM knn GROUP BY dst) c
    ON g.image_id = c.dst
)"""


def sql_graph_stats(ckpt: str, sketch_size: int = 128,
                    k: int = KNN_K) -> str:
    return f"""
WITH {_sql_knn_cte(ckpt, sketch_size, k)},
m AS (SELECT count(*) AS n, sum(d) AS s1, sum(d*d) AS s2,
             sum(d*d*d) AS s3, max(d) AS max_indeg FROM indeg),
ds AS (SELECT count(*) AS n_sources,
              min(dist) AS d1_min,
              CAST(quantile_cont(dist, 0.5) AS DOUBLE) AS d1_median,
              avg(dist) AS d1_avg,
              max(dist) AS d1_max
       FROM knn WHERE rank = 1),
ne AS (SELECT count(*) AS n_edges FROM knn)
SELECT CAST(m.n AS BIGINT) AS n_nodes,
       CAST(ne.n_edges AS BIGINT) AS n_edges,
       CAST(ds.n_sources AS BIGINT) AS n_sources,
       ds.d1_min, ds.d1_median, ds.d1_avg, ds.d1_max,
       CAST(m.max_indeg AS INTEGER) AS max_indeg,
       CASE WHEN (CAST(m.s2 AS DOUBLE) / CAST(m.n AS DOUBLE)
                  - (CAST(m.s1 AS DOUBLE) / CAST(m.n AS DOUBLE))
                    * (CAST(m.s1 AS DOUBLE) / CAST(m.n AS DOUBLE))) > 0
       THEN (CAST(m.s3 AS DOUBLE) / CAST(m.n AS DOUBLE)
             - 3.0 * (CAST(m.s1 AS DOUBLE) / CAST(m.n AS DOUBLE))
                   * (CAST(m.s2 AS DOUBLE) / CAST(m.n AS DOUBLE))
             + 2.0 * (CAST(m.s1 AS DOUBLE) / CAST(m.n AS DOUBLE))
                   * (CAST(m.s1 AS DOUBLE) / CAST(m.n AS DOUBLE))
                   * (CAST(m.s1 AS DOUBLE) / CAST(m.n AS DOUBLE)))
            / pow(CAST(m.s2 AS DOUBLE) / CAST(m.n AS DOUBLE)
                  - (CAST(m.s1 AS DOUBLE) / CAST(m.n AS DOUBLE))
                    * (CAST(m.s1 AS DOUBLE) / CAST(m.n AS DOUBLE)), 1.5)
       END AS hubness_s3
FROM m, ds, ne
"""


def sql_hubness_histogram(ckpt: str, sketch_size: int = 128,
                          k: int = KNN_K) -> str:
    return f"""
WITH {_sql_knn_cte(ckpt, sketch_size, k)}
SELECT d AS in_degree, count(*) AS n_nodes
FROM indeg
GROUP BY d
"""


# --------------------------------------------------- 2-D spectral layout

def spectral_embed2d(spark: SparkSession, ckpt: str,
                     sketch_size: int = 128, k: int = KNN_K,
                     iters: int = 12, alpha: float = 0.5) -> DataFrame:
    """(image_id, x, y): deterministic 2-D layout of the k-NN graph —
    the embedding half of the reference's ``ann`` (embed.rs:34-70).

    Construction: every node gets a deterministic pseudo-random anchor
    in the unit square (hash of its id — the dmap-style init), then
    ``iters`` rounds of neighborhood contraction
    ``x ← (1-α)·x + α·mean(neighbor x)`` pull k-NN neighbors together
    while distinct components stay spread around their own anchor
    means — the attraction half of annembed's neighbor-contraction
    gradient, with the anchors playing the role of its repulsion term.
    A global spectral drawing is deliberately NOT used: a near-dup
    k-NN graph is a forest of many small components, whose dominant
    eigenvectors concentrate on one component and collapse the rest.

    Execution shape: the symmetrized edge list is computed once and
    cut; each round is ONE shuffle (join coordinates onto edge
    destinations, groupBy source for the neighbor mean) with lineage
    cut per round — runs at any scale the edge list fits, no
    driver-side state beyond scalars."""
    knn = knn_sketch_graph(spark, ckpt, sketch_size, k)
    und = (knn.select("src", "dst")
           .unionByName(knn.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst")))
           .distinct().localCheckpoint())
    nodes = spark.read.parquet(f"{ckpt}/signatures").select("image_id")

    def init(salt: int):
        # deterministic pseudo-random anchor coordinate in [-0.5, 0.5)
        return (F.pmod(F.xxhash64(F.col("image_id"), F.lit(salt)),
                       F.lit(100_000)).cast("double") / 100_000.0 - 0.5)

    vec = (nodes.select("image_id", init(1).alias("x"), init(2).alias("y"))
           .localCheckpoint())
    for _ in range(iters):
        nbr = (und.join(vec.select(F.col("image_id").alias("dst"),
                                   F.col("x").alias("nx"),
                                   F.col("y").alias("ny")), "dst")
               .groupBy("src")
               .agg(F.avg("nx").alias("nx"), F.avg("ny").alias("ny"))
               .withColumnRenamed("src", "image_id"))
        vec = (vec.join(nbr, "image_id", "left")
               .select("image_id",
                       (F.lit(1.0 - alpha) * F.col("x")
                        + F.lit(alpha) * F.coalesce("nx", F.col("x")))
                       .alias("x"),
                       (F.lit(1.0 - alpha) * F.col("y")
                        + F.lit(alpha) * F.coalesce("ny", F.col("y")))
                       .alias("y"))
               .localCheckpoint())
    return vec
