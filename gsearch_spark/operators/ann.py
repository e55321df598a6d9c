"""Similarity search over the ``embeddings`` table (training-data mandate).

Brute-force cosine top-k is the small-scale oracle (the reference's
all-pairs pattern, gsearch ``src/bin/bindash.rs:120-157``); the scale path
is sign-random-projection LSH bucketing (the SimHash trick applied to
dense vectors), which buckets candidates so the pairwise work is per
bucket, not global — the same band-join skeleton as the image pipeline.

Cross-engine determinism: dot products fold the array IN ORDER (Spark
``aggregate`` HOF; DuckDB ordered unnest+sum would reorder, so the oracle
uses ``list_dot_product``-free explicit per-index products summed by
index order via list comprehension + list_sum — see the SQL) and results
are rounded to 4 dp before ranking, with the neighbor id as tie-break.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

TOP_K = 3
N_PROJ = 8  # sign-projection bits for the LSH variant
N_TABLES = 2  # independent band tables for the retrieval variant
PROJ_PRIME = 2147483647


def _register(spark: SparkSession, sf_dir: str) -> None:
    spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .createOrReplaceTempView("embeddings")


def q_knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k per query vector (J4 oracle shape)."""
    _register(spark, sf_dir)
    return spark.sql(f"""
      WITH v AS (
        SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS e
        FROM embeddings
      ),
      norms AS (
        SELECT vec_id, e,
               sqrt(aggregate(e, cast(0.0 AS double),
                              (acc, x) -> acc + x * x)) AS nrm
        FROM v
      ),
      pairs AS (
        SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
               round(aggregate(zip_with(a.e, b.e, (x, y) -> x * y),
                               cast(0.0 AS double),
                               (acc, x) -> acc + x)
                     / (a.nrm * b.nrm), 4) AS cos_sim
        FROM norms a JOIN norms b ON a.vec_id <> b.vec_id
      ),
      ranked AS (
        SELECT vec_id, nbr_id, cos_sim,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos_sim DESC, nbr_id) AS rank
        FROM pairs
      )
      SELECT vec_id, nbr_id, cos_sim, cast(rank AS int) AS rank
      FROM ranked WHERE rank <= {TOP_K}
    """)


SQL_KNN_COSINE_TOPK = f"""
  WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
    FROM embeddings
  ),
  norms AS (
    SELECT vec_id, e,
           sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
    FROM v
  ),
  pairs AS (
    SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
           round(list_sum(list_transform(generate_series(1, len(a.e)),
                                         i -> a.e[i] * b.e[i]))
                 / (a.nrm * b.nrm), 4) AS cos_sim
    FROM norms a JOIN norms b ON a.vec_id <> b.vec_id
  ),
  ranked AS (
    SELECT vec_id, nbr_id, cos_sim,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos_sim DESC, nbr_id) AS rank
    FROM pairs
  )
  SELECT vec_id, nbr_id, cos_sim, rank::INT AS rank
  FROM ranked WHERE rank <= {TOP_K}
"""


def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection bucket id per vector (the ANN scale path).

    Projection vectors are pseudo-random ±1 derived from md5 of (bit,
    dim) — deterministic and identical in both engines.  Two vectors in
    the same bucket agree on all {N_PROJ} projection signs; buckets then
    feed the usual band-join candidate machinery.
    """
    _register(spark, sf_dir)
    return spark.sql(f"""
      WITH v AS (
        SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS e
        FROM embeddings
      ),
      proj AS (
        SELECT vec_id, b,
               aggregate(
                 zip_with(e, sequence(0, size(e) - 1),
                   (x, i) -> x * (2.0 * cast(
                       conv(substring(md5(concat(cast(b AS string), '_',
                                                 cast(i AS string))), 1, 8),
                            16, 10) % 2 AS double) - 1.0)),
                 cast(0.0 AS double), (acc, x) -> acc + x) AS s
        FROM v LATERAL VIEW explode(sequence(0, {N_PROJ - 1})) t AS b
      )
      SELECT vec_id,
             cast(sum(CASE WHEN s > 0 THEN shiftleft(cast(1 AS bigint), b)
                           ELSE cast(0 AS bigint) END) AS bigint) AS bucket
      FROM proj GROUP BY vec_id
    """)


DUP_COS_MIN = 0.35  # threshold for the embedding near-dup pair operator


def _spark_emb_scored_cte() -> str:
    """Shared Spark CTE chain: embeddings -> LSH buckets -> candidate
    pairs -> exact cosine (``scored``).  Used by both the top-k retrieval
    query and the threshold near-dup pair query."""
    return f"""
      WITH v AS (
        SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS e
        FROM embeddings
      ),
      norms AS (
        SELECT vec_id, e,
               sqrt(aggregate(e, cast(0.0 AS double),
                              (acc, x) -> acc + x * x)) AS nrm
        FROM v
      ),
      proj AS (
        SELECT vec_id, t, b,
               aggregate(
                 zip_with(e, sequence(0, size(e) - 1),
                   (x, i) -> x * (2.0 * cast(
                       conv(substring(md5(concat(cast(t AS string), '_',
                                                 cast(b AS string), '_',
                                                 cast(i AS string))), 1, 8),
                            16, 10) % 2 AS double) - 1.0)),
                 cast(0.0 AS double), (acc, x) -> acc + x) AS s
        FROM v
        LATERAL VIEW explode(sequence(0, {N_TABLES - 1})) tt AS t
        LATERAL VIEW explode(sequence(0, {N_PROJ - 1})) bb AS b
      ),
      buckets AS (
        SELECT vec_id, t,
               cast(sum(CASE WHEN s > 0 THEN shiftleft(cast(1 AS bigint), b)
                             ELSE cast(0 AS bigint) END) AS bigint) AS bucket
        FROM proj GROUP BY vec_id, t
      ),
      cands AS (
        SELECT DISTINCT x.vec_id AS vec_id, y.vec_id AS nbr_id
        FROM buckets x JOIN buckets y
          ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id <> y.vec_id
      ),
      scored AS (
        SELECT c.vec_id, c.nbr_id,
               round(aggregate(zip_with(a.e, b.e, (x, y) -> x * y),
                               cast(0.0 AS double),
                               (acc, x) -> acc + x)
                     / (a.nrm * b.nrm), 4) AS cos_sim
        FROM cands c
        JOIN norms a ON a.vec_id = c.vec_id
        JOIN norms b ON b.vec_id = c.nbr_id
      )
    """


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN retrieval completion (reference ``src/dna/dnarequest.rs:349-364``
    semantics): banded multi-table probing — N_TABLES independent
    sign-projection tables of N_PROJ bits; same-bucket vectors in ANY
    table become candidates; exact cosine ranks per-query top-k.

    Scale shape: pairwise work is per bucket (equi-join on (table,
    bucket)), never global; ranking is one shuffle on vec_id.  This is
    the embeddings-table twin of the image pipeline's band join.
    """
    _register(spark, sf_dir)
    return spark.sql(_spark_emb_scored_cte() + f"""
      , ranked AS (
        SELECT vec_id, nbr_id, cos_sim,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos_sim DESC, nbr_id) AS rank
        FROM scored
      )
      SELECT vec_id, nbr_id, cos_sim, cast(rank AS int) AS rank
      FROM ranked WHERE rank <= {TOP_K}
    """)


def q_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup DEDUP shape (vs the per-query top-k
    above): canonical a<b PAIRS whose exact cosine clears a threshold,
    candidates drawn from the same multi-table sign-projection buckets —
    the embeddings twin of the image pipeline's band->verify->edges flow
    (emit symmetric edges for CC, not per-query answers).

    The synthetic embeddings table plants no high-cosine duplicates
    (global max ~0.51), so the threshold sits at the table's top
    percentile ({DUP_COS_MIN}); the gated semantics are the operator's —
    bucket-candidate generation, exact re-check, canonical ordering —
    not the knob value, which a real corpus would set near 0.95.
    """
    _register(spark, sf_dir)
    return spark.sql(_spark_emb_scored_cte() + f"""
      SELECT vec_id AS a, nbr_id AS b, cos_sim
      FROM scored
      WHERE vec_id < nbr_id AND cos_sim >= {DUP_COS_MIN}
    """)


_DUCK_EMB_SCORED_CTE = f"""
  WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
    FROM embeddings
  ),
  norms AS (
    SELECT vec_id, e,
           sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
    FROM v
  ),
  proj AS (
    SELECT vec_id, t, b,
           list_sum(list_transform(generate_series(1, len(e)),
             i -> e[i] * (2.0 * (('0x' || substr(md5(t::VARCHAR || '_'
                          || b::VARCHAR || '_'
                          || (i - 1)::VARCHAR), 1, 8))::BIGINT % 2)::DOUBLE
                          - 1.0))) AS s
    FROM v,
         unnest(generate_series(0, {N_TABLES - 1})) AS tt(t),
         unnest(generate_series(0, {N_PROJ - 1})) AS bb(b)
  ),
  buckets AS (
    SELECT vec_id, t,
           sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT
             AS bucket
    FROM proj GROUP BY vec_id, t
  ),
  cands AS (
    SELECT DISTINCT x.vec_id AS vec_id, y.vec_id AS nbr_id
    FROM buckets x JOIN buckets y
      ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id <> y.vec_id
  ),
  scored AS (
    SELECT c.vec_id, c.nbr_id,
           round(list_sum(list_transform(generate_series(1, len(a.e)),
                                         i -> a.e[i] * b.e[i]))
                 / (a.nrm * b.nrm), 4) AS cos_sim
    FROM cands c
    JOIN norms a ON a.vec_id = c.vec_id
    JOIN norms b ON b.vec_id = c.nbr_id
  )
"""

SQL_ANN_LSH_TOPK = _DUCK_EMB_SCORED_CTE + f"""
  , ranked AS (
    SELECT vec_id, nbr_id, cos_sim,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos_sim DESC, nbr_id) AS rank
    FROM scored
  )
  SELECT vec_id, nbr_id, cos_sim, rank::INT AS rank
  FROM ranked WHERE rank <= {TOP_K}
"""

SQL_EMBEDDING_COSINE_PAIRS = _DUCK_EMB_SCORED_CTE + f"""
  SELECT vec_id AS a, nbr_id AS b, cos_sim
  FROM scored
  WHERE vec_id < nbr_id AND cos_sim >= {DUP_COS_MIN}
"""


SQL_ANN_LSH_BUCKETS = f"""
  WITH v AS (
    SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
    FROM embeddings
  ),
  proj AS (
    SELECT vec_id, b,
           list_sum(list_transform(generate_series(1, len(e)),
             i -> e[i] * (2.0 * (('0x' || substr(md5(b::VARCHAR || '_'
                          || (i - 1)::VARCHAR), 1, 8))::BIGINT % 2)::DOUBLE
                          - 1.0))) AS s
    FROM v, unnest(generate_series(0, {N_PROJ - 1})) AS t(b)
  )
  SELECT vec_id,
         sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT
           AS bucket
  FROM proj GROUP BY vec_id
"""
