"""SQL-expressible twin of the image pipeline's signature/banding half.

The flagship pipeline is rows-only at the driver gate because pixel
decode can't run in DuckDB — but the MinHash half of the signature
(phash bit n-grams ∪ caption k-grams -> one-permutation MinHash -> LSH
bands -> candidate pairs) never touches pixels: phash is a COLUMN of the
input table.  This module re-expresses exactly that structure with an
md5-derived hash family (identical in Spark SQL and DuckDB, like
``textdedup``) over the same deterministic images fixture the pipeline
runs on, giving the signatures family a hash-checked driver gate.

Shingle rules mirror ``gsearch_spark/oracle.py::combined_shingles``:
  * phash windows: 16-bit sliding windows at bit offsets 0..48,
    position-tagged (arithmetic-shift + mask is identical in both
    engines because the mask keeps only real value bits);
  * caption k-grams: 5-char grams of the normalized caption (lowercase,
    whitespace collapsed); captions shorter than k contribute one
    whole-string shingle; empty captions contribute none.
MinHash/banding parameters are the textdedup family's (16 perms, 4x4).

Reference anchors: sketch stage ``src/dna/dnasketch.rs:327-365``; band
search ``src/dna/dnarequest.rs:349-364``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gsearch_spark.operators.textdedup import (N_PERMS, PRIME, ROWS_PER_BAND,
                                               _perm_arrays_sql)

PHASH_WINDOW_BITS = 16
N_WINDOWS = 64 - PHASH_WINDOW_BITS + 1  # bit offsets 0..48
CAPTION_K = 5


def _spark_shingle_cte(parquet_path: str) -> str:
    return f"""
      WITH img AS (
        SELECT image_id,
               regexp_replace(lower(trim(caption)), '\\\\s+', ' ') AS cap,
               phash
        FROM parquet.`{parquet_path}`
      ),
      shingles AS (
        SELECT image_id,
               concat('p', cast(b AS string), '_',
                      cast(shiftright(phash, b) & {(1 << PHASH_WINDOW_BITS) - 1}
                           AS string)) AS sh
        FROM img LATERAL VIEW explode(sequence(0, {N_WINDOWS - 1})) w AS b
        UNION ALL
        SELECT image_id, concat('c_', substring(cap, i, {CAPTION_K})) AS sh
        FROM img LATERAL VIEW explode(
          sequence(1, length(cap) - {CAPTION_K} + 1)) s AS i
        WHERE length(cap) >= {CAPTION_K}
        UNION ALL
        SELECT image_id, concat('c_', cap) AS sh
        FROM img WHERE length(cap) > 0 AND length(cap) < {CAPTION_K}
      ),
      hashed AS (
        SELECT DISTINCT image_id,
               cast(conv(substring(md5(sh), 1, 15), 16, 10) AS bigint)
                 % {PRIME} AS h0
        FROM shingles
      )
    """


def _duck_shingle_cte(parquet_path: str) -> str:
    return f"""
      WITH img AS (
        SELECT image_id,
               regexp_replace(lower(trim(caption)), '\\s+', ' ', 'g') AS cap,
               phash
        FROM read_parquet('{parquet_path}')
      ),
      shingles AS (
        SELECT image_id,
               'p' || b::VARCHAR || '_' ||
               ((phash >> b) & {(1 << PHASH_WINDOW_BITS) - 1})::VARCHAR AS sh
        FROM img, unnest(generate_series(0, {N_WINDOWS - 1})) AS w(b)
        UNION ALL
        SELECT image_id, 'c_' || substr(cap, i, {CAPTION_K}) AS sh
        FROM img, unnest(generate_series(1, len(cap) - {CAPTION_K} + 1))
             AS s(i)
        WHERE len(cap) >= {CAPTION_K}
        UNION ALL
        SELECT image_id, 'c_' || cap AS sh
        FROM img WHERE len(cap) > 0 AND len(cap) < {CAPTION_K}
      ),
      hashed AS (
        SELECT DISTINCT image_id,
               ('0x' || substr(md5(sh), 1, 15))::BIGINT % {PRIME} AS h0
        FROM shingles
      )
    """


def _spark_minhash_cte(parquet_path: str) -> str:
    (a_spark, _), (b_spark, _) = _perm_arrays_sql()
    return _spark_shingle_cte(parquet_path) + f"""
      , minhash AS (
        SELECT image_id, j,
               min((element_at({a_spark}, j + 1) * h0
                    + element_at({b_spark}, j + 1)) % {PRIME}) AS minval
        FROM hashed LATERAL VIEW explode(sequence(0, {N_PERMS - 1})) p AS j
        GROUP BY image_id, j
      )
    """


def _duck_minhash_cte(parquet_path: str) -> str:
    (_, a_duck), (_, b_duck) = _perm_arrays_sql()
    return _duck_shingle_cte(parquet_path) + f"""
      , minhash AS (
        SELECT image_id, j,
               min(({a_duck}[j + 1] * h0 + {b_duck}[j + 1]) % {PRIME})
                 AS minval
        FROM hashed, unnest(generate_series(0, {N_PERMS - 1})) AS p(j)
        GROUP BY image_id, j
      )
    """


def q_images_sig_minhash(spark: SparkSession, parquet_path: str) -> DataFrame:
    """Signatures-family gate: one row per (image, perm) with the min
    hashed shingle — the SQL twin of compute_signatures' minhash half."""
    return spark.sql(_spark_minhash_cte(parquet_path)
                     + "SELECT image_id, j AS perm, minval FROM minhash")


def sql_images_sig_minhash(parquet_path: str) -> str:
    return (_duck_minhash_cte(parquet_path)
            + "SELECT image_id, j AS perm, minval FROM minhash")


def q_images_lsh_pairs(spark: SparkSession, parquet_path: str) -> DataFrame:
    """Banding-family gate: identical band signature => candidate pair,
    the SQL twin of build_bands + emit_bucket_pairs (minhash family)."""
    return spark.sql(_spark_minhash_cte(parquet_path) + f"""
      , bands AS (
        SELECT image_id, cast(j / {ROWS_PER_BAND} AS int) AS band,
               array_join(transform(array_sort(
                   collect_list(struct(j, minval))),
                   s -> cast(s.minval AS string)), '-') AS sig
        FROM minhash
        GROUP BY image_id, cast(j / {ROWS_PER_BAND} AS int)
      )
      SELECT DISTINCT x.image_id AS a, y.image_id AS b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.sig = y.sig AND x.image_id < y.image_id
    """)


def sql_images_lsh_pairs(parquet_path: str) -> str:
    return _duck_minhash_cte(parquet_path) + f"""
      , bands AS (
        SELECT image_id, (j // {ROWS_PER_BAND})::INT AS band,
               string_agg(minval::VARCHAR, '-' ORDER BY j) AS sig
        FROM minhash
        GROUP BY image_id, (j // {ROWS_PER_BAND})::INT
      )
      SELECT DISTINCT x.image_id AS a, y.image_id AS b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.sig = y.sig AND x.image_id < y.image_id
    """


# --------------------------------------------------------------------------
# Request/reformat twin: per-probe top-k answers with ANI columns.
#
# The reference's most-used output surface is `request` piped through
# `reformat` (src/bin/reformat.rs:69-86): one row per (query, neighbor)
# with the sketch distance and an ANI estimate — model 1 (Poisson)
# (1 + ln(2j/(1+j))/k)*100, model 2 (binomial) (2j/(1+j))^(1/k)*100.
# Probes are every 7th image (deterministic on the numeric id suffix so
# Spark and DuckDB pick identical rows); candidates come from the band
# equi-join (band match => >= ROWS_PER_BAND agreeing slots => j_est > 0,
# so ln never sees 0); j_est is exact slot agreement over all perms.
# --------------------------------------------------------------------------

REQ_K = 3
REQ_MAX_DIST = 0.5


def q_images_request_ani(spark: SparkSession, parquet_path: str) -> DataFrame:
    return spark.sql(_spark_minhash_cte(parquet_path) + f"""
      , bands AS (
        SELECT image_id, cast(j / {ROWS_PER_BAND} AS int) AS band,
               array_join(transform(array_sort(
                   collect_list(struct(j, minval))),
                   s -> cast(s.minval AS string)), '-') AS sig
        FROM minhash
        GROUP BY image_id, cast(j / {ROWS_PER_BAND} AS int)
      ),
      probes AS (
        SELECT image_id FROM img
        WHERE cast(substring(image_id, 5, 8) AS int) % 7 = 0
      ),
      cand AS (
        SELECT p.image_id AS query_id, t.image_id AS target_id
        FROM bands p JOIN bands t
          ON p.band = t.band AND p.sig = t.sig
             AND p.image_id <> t.image_id
        JOIN probes q ON p.image_id = q.image_id
        GROUP BY p.image_id, t.image_id
      ),
      scored AS (
        SELECT c.query_id, c.target_id,
               round(cast(sum(CASE WHEN mp.minval = mt.minval
                                   THEN 1 ELSE 0 END) AS double)
                     / {N_PERMS}.0, 6) AS j_est
        FROM cand c
        JOIN minhash mp ON mp.image_id = c.query_id
        JOIN minhash mt ON mt.image_id = c.target_id AND mt.j = mp.j
        GROUP BY c.query_id, c.target_id
      ),
      ranked AS (
        SELECT query_id, target_id, j_est,
               round(1.0 - j_est, 6) AS distance,
               cast(row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY 1.0 - j_est ASC, target_id ASC) AS int) AS rnk
        FROM scored
      )
      SELECT query_id, target_id, j_est, distance, rnk,
             round((1.0 + ln(2.0 * j_est / (1.0 + j_est))
                    / {CAPTION_K}.0) * 100.0, 6) AS ani_poisson,
             round(pow(2.0 * j_est / (1.0 + j_est),
                       1.0 / {CAPTION_K}.0) * 100.0, 6) AS ani_binomial
      FROM ranked
      WHERE rnk <= {REQ_K} AND distance <= {REQ_MAX_DIST}
    """)


def sql_images_request_ani(parquet_path: str) -> str:
    return _duck_minhash_cte(parquet_path) + f"""
      , bands AS (
        SELECT image_id, (j // {ROWS_PER_BAND})::INT AS band,
               string_agg(minval::VARCHAR, '-' ORDER BY j) AS sig
        FROM minhash
        GROUP BY image_id, (j // {ROWS_PER_BAND})::INT
      ),
      probes AS (
        SELECT image_id FROM img
        WHERE substr(image_id, 5, 8)::INT % 7 = 0
      ),
      cand AS (
        SELECT p.image_id AS query_id, t.image_id AS target_id
        FROM bands p JOIN bands t
          ON p.band = t.band AND p.sig = t.sig
             AND p.image_id <> t.image_id
        JOIN probes q ON p.image_id = q.image_id
        GROUP BY p.image_id, t.image_id
      ),
      scored AS (
        SELECT c.query_id, c.target_id,
               round((sum(CASE WHEN mp.minval = mt.minval
                               THEN 1 ELSE 0 END))::DOUBLE
                     / {N_PERMS}.0, 6) AS j_est
        FROM cand c
        JOIN minhash mp ON mp.image_id = c.query_id
        JOIN minhash mt ON mt.image_id = c.target_id AND mt.j = mp.j
        GROUP BY c.query_id, c.target_id
      ),
      ranked AS (
        SELECT query_id, target_id, j_est,
               round(1.0 - j_est, 6) AS distance,
               (row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY 1.0 - j_est ASC, target_id ASC))::INT AS rnk
        FROM scored
      )
      SELECT query_id, target_id, j_est, distance, rnk,
             round((1.0 + ln(2.0 * j_est / (1.0 + j_est))
                    / {CAPTION_K}.0) * 100.0, 6) AS ani_poisson,
             round(pow(2.0 * j_est / (1.0 + j_est),
                       1.0 / {CAPTION_K}.0) * 100.0, 6) AS ani_binomial
      FROM ranked
      WHERE rnk <= {REQ_K} AND distance <= {REQ_MAX_DIST}
    """


# --------------------------------------------------------------------------
# Clusters twin: connected components over the SQL-twin edge set.
#
# Puts the LAST pipeline stage family (CC -> cluster assignments, the
# product surface of binaux/hnswcore.rs:269-277's point->facility
# dispatch) under the hash gate: Spark runs the SAME small-star/large-star
# operator the pipeline uses (operators/cc.py) over the twin band-join
# edges; DuckDB computes components independently via a recursive-CTE
# reachability closure (label = min reachable node).  Both sides label a
# component by its lexicographic minimum member — the FIXTURES.md
# normalization contract — so the assignments must hash-match exactly.
# --------------------------------------------------------------------------

def q_images_clusters_sql(spark: SparkSession,
                          parquet_path: str) -> DataFrame:
    from gsearch_spark.operators.cc import assign_clusters
    pairs = q_images_lsh_pairs(spark, parquet_path)
    universe = spark.read.parquet(parquet_path).select("image_id")
    return assign_clusters(pairs, universe)


def sql_images_clusters(parquet_path: str) -> str:
    base = _duck_minhash_cte(parquet_path).replace(
        "WITH img AS", "WITH RECURSIVE img AS", 1)
    return base + f"""
      , bands AS (
        SELECT image_id, (j // {ROWS_PER_BAND})::INT AS band,
               string_agg(minval::VARCHAR, '-' ORDER BY j) AS sig
        FROM minhash
        GROUP BY image_id, (j // {ROWS_PER_BAND})::INT
      ),
      pairs AS (
        SELECT DISTINCT x.image_id AS a, y.image_id AS b
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.sig = y.sig AND x.image_id < y.image_id
      ),
      bidir AS (
        SELECT a AS u, b AS v FROM pairs
        UNION
        SELECT b AS u, a AS v FROM pairs
      ),
      reach(u, label) AS (
        SELECT image_id, image_id FROM img
        UNION
        SELECT e.v, r.label
        FROM reach r JOIN bidir e ON e.u = r.u
      )
      SELECT u AS image_id, min(label) AS cluster_id
      FROM reach GROUP BY u
    """
