"""Text near-duplicate operators over the ``documents`` table.

The same computational skeleton as the image pipeline (shingle ->
signature -> band join -> verify), instantiated for text so every step is
ALSO expressible in ANSI SQL and therefore oracle-checkable against DuckDB
by the driver (CORRECTNESS gate).  The hash function here is
**md5-derived** (identical in Spark and DuckDB) instead of the engine's
splitmix64 family — same algorithm, different hash family, chosen purely
so the oracle can recompute signatures bit-for-bit.

The documents table has no planted duplicates, so each operator that
needs them *plants its own inside the query* (doc_id + DUP_OFFSET with a
transformed copy of the text) — deterministic, side-effect-free, and
reproduced verbatim in the oracle SQL.

SURVEY §2 coverage: A5 (MinHash), A9 (SimHash), J1 (LSH band join),
J4 (all-pairs oracle), J7 (substring containment), C1 (Hamming->Jaccard),
§2.8 (edge-set union), dedup ops from the training-data mandate.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

N_PERMS = 16
PRIME = 2147483647
N_BANDS = 4
ROWS_PER_BAND = 4
SIMHASH_BITS = 16
DUP_OFFSET = 1_000_000
NEAR_DROP_WORDS = 3  # near-dup copies drop the last N words
N_DUP_DOCS = 40      # first N docs (by doc_id) get planted copies


def perm_coeffs(seed: int = 42) -> "tuple[list[int], list[int]]":
    rng = np.random.default_rng(seed)
    a = [int(x) for x in rng.integers(1, PRIME, N_PERMS)]
    b = [int(x) for x in rng.integers(0, PRIME, N_PERMS)]
    return a, b


# --------------------------------------------------------------- SQL bits
# Shared snippets: the Spark queries are built with spark.sql(...) on a
# temp view so Spark SQL and the DuckDB oracle SQL stay textually parallel.

def _spark_docs_with_dups() -> str:
    """Spark SQL: documents ∪ planted exact copies ∪ planted near copies."""
    return f"""
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {DUP_OFFSET} AS doc_id, text
      FROM documents WHERE doc_id < {N_DUP_DOCS}
      UNION ALL
      SELECT doc_id + {2 * DUP_OFFSET} AS doc_id,
             array_join(slice(split(trim(text), '\\\\s+'), 1,
                        size(split(trim(text), '\\\\s+')) - {NEAR_DROP_WORDS}),
                        ' ') AS text
      FROM documents
      WHERE doc_id < {N_DUP_DOCS}
        AND size(split(trim(text), '\\\\s+')) > {NEAR_DROP_WORDS + 3}
    """


def _duck_docs_with_dups() -> str:
    return f"""
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {DUP_OFFSET} AS doc_id, text
      FROM documents WHERE doc_id < {N_DUP_DOCS}
      UNION ALL
      SELECT doc_id + {2 * DUP_OFFSET} AS doc_id,
             array_to_string(
               regexp_split_to_array(trim(text), '\\s+')[
                 1:len(regexp_split_to_array(trim(text), '\\s+'))
                   - {NEAR_DROP_WORDS}], ' ') AS text
      FROM documents
      WHERE doc_id < {N_DUP_DOCS}
        AND len(regexp_split_to_array(trim(text), '\\s+')) > {NEAR_DROP_WORDS + 3}
    """


def _spark_shingles(docs_cte: str) -> str:
    """word 3-gram shingles + md5-derived 60-bit hash, Spark SQL."""
    return f"""
      WITH docs AS ({docs_cte}),
      toks AS (
        SELECT doc_id, split(lower(trim(text)), '\\\\s+') AS t FROM docs
      ),
      shingles AS (
        SELECT DISTINCT doc_id,
               concat_ws(' ', t[i], t[i+1], t[i+2]) AS sh
        FROM toks LATERAL VIEW explode(sequence(0, size(t) - 3)) s AS i
        WHERE size(t) >= 3
      ),
      hashed AS (
        SELECT doc_id,
               cast(conv(substring(md5(sh), 1, 15), 16, 10) AS bigint)
                 % {PRIME} AS h0
        FROM shingles
      )
    """


def _duck_shingles(docs_cte: str) -> str:
    return f"""
      WITH docs AS ({docs_cte}),
      toks AS (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
        FROM docs
      ),
      shingles AS (
        SELECT DISTINCT doc_id,
               t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
        FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
        WHERE len(t) >= 3
      ),
      hashed AS (
        SELECT doc_id,
               ('0x' || substr(md5(sh), 1, 15))::BIGINT % {PRIME} AS h0
        FROM shingles
      )
    """


def _perm_arrays_sql() -> "tuple[str, str]":
    a, b = perm_coeffs()
    return (f"array({', '.join(map(str, a))})",
            f"[{', '.join(map(str, a))}]"), (
            f"array({', '.join(map(str, b))})",
            f"[{', '.join(map(str, b))}]")


def _spark_minhash_cte() -> str:
    (a_spark, _), (b_spark, _) = _perm_arrays_sql()
    return _spark_shingles(_spark_docs_with_dups()) + f"""
      , minhash AS (
        SELECT doc_id, j,
               min((element_at({a_spark}, j + 1) * h0
                    + element_at({b_spark}, j + 1)) % {PRIME}) AS minval
        FROM hashed LATERAL VIEW explode(sequence(0, {N_PERMS - 1})) p AS j
        GROUP BY doc_id, j
      )
    """


def _duck_minhash_cte() -> str:
    (_, a_duck), (_, b_duck) = _perm_arrays_sql()
    return _duck_shingles(_duck_docs_with_dups()) + f"""
      , minhash AS (
        SELECT doc_id, j,
               min(({a_duck}[j + 1] * h0 + {b_duck}[j + 1]) % {PRIME})
                 AS minval
        FROM hashed, unnest(generate_series(0, {N_PERMS - 1})) AS p(j)
        GROUP BY doc_id, j
      )
    """


# ------------------------------------------------------------- operators
# Each returns (spark_fn, duckdb_sql); spark_fn(spark, sf_dir) -> DataFrame.

def _register(spark: SparkSession, sf_dir: str) -> None:
    spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .createOrReplaceTempView("documents")


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5-groupBy, canonical = min doc_id (dedup tier)."""
    _register(spark, sf_dir)
    return spark.sql(f"""
      WITH docs AS ({_spark_docs_with_dups()})
      SELECT md5(lower(trim(text))) AS fp,
             min(doc_id) AS canonical_id,
             count(*) AS n_copies
      FROM docs
      GROUP BY md5(lower(trim(text)))
      HAVING count(*) > 1
    """)


SQL_EXACT_DEDUP = f"""
  WITH docs AS ({_duck_docs_with_dups()})
  SELECT md5(lower(trim(text))) AS fp,
         min(doc_id) AS canonical_id,
         count(*) AS n_copies
  FROM docs
  GROUP BY md5(lower(trim(text)))
  HAVING count(*) > 1
"""


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (A5's SQL-checkable analog): one row per
    (doc, permutation) with the min hashed shingle value."""
    _register(spark, sf_dir)
    return spark.sql(
        _spark_minhash_cte() + "SELECT doc_id, j AS perm, minval FROM minhash")


SQL_MINHASH_SIGNATURES = (
    lambda: _duck_minhash_cte() + "SELECT doc_id, j AS perm, minval FROM minhash"
)()


def q_lsh_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band join (J1): identical band signature => candidate pair."""
    _register(spark, sf_dir)
    return spark.sql(_spark_minhash_cte() + f"""
      , bands AS (
        SELECT doc_id, cast(j / {ROWS_PER_BAND} AS int) AS band,
               array_join(transform(array_sort(
                   collect_list(struct(j, minval))),
                   s -> cast(s.minval AS string)), '-') AS sig
        FROM minhash
        GROUP BY doc_id, cast(j / {ROWS_PER_BAND} AS int)
      )
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
    """)


SQL_LSH_BAND_PAIRS = _duck_minhash_cte() + f"""
  , bands AS (
    SELECT doc_id, (j // {ROWS_PER_BAND})::INT AS band,
           string_agg(minval::VARCHAR, '-' ORDER BY j) AS sig
    FROM minhash
    GROUP BY doc_id, (j // {ROWS_PER_BAND})::INT
  )
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (A9's SQL-checkable analog): 16-bit sign-of-sums."""
    _register(spark, sf_dir)
    return spark.sql(_spark_shingles(_spark_docs_with_dups()) + f"""
      , bits AS (
        SELECT doc_id, b,
               sum(2 * cast(shiftright(h0, b) & 1 AS bigint) - 1) AS c
        FROM hashed LATERAL VIEW explode(sequence(0, {SIMHASH_BITS - 1})) t AS b
        GROUP BY doc_id, b
      )
      SELECT doc_id,
             cast(sum(CASE WHEN c > 0 THEN shiftleft(1, b) ELSE 0 END)
                  AS bigint) AS simhash
      FROM bits GROUP BY doc_id
    """)


SQL_SIMHASH = _duck_shingles(_duck_docs_with_dups()) + f"""
  , bits AS (
    SELECT doc_id, b, sum(2 * ((h0 >> b) & 1) - 1) AS c
    FROM hashed, unnest(generate_series(0, {SIMHASH_BITS - 1})) AS t(b)
    GROUP BY doc_id, b
  )
  SELECT doc_id,
         sum(CASE WHEN c > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT
           AS simhash
  FROM bits GROUP BY doc_id
"""


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard >= 0.6 over shingle sets (J4 all-pairs on the
    shared-shingle graph — the brute-force dedup oracle pattern)."""
    _register(spark, sf_dir)
    return spark.sql(_spark_shingles(_spark_docs_with_dups()) + f"""
      , sizes AS (
        SELECT doc_id, count(*) AS n FROM hashed GROUP BY doc_id
      ),
      inter AS (
        SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
        FROM hashed x JOIN hashed y
          ON x.h0 = y.h0 AND x.doc_id < y.doc_id
        GROUP BY x.doc_id, y.doc_id
      )
      SELECT a, b,
             round(cast(i AS double)
                   / (sa.n + sb.n - i), 6) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = a
      JOIN sizes sb ON sb.doc_id = b
      WHERE cast(i AS double) / (sa.n + sb.n - i) >= 0.6
    """)


SQL_NGRAM_JACCARD_PAIRS = _duck_shingles(_duck_docs_with_dups()) + """
  , sizes AS (
    SELECT doc_id, count(*) AS n FROM hashed GROUP BY doc_id
  ),
  inter AS (
    SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
    FROM hashed x JOIN hashed y
      ON x.h0 = y.h0 AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
  )
  SELECT a, b,
         round((i::DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = a
  JOIN sizes sb ON sb.doc_id = b
  WHERE (i::DOUBLE) / (sa.n + sb.n - i) >= 0.6
"""


def q_hamming_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: Jaccard estimated as fraction of equal minhash slots, for the
    planted exact-dup pairs (reference src/bin/bindash.rs:93-97)."""
    _register(spark, sf_dir)
    return spark.sql(_spark_minhash_cte() + f"""
      SELECT x.doc_id AS a, y.doc_id AS b,
             round(cast(sum(CASE WHEN x.minval = y.minval
                            THEN 1 ELSE 0 END) AS double)
                   / {N_PERMS}, 6) AS j_est
      FROM minhash x JOIN minhash y
        ON x.j = y.j AND y.doc_id = x.doc_id + {DUP_OFFSET}
      GROUP BY x.doc_id, y.doc_id
    """)


SQL_HAMMING_JACCARD = _duck_minhash_cte() + f"""
  SELECT x.doc_id AS a, y.doc_id AS b,
         round(sum(CASE WHEN x.minval = y.minval
                   THEN 1 ELSE 0 END)::DOUBLE
               / {N_PERMS}, 6) AS j_est
  FROM minhash x JOIN minhash y
    ON x.j = y.j AND y.doc_id = x.doc_id + {DUP_OFFSET}
  GROUP BY x.doc_id, y.doc_id
"""


def q_substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 oracle shape: strict text containment pairs (the suffix-array
    pass's semantics, checked by brute force in SQL)."""
    _register(spark, sf_dir)
    return spark.sql(f"""
      WITH docs AS ({_spark_docs_with_dups()}),
      n AS (SELECT doc_id, lower(trim(text)) AS t FROM docs)
      SELECT x.doc_id AS a, y.doc_id AS b
      FROM n x JOIN n y
        ON x.doc_id < y.doc_id
       AND x.t <> y.t
       AND (instr(y.t, x.t) > 0 OR instr(x.t, y.t) > 0)
    """)


SQL_SUBSTRING_PAIRS = f"""
  WITH docs AS ({_duck_docs_with_dups()}),
  n AS (SELECT doc_id, lower(trim(text)) AS t FROM docs)
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM n x JOIN n y
    ON x.doc_id < y.doc_id
   AND x.t <> y.t
   AND (position(x.t IN y.t) > 0 OR position(y.t IN x.t) > 0)
"""


FRAC_SCALE = 8  # FracMinHash: keep shingles with h % SCALE == 0


def q_fracminhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 FracMinHash containment (reference ``src/dna/dnasketch.rs:541-574``
    family, mash-like semantics): sample each doc's shingle set by
    ``hash % {FRAC_SCALE} == 0`` (a scaled, unbiased fraction of the set)
    and report, for every planted near-dup pair, the containment of the
    COPY's sampled set in the ORIGINAL's — |A ∩ B| / |A| over samples.
    The near copies drop trailing words, so containment stays high while
    plain Jaccard drops — exactly the asymmetric-size case FracMinHash
    exists for."""
    _register(spark, sf_dir)
    return spark.sql(_spark_shingles(_spark_docs_with_dups()) + f"""
      , sampled AS (
        SELECT doc_id, h0 FROM hashed WHERE h0 % {FRAC_SCALE} = 0
      ),
      sizes AS (
        SELECT doc_id, count(*) AS n FROM sampled GROUP BY doc_id
      ),
      inter AS (
        SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
        FROM sampled x JOIN sampled y
          ON x.h0 = y.h0 AND x.doc_id = y.doc_id + {2 * DUP_OFFSET}
        GROUP BY x.doc_id, y.doc_id
      )
      SELECT a, b,
             round(cast(i AS double) / sa.n, 6) AS containment
      FROM inter JOIN sizes sa ON sa.doc_id = a
    """)


SQL_FRACMINHASH_CONTAINMENT = _duck_shingles(_duck_docs_with_dups()) + f"""
  , sampled AS (
    SELECT doc_id, h0 FROM hashed WHERE h0 % {FRAC_SCALE} = 0
  ),
  sizes AS (
    SELECT doc_id, count(*) AS n FROM sampled GROUP BY doc_id
  ),
  inter AS (
    SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
    FROM sampled x JOIN sampled y
      ON x.h0 = y.h0 AND x.doc_id = y.doc_id + {2 * DUP_OFFSET}
    GROUP BY x.doc_id, y.doc_id
  )
  SELECT a, b,
         round((i::DOUBLE) / sa.n, 6) AS containment
  FROM inter JOIN sizes sa ON sa.doc_id = a
"""


KMV_K = 32  # k-minimum-values sketch size


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 analog (HLL/SetSketch family, reference
    ``src/dna/dnasketch.rs:541-574``): per-doc distinct-shingle
    cardinality from a bottom-k (KMV) sketch — est = (k-1) * M / kth_min
    where M is the hash range (Bar-Yossef et al. 2002), with the exact
    count when fewer than k distinct hashes exist.  KMV over the k
    smallest hashes is the bottom-k cousin of HLL chosen here because it
    is integer-exact in ANSI SQL (HLL needs leading-zero counts whose
    float log2 differs across engines)."""
    _register(spark, sf_dir)
    return spark.sql(_spark_shingles(_spark_docs_with_dups()) + f"""
      , ranked AS (
        SELECT doc_id, h0,
               row_number() OVER (PARTITION BY doc_id ORDER BY h0) AS rk,
               count(*) OVER (PARTITION BY doc_id) AS n_distinct
        FROM hashed
      )
      SELECT doc_id, n_distinct AS exact_count,
             CASE WHEN n_distinct < {KMV_K} THEN cast(n_distinct AS double)
                  ELSE round(cast({KMV_K - 1} AS double) * {PRIME}
                             / cast(h0 AS double), 4)
             END AS est_count
      FROM ranked
      WHERE rk = least(cast(n_distinct AS int), {KMV_K})
        AND (rk = {KMV_K} OR n_distinct < {KMV_K})
    """)


SQL_KMV_DISTINCT = _duck_shingles(_duck_docs_with_dups()) + f"""
  , ranked AS (
    SELECT doc_id, h0,
           row_number() OVER (PARTITION BY doc_id ORDER BY h0) AS rk,
           count(*) OVER (PARTITION BY doc_id) AS n_distinct
    FROM hashed
  )
  SELECT doc_id, n_distinct AS exact_count,
         CASE WHEN n_distinct < {KMV_K} THEN n_distinct::DOUBLE
              ELSE round({KMV_K - 1}::DOUBLE * {PRIME} / h0::DOUBLE, 4)
         END AS est_count
  FROM ranked
  WHERE rk = least(n_distinct::INT, {KMV_K})
    AND (rk = {KMV_K} OR n_distinct < {KMV_K})
"""


def q_kmv_union_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 analog (sketch union-reduce, reference HyperMinHash union):
    bottom-k sketches MERGE by taking the k smallest of the union — the
    associative/commutative reduce that lets group cardinalities be
    estimated from per-member sketches.  Here: distinct-shingle
    cardinality of each planted dup GROUP (original ∪ exact copy ∪ near
    copy), reduced over the members' hash streams."""
    _register(spark, sf_dir)
    return spark.sql(_spark_shingles(_spark_docs_with_dups()) + f"""
      , grouped AS (
        SELECT doc_id % {DUP_OFFSET} AS group_id, h0
        FROM hashed WHERE doc_id % {DUP_OFFSET} < {N_DUP_DOCS}
      ),
      merged AS (  -- union-reduce: distinct hashes across group members
        SELECT DISTINCT group_id, h0 FROM grouped
      ),
      ranked AS (
        SELECT group_id, h0,
               row_number() OVER (PARTITION BY group_id ORDER BY h0) AS rk,
               count(*) OVER (PARTITION BY group_id) AS n_distinct
        FROM merged
      )
      SELECT group_id, n_distinct AS exact_count,
             CASE WHEN n_distinct < {KMV_K} THEN cast(n_distinct AS double)
                  ELSE round(cast({KMV_K - 1} AS double) * {PRIME}
                             / cast(h0 AS double), 4)
             END AS est_count
      FROM ranked
      WHERE rk = least(cast(n_distinct AS int), {KMV_K})
        AND (rk = {KMV_K} OR n_distinct < {KMV_K})
    """)


SQL_KMV_UNION_CARDINALITY = _duck_shingles(_duck_docs_with_dups()) + f"""
  , grouped AS (
    SELECT doc_id % {DUP_OFFSET} AS group_id, h0
    FROM hashed WHERE doc_id % {DUP_OFFSET} < {N_DUP_DOCS}
  ),
  merged AS (
    SELECT DISTINCT group_id, h0 FROM grouped
  ),
  ranked AS (
    SELECT group_id, h0,
           row_number() OVER (PARTITION BY group_id ORDER BY h0) AS rk,
           count(*) OVER (PARTITION BY group_id) AS n_distinct
    FROM merged
  )
  SELECT group_id, n_distinct AS exact_count,
         CASE WHEN n_distinct < {KMV_K} THEN n_distinct::DOUBLE
              ELSE round({KMV_K - 1}::DOUBLE * {PRIME} / h0::DOUBLE, 4)
         END AS est_count
  FROM ranked
  WHERE rk = least(n_distinct::INT, {KMV_K})
    AND (rk = {KMV_K} OR n_distinct < {KMV_K})
"""


def q_dedup_edge_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 set ops: union of exact-dup edges and LSH candidate edges,
    deduplicated — the engine's multi-generator edge merge."""
    _register(spark, sf_dir)
    exact = spark.sql(f"""
      WITH docs AS ({_spark_docs_with_dups()}),
      fp AS (SELECT doc_id, md5(lower(trim(text))) AS f FROM docs)
      SELECT x.doc_id AS a, y.doc_id AS b
      FROM fp x JOIN fp y ON x.f = y.f AND x.doc_id < y.doc_id
    """)
    lsh = q_lsh_band_pairs(spark, sf_dir)
    return exact.union(lsh).dropDuplicates(["a", "b"])


SQL_DEDUP_EDGE_UNION = f"""
  WITH docs AS ({_duck_docs_with_dups()}),
  fp AS (SELECT doc_id, md5(lower(trim(text))) AS f FROM docs),
  exact AS (
    SELECT x.doc_id AS a, y.doc_id AS b
    FROM fp x JOIN fp y ON x.f = y.f AND x.doc_id < y.doc_id
  ),
  lsh AS ({SQL_LSH_BAND_PAIRS})
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM exact UNION ALL SELECT a, b FROM lsh
  )
"""
