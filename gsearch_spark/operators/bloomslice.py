"""A10: bitsliced Bloom containment screen (BIGSI/COBS analog).

The reference's ``bigsig`` tool builds one Bloom filter per reference
set and stores the filters BIT-SLICED — row i holds, for Bloom bit i, a
bitmap over all targets whose filter has that bit set — so screening a
query touches only the rows its own shingles hash to, never the filters
themselves (gsearch ``binaux/src/bin/bigsig.rs:193-317``).  This module
re-expresses that structure relationally, which is exactly what the
bitsliced layout is: a (bit, word_idx, word) table.

Pipeline (identical SQL shape in Spark and DuckDB):

  targets:  docs with doc_id % 13 == 0 -> dense rank idx; word-sliced
            bitmaps use 63 targets per bigint word (sign bit unused so
            the arithmetic is identical across engines).
  build:    shingle (word 3-grams, textdedup family) -> h = 2 Bloom bit
            positions per shingle (independent affine hashes mod PRIME
            mod M) -> slices = per (bit, word) OR of target masks.
  screen:   query shingles -> same 2 bits -> join slices -> per
            (query, shingle, word) AND across the h bits (a shingle is
            contained in target t iff ALL its bits are set in t's
            filter; a missing slice row means no target has that bit,
            so incomplete groups contribute zero) -> popcount per
            target position across shingles -> containment =
            contained_shingles / query_shingles.

Queries are the planted near-dup copies (their shingle sets are true
SUBSETS of their originals, so containment vs an indexed original is
exactly 1.0 — Bloom filters have no false negatives) plus the targets
themselves (self-screen == 1.0); everything else surfaces only the
deterministic false-positive floor of the M=8192, h=2 configuration.

At 10^12 scale the slices table is the index: M rows x T/63 words,
range-partitioned on bit; a screen reads h x |query shingles| rows via
a semi join (partition/row-group pruning on ``bit``), never the corpus.
Scoring work is per-(query, word) — embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gsearch_spark.operators.textdedup import (PRIME, _duck_docs_with_dups,
                                               _duck_shingles, _register,
                                               _spark_docs_with_dups,
                                               _spark_shingles)

M_BITS = 8192          # Bloom width per target
N_HASHES = 2           # affine bit hashes per shingle
WORD_BITS = 63         # targets per bigint word (sign bit unused)
TARGET_MOD = 13        # doc_id % 13 == 0 -> reference set
MIN_CONTAINMENT = 0.02
# affine coefficients of the two bit hashes (fixed primes)
A1, B1 = 1_299_721, 104_729
A2, B2 = 15_485_863, 32_452_843

# final SELECTs use only engine-shared syntax (CAST, round, ln, pow)
FINAL_SCREEN = f"""
      SELECT s.query_id, t.doc_id AS target_id,
             z.n AS n_shingles, s.contained,
             round(cast(s.contained AS double) / z.n, 6) AS containment
      FROM scores s
      JOIN targets t ON t.idx = s.idx
      JOIN qsizes z ON z.doc_id = s.query_id
      WHERE cast(s.contained AS double) / z.n >= {MIN_CONTAINMENT}
    """


def _final_significance(tfill_sql: str) -> str:
    """C7 Bloom-match significance (reference binaux bigsig match
    scoring): -ln of a Chernoff/KL upper bound on the binomial tail
    P[X >= contained] under the null that every query shingle hits the
    target's filter only by chance (per-shingle FP = fill^h for h
    independent bit hashes).  neg_ln_p = n * KL(c || p2) for c > p2,
    0 otherwise; c = 1 degenerates to n * ln(1/p2).  Closed form in
    ln/pow only, so Spark and DuckDB agree to rounding."""
    return f"""
      SELECT query_id, target_id, n_shingles, contained, containment,
             fill,
             round(CASE
               WHEN c <= p2 THEN 0.0
               WHEN c >= 1.0 THEN n_shingles * ln(1.0 / p2)
               ELSE n_shingles * (c * ln(c / p2)
                                  + (1.0 - c) * ln((1.0 - c)
                                                   / (1.0 - p2)))
             END, 4) AS neg_ln_p
      FROM (
        SELECT s.query_id, t.doc_id AS target_id, z.n AS n_shingles,
               s.contained,
               round(cast(s.contained AS double) / z.n, 6) AS containment,
               round(cast(f.bits_set AS double) / {M_BITS}, 6) AS fill,
               cast(s.contained AS double) / z.n AS c,
               pow(cast(f.bits_set AS double) / {M_BITS},
                   {N_HASHES}) AS p2
        FROM scores s
        JOIN targets t ON t.idx = s.idx
        JOIN qsizes z ON z.doc_id = s.query_id
        JOIN ({tfill_sql}) f ON f.idx = s.idx
        WHERE cast(s.contained AS double) / z.n >= {MIN_CONTAINMENT}
      ) x
    """


# per-target Bloom fill (popcount of the target's column across slices)
TFILL_SPARK = f"""SELECT w * {WORD_BITS} + p AS idx,
               count(*) AS bits_set
        FROM tslices LATERAL VIEW explode(
          sequence(0, {WORD_BITS - 1})) e AS p
        WHERE (shiftright(word, p) & 1) = 1
        GROUP BY w * {WORD_BITS} + p"""
TFILL_DUCK = f"""SELECT w * {WORD_BITS} + p AS idx,
               count(*) AS bits_set
        FROM tslices, unnest(generate_series(0, {WORD_BITS - 1})) AS e(p)
        WHERE ((word >> p::INT) & 1) = 1
        GROUP BY w * {WORD_BITS} + p"""


def _spark_sql(final: str = FINAL_SCREEN) -> str:
    return _spark_cte() + final


def _spark_cte() -> str:
    return _spark_shingles(_spark_docs_with_dups()) + f"""
      , targets AS (
        SELECT doc_id,
               cast(row_number() OVER (ORDER BY doc_id) - 1 AS bigint)
                 AS idx
        FROM (SELECT DISTINCT doc_id FROM docs
              WHERE doc_id % {TARGET_MOD} = 0 AND doc_id < 1000000)
      ),
      qdocs AS (
        SELECT doc_id FROM docs WHERE doc_id >= 2000000
        UNION
        SELECT doc_id FROM targets
      ),
      bits AS (
        SELECT doc_id, h0,
               (({A1} * h0 + {B1}) % {PRIME}) % {M_BITS} AS bit, 0 AS j
        FROM hashed
        UNION ALL
        SELECT doc_id, h0,
               (({A2} * h0 + {B2}) % {PRIME}) % {M_BITS} AS bit, 1 AS j
        FROM hashed
      ),
      tslices AS (
        SELECT b.bit, t.idx div {WORD_BITS} AS w,
               bit_or(shiftleft(cast(1 AS bigint),
                                cast(t.idx % {WORD_BITS} AS int))) AS word
        FROM (SELECT DISTINCT doc_id, bit FROM bits) b
        JOIN targets t ON b.doc_id = t.doc_id
        GROUP BY b.bit, t.idx div {WORD_BITS}
      ),
      qand AS (
        SELECT b.doc_id AS query_id, b.h0, s.w,
               CASE WHEN count(DISTINCT b.j) = {N_HASHES}
                    THEN bit_and(s.word) ELSE 0 END AS word
        FROM bits b
        JOIN qdocs q ON b.doc_id = q.doc_id
        JOIN tslices s ON s.bit = b.bit
        GROUP BY b.doc_id, b.h0, s.w
      ),
      scores AS (
        SELECT query_id, w * {WORD_BITS} + p AS idx,
               count(*) AS contained
        FROM qand LATERAL VIEW explode(sequence(0, {WORD_BITS - 1})) e AS p
        WHERE word != 0 AND (shiftright(word, p) & 1) = 1
        GROUP BY query_id, w * {WORD_BITS} + p
      ),
      qsizes AS (
        SELECT h.doc_id, count(DISTINCT h.h0) AS n
        FROM hashed h JOIN qdocs q ON h.doc_id = q.doc_id
        GROUP BY h.doc_id
      )
    """


def _duck_sql(final: str = FINAL_SCREEN) -> str:
    return _duck_cte() + final


def _duck_cte() -> str:
    return _duck_shingles(_duck_docs_with_dups()) + f"""
      , targets AS (
        SELECT doc_id,
               (row_number() OVER (ORDER BY doc_id) - 1)::BIGINT AS idx
        FROM (SELECT DISTINCT doc_id FROM docs
              WHERE doc_id % {TARGET_MOD} = 0 AND doc_id < 1000000)
      ),
      qdocs AS (
        SELECT doc_id FROM docs WHERE doc_id >= 2000000
        UNION
        SELECT doc_id FROM targets
      ),
      bits AS (
        SELECT doc_id, h0,
               (({A1} * h0 + {B1}) % {PRIME}) % {M_BITS} AS bit, 0 AS j
        FROM hashed
        UNION ALL
        SELECT doc_id, h0,
               (({A2} * h0 + {B2}) % {PRIME}) % {M_BITS} AS bit, 1 AS j
        FROM hashed
      ),
      tslices AS (
        SELECT b.bit, t.idx // {WORD_BITS} AS w,
               bit_or((1::BIGINT << (t.idx % {WORD_BITS})::INT)) AS word
        FROM (SELECT DISTINCT doc_id, bit FROM bits) b
        JOIN targets t ON b.doc_id = t.doc_id
        GROUP BY b.bit, t.idx // {WORD_BITS}
      ),
      qand AS (
        SELECT b.doc_id AS query_id, b.h0, s.w,
               CASE WHEN count(DISTINCT b.j) = {N_HASHES}
                    THEN bit_and(s.word) ELSE 0 END AS word
        FROM bits b
        JOIN qdocs q ON b.doc_id = q.doc_id
        JOIN tslices s ON s.bit = b.bit
        GROUP BY b.doc_id, b.h0, s.w
      ),
      scores AS (
        SELECT query_id, w * {WORD_BITS} + p AS idx,
               count(*) AS contained
        FROM qand, unnest(generate_series(0, {WORD_BITS - 1})) AS e(p)
        WHERE word != 0 AND ((word >> p::INT) & 1) = 1
        GROUP BY query_id, w * {WORD_BITS} + p
      ),
      qsizes AS (
        SELECT h.doc_id, count(DISTINCT h.h0) AS n
        FROM hashed h JOIN qdocs q ON h.doc_id = q.doc_id
        GROUP BY h.doc_id
      )
    """


def q_bloom_bitslice_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 gate: containment of query shingle sets vs the bitsliced
    Bloom index of the reference set (doc_id % 13 == 0 docs)."""
    _register(spark, sf_dir)
    return spark.sql(_spark_sql())


def q_bloom_screen_significance(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """C7 gate: screen rows + per-target fill + Chernoff -ln p of the
    observed containment under the chance-hit null."""
    _register(spark, sf_dir)
    return spark.sql(_spark_sql(_final_significance(TFILL_SPARK)))


SQL_BLOOM_BITSLICE_SCREEN = _duck_sql()
SQL_BLOOM_SCREEN_SIGNIFICANCE = _duck_sql(_final_significance(TFILL_DUCK))
