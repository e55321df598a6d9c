"""Text analysis operators over ``documents`` (training-data mandate):
language-ID heuristic, quality scoring, token counting, fingerprinting.

All pure built-in SQL expressions (JVM codegen, no UDFs), each with a
textually-parallel DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

STOPWORDS_EN = ("the", "a", "an", "and", "of", "to", "in", "is", "on")
PUNCT_CLASS = r"[^a-z0-9 ]"


def _register(spark: SparkSession, sf_dir: str) -> None:
    spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .createOrReplaceTempView("documents")


_SW_LIST = ", ".join(f"'{w}'" for w in STOPWORDS_EN)


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + distinct-token count per doc."""
    _register(spark, sf_dir)
    return spark.sql("""
      WITH t AS (
        SELECT doc_id, split(lower(trim(text)), '\\\\s+') AS toks
        FROM documents WHERE length(trim(text)) > 0
      )
      SELECT doc_id,
             cast(size(toks) AS bigint) AS n_tokens,
             cast(size(array_distinct(toks)) AS bigint) AS n_distinct
      FROM t
    """)


SQL_TOKEN_COUNT = """
  WITH t AS (
    SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
    FROM documents WHERE length(trim(text)) > 0
  )
  SELECT doc_id,
         len(toks)::BIGINT AS n_tokens,
         len(list_distinct(toks))::BIGINT AS n_distinct
  FROM t
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword-ratio quality features per doc."""
    _register(spark, sf_dir)
    return spark.sql(f"""
      WITH t AS (
        SELECT doc_id, lower(trim(text)) AS txt,
               split(lower(trim(text)), '\\\\s+') AS toks
        FROM documents WHERE length(trim(text)) > 0
      )
      SELECT doc_id,
             cast(length(txt) AS bigint) AS n_chars_norm,
             round(cast(length(regexp_replace(txt, '{PUNCT_CLASS}', ''))
                        AS double) / length(txt), 6) AS alnum_ratio,
             round(cast(size(filter(toks, x -> x IN ({_SW_LIST})))
                        AS double) / size(toks), 6) AS stopword_ratio,
             round(cast(length(replace(txt, ' ', '')) AS double)
                   / size(toks), 6) AS avg_token_len
      FROM t
    """)


SQL_QUALITY_SCORE = f"""
  WITH t AS (
    SELECT doc_id, lower(trim(text)) AS txt,
           regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
    FROM documents WHERE length(trim(text)) > 0
  )
  SELECT doc_id,
         length(txt)::BIGINT AS n_chars_norm,
         round(length(regexp_replace(txt, '{PUNCT_CLASS}', '', 'g'))::DOUBLE
               / length(txt), 6) AS alnum_ratio,
         round(len(list_filter(toks, x -> x IN ({_SW_LIST})))::DOUBLE
               / len(toks), 6) AS stopword_ratio,
         round(length(replace(txt, ' ', ''))::DOUBLE
               / len(toks), 6) AS avg_token_len
  FROM t
"""


def q_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language heuristic (n-gram-free lang-ID baseline):
    label 'en' when any English stopword token appears, else 'und'."""
    _register(spark, sf_dir)
    return spark.sql(f"""
      WITH t AS (
        SELECT doc_id, split(lower(trim(text)), '\\\\s+') AS toks
        FROM documents WHERE length(trim(text)) > 0
      )
      SELECT doc_id,
             CASE WHEN size(filter(toks, x -> x IN ({_SW_LIST}))) > 0
                  THEN 'en' ELSE 'und' END AS lang_guess,
             cast(size(filter(toks, x -> x IN ({_SW_LIST}))) AS bigint)
               AS sw_hits
      FROM t
    """)


SQL_LANG_GUESS = f"""
  WITH t AS (
    SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
    FROM documents WHERE length(trim(text)) > 0
  )
  SELECT doc_id,
         CASE WHEN len(list_filter(toks, x -> x IN ({_SW_LIST}))) > 0
              THEN 'en' ELSE 'und' END AS lang_guess,
         len(list_filter(toks, x -> x IN ({_SW_LIST})))::BIGINT AS sw_hits
  FROM t
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint (md5) — C6/S10-style identity export."""
    _register(spark, sf_dir)
    return spark.sql("""
      SELECT doc_id, md5(lower(trim(text))) AS fp,
             substring(md5(lower(trim(text))), 1, 8) AS fp_short
      FROM documents
    """)


SQL_DOC_FINGERPRINT = """
  SELECT doc_id, md5(lower(trim(text))) AS fp,
         substr(md5(lower(trim(text))), 1, 8) AS fp_short
  FROM documents
"""
