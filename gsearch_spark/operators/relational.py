"""Relational operator analogs over the driver tables (SURVEY §2 F/G/O/C).

Each query maps a reference operator family onto the generic test tables
so the driver's DuckDB oracle can gate it:

  G1 rollup      -> lineitem group-sum (decimal-exact, cast to double)
  G3 merit       -> per-order product of (1 - discount) via exp-sum-log
  G4/O1 top-k    -> row_number window per group
  G5 best hit    -> latest event per user
  G8/streaming   -> gap-based sessionization (lag window)
  C2-C4 scalars  -> Jaccard -> distance / ANI transforms on a value grid
  F1/F4/F6       -> filter + projection pushdown query

Float discipline: sums go through DECIMAL for exactness then cast to
double; transcendental outputs are rounded to 6 dp (cross-libm safety).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

KMER = 16  # the reference's recommended nt k (README.md:680-689)


def _reg(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        spark.read.parquet(f"{sf_dir}/{t}.parquet") \
            .createOrReplaceTempView(t)


def q_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    _reg(spark, sf_dir, "documents")
    return spark.sql("""
      SELECT doc_id, source, cast(n_chars AS bigint) AS n_chars
      FROM documents
      WHERE lang = 'en' AND n_chars >= 200 AND text IS NOT NULL
    """)


SQL_SCAN_FILTER_PROJECT = """
  SELECT doc_id, source, n_chars::BIGINT AS n_chars
  FROM documents
  WHERE lang = 'en' AND n_chars >= 200 AND text IS NOT NULL
"""


def q_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 grouped rollup, decimal-exact arithmetic (TPC-H Q1 shape)."""
    _reg(spark, sf_dir, "lineitem")
    return spark.sql("""
      SELECT l_returnflag, l_linestatus,
             cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sum_qty,
             cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double)
               AS sum_base_price,
             cast(sum(cast(l_extendedprice AS decimal(18,2))
                      * cast(1 - l_discount AS decimal(18,2))) AS double)
               AS sum_disc_price,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
    """)


SQL_ROLLUP_LINEITEM = """
  SELECT l_returnflag, l_linestatus,
         sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
         sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base_price,
         sum(l_extendedprice::DECIMAL(18,2)
             * (1 - l_discount)::DECIMAL(18,2))::DOUBLE AS sum_disc_price,
         count(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
  GROUP BY l_returnflag, l_linestatus
"""


def q_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4/O1: top-3 orders per customer by price (window row_number)."""
    _reg(spark, sf_dir, "orders")
    return spark.sql("""
      WITH r AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC,
                                           o_orderkey) AS rk
        FROM orders
      )
      SELECT o_custkey, o_orderkey, o_totalprice, cast(rk AS int) AS rk
      FROM r WHERE rk <= 3
    """)


SQL_TOPK_ORDERS_PER_CUSTOMER = """
  WITH r AS (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC,
                                       o_orderkey) AS rk
    FROM orders
  )
  SELECT o_custkey, o_orderkey, o_totalprice, rk::INT AS rk
  FROM r WHERE rk <= 3
"""


def q_merit_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3: per-order merit = product of (1 - discount) over its lines,
    carried in LOG space (sum of ln — the product-as-sum-of-logs
    aggregate; the reference's product-of-distances ranking,
    gsearch src/matcher.rs:86-94), with its top-5 emission
    (src/matcher.rs:262-275) as rank <= 5 per customer.  Log space keeps
    the rounded output off exact decimal boundaries (products of 2-dp
    discounts land exactly on .5 grid points where Spark and DuckDB
    round differently; logs are transcendental and never do)."""
    _reg(spark, sf_dir, "lineitem", "orders")
    return spark.sql("""
      WITH merit AS (
        SELECT l_orderkey,
               round(sum(ln(1.0 - l_discount)), 6) AS log_merit
        FROM lineitem WHERE l_discount < 1.0
        GROUP BY l_orderkey
      ),
      ranked AS (
        SELECT o.o_custkey, m.l_orderkey, m.log_merit,
               row_number() OVER (PARTITION BY o.o_custkey
                                  ORDER BY m.log_merit ASC,
                                           m.l_orderkey) AS rk
        FROM merit m JOIN orders o ON o.o_orderkey = m.l_orderkey
      )
      SELECT o_custkey, l_orderkey AS orderkey, log_merit,
             cast(rk AS int) AS rk
      FROM ranked WHERE rk <= 5
    """)


SQL_MERIT_PRODUCT = """
  WITH merit AS (
    SELECT l_orderkey,
           round(sum(ln(1.0 - l_discount)), 6) AS log_merit
    FROM lineitem WHERE l_discount < 1.0
    GROUP BY l_orderkey
  ),
  ranked AS (
    SELECT o.o_custkey, m.l_orderkey, m.log_merit,
           row_number() OVER (PARTITION BY o.o_custkey
                              ORDER BY m.log_merit ASC,
                                       m.l_orderkey) AS rk
    FROM merit m JOIN orders o ON o.o_orderkey = m.l_orderkey
  )
  SELECT o_custkey, l_orderkey AS orderkey, log_merit, rk::INT AS rk
  FROM ranked WHERE rk <= 5
"""


def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 best-hit-per-query analog: most recent event per user."""
    _reg(spark, sf_dir, "events")
    return spark.sql("""
      WITH r AS (
        SELECT user_id, event_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rk
        FROM events
      )
      SELECT user_id, event_id, event_type, ts FROM r WHERE rk = 1
    """)


SQL_LATEST_EVENT_PER_USER = """
  WITH r AS (
    SELECT user_id, event_id, event_type, ts,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rk
    FROM events
  )
  SELECT user_id, event_id, event_type, ts FROM r WHERE rk = 1
"""


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min), per-user session count —
    batch analog of the streaming session-window operator."""
    _reg(spark, sf_dir, "events")
    return spark.sql("""
      WITH g AS (
        SELECT user_id, ts,
               lag(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
      ),
      b AS (
        SELECT user_id,
               CASE WHEN prev_ts IS NULL THEN 1
                    WHEN unix_timestamp(ts) - unix_timestamp(prev_ts) > 1800
                    THEN 1 ELSE 0 END AS brk
        FROM g
      )
      SELECT user_id, cast(sum(brk) AS bigint) AS n_sessions,
             count(*) AS n_events
      FROM b GROUP BY user_id
    """)


SQL_SESSIONIZE_EVENTS = """
  WITH g AS (
    SELECT user_id, ts,
           lag(ts) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev_ts
    FROM events
  ),
  b AS (
    SELECT user_id,
           CASE WHEN prev_ts IS NULL THEN 1
                WHEN date_diff('second', prev_ts, ts) > 1800
                THEN 1 ELSE 0 END AS brk
    FROM g
  )
  SELECT user_id, sum(brk)::BIGINT AS n_sessions, count(*) AS n_events
  FROM b GROUP BY user_id
"""


def q_ani_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2/C3/C4 scalar transforms on a Jaccard grid (reference formulas:
    d = 1-(2J/(1+J))^(1/k), ANI_poisson = (1+ln(2J/(1+J))/k)*100,
    ANI_binomial = (2J/(1+J))^(1/k)*100; gsearch src/bin/reformat.rs:80-86,
    src/bin/bindash.rs:93-99)."""
    _reg(spark, sf_dir, "region")  # touch a view so sf_dir participates
    return spark.sql(f"""
      WITH grid AS (
        SELECT cast(i AS double) / 20.0 AS j
        FROM (SELECT explode(sequence(1, 19)) AS i)
      )
      SELECT round(j, 6) AS j,
             round(1.0 - pow(2.0 * j / (1.0 + j), 1.0 / {KMER}), 6)
               AS mash_dist,
             round((1.0 + ln(2.0 * j / (1.0 + j)) / {KMER}) * 100.0, 6)
               AS ani_poisson,
             round(pow(2.0 * j / (1.0 + j), 1.0 / {KMER}) * 100.0, 6)
               AS ani_binomial
      FROM grid
    """)


SQL_ANI_TRANSFORM = f"""
  WITH grid AS (
    SELECT i::DOUBLE / 20.0 AS j
    FROM unnest(generate_series(1, 19)) AS t(i)
  )
  SELECT round(j, 6) AS j,
         round(1.0 - pow(2.0 * j / (1.0 + j), 1.0 / {KMER}), 6)
           AS mash_dist,
         round((1.0 + ln(2.0 * j / (1.0 + j)) / {KMER}) * 100.0, 6)
           AS ani_poisson,
         round(pow(2.0 * j / (1.0 + j), 1.0 / {KMER}) * 100.0, 6)
           AS ani_binomial
  FROM grid
"""


def q_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G8 distance-quantile analog (reference CKMS sketch, binaux
    hnswcore.rs:188-228): exact interpolated quantiles of event values
    per event_type.  Spark ``percentile`` and DuckDB ``quantile_cont``
    share the linear-interpolation definition; outputs rounded 6dp."""
    _reg(spark, sf_dir, "events")
    return spark.sql("""
      SELECT event_type,
             round(percentile(value, 0.5), 6) AS p50,
             round(percentile(value, 0.9), 6) AS p90,
             round(percentile(value, 0.99), 6) AS p99,
             count(*) AS n
      FROM events GROUP BY event_type
    """)


SQL_VALUE_QUANTILES = """
  SELECT event_type,
         round(quantile_cont(value, 0.5), 6) AS p50,
         round(quantile_cont(value, 0.9), 6) AS p90,
         round(quantile_cont(value, 0.99), 6) AS p99,
         count(*) AS n
  FROM events GROUP BY event_type
"""


def q_props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events.props column (built-in
    JSON path functions, SURVEY §2.9 'JSON built-ins' row)."""
    _reg(spark, sf_dir, "events")
    return spark.sql("""
      SELECT event_id,
             cast(get_json_object(props, '$.k') AS bigint) AS k
      FROM events
      WHERE props IS NOT NULL AND props LIKE '{%'
    """)


SQL_PROPS_JSON_EXTRACT = """
  SELECT event_id,
         (props ->> '$.k')::BIGINT AS k
  FROM events
  WHERE props IS NOT NULL AND props LIKE '{%'
"""


def q_revenue_topk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + group + top-k: revenue per supplier, top 10 (decimal-exact)."""
    _reg(spark, sf_dir, "lineitem", "supplier")
    return spark.sql("""
      WITH rev AS (
        SELECT l_suppkey,
               cast(sum(cast(l_extendedprice AS decimal(18,2))
                        * cast(1 - l_discount AS decimal(18,2))) AS double)
                 AS revenue
        FROM lineitem GROUP BY l_suppkey
      ),
      r AS (
        SELECT s.s_name, rev.l_suppkey, rev.revenue,
               row_number() OVER (ORDER BY rev.revenue DESC,
                                           rev.l_suppkey) AS rk
        FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
      )
      SELECT s_name, l_suppkey, revenue, cast(rk AS int) AS rk
      FROM r WHERE rk <= 10
    """)


SQL_REVENUE_TOPK_SUPPLIERS = """
  WITH rev AS (
    SELECT l_suppkey,
           sum(l_extendedprice::DECIMAL(18,2)
               * (1 - l_discount)::DECIMAL(18,2))::DOUBLE AS revenue
    FROM lineitem GROUP BY l_suppkey
  ),
  r AS (
    SELECT s.s_name, rev.l_suppkey, rev.revenue,
           row_number() OVER (ORDER BY rev.revenue DESC,
                                       rev.l_suppkey) AS rk
    FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
  )
  SELECT s_name, l_suppkey, revenue, rk::INT AS rk
  FROM r WHERE rk <= 10
"""
