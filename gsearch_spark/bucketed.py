"""Bucketed payload layout — the at-scale attach path.

The verify and append-only-add stages fetch payload ``bytes`` for
candidate ids by joining the images table on ``image_id``
(``operators/verify.py::attach_payloads``).  With a plain parquet table
the SHUFFLE strategy must exchange the payload side once per join — at
10^12 rows that is the single biggest data movement in the pipeline.
The storage-side fix on a real deployment is an Iceberg/Hive table
BUCKETED on ``image_id``: every join keyed on image_id then reads the
payload partitions in place and only the (tiny) pairs side shuffles to
match the bucketing.

This module provides that layout with Spark's built-in bucketing
(``bucketBy + sortBy + saveAsTable`` — the same hash-bucket contract
Iceberg's bucket transform provides), and
``tests/test_bucketed_attach.py`` proves the plan-level claim: the
bucketed attach produces FEWER exchanges than the plain shuffle attach
and byte-identical rows.

Reference anchor: gsearch keeps payload dictionaries beside its index
and reads them by rank (``src/dna/dnasketch.rs:405``); our columnar
analog is key-bucketed payload storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_images_bucketed(spark: SparkSession, images: DataFrame,
                          table: str, buckets: int = 32) -> str:
    """Persist the images table bucketed + sorted on image_id.

    ``buckets`` should be sized so one bucket's payload fits an executor
    scan task (at 10^12 rows and ~50 KB/row, O(10^5) buckets); the
    sortBy lets parquet row-group stats prune inside each bucket for
    point lookups.
    """
    (images.write.mode("overwrite")
     .bucketBy(buckets, "image_id")
     .sortBy("image_id")
     .format("parquet")
     .saveAsTable(table))
    return table


def bucketed_images(spark: SparkSession, table: str) -> DataFrame:
    """The bucketed payload table, join-ready: pass this as the
    ``images`` side of ``attach_payloads(..., strategy='shuffle')`` and
    every image_id-keyed join consumes the bucketing in place (no
    exchange on the payload side — asserted in the plan test)."""
    return spark.table(table)
