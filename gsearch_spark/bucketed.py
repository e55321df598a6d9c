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
                          table: str, buckets: int = 32,
                          path: "str | None" = None) -> str:
    """Persist the images table bucketed + sorted on image_id.

    ``buckets`` should be sized so one bucket's payload fits an executor
    scan task (at 10^12 rows and ~50 KB/row, O(10^5) buckets); the
    sortBy lets parquet row-group stats prune inside each bucket for
    point lookups.  With ``path`` the table is EXTERNAL (data lives
    beside the build checkpoint instead of the session warehouse) —
    what the CLI's ``tohnsw --bucketed`` uses.
    """
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = (images.write.mode("overwrite")
         .bucketBy(buckets, "image_id")
         .sortBy("image_id")
         .format("parquet"))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
    return table


def bucket_count(spark: SparkSession, table: str) -> int:
    """Number of buckets the stored table was written with."""
    info = {r["col_name"]: r["data_type"]
            for r in spark.sql(f"DESCRIBE EXTENDED {table}").collect()}
    return int(info["Num Buckets"])


def append_images_bucketed(spark: SparkSession, images: DataFrame,
                           table: str) -> None:
    """Append new rows under the table's EXISTING bucket spec (the
    append-only ``add`` path keeps old payload files untouched — new
    files land in the matching buckets, exactly Iceberg's append to a
    bucket-partitioned table).  Callers must ensure id uniqueness; a
    duplicate image_id would fan out every payload join on it."""
    (images.write.mode("append")
     .bucketBy(bucket_count(spark, table), "image_id")
     .sortBy("image_id")
     .format("parquet")
     .saveAsTable(table))
    # invalidate the shared relation cache: appends from a cloned
    # session (streaming foreachBatch) must be visible to every other
    # session reading the table
    spark.catalog.refreshTable(table)


IMAGES_DDL = ("image_id STRING, bytes BINARY, w INT, h INT, "
              "fmt STRING, caption STRING, phash BIGINT")


def schema_ddl(df: DataFrame) -> str:
    """DDL column list of a DataFrame's schema — recorded in the build
    manifest at write time so re-registration declares the schema the
    table was ACTUALLY written with, not a hardcoded constant."""
    return ", ".join(f"{f.name} {f.dataType.simpleString()}"
                     for f in df.schema.fields)


def ensure_bucketed_table(spark: SparkSession, table: str, path: str,
                          buckets: int, ddl: "str | None" = None) -> None:
    """Re-register the external bucketed payload table in THIS session's
    catalog if absent.  With the default in-memory catalog, saveAsTable
    metadata dies with the session while the external data files (whose
    names carry their bucket ids) survive beside the build — a fresh CLI
    process re-declares the same bucket spec over the same location and
    the files read back bucketed.  (On a real deployment with a shared
    metastore / Iceberg catalog this is a no-op.)

    ``ddl`` is the manifest-recorded column list from write time
    (:func:`schema_ddl`); without it the default IMAGES_DDL applies.
    Either way the declared schema is VALIDATED against the parquet
    footer schema at the location — an evolved/foreign table fails loud
    instead of silently reading nulls / dropping columns."""
    if not spark.catalog.tableExists(table):
        spark.sql(f"""
            CREATE TABLE {table} ({ddl or IMAGES_DDL})
            USING parquet
            CLUSTERED BY (image_id) SORTED BY (image_id)
            INTO {buckets} BUCKETS
            LOCATION '{path}'""")
    declared = {(f.name, f.dataType.simpleString())
                for f in spark.table(table).schema.fields}
    actual = {(f.name, f.dataType.simpleString())
              for f in spark.read.parquet(path).schema.fields}
    if declared != actual:
        raise ValueError(
            f"payload table {table} registration does not match the "
            f"parquet files at {path}: declared-only="
            f"{sorted(declared - actual)} files-only="
            f"{sorted(actual - declared)}; the table schema evolved — "
            "re-register from the build manifest's recorded schema")


def bucketed_images(spark: SparkSession, table: str) -> DataFrame:
    """The bucketed payload table, join-ready: pass this as the
    ``images`` side of ``attach_payloads(..., strategy='shuffle')`` and
    every image_id-keyed join consumes the bucketing in place (no
    exchange on the payload side — asserted in the plan test)."""
    return spark.table(table)
