"""Smoke tests for the driver contract: entry() and rows-only queries."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
ROWS_ONLY = [n for n in entrymod.queries() if n not in entrymod.oracle_sql()]


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"image_id", "cluster_id"}


@pytest.mark.parametrize("name", sorted(ROWS_ONLY))
def test_rows_only_queries(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    pdf = df.toPandas()
    assert len(pdf) > 0
    assert len(pdf.columns) >= 2
    # Replicate the driver's canonicalization: every rows-only result must
    # survive a full-column pandas sort (array columns are unhashable and
    # crash it — see round-1 images_knn_adjacency failure).
    pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def test_every_oracle_key_has_query():
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())
