"""Local replica of the driver's correctness gate: every queries() entry
with an oracle_sql() runs on Spark AND DuckDB at sf0.01; results must
match on row count, schema (column names), and order-insensitive values.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

ORACLED = sorted(entrymod.oracle_sql().keys())


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].astype(float).round(9)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, name):
    q = entrymod.queries()[name]
    got = _canon(q(spark, SF_DIR).toPandas())
    want = _canon(_duck(entrymod.oracle_sql()[name]))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}")
    # The driver hashes raw values, so an int64-vs-float64 mismatch (e.g.
    # DuckDB HUGEINT sums landing as float64) fails its gate even when the
    # values are equal — compare dtype KIND to catch that locally.
    got_kinds = [got[c].dtype.kind for c in got.columns]
    want_kinds = [want[c].dtype.kind for c in want.columns]
    assert got_kinds == want_kinds, (
        f"{name}: dtype kinds {got_kinds} != {want_kinds} "
        f"({dict(got.dtypes)} vs {dict(want.dtypes)})")
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    assert len(got) > 0, f"{name}: empty result weakens the gate"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=1e-9, atol=1e-9,
                                  obj=name)
