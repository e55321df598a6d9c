"""CLI surface: tohnsw / add / request subcommands (reference parity)."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq

from gsearch_spark.__main__ import main as cli_main

ROOT = "/tmp/gsearch_spark_cli_test"


def _split_fixture(small_fixture_dir):
    """old = all but last 40 rows; new = last 40 (fresh ids keep it an
    append, not a content clash)."""
    os.makedirs(ROOT, exist_ok=True)
    tbl = pq.read_table(f"{small_fixture_dir}/images.parquet")
    old, new = tbl.slice(0, tbl.num_rows - 40), tbl.slice(tbl.num_rows - 40)
    pq.write_table(old, f"{ROOT}/old.parquet")
    pq.write_table(new, f"{ROOT}/new.parquet")
    return f"{ROOT}/old.parquet", f"{ROOT}/new.parquet"


def test_cli_tohnsw_request_add(spark, small_fixture_dir, capsys):
    shutil.rmtree(ROOT, ignore_errors=True)
    old, new = _split_fixture(small_fixture_dir)
    build = f"{ROOT}/build"

    assert cli_main(["--cores", "8", "tohnsw", "-d", old,
                     "-b", build, "--no-resume"]) == 0
    assert os.path.exists(f"{build}/clusters/_SUCCESS")
    assert os.path.exists(f"{build}/parameters.json")
    assert os.path.exists(f"{build}/sources.json")

    assert cli_main(["--cores", "8", "request", "-b", build,
                     "-r", new, "-n", "3", "--max-distance", "0.9"]) == 0
    assert os.path.exists(f"{build}/answers/_SUCCESS")
    assert os.path.getsize(f"{build}/gsearch.neighbors.txt") > 0

    assert cli_main(["--cores", "8", "add", "-b", build,
                     "-n", new]) == 0
    clusters = pq.read_table(f"{build}/clusters").to_pydict()
    n_old = pq.read_table(old).num_rows
    n_new = pq.read_table(new).num_rows
    assert len(clusters["image_id"]) == n_old + n_new
    out = capsys.readouterr().out
    assert "tohnsw: built" in out and "request:" in out and "add:" in out
