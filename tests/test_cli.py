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

    # ann subcommand (reference src/bin/gsearch.rs:784-852): stats print
    # + embedding CSV beside the build (database_embedded.csv, the
    # reference's exact output file, src/utils/embed.rs:60-66)
    assert cli_main(["--cores", "8", "ann", "-b", build,
                     "--stats", "--embed"]) == 0
    out = capsys.readouterr().out
    assert "graph hubness estimation" in out and "graph stats:" in out
    csv = f"{build}/database_embedded.csv"
    assert os.path.exists(csv)
    n_csv = sum(1 for _ in open(csv))
    # embedded items = indexed items = exact-group representatives (the
    # signatures table), exactly like the reference embeds index points
    assert n_csv == pq.read_table(f"{build}/signatures").num_rows


def test_cli_bucketed_build_and_add(spark, small_fixture_dir, capsys):
    """tohnsw --bucketed: payloads persist as an image_id-bucketed
    external table beside the build; verify/add run through it with the
    shuffle attach (the 10^12-row path), whose plan never exchanges the
    payload side; add appends new payloads under the same bucket spec —
    and re-registers the table in a fresh session (simulated by dropping
    the catalog entry, which keeps the external files)."""
    import json

    import pytest

    from gsearch_spark.operators.verify import attach_payloads

    root = "/tmp/gsearch_spark_cli_bucketed"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    tbl = pq.read_table(f"{small_fixture_dir}/images.parquet")
    old_t, new_t = (tbl.slice(0, tbl.num_rows - 40),
                    tbl.slice(tbl.num_rows - 40))
    old, new = f"{root}/old.parquet", f"{root}/new.parquet"
    pq.write_table(old_t, old)
    pq.write_table(new_t, new)
    build = f"{root}/build"

    assert cli_main(["--cores", "8", "tohnsw", "-d", old, "-b", build,
                     "--no-resume", "--bucketed",
                     "--payload-buckets", "8"]) == 0
    man = json.load(open(f"{build}/sources.json"))
    table = man["payload_table"]
    assert man["payload_buckets"] == 8
    assert os.path.isdir(f"{build}/payload")
    assert spark.table(table).count() == old_t.num_rows

    # plan contract: with broadcast off, the bucketed attach needs
    # strictly fewer exchanges than the plain-parquet attach (payload
    # side joins in place; only the pairs/id side shuffles)
    pairs = spark.createDataFrame(
        [("img_00000001", "img_00000002", "t")],
        schema="a string, b string, src string")
    plain = spark.read.parquet(old)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def n_exch(df):
            plan = df._jdf.queryExecution().executedPlan().toString()
            return plan.count("Exchange hashpartitioning")
        n_b = n_exch(attach_payloads(pairs, spark.table(table),
                                     strategy="shuffle"))
        n_p = n_exch(attach_payloads(pairs, plain, strategy="shuffle"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert n_b < n_p, (n_b, n_p)

    # fresh-session simulation: drop ONLY the catalog entry (external
    # data files stay); add must re-register from sources.json
    spark.sql(f"DROP TABLE {table}")
    assert cli_main(["--cores", "8", "add", "-b", build, "-n", new]) == 0
    assert spark.table(table).count() == tbl.num_rows
    clusters = pq.read_table(f"{build}/clusters").to_pydict()
    assert len(clusters["image_id"]) == tbl.num_rows

    # a retried add of an ALREADY-INGESTED batch must refuse (the ids
    # are in the build) and must not plant duplicate payload rows — the
    # payload append now skips ids already present instead of refusing,
    # so the refusal comes from the build-side checks
    with pytest.raises(ValueError):
        cli_main(["--cores", "8", "add", "-b", build, "-n", new])
    assert spark.table(table).count() == tbl.num_rows

    # torn-attempt resume (r4-advice fix): payloads appended but the
    # build add never ran — a retry must NOT refuse forever; it skips
    # the already-present payload rows and ingests the images
    new2_t = tbl.slice(0, 20).to_pandas()
    new2_t["image_id"] = ["re_" + i for i in new2_t["image_id"]]
    new2 = f"{root}/new2.parquet"
    import pyarrow as pa
    pq.write_table(pa.Table.from_pandas(new2_t), new2)
    from gsearch_spark.bucketed import append_images_bucketed
    append_images_bucketed(spark, spark.read.parquet(new2), table)
    n_after_torn = spark.table(table).count()
    assert cli_main(["--cores", "8", "add", "-b", build, "-n", new2]) == 0
    assert spark.table(table).count() == n_after_torn  # no dup payloads
    clusters2 = pq.read_table(f"{build}/clusters").to_pydict()
    assert len(clusters2["image_id"]) == tbl.num_rows + 20
    spark.sql(f"DROP TABLE IF EXISTS {table}")
