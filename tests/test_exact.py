"""Exact-duplicate collapse stage (identity short-circuit) unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from gsearch_spark.operators.exact import (exact_groups, expand_clusters,
                                           representatives)


def _images(spark, rows):
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, caption string")


def test_exact_groups_min_rep(spark):
    df = _images(spark, [
        ("b", b"X", "same cap"), ("a", b"X", "Same  Cap"),  # normalized eq
        ("c", b"X", "other cap"),                            # same bytes, diff cap
        ("d", b"Y", "same cap"),                             # diff bytes
    ])
    got = {r["image_id"]: r["rep_id"] for r in exact_groups(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "c", "d": "d"}


def test_representatives_filter(spark):
    df = _images(spark, [("a", b"X", "c"), ("b", b"X", "c"),
                         ("z", b"Q", "q")])
    reps = {r["image_id"]
            for r in representatives(df, exact_groups(df)).collect()}
    assert reps == {"a", "z"}


def test_expand_clusters(spark):
    groups = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c")],
        "image_id string, rep_id string")
    rep_clusters = spark.createDataFrame(
        [("a", "a"), ("c", "a")], "image_id string, cluster_id string")
    got = {r["image_id"]: r["cluster_id"]
           for r in expand_clusters(rep_clusters, groups).collect()}
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_exact_groups_viral_hot_key(spark):
    """A single content key covering 90% of rows (the viral/black-image
    bomb) must still collapse to one group with the min-id rep, and the
    output must stay one-row-per-image.  Pins the skew-immune
    groupBy+join form (the old per-key window put the whole bomb in one
    task; the sf0.5 arm measured it as an 11x straggler)."""
    bomb = [(f"v{i:04d}", b"BOMB", "same meme") for i in range(900)]
    rest = [(f"u{i:04d}", b"u%d" % i, f"cap {i}") for i in range(100)]
    df = _images(spark, bomb + rest).repartition(16)
    got = exact_groups(df).collect()
    assert len(got) == 1000
    by_id = {r["image_id"]: r["rep_id"] for r in got}
    assert all(by_id[f"v{i:04d}"] == "v0000" for i in range(900))
    assert all(by_id[f"u{i:04d}"] == f"u{i:04d}" for i in range(100))
    # ck is carried per row and identical across the bomb
    cks = {r["ck"] for r in got if r["image_id"].startswith("v")}
    assert len(cks) == 1


def test_null_caption_grouping(spark):
    df = _images(spark, [("a", b"X", None), ("b", b"X", ""),
                         ("c", b"X", "  ")])
    got = {r["image_id"]: r["rep_id"] for r in exact_groups(df).collect()}
    # null, empty and whitespace-only captions normalize identically
    assert got == {"a": "a", "b": "a", "c": "a"}
