"""PWM profile motif search (hmmsearch_rs analog): brute-force numpy
parity on real fixture docs, crafted-motif exactness, short-doc
exclusion, and the CLI subcommand end-to-end with custom motifs.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import Row

from gsearch_spark.operators.profilesearch import (MOTIFS, PROFILE_LEN,
                                                   _profiles_df, char_class,
                                                   profile_motif_search,
                                                   profile_weights,
                                                   q_profile_motif_search)

SF_DIR = "/root/testdata/sf0.001"
ROOT = "/tmp/gsearch_spark_profilesearch_test"


def _brute(text: str, w: "list[int]") -> "tuple[int, int] | None":
    s = [char_class(c) for c in text.lower()]
    if len(s) < PROFILE_LEN:
        return None
    best, bpos = None, None
    for j in range(len(s) - PROFILE_LEN + 1):
        sc = sum(w[i * 8 + s[j + i]] for i in range(PROFILE_LEN))
        if best is None or sc > best:
            best, bpos = sc, j + 1  # 1-based, first occurrence wins
    return best, bpos


def test_brute_force_parity_on_fixture_docs(spark):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    got = {(r.doc_id, r.profile_id): (r.best_score, r.best_pos)
           for r in q_profile_motif_search(spark, SF_DIR).collect()}
    sample = docs.orderBy("doc_id").limit(40).collect()
    checked = 0
    for row in sample:
        for pid, motif in MOTIFS.items():
            exp = _brute(row.text, profile_weights(motif))
            if exp is None:
                assert (row.doc_id, pid) not in got
            else:
                assert got[(row.doc_id, pid)] == exp, (row.doc_id, pid)
                checked += 1
    assert checked >= 100


def test_exact_motif_window_scores_maximum(spark):
    """A doc containing a literal motif scores the 8*8=64 ceiling at the
    motif's position; ties resolve to the FIRST position."""
    docs = spark.createDataFrame([
        Row(doc_id=1, text="xyz http://www.example.com"),
        Row(doc_id=2, text="http://whttp://w"),  # tie: two perfect windows
    ])
    hits = {(r.doc_id, r.profile_id): (r.best_score, r.best_pos)
            for r in profile_motif_search(
                docs, _profiles_df(spark, MOTIFS)).collect()}
    assert hits[(1, "url")] == (64, 5)
    assert hits[(2, "url")] == (64, 1)


def test_short_and_null_docs_emit_no_rows(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="short"),          # 5 chars < PROFILE_LEN
         Row(doc_id=2, text=None),
         Row(doc_id=3, text="exactly8")],
        "doc_id bigint, text string")
    out = profile_motif_search(docs, _profiles_df(spark, MOTIFS))
    assert sorted(set(r.doc_id for r in out.collect())) == [3]
    assert out.filter("doc_id = 3").count() == len(MOTIFS)


def test_cli_hmmsearch_with_custom_motifs(spark, capsys):
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT)
    from gsearch_spark.__main__ import main as cli_main
    docs = spark.createDataFrame([
        Row(doc_id=10, text="call 555-0199 now"),
        Row(doc_id=11, text="no digits here at all"),
    ])
    docs.write.parquet(f"{ROOT}/docs.parquet")
    with open(f"{ROOT}/motifs.json", "w") as f:
        json.dump({"phoneish": "555-0199"}, f)
    rc = cli_main(["hmmsearch", "-d", f"{ROOT}/docs.parquet",
                   "-m", f"{ROOT}/motifs.json",
                   "-o", f"{ROOT}/hits.parquet"])
    assert rc == 0
    assert "2 (doc, profile) rows" in capsys.readouterr().out
    hits = {r.doc_id: (r.profile_id, r.best_score, r.best_pos)
            for r in spark.read.parquet(f"{ROOT}/hits.parquet").collect()}
    assert hits[10] == ("phoneish", 64, 6)  # perfect window at "555-0199"
    assert hits[11][1] < 64
    shutil.rmtree(ROOT, ignore_errors=True)
