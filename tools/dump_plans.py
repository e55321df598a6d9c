#!/usr/bin/env python
"""Dump .explain('formatted') for declared queries to a directory.

    python tools/dump_plans.py OUT_DIR SUFFIX [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each named query (default: a
representative set of the bench-timed ones).  Uses the sf0.1 driver
tables and the cached /tmp entry fixtures, same as the bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = ["rollup_lineitem", "merit_product", "lsh_band_pairs_docs",
           "minhash_signatures_docs", "sessionize_events", "token_count",
           "quality_score", "revenue_topk_suppliers", "ann_ivf_topk",
           "images_request_topk", "knn_cosine_topk", "ann_lsh_topk"]


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from gsearch_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("gsearch_plans", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entrymod.queries()
    import contextlib
    import io
    for name in names:
        df = qmap[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"dumped {name}")
    spark.stop()


if __name__ == "__main__":
    main()
