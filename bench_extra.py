#!/usr/bin/env python
"""Extra (non-driver) benchmark arms — numbers cited in
OPTIMIZATION_r06.md.  bench.py is frozen for measurement; anything
beyond its units lives here.

Arms:
  purge     — remove a batch, then time ``purge_removed`` (the
              rewrite-data-files half of the delete lifecycle, round-5
              verdict ask #6) on a throwaway copy of the bench
              checkpoint; asserts the post-purge build reports no
              removals (the zero-removal fast paths re-engage).

Requires the bench checkpoint left behind by a bench.py run
(``/tmp/gsearch_spark_bench/ckpt_<n>_<cpus>``).  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE = "/tmp/gsearch_spark_bench"
N_BASE = int(os.environ.get("BENCH_N_BASE", "160000"))


def main() -> None:
    from pyspark.sql import functions as F
    from gsearch_spark.config import PipelineConfig
    from gsearch_spark.operators.remove import (has_removals, purge_removed,
                                                remove_images)
    from gsearch_spark.session import get_spark

    spark = get_spark("gsearch_bench_extra", cores=CPUS,
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PipelineConfig(shuffle_partitions=CPUS)
    fixture = os.path.join(CACHE, f"images_{N_BASE}")
    ckpt = os.path.join(CACHE, f"ckpt_{N_BASE}_{CPUS}")
    images = spark.read.parquet(os.path.join(fixture, "images.parquet"))

    n_runs = max(1, int(os.environ.get("BENCH_RUNS", "3")))
    rm_ids = (images
              .filter(F.pmod(F.xxhash64("image_id"), F.lit(199)) == 0)
              .select("image_id"))
    n_rm = rm_ids.count()

    ckpt_copy = ckpt + "_purgerun"
    purge_times, remove_times = [], []
    stats = None
    for rep in range(n_runs):
        shutil.rmtree(ckpt_copy, ignore_errors=True)
        shutil.copytree(ckpt, ckpt_copy)
        t0 = time.time()
        remove_images(spark, cfg, ckpt_copy, rm_ids).write.format(
            "noop").mode("overwrite").save()
        remove_times.append(round(time.time() - t0, 3))
        t0 = time.time()
        stats = purge_removed(spark, cfg, ckpt_copy)
        purge_times.append(round(time.time() - t0, 3))
        assert not has_removals(spark, ckpt_copy), \
            "purge left removal sidecars behind"
    shutil.rmtree(ckpt_copy, ignore_errors=True)

    out = {
        "metric": "bench_extra_purge_seconds",
        "value": min(purge_times),
        "unit": "sec",
        "n_removed": n_rm,
        "purge_runs": purge_times,
        "remove_runs": remove_times,
        "purge_stats": stats,
        "sf": os.path.basename(os.path.normpath(SF_DIR)),
        "cores": CPUS,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
