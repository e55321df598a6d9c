#!/usr/bin/env python
"""One-off profiler: per-stage wall breakdown of incremental_add and the
request cap cost at the bench sf0.1 scale, using the cached bench
checkpoint.  Not part of the driver contract; prints human-readable
lines plus one JSON tail."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from gsearch_spark.config import PipelineConfig
from gsearch_spark.operators.pipeline import NearDupPipeline, incremental_add
from gsearch_spark.operators import request as req
from gsearch_spark.session import get_spark

CACHE = "/tmp/gsearch_spark_bench"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BASE = int(os.environ.get("BENCH_N_BASE", "160000"))
RUNS = int(os.environ.get("PROFILE_RUNS", "2"))


def main() -> None:
    spark = get_spark("gsearch_profile", cores=CPUS,
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PipelineConfig(shuffle_partitions=CPUS)
    fixture = os.path.join(CACHE, f"images_{N_BASE}")
    ckpt = os.path.join(CACHE, f"ckpt_{N_BASE}_{CPUS}")
    images = spark.read.parquet(os.path.join(fixture, "images.parquet"))

    new_imgs = (images
                .filter(F.pmod(F.xxhash64("image_id"), F.lit(97)) == 0)
                .select(F.concat(F.lit("a_"), F.col("image_id"))
                        .alias("image_id"), "bytes", "w", "h", "fmt",
                        F.concat(F.col("caption"), F.lit(" appended"))
                        .alias("caption"), "phash"))
    all_imgs = images.unionByName(new_imgs)

    ckpt_copy = ckpt + "_profile"
    stage_runs = []
    totals = []
    for rep in range(RUNS):
        shutil.rmtree(ckpt_copy, ignore_errors=True)
        shutil.copytree(ckpt, ckpt_copy)
        t0 = time.time()
        incremental_add(spark, cfg, ckpt_copy, new_imgs,
                        all_imgs).write.format("noop").mode(
            "overwrite").save()
        wall = time.time() - t0
        totals.append(round(wall, 2))
        st = (spark.read.parquet(os.path.join(ckpt_copy, "pipeline_state"))
              .filter(F.col("stage").startswith("add"))
              .groupBy("stage").agg(F.max("seconds").alias("sec"),
                                    F.max("rows_out").alias("rows"))
              .collect())
        stage_runs.append({r["stage"]: (round(r["sec"], 3), r["rows"])
                           for r in st})
        print(f"run {rep}: total {wall:.2f}s")
        for k in sorted(stage_runs[-1]):
            print(f"   {k:32s} {stage_runs[-1][k][0]:8.3f}s  "
                  f"rows={stage_runs[-1][k][1]}")
        acc = sum(v[0] for v in stage_runs[-1].values())
        print(f"   {'(sum of stages)':32s} {acc:8.3f}s  "
              f"unaccounted={wall - acc:.2f}s")
    shutil.rmtree(ckpt_copy, ignore_errors=True)

    # ---- request: cap on vs off ----------------------------------------
    probes = (images
              .filter(F.pmod(F.xxhash64("image_id"), F.lit(50)) == 0)
              .select(F.concat(F.lit("q_"), F.col("image_id"))
                      .alias("image_id"), "bytes", "w", "h", "fmt",
                      "caption", "phash"))
    req_times = {}
    for label, cap in (("cap_default", cfg.max_bucket_probe),
                       ("cap_off", 0)):
        ts = []
        for rep in range(RUNS + 1):
            t0 = time.time()
            req.request(spark, ckpt, probes, k=10,
                        max_bucket_probe=cap).write.format(
                "noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 2))
        req_times[label] = ts
        print(f"request {label} (cap={cap}): {ts}")

    print(json.dumps({"add_totals": totals, "request": req_times}))
    spark.stop()


if __name__ == "__main__":
    main()
