#!/usr/bin/env python
"""Profile one incremental_add / remove_batch against the bench build:
per-recorded-stage seconds plus the GAPS between records (untimed work —
localCheckpoints, counts, staging writes, commit renames).  Reads the
checkpoint left behind by bench.py; writes nothing to the live build
(runs on a throwaway copy, same protocol as bench.py)."""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE = "/tmp/gsearch_spark_bench"
MODE = sys.argv[1] if len(sys.argv) > 1 else "add"


def main() -> None:
    from pyspark.sql import functions as F
    from gsearch_spark.config import PipelineConfig
    from gsearch_spark.session import get_spark

    n_base = 160_000
    spark = get_spark("gsearch_profile", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PipelineConfig(shuffle_partitions=CPUS)
    fixture = os.path.join(CACHE, f"images_{n_base}")
    ckpt = os.path.join(CACHE, f"ckpt_{n_base}_{CPUS}")
    images = spark.read.parquet(os.path.join(fixture, "images.parquet"))

    ckpt_copy = ckpt + "_profile"
    n_reps = int(os.environ.get("PROFILE_REPS", "2"))
    for rep in range(n_reps):
        run_once(spark, cfg, images, ckpt, ckpt_copy)
    spark.stop()


def run_once(spark, cfg, images, ckpt, ckpt_copy) -> None:
    from pyspark.sql import functions as F
    shutil.rmtree(ckpt_copy, ignore_errors=True)
    shutil.copytree(ckpt, ckpt_copy)

    t_begin = time.time()
    if MODE == "add":
        from gsearch_spark.operators.pipeline import incremental_add
        new_imgs = (images
                    .filter(F.pmod(F.xxhash64("image_id"), F.lit(97)) == 0)
                    .select(F.concat(F.lit("a_"), F.col("image_id"))
                            .alias("image_id"), "bytes", "w", "h", "fmt",
                            F.concat(F.col("caption"), F.lit(" appended"))
                            .alias("caption"), "phash"))
        incremental_add(spark, cfg, ckpt_copy, new_imgs,
                        images.unionByName(new_imgs)).write.format(
            "noop").mode("overwrite").save()
    else:
        from gsearch_spark.operators.remove import remove_images
        rm_ids = (images
                  .filter(F.pmod(F.xxhash64("image_id"), F.lit(199)) == 0)
                  .select("image_id"))
        remove_images(spark, cfg, ckpt_copy, rm_ids).write.format(
            "noop").mode("overwrite").save()
    t_end = time.time()
    print(f"TOTAL {MODE}: {t_end - t_begin:.3f}s")

    state = (spark.read.parquet(os.path.join(ckpt_copy, "pipeline_state"))
             .withColumn("ts", F.col("t_start").cast("double"))
             .withColumn("te", F.col("t_end").cast("double"))
             .filter(F.col("ts") >= t_begin)
             .select("stage", "ts", "te", "seconds")
             .dropDuplicates(["stage"])
             .orderBy("ts").collect())
    last = t_begin
    for r in state:
        print(f"  [{r['ts']-t_begin:7.2f} .. {r['te']-t_begin:7.2f}] "
              f"{r['stage']:28s} {r['seconds']:7.3f}s")
        last = max(last, r["te"])
    print(f"  tail [{last-t_begin:7.2f} .. {t_end-t_begin:7.2f}] "
          "(commit+flush+refresh)")
    shutil.rmtree(ckpt_copy, ignore_errors=True)


if __name__ == "__main__":
    main()
