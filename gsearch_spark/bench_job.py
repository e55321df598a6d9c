"""One benchmark run of the image near-dup pipeline at a given core count.

Invoked as a subprocess (fresh JVM per parallelism level) by bench.py and
scaling_bench.py:

    python -m gsearch_spark.bench_job --cores 8 --fixture DIR --ckpt DIR

Prints one JSON line with per-stage wall times and throughput.  This is
the sandbox stand-in for the north_rule's N vs 4N executor scaling run
(driver instruction: local[8] vs local[32] on identical input).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--fixture", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--skip-verify", action="store_true")
    args = ap.parse_args()

    from gsearch_spark.config import PipelineConfig
    from gsearch_spark.operators.banding import build_bands
    from gsearch_spark.operators.candidates import emit_bucket_pairs
    from gsearch_spark.operators.cc import assign_clusters
    from gsearch_spark.operators.pipeline import NearDupPipeline
    from gsearch_spark.session import get_spark

    shutil.rmtree(args.ckpt, ignore_errors=True)
    spark = get_spark(f"bench_c{args.cores}", cores=args.cores,
                      shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PipelineConfig(shuffle_partitions=args.cores)
    images = spark.read.parquet(f"{args.fixture}/images.parquet")
    n = images.count()

    pipe = NearDupPipeline(spark, cfg, args.ckpt)
    t0 = time.time()
    pipe.run(images, resume=False)
    total = time.time() - t0

    stage_s = {r.stage: round(r.seconds, 3) for r in pipe.records}
    sig_lsh = (stage_s.get("signatures", 0) + stage_s.get("bands", 0)
               + stage_s.get("candidate_pairs", 0))
    out = {
        "cores": args.cores,
        "n_images": n,
        "total_sec": round(total, 3),
        "stages_sec": stage_s,
        "sig_lsh_sec": round(sig_lsh, 3),
        "images_per_sec_sig_lsh": round(n / sig_lsh, 1) if sig_lsh else None,
        "images_per_sec_total": round(n / total, 1),
    }
    spark.stop()
    print(json.dumps(out))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
