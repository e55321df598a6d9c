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
    ap.add_argument("--fixture", default="")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--mode", choices=("full", "sig_lsh", "sig_lsh_gen",
                                       "meta_lsh_gen"),
                    default="full",
                    help="full = checkpointed pipeline; sig_lsh = the "
                         "compute core (signatures -> bands -> candidate "
                         "pairs) as ONE query with no checkpoint writes; "
                         "sig_lsh_gen = same, but rows are generated "
                         "in-task from (seed, ordinal) — zero input I/O, "
                         "the CPU-scaling measurement target (this "
                         "sandbox's single virtio disk caps any "
                         "bytes-heavy scan at ~300 MB/s regardless of "
                         "cores)")
    ap.add_argument("--n-base", type=int, default=128000)
    ap.add_argument("--size-scale", type=int, default=2)
    ap.add_argument("--shuffle-mult", type=int, default=1,
                    help="shuffle partitions = cores * mult (tail-balance "
                         "knob for the CPU-bound scaling job)")
    ap.add_argument("--multi-jvm", type=int, default=0, metavar="N",
                    help="run on local-cluster[N, cores/N, mem] — N real "
                         "executor JVMs instead of one local[cores] JVM; "
                         "pins whether a scaling residual is the single "
                         "JVM or host memory physics")
    ap.add_argument("--exec-mem-mb", type=int, default=8192,
                    help="per-executor JVM heap for --multi-jvm arms; "
                         "the FULL checkpointed pipeline overlaps "
                         "independent job chains and needs more headroom "
                         "than the single-query scaling modes (a real "
                         "cluster sizes executors for its workload)")
    args = ap.parse_args()

    from gsearch_spark.config import PipelineConfig
    from gsearch_spark.operators.banding import build_bands
    from gsearch_spark.operators.candidates import emit_bucket_pairs
    from gsearch_spark.operators.pipeline import NearDupPipeline
    from gsearch_spark.operators.signatures import compute_signatures
    from gsearch_spark.session import get_spark

    shutil.rmtree(args.ckpt, ignore_errors=True)
    master, extra_conf = None, None
    if args.multi_jvm:
        per = max(1, args.cores // args.multi_jvm)
        master = f"local-cluster[{args.multi_jvm},{per},{args.exec_mem_mb}]"
        # executors are separate JVMs whose python workers don't inherit
        # the driver's sys.path — ship the repo dir like --py-files would.
        # The master string sets the WORKER's capacity only; the executor
        # itself still requests spark.executor.memory (default 1g), so
        # size it to the worker or the heap never grows.
        import os as _os
        repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        extra_conf = {"spark.executorEnv.PYTHONPATH": repo,
                      "spark.executor.memory": f"{args.exec_mem_mb}m"}
    spark = get_spark(f"bench_c{args.cores}", cores=args.cores,
                      shuffle_partitions=args.cores * args.shuffle_mult,
                      master=master, extra_conf=extra_conf)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PipelineConfig(shuffle_partitions=args.cores)

    if args.mode == "meta_lsh_gen":
        # Metadata-tier dedup core: phash+caption MinHash signatures ->
        # salted bands -> candidate pairs, NO pixel codec.  phash is an
        # INPUT COLUMN of the target table (BASELINE input_hint), so this
        # measures exactly the engine's distributed machinery (sketch
        # UDF, band shuffle, salting, star policy) with an L2-resident
        # working set — the regime where this host can physically scale
        # (see BENCH/host_capacity.json: >L2 sets collapse to ~1.2x at
        # 4x cores regardless of framework; <=L2 sets reach ~3.5x).
        # Dup structure: every 10th row clones the previous row's
        # metadata; the first 2% share ONE identity (skew bomb) so the
        # hot-bucket salting + star policy are on the measured path.
        import numpy as np
        import pandas as pd
        from pyspark import StorageLevel
        from gsearch_spark.generator import _vocab
        from gsearch_spark.hashing import hash_pair_u64, hash_u64
        from gsearch_spark.minhash import minhash_batch
        from gsearch_spark.operators.signatures import (SIGNATURES_SCHEMA,
                                                        caption_hash_batch)
        from gsearch_spark.oracle import combined_shingles

        n = args.n_base

        def gen_meta(batches):
            vocab = _vocab(42)
            nv = len(vocab)
            for pdf in batches:
                ords = pdf["id"].to_numpy()
                m = len(ords)
                # source ordinal: clones + skew bomb
                src = ords.copy()
                clone = (ords % 10) == 9
                src[clone] = ords[clone] - 1
                src[src < int(n * 0.02)] = 0
                phash = hash_u64(src.astype(np.uint64),
                                 seed=0xBEEF).view(np.int64)
                widx = np.stack([
                    (hash_pair_u64(src.astype(np.uint64),
                                   np.full(m, k, dtype=np.uint64),
                                   seed=7) % np.uint64(nv)).astype(np.int64)
                    for k in range(10)], axis=1)
                captions = [" ".join(vocab[j] for j in row) for row in widx]
                h, r = combined_shingles(phash, captions, cfg)
                mh = minhash_batch(h, r, m, cfg.sketch_size, algo=cfg.algo,
                                   seed=cfg.seed).view(np.int64)
                yield pd.DataFrame({
                    "image_id": np.char.add("img_",
                                            ords.astype(np.str_)),
                    "minhash": list(mh),
                    "simhash": hash_u64(phash.view(np.uint64),
                                        seed=0x51A).view(np.int64),
                    "phash": phash,
                    "cap_hash": caption_hash_batch(captions),
                    "part_id": np.full(m, -1, dtype=np.int32),
                })

        t0 = time.time()
        sigs = (spark.range(0, n, 1, args.cores * 8)
                .mapInPandas(gen_meta, schema=SIGNATURES_SCHEMA)
                .persist(StorageLevel.MEMORY_AND_DISK))
        n_sigs = sigs.count()
        t_sig = time.time()
        pairs = emit_bucket_pairs(build_bands(sigs, cfg))
        n_pairs = pairs.count()
        t_end = time.time()
        total = t_end - t0
        sigs.unpersist()
        out = {
            "cores": args.cores, "mode": "meta_lsh_gen",
            "n_images": n_sigs, "n_pairs": n_pairs,
            "total_sec": round(total, 3),
            "sig_lsh_sec": round(total, 3),
            "images_per_sec_sig_lsh": round(n / total, 1),
            "images_per_sec_total": round(n / total, 1),
            "stages_sec": {"gen_sign": round(t_sig - t0, 3),
                           "band_pairs": round(t_end - t_sig, 3)},
        }
        out["multi_jvm"] = args.multi_jvm
        spark.stop()
        print(json.dumps(out))
        sys.stdout.flush()
        return

    if args.mode == "sig_lsh_gen":
        import numpy as np
        import pandas as pd
        from pyspark import StorageLevel
        from gsearch_spark.generator import (_vocab, generate_rows_arrow,
                                             make_plan)
        from gsearch_spark.operators.signatures import (SIGNATURES_SCHEMA,
                                                        caption_hash_batch)
        from gsearch_spark.minhash import minhash_batch
        from gsearch_spark.oracle import SEED_PIXEL, combined_shingles
        from gsearch_spark.simhash import (pixel_shingles_stream,
                                           simhash64_batch)

        n_base, size_scale = args.n_base, args.size_scale
        n = make_plan(n_base, seed=42, skew_fraction=0.10).n_total

        def gen_and_sign(batches):
            """Fused ingest: materialize rows from (seed, ordinal) and
            sketch them in the SAME Python stage — one worker per task
            slot, so local[K] parallelism equals K exactly (a chained
            gen->JVM->sign pipeline runs TWO python workers per slot and
            muddies the core-count comparison)."""
            p = make_plan(n_base, seed=42, skew_fraction=0.10)
            vocab = _vocab(42)
            for pdf in batches:
                tbl = generate_rows_arrow(pdf["id"].to_numpy(), p, vocab,
                                          size_scale).to_pandas()
                m = len(tbl)
                phash = tbl["phash"].to_numpy(dtype=np.int64)
                captions = tbl["caption"].tolist()
                h, r = combined_shingles(phash, captions, cfg)
                mh = minhash_batch(h, r, m, cfg.sketch_size, algo=cfg.algo,
                                   seed=cfg.seed).view(np.int64)
                sh = simhash64_batch(np.stack(
                    [pixel_shingles_stream(b, seed=cfg.seed ^ SEED_PIXEL)
                     for b in tbl["bytes"]]))
                yield pd.DataFrame({
                    "image_id": tbl["image_id"].to_numpy(),
                    "minhash": list(mh), "simhash": sh, "phash": phash,
                    "cap_hash": caption_hash_batch(captions),
                    "part_id": np.full(m, -1, dtype=np.int32),
                })

        t0 = time.time()
        sigs = (spark.range(0, n, 1, args.cores * 8)
                .mapInPandas(gen_and_sign, schema=SIGNATURES_SCHEMA)
                .persist(StorageLevel.MEMORY_AND_DISK))
        n_sigs = sigs.count()  # forces the Python stage; persist fills
        t_sig = time.time()
        pairs = emit_bucket_pairs(build_bands(sigs, cfg))
        n_pairs = pairs.count()
        t_end = time.time()
        total = t_end - t0
        sigs.unpersist()
        out = {
            "cores": args.cores, "mode": "sig_lsh_gen",
            "n_images": n_sigs, "n_pairs": n_pairs,
            "size_scale": size_scale,
            "total_sec": round(total, 3),
            "sig_lsh_sec": round(total, 3),
            "images_per_sec_sig_lsh": round(n / total, 1),
            "images_per_sec_total": round(n / total, 1),
            "stages_sec": {"gen_sign": round(t_sig - t0, 3),
                           "band_pairs": round(t_end - t_sig, 3)},
        }
        out["multi_jvm"] = args.multi_jvm
        spark.stop()
        print(json.dumps(out))
        sys.stdout.flush()
        return

    images = spark.read.parquet(f"{args.fixture}/images.parquet")
    n = images.count()

    if args.mode == "sig_lsh":
        from pyspark import StorageLevel
        t0 = time.time()
        # persist: the banding stage consumes signatures twice (bucket
        # stats + salt join); without the pipeline's parquet checkpoint
        # the expensive signature UDF would run twice.  Fresh JVM per
        # bench run => no cross-run cache-reuse hazard here.
        sigs = compute_signatures(images, cfg).persist(
            StorageLevel.MEMORY_AND_DISK)
        sigs.count()  # materialize the persist BEFORE the banding passes
        # consume it, or the signature UDF re-runs concurrently per branch
        pairs = emit_bucket_pairs(build_bands(sigs, cfg))
        n_pairs = pairs.count()
        total = time.time() - t0
        sigs.unpersist()
        out = {
            "cores": args.cores, "mode": "sig_lsh",
            "n_images": n, "n_pairs": n_pairs,
            "total_sec": round(total, 3),
            "sig_lsh_sec": round(total, 3),
            "images_per_sec_sig_lsh": round(n / total, 1),
            "images_per_sec_total": round(n / total, 1),
            "stages_sec": {},
        }
    else:
        pipe = NearDupPipeline(spark, cfg, args.ckpt)
        t0 = time.time()
        pipe.run(images, resume=False)
        total = time.time() - t0
        stage_s = {r.stage: round(r.seconds, 3) for r in pipe.records}
        sig_lsh = (stage_s.get("exact_groups", 0)
                   + stage_s.get("signatures", 0) + stage_s.get("bands", 0)
                   + stage_s.get("candidate_pairs", 0))
        out = {
            "cores": args.cores, "mode": "full",
            "n_images": n,
            "total_sec": round(total, 3),
            "stages_sec": stage_s,
            "sig_lsh_sec": round(sig_lsh, 3),
            "images_per_sec_sig_lsh": round(n / sig_lsh, 1)
            if sig_lsh else None,
            "images_per_sec_total": round(n / total, 1),
        }
    out["multi_jvm"] = args.multi_jvm
    spark.stop()
    print(json.dumps(out))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
