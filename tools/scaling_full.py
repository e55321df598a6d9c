#!/usr/bin/env python
"""Full-pipeline executor-scaling arm (round-5 verdict ask #4).

Round-5 scaling evidence covered the sig+LSH compute core only
(``scaling_bench.py`` / BENCH/scaling.json r5_confirmation).  This runs
the WHOLE checkpointed pipeline — exact collapse, signatures, bands,
candidate pairs, pixel verify, CC, all three sidecar layouts — through
``bench_job --mode full`` on real separate executor JVMs
(local-cluster[1,8] vs local-cluster[4,8]), alternating arms, min-based
over N pairs, loadavg recorded, fixture + checkpoints + shuffle dirs on
tmpfs (the executor-local-NVMe / scaling-object-store model documented
in scaling_bench.py — this sandbox's single virtio disk caps any
bytes-heavy path at ~300 MB/s REGARDLESS of cores, so with the disk in
the loop the measurement is of the disk, not the engine).

    efficiency = T_1x8 / (4 * T_4x8)

Appends the result under "r6_full_pipeline" in BENCH/scaling.json.

Usage: python tools/scaling_full.py [--pairs 3] [--fixture DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHM = "/dev/shm/gsearch_scaling_full"


def run_arm(cores: int, n_exec: int, fixture: str) -> dict:
    os.makedirs(os.path.join(SHM, "local"), exist_ok=True)
    env = dict(os.environ, SPARK_LOCAL_DIRS=os.path.join(SHM, "local"))
    subprocess.run(["sync"], check=False)
    time.sleep(2)
    load = os.getloadavg()
    ckpt = os.path.join(SHM, f"ckpt_c{cores}")
    shutil.rmtree(ckpt, ignore_errors=True)
    cmd = [sys.executable, "-m", "gsearch_spark.bench_job",
           "--cores", str(cores), "--mode", "full",
           "--fixture", fixture, "--ckpt", ckpt,
           "--multi-jvm", str(n_exec), "--exec-mem-mb", "16384"]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                         timeout=3600, env=env)
    rec = None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            cand = json.loads(line)
        except ValueError:
            continue
        if isinstance(cand, dict) and "total_sec" in cand:
            rec = cand
            break
    if rec is None:
        raise RuntimeError(
            f"arm {n_exec}x{cores // n_exec} produced no result: "
            f"rc={out.returncode}\n{out.stderr[-2000:]}")
    rec["loadavg_before"] = list(load)
    shutil.rmtree(ckpt, ignore_errors=True)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--fixture", default="/tmp/gsearch_spark_bench/"
                                         "images_160000")
    args = ap.parse_args()

    shutil.rmtree(SHM, ignore_errors=True)
    fx = os.path.join(SHM, "fixture")
    shutil.copytree(args.fixture, fx)  # fixture on tmpfs too

    lows, highs = [], []
    for i in range(args.pairs):
        # alternate arm order so slow-host drift hits both sides equally
        order = [(8, 1, lows), (32, 4, highs)]
        if i % 2:
            order.reverse()
        for cores, n_exec, sink in order:
            rec = run_arm(cores, n_exec, fx)
            sink.append(rec)
            print(f"pair {i} {n_exec}x{cores // n_exec}: "
                  f"{rec['total_sec']}s load={rec['loadavg_before']}",
                  flush=True)

    t_low = min(r["total_sec"] for r in lows)
    t_high = min(r["total_sec"] for r in highs)
    eff = t_low / (4.0 * t_high)
    result = {
        "protocol": "alternating local-cluster[1,8,16384] vs "
                    "local-cluster[4,8,16384] (spark.executor.memory="
                    "16g), full checkpointed pipeline (bench_job --mode "
                    "full), fixture+ckpt+shuffle on tmpfs, min-based "
                    "over pairs, loadavg recorded",
        "n_images": lows[0]["n_images"],
        "t_1x8_sec": t_low,
        "t_4x8_sec": t_high,
        "efficiency": round(eff, 3),
        "runs_1x8": [r["total_sec"] for r in lows],
        "runs_4x8": [r["total_sec"] for r in highs],
        "loadavg_1x8": [r["loadavg_before"] for r in lows],
        "loadavg_4x8": [r["loadavg_before"] for r in highs],
        "stages_best_1x8": min(lows, key=lambda r: r["total_sec"])
        ["stages_sec"],
        "stages_best_4x8": min(highs, key=lambda r: r["total_sec"])
        ["stages_sec"],
    }
    print(json.dumps(result, indent=2))
    path = os.path.join(REPO, "BENCH", "scaling.json")
    doc = json.load(open(path))
    doc["r6_full_pipeline"] = result
    json.dump(doc, open(path, "w"), indent=2)
    shutil.rmtree(SHM, ignore_errors=True)
    print(f"recorded under r6_full_pipeline in {path}")


if __name__ == "__main__":
    main()
