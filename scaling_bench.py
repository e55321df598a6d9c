#!/usr/bin/env python
"""Two-parallelism scaling run -> BENCH/BASELINE.md.

north_rule requires throughput scaling efficiency >= 0.8 between N and 4N
executors; per driver instruction the sandbox stand-in is the SAME job on
the SAME input at local[8] vs local[32] (fresh JVM each, via subprocess).

    efficiency = T_low / (ratio * T_high)   (1.0 = perfect scaling)

Usage:  python scaling_bench.py [--n-base 160000] [--low 8] [--high 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = "/tmp/gsearch_spark_bench"


def _ensure_fixture(n_base: int, cores: int) -> str:
    fixture = os.path.join(CACHE, f"images_{n_base}")
    marker = os.path.join(fixture, "images.parquet", "_SUCCESS")
    if not os.path.exists(marker):
        sys.path.insert(0, REPO)
        from gsearch_spark.generator import write_fixture_spark
        from gsearch_spark.session import get_spark
        spark = get_spark("scaling_fixture", cores=cores)
        spark.sparkContext.setLogLevel("ERROR")
        write_fixture_spark(spark, fixture, n_base=n_base, seed=42,
                            skew_fraction=0.10, partitions=cores * 2)
        spark.stop()
    return fixture


def _run(cores: int, fixture: str) -> dict:
    ckpt = os.path.join(CACHE, f"scaling_ckpt_c{cores}")
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-m", "gsearch_spark.bench_job",
         "--cores", str(cores), "--fixture", fixture, "--ckpt", ckpt],
        capture_output=True, text=True, cwd=REPO, timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(f"bench_job c{cores} failed:\n{out.stderr[-3000:]}")
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    rec["wall_sec"] = round(time.time() - t0, 1)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-base", type=int,
                    default=int(os.environ.get("SCALING_N_BASE", "160000")))
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    fixture = _ensure_fixture(args.n_base, args.high)
    lo = _run(args.low, fixture)
    hi = _run(args.high, fixture)
    ratio = args.high / args.low

    def eff(key: str) -> float:
        return round(lo[key] / (ratio * hi[key]), 3)

    report = {
        "n_images": lo["n_images"],
        "low_cores": args.low, "high_cores": args.high,
        "low": lo, "high": hi,
        "efficiency_total": eff("total_sec"),
        "efficiency_sig_lsh": eff("sig_lsh_sec"),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(report, f, indent=2)

    md = f"""# BENCH/BASELINE.md — scaling + throughput evidence

North rule: throughput scaling efficiency >= 0.8 between N and 4N
executors.  Sandbox stand-in (per driver instruction): identical job,
identical input, `local[{args.low}]` vs `local[{args.high}]`, fresh JVM
per run (subprocess), fixture generation excluded from timing.

Job: full image near-duplicate pipeline (signatures -> salted LSH bands
-> candidate pairs ∪ suffix pass -> pixel/caption verify -> small-star/
large-star CC) on {lo['n_images']:,} synthetic images
(FIXTURES.md bench profile, 10% skew bombs).

| metric | local[{args.low}] | local[{args.high}] | efficiency (T_N / {ratio:.0f}·T_4N) |
|---|---|---|---|
| pipeline total (s) | {lo['total_sec']} | {hi['total_sec']} | **{report['efficiency_total']}** |
| signature+LSH (s) | {lo['sig_lsh_sec']} | {hi['sig_lsh_sec']} | **{report['efficiency_sig_lsh']}** |
| images/s (sig+LSH) | {lo['images_per_sec_sig_lsh']} | {hi['images_per_sec_sig_lsh']} | — |
| images/s (pipeline) | {lo['images_per_sec_total']} | {hi['images_per_sec_total']} | — |

Per-stage seconds:

| stage | local[{args.low}] | local[{args.high}] |
|---|---|---|
"""
    for stage in ("signatures", "bands", "candidate_pairs",
                  "verified_edges", "clusters"):
        md += (f"| {stage} | {lo['stages_sec'].get(stage)} "
               f"| {hi['stages_sec'].get(stage)} |\n")
    md += f"""
Raw records: `BENCH/scaling.json`.  Target >= 0.8: efficiency_total =
{report['efficiency_total']}, efficiency_sig_lsh =
{report['efficiency_sig_lsh']}.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps(report["low"]))
    print(json.dumps(report["high"]))
    print(json.dumps({"efficiency_total": report["efficiency_total"],
                      "efficiency_sig_lsh": report["efficiency_sig_lsh"]}))


if __name__ == "__main__":
    main()
