#!/usr/bin/env python
"""Framework-free host CPU/memory scaling capacity -> BENCH/host_capacity.json.

Measures what THIS machine can physically deliver when going from 8 to 32
sustained busy cores, with no Spark/JVM involved (pure multiprocessing +
numpy), so engine scaling numbers can be read against the host's own
ceiling.  Three working-set regimes of the same integer-hash kernel:

  * 16 KB  (L1/L2-resident)  — measures CPU core scaling,
  * 400 KB (beyond private L2) — measures the shared cache/memory wall,
  * 240 MB (DRAM streaming)    — measures aggregate memory bandwidth.

Each task runs SUSTAINED (tens of seconds): burst-length tasks overstate
capacity on shared/virtualized hosts.

aggregate_speedup = 4 x (t_per_task@8 / t_per_task@32); efficiency =
speedup / 4.  A job whose working set exceeds L2 cannot beat the
corresponding row here, no matter how it is scheduled.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
C = np.uint64(0x100000001B3)
S13 = np.uint64(13)


def _kernel(n_elems: int, iters: int) -> float:
    t0 = time.time()
    a = np.arange(n_elems, dtype=np.uint64)
    for _ in range(iters):
        a = a * C ^ (a >> S13)
    return time.time() - t0


def _work_16kb(_):
    return _kernel(2_000, 1_500_000)


def _work_400kb(_):
    return _kernel(50_000, 60_000)


def _work_240mb(_):
    return _kernel(30_000_000, 12)


def measure(fn, n_workers: int, waves: int = 2) -> float:
    with mp.Pool(n_workers) as p:
        times = p.map(fn, range(n_workers * waves))  # sustained load
    return float(np.mean(times))


def main() -> None:
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    out = {"low_workers": 8, "high_workers": 32, "regimes": {}}
    for name, fn, waves in (("l2_16kb", _work_16kb, 2),
                            ("shared_400kb", _work_400kb, 2),
                            ("dram_240mb", _work_240mb, 1)):
        t_lo = measure(fn, 8, waves)
        t_hi = measure(fn, 32, waves)
        speedup = 4 * t_lo / t_hi
        out["regimes"][name] = {
            "per_task_sec_8w": round(t_lo, 2),
            "per_task_sec_32w": round(t_hi, 2),
            "aggregate_speedup_vs_8w": round(speedup, 2),
            "efficiency": round(speedup / 4, 3),
        }
        print(name, out["regimes"][name])
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "host_capacity.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote BENCH/host_capacity.json")


if __name__ == "__main__":
    main()
