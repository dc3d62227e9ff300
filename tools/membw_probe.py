"""Memory-bandwidth probe for the scaling gate (BENCH.md §4).

The r3 postmortem showed the CPU-capacity probe (forked-numpy tokenize
kernel) passing in host windows where the pipeline still ran 40% below
its certified record — the §4 phase decomposition places the deficit in
memory bandwidth/IPC, a resource the tokenize kernel (cache-resident
pandas/str work) barely exercises. This probe measures the binding
resource directly: a STREAM-style triad (a = b + s*c) over a working set
far larger than any LLC, in forked worker processes pinned to cores
0..P-1 — the same process/pinning shape as the kernel control, no JVM,
no Spark.

Reported per level P:
  - agg_gbps: summed worker bandwidth (the host's deliverable DRAM
    bandwidth at that parallelism),
  - per-core scaling ratio agg_gbps(P_hi)/agg_gbps(P_lo) when two levels
    are given — on a healthy box the triad saturates the memory
    controller well below 8 cores, so the RATIO is stable across host
    regimes while the ABSOLUTE number drops when a co-tenant is eating
    bandwidth; the gate thresholds the absolute number.

Bytes accounted: 24 B/element (read b, read c, write a; write-allocate
traffic not counted — consistent under-estimate, fine for a gate).

Usage:
    python tools/membw_probe.py [--levels 2,8] [--mb 256] [--secs 2.0]
Prints one JSON line:
    {"metric": "membw_probe", "levels": {"2": {"agg_gbps": ...,
     "per_worker_gbps": [...]}, ...}, "ratio": ...}
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

BYTES_PER_ELEM = 24  # triad: 2 reads + 1 write, 8 B doubles


def _triad_worker(args) -> float:
    """One pinned worker: run the triad for ~secs, return GB/s."""
    core, mb, secs = args
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    import numpy as np

    n = (mb * 1024 * 1024) // 8 // 3  # three arrays within the budget
    b = np.random.default_rng(core).random(n)
    c = np.random.default_rng(core + 1).random(n)
    a = np.empty_like(b)
    s = 1.000001
    # warm: touch all pages
    np.add(b, c, out=a)
    iters = 0
    t0 = time.perf_counter()
    while True:
        np.multiply(c, s, out=a)
        np.add(a, b, out=a)
        iters += 1
        dt = time.perf_counter() - t0
        if dt >= secs:
            break
    # two passes over the arrays per iter (multiply: read c write a;
    # add: read a,b write a) → 5 touches × 8 B; report the triad-
    # equivalent 24 B/elem on the combined loop's slower of the two to
    # stay conservative: use measured bytes = iters * n * 5 * 8
    gb = iters * n * 5 * 8 / 1e9
    return gb / dt


def measure_level(cpus: int, mb: int, secs: float) -> dict:
    with mp.get_context("spawn").Pool(cpus) as pool:
        # one warm round (page faults, numpy import) outside the timing
        per = pool.map(_triad_worker, [(i, mb, secs * 0.3) for i in range(cpus)])
        per = pool.map(_triad_worker, [(i, mb, secs) for i in range(cpus)])
    return {
        "agg_gbps": round(sum(per), 2),
        "per_worker_gbps": [round(x, 2) for x in per],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--mb", type=int, default=256, help="working set per worker (MB)")
    ap.add_argument("--secs", type=float, default=2.0)
    args = ap.parse_args()
    lvls = list(dict.fromkeys(int(x) for x in args.levels.split(",")))
    out = {"metric": "membw_probe", "mb_per_worker": args.mb, "levels": {}}
    for p in lvls:
        out["levels"][str(p)] = measure_level(p, args.mb, args.secs)
        print(
            f"level {p}: {out['levels'][str(p)]['agg_gbps']} GB/s",
            file=sys.stderr,
        )
    if len(lvls) > 1:
        lo, hi = min(lvls), max(lvls)
        lo_g = out["levels"][str(lo)]["agg_gbps"]
        out["ratio"] = round(out["levels"][str(hi)]["agg_gbps"] / lo_g, 3) if lo_g else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
