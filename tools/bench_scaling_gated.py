"""Host-noise-gated scaling pairs (companion to bench_scaling.py).

This box is a VM on shared hardware whose PARALLEL capacity oscillates
2-3x on minute timescales while 2-core throughput stays flat (measured:
the bare-process kernel control read 8-core [229k, 93k, 219k] rows/s in
three back-to-back trials at identical config — no JVM, no Spark, pure
forked numpy — while its 2-core trials held 51-59k). A scaling pair
whose 8-core half lands in a degraded window measures the HOST, not the
job. bench_scaling.py's interleaved medians average over those windows;
this script instead measures pairs INSIDE verified-clean windows:

  loop:
    probe: the bare-process tokenize+tf kernel at 8 pinned cores
           (tools/kernel_scaling_control._kernel — no Spark anywhere)
    if probe >= CLEAN_ROWS_PER_SEC:
        run ONE full bench_scaling worker pair (8-core, then 2-core —
        the 8-core half first, while the verified window is freshest)
        probe again; keep the pair only if the window held
  until KEEP_PAIRS pairs kept (or MAX_MINUTES exceeded)

Every probe and pair is logged — discarded pairs stay in the record as
host-noise evidence, the kept pairs are the job's scaling number.

Usage: python tools/bench_scaling_gated.py [--input DIR] [--pairs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLEAN_ROWS_PER_SEC = 170_000  # clean-window 8-core kernel reads ~200-230k
PROBE_ROWS = 600_000  # ~13% of the 4.5M fileset: a ~15-25 s probe
# memory-bandwidth gate (r4 — the r3 postmortem's fix): the CPU probe
# passed in windows where the pipeline ran 40% under the certified
# record because the binding resource was DRAM bandwidth, which the
# cache-resident tokenize kernel barely touches. A window now "holds"
# only if the STREAM-triad probe (tools/membw_probe.py) ALSO clears this
# aggregate-8-core floor. Healthy-regime reading on this box: ~105-110
# GB/s (2026-08-21); the threshold leaves ~20% headroom for benign sway.
CLEAN_MEMBW_GBPS = 85.0


def _probe_membw(cpus: int = 8) -> float:
    """Aggregate pinned-core triad bandwidth (GB/s), forked, no Spark."""
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "membw_probe.py"),
            "--levels",
            str(cpus),
            "--secs",
            "1.5",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("metric") == "membw_probe":
            return float(d["levels"][str(cpus)]["agg_gbps"])
    raise RuntimeError(f"membw probe failed: {out.stdout[-300:]} {out.stderr[-300:]}")


def _probe(input_dir: str, cpus: int = 8) -> float:
    """Bare-process kernel throughput at `cpus` pinned cores (rows/s)."""
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "kernel_scaling_control.py"),
            "--levels",
            str(cpus),
            "--trials",
            "1",
            "--input",
            input_dir,
            "--max-rows",
            str(PROBE_ROWS),
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "levels" in d:
            return float(d["levels"][str(cpus)]["rows_per_sec"])
        if "rows_per_sec" in d:
            return float(d["rows_per_sec"])
    raise RuntimeError(f"probe failed: {out.stdout[-500:]} {out.stderr[-500:]}")


def _worker(level: str, input_dir: str) -> dict:
    from tools.bench_scaling import _run_worker

    return _run_worker(level, input_dir, repeats=2, pin=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/tmp/nexlt_scaling_4m5/input")
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--max-minutes", type=int, default=150)
    ap.add_argument("--clean", type=float, default=CLEAN_ROWS_PER_SEC)
    ap.add_argument("--bw-clean", type=float, default=CLEAN_MEMBW_GBPS)
    ap.add_argument(
        "--levels", default="2,8",
        help="lo,hi pinned-core pair (hi/lo = the N→4N cluster-size ratio)",
    )
    args = ap.parse_args()
    lo_lvl, hi_lvl = args.levels.split(",")
    ratio = int(hi_lvl) / int(lo_lvl)

    t_end = time.time() + args.max_minutes * 60
    kept, discarded, probes = [], [], []

    def _both_probes() -> tuple[float, float, bool]:
        cpu = _probe(args.input)
        bw = _probe_membw()
        ok = cpu >= args.clean and bw >= args.bw_clean
        probes.append({"cpu": round(cpu), "bw_gbps": round(bw, 1), "clean": ok})
        print(f"probe: cpu {cpu:,.0f} rows/s, membw {bw:.1f} GB/s "
              f"({'clean' if ok else 'DEGRADED'})", file=sys.stderr)
        return cpu, bw, ok

    while len(kept) < args.pairs and time.time() < t_end:
        c0, b0, ok0 = _both_probes()
        if not ok0:
            time.sleep(60)
            continue
        os.sync()
        r8 = _worker(hi_lvl, args.input)
        r2 = _worker(lo_lvl, args.input)
        c1, b1, ok1 = _both_probes()
        pair = {
            "levels": args.levels,
            "tps_2": r2["turns_per_sec"],
            "tps_8": r8["turns_per_sec"],
            "eff": round(r8["turns_per_sec"] / r2["turns_per_sec"] / ratio, 3),
            "probe_before": {"cpu": round(c0), "bw_gbps": round(b0, 1)},
            "probe_after": {"cpu": round(c1), "bw_gbps": round(b1, 1)},
            "phases_2": r2["phases"],
            "phases_8": r8["phases"],
            "q50_2": r2["query_p50_sec"],
            "q50_8": r8["query_p50_sec"],
        }
        if ok1:
            kept.append(pair)
            print(f"KEPT pair eff={pair['eff']}", file=sys.stderr)
        else:
            discarded.append(pair)
            print(
                f"DISCARDED pair eff={pair['eff']} (window closed: "
                f"cpu {c1:,.0f} rows/s, membw {b1:.1f} GB/s)",
                file=sys.stderr,
            )
    summary = {
        "metric": "scaling_efficiency_gated",
        "levels": args.levels,
        "value": (
            round(statistics.median(p["eff"] for p in kept), 3) if kept else None
        ),
        "kept_pairs": kept,
        "discarded_pairs": discarded,
        "probes": probes,
        "clean_threshold_rows_per_sec": args.clean,
        "clean_threshold_membw_gbps": args.bw_clean,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
