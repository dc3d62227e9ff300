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
    args = ap.parse_args()

    t_end = time.time() + args.max_minutes * 60
    kept, discarded, probes = [], [], []
    while len(kept) < args.pairs and time.time() < t_end:
        p0 = _probe(args.input)
        probes.append(round(p0))
        print(f"probe: {p0:,.0f} rows/s", file=sys.stderr)
        if p0 < args.clean:
            time.sleep(60)
            continue
        os.sync()
        r8 = _worker("8", args.input)
        r2 = _worker("2", args.input)
        p1 = _probe(args.input)
        probes.append(round(p1))
        pair = {
            "tps_2": r2["turns_per_sec"],
            "tps_8": r8["turns_per_sec"],
            "eff": round(r8["turns_per_sec"] / r2["turns_per_sec"] / 4, 3),
            "probe_before": round(p0),
            "probe_after": round(p1),
            "phases_2": r2["phases"],
            "phases_8": r8["phases"],
            "q50_2": r2["query_p50_sec"],
            "q50_8": r8["query_p50_sec"],
        }
        if p1 >= args.clean:
            kept.append(pair)
            print(f"KEPT pair eff={pair['eff']}", file=sys.stderr)
        else:
            discarded.append(pair)
            print(
                f"DISCARDED pair eff={pair['eff']} (window closed: "
                f"{p1:,.0f} rows/s)",
                file=sys.stderr,
            )
    summary = {
        "metric": "scaling_efficiency_gated",
        "value": (
            round(statistics.median(p["eff"] for p in kept), 3) if kept else None
        ),
        "kept_pairs": kept,
        "discarded_pairs": discarded,
        "probes": probes,
        "clean_threshold_rows_per_sec": args.clean,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
