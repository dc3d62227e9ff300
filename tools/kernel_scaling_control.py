"""Bare-process scaling control for BENCH.md §5.

Runs the EXACT per-batch tokenize+tf kernel of the index build (the same
pandas/numpy code `nexlt_spark.index.build._emit_postings` executes inside
mapInPandas) in plain forked worker processes — no JVM, no Arrow socket,
no Spark scheduler — pinned to N and 4N cores. This isolates the job's
computational kernel from the single-box Spark python-runner path:

- if the kernel scales ~4x here but the Spark job does not, the limit is
  the shared-box runner/JVM contention (a resource a real 4N-executor
  cluster replicates 4x, see BENCH.md §5);
- if the kernel did NOT scale here, the job logic itself would be at
  fault. (Measured: it scales.)

Usage:
    python tools/kernel_scaling_control.py [--levels 2,8] [--input DIR]
Each level forks `cpus` workers over the same pre-loaded text chunks,
parent+children pinned to cores 0..cpus-1 via sched_setaffinity.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_INPUT = "/tmp/nexlt_scaling/input"
CHUNK = 10_000  # rows per work item ≈ one Arrow batch in the Spark job


def _kernel(texts) -> int:
    """The _emit_postings hot loop, verbatim shape (build.py:110-158)."""
    from itertools import chain

    import numpy as np
    import pandas as pd

    from nexlt_spark.analysis import TOKEN_RE

    s = pd.Series(texts)
    toks = s.fillna("").str.normalize("NFKC").str.lower().str.findall(TOKEN_RE)
    lens = toks.str.len().to_numpy(dtype=np.int64)
    flat = list(chain.from_iterable(toks))
    if not flat:
        return 0
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    v = len(uniques)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    key = doc_idx * v + codes
    uk, counts = np.unique(key, return_counts=True)
    return int(uk.size)


def _one_level(cpus: int, chunks) -> dict:
    os.sched_setaffinity(0, set(range(cpus)))  # children inherit
    with mp.get_context("fork").Pool(cpus) as pool:
        pool.map(_kernel, chunks[: max(2, cpus)])  # warm allocators/imports
        t0 = time.perf_counter()
        n_postings = sum(pool.map(_kernel, chunks, chunksize=1))
        dt = time.perf_counter() - t0
    os.sched_setaffinity(0, set(range(os.cpu_count())))
    n_rows = sum(len(c) for c in chunks)
    return {
        "cpus": cpus,
        "rows": n_rows,
        "sec": round(dt, 2),
        "rows_per_sec": round(n_rows / dt, 1),
        "n_postings": n_postings,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--input", default=DEFAULT_INPUT)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument(
        "--max-rows", type=int, default=0,
        help="cap loaded rows (0 = all) — a bounded probe of host capacity",
    )
    args = ap.parse_args()

    import pyarrow.dataset as ds

    scanner = ds.dataset(args.input, format="parquet").scanner(columns=["text"])
    tbl = scanner.head(args.max_rows) if args.max_rows else scanner.to_table()
    texts = tbl.column("text").to_pylist()
    chunks = [texts[i : i + CHUNK] for i in range(0, len(texts), CHUNK)]
    print(f"{len(texts)} rows, {len(chunks)} chunks", file=sys.stderr)

    lvls = list(dict.fromkeys(int(x) for x in args.levels.split(",")))
    runs = {lvl: [] for lvl in lvls}  # ALL requested levels run
    for _ in range(args.trials):
        for cpus in lvls:
            r = _one_level(cpus, chunks)
            runs[cpus].append(r["rows_per_sec"])
            print(json.dumps(r), file=sys.stderr)

    import statistics

    med = {c: statistics.median(v) for c, v in runs.items()}
    lo, hi = min(lvls), max(lvls)
    eff = (med[hi] / med[lo]) / (hi / lo) if hi != lo else 1.0
    print(
        json.dumps(
            {
                "metric": "kernel_scaling_control",
                "levels": {str(c): {"rows_per_sec": med[c], "all": runs[c]} for c in lvls},
                "efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
