"""Arrow-kernel vs pure-Catalyst tokenize/tf emit: throughput + scaling.

The emit stage is where the build crosses the JVM↔Python Arrow boundary;
BENCH.md §5 identifies that boundary's aggregate bandwidth as the box's
>8-core scaling ceiling. tokenizer='jvm' (index.build._emit_postings_jvm)
removes the boundary. This bench answers: what does that buy, absolutely
and in scaling, on the same pinned-level protocol as bench_scaling?

Per (level, path): fresh JVM, identical 5% warmup, full emit forced by a
count+sum aggregate (no store write — this isolates the emit stage).
Paths interleaved A/B within each trial; medians reported.

Usage: python tools/bench_emit_paths.py [--levels 8,32] [--trials 3]
       (expects the bench_scaling input at /tmp/nexlt_scaling/input)
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

DEFAULT_INPUT = "/tmp/nexlt_scaling/input"


def _worker(level: int, path: str, input_dir: str) -> None:
    from pyspark.sql import functions as F

    from nexlt_spark.flatten import flatten_transcripts
    from nexlt_spark.index.build import (
        RAW_SCHEMA,
        _emit_postings,
        _emit_postings_jvm,
    )
    from nexlt_spark.session import get_spark

    spark = get_spark(
        app_name=f"nexlt-emit-{path}-{level}",
        master=f"local[{level}]",
        shuffle_partitions=4 * level,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    transcripts = spark.read.parquet(input_dir)
    n_turns = transcripts.count()

    def emit(src):
        documents = flatten_transcripts(src)
        if path == "jvm":
            raw = _emit_postings_jvm(documents, "doc_id", "text", False)
        else:
            raw = documents.select("doc_id", "text").mapInPandas(
                _emit_postings("doc_id", "text", "standard", False),
                schema=RAW_SCHEMA,
            )
        # force every posting row; sum(tf) defeats any count-only shortcut
        return raw.agg(
            F.count(F.lit(1)).alias("rows"), F.sum("tf").alias("tok")
        ).collect()[0]

    emit(transcripts.sample(0.05, seed=1))  # JIT/codegen warmup
    t0 = time.perf_counter()
    res = emit(transcripts)
    sec = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "level": level, "path": path, "sec": round(sec, 2),
                "turns_per_sec": round(n_turns / sec, 1),
                "posting_rows": int(res["rows"]), "tokens": int(res["tok"]),
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", nargs=2, metavar=("LEVEL", "PATH"))
    ap.add_argument("--input", default=DEFAULT_INPUT)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    if args.worker:
        _worker(int(args.worker[0]), args.worker[1], args.input)
        return

    levels = [int(x) for x in args.levels.split(",")]
    runs: dict = {}
    for trial in range(args.trials):
        for level in levels:
            for path in ("arrow", "jvm"):
                cmd = [
                    "taskset", "-c", f"0-{level - 1}",
                    sys.executable, os.path.abspath(__file__),
                    "--worker", str(level), path, "--input", args.input,
                ]
                env = dict(os.environ, NEXLT_DRIVER_MEM="48g")
                out = subprocess.run(
                    cmd, capture_output=True, text=True, cwd=REPO,
                    timeout=1800, check=True, env=env,
                )
                r = json.loads(
                    [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
                )
                runs.setdefault((level, path), []).append(r)
                print(f"trial {trial}: {json.dumps(r)}", file=sys.stderr)

    summary = {}
    for (level, path), rs in runs.items():
        summary[f"{path}@{level}"] = {
            "tps_median": round(statistics.median(x["turns_per_sec"] for x in rs), 1),
            "all_tps": [x["turns_per_sec"] for x in rs],
        }
    for path in ("arrow", "jvm"):
        lo, hi = levels[0], levels[-1]
        a, b = summary.get(f"{path}@{lo}"), summary.get(f"{path}@{hi}")
        if a and b and hi > lo:
            summary[f"{path}_eff_{lo}to{hi}"] = round(
                (b["tps_median"] / a["tps_median"]) / (hi / lo), 3
            )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
