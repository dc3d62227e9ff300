"""Dissect the encode+store phase's 2→8 scaling (BENCH.md §5 laggard).

The blocked encode phase = decode packed runs → numpy block encode
(applyInPandas) → repartition → parquet store write. This bench times
the phase per (level, sink) with the flatten+emit output pre-built and
persisted, isolating encode+sink from the rest of the pipeline:

- sink=parquet : the production store write (snappy)
- sink=noop    : same full computation, rows discarded at the sink —
                 if noop scales but parquet doesn't, the store write is
                 the non-scaling part; if both scale equally badly, the
                 encode kernel's memory traffic is.

Protocol: fresh JVM per (level, sink) run, pinned to the level's cores,
5% warmup through the identical path, interleaved trials, medians.

Usage: python tools/bench_encode_phase.py [--levels 2,8] [--trials 3]
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


def _worker(level: int, sink: str, input_dir: str) -> None:
    import shutil
    import tempfile

    from nexlt_spark.flatten import flatten_transcripts
    from nexlt_spark.index.packed import build_blocked_direct, save_blocked
    from nexlt_spark.session import get_spark

    spark = get_spark(
        app_name=f"nexlt-encode-{sink}-{level}",
        master=f"local[{level}]",
        shuffle_partitions=4 * level,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    transcripts = spark.read.parquet(input_dir)
    n_turns = transcripts.count()
    store = tempfile.mkdtemp(prefix=f"nexlt_encstore_{level}_")

    def run(src, out):
        documents = flatten_transcripts(src).persist()
        idx = build_blocked_direct(documents)  # stats collect materializes emit
        t0 = time.perf_counter()
        if sink == "noop":
            # identical computation INCLUDING save_blocked's bucket
            # repartition shuffle; only the parquet encode+file write is
            # removed — rows die at the sink
            from pyspark.sql import functions as F

            bucket = F.pmod(F.xxhash64(F.col("term")), F.lit(32)).cast("int")
            (
                idx.blocks.withColumn("term_bucket", bucket)
                .repartition(F.col("term_bucket"), F.pmod(F.col("rsalt"), F.lit(8)))
                .write.format("noop").mode("overwrite").save()
            )
            idx.term_stats.write.format("noop").mode("overwrite").save()
        else:
            save_blocked(idx, out, n_buckets=32)
        sec = time.perf_counter() - t0
        documents.unpersist()
        return sec

    run(transcripts.sample(0.05, seed=1), os.path.join(store, "warm"))
    spark.catalog.clearCache()
    sec = run(transcripts, os.path.join(store, "main"))
    print(
        json.dumps(
            {
                "level": level, "sink": sink, "encode_sec": round(sec, 2),
                "turns_per_sec": round(n_turns / sec, 1),
            }
        )
    )
    shutil.rmtree(store, ignore_errors=True)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", nargs=2, metavar=("LEVEL", "SINK"))
    ap.add_argument("--input", default=DEFAULT_INPUT)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    if args.worker:
        _worker(int(args.worker[0]), args.worker[1], args.input)
        return

    levels = [int(x) for x in args.levels.split(",")]
    runs: dict = {}
    for trial in range(args.trials):
        for level in levels:
            for sink in ("parquet", "noop"):
                cmd = [
                    "taskset", "-c", f"0-{level - 1}",
                    sys.executable, os.path.abspath(__file__),
                    "--worker", str(level), sink, "--input", args.input,
                ]
                out = subprocess.run(
                    cmd, capture_output=True, text=True, cwd=REPO, timeout=1800,
                    check=True, env=dict(os.environ, NEXLT_DRIVER_MEM="48g"),
                )
                r = json.loads(
                    [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
                )
                runs.setdefault((level, sink), []).append(r)
                print(f"trial {trial}: {json.dumps(r)}", file=sys.stderr)

    summary = {}
    for (level, sink), rs in runs.items():
        summary[f"{sink}@{level}"] = {
            "encode_sec_median": round(
                statistics.median(x["encode_sec"] for x in rs), 2
            ),
            "all_sec": [x["encode_sec"] for x in rs],
        }
    lo, hi = levels[0], levels[-1]
    for sink in ("parquet", "noop"):
        a, b = summary.get(f"{sink}@{lo}"), summary.get(f"{sink}@{hi}")
        if a and b and hi > lo:
            summary[f"{sink}_eff_{lo}to{hi}"] = round(
                (a["encode_sec_median"] / b["encode_sec_median"]) / (hi / lo), 3
            )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
