"""Per-stage decomposition of the flatten_emit phase at one parallelism
level — the round-3 scaling diagnosis tool.

Runs the production phase exactly as tools/bench_scaling.py times it
(flatten → persist → packed emit → persist → stats agg) and dumps every
Spark stage's task metrics (executorRunTime, executorCpuTime, GC,
shuffle bytes, spill) from the live UI REST API, so "flatten doesn't
scale" becomes "stage X has utilization Y and spends Z in W".

Usage (pin externally, fresh JVM per level, one level per invocation):

    taskset -c 0-1 python tools/profile_flatten.py --cores 2 --input DIR
    taskset -c 0-7 python tools/profile_flatten.py --cores 8 --input DIR
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
        return json.load(r)


def _stage_rows(spark, after_stage: int):
    rows = []
    for st in _rest(spark, "/stages?status=complete"):
        if st["stageId"] <= after_stage:
            continue
        rows.append(
            {
                "stage": st["stageId"],
                "name": st["name"].split("\n")[0][:70],
                "tasks": st["numCompleteTasks"],
                "run_s": round(st["executorRunTime"] / 1000, 2),
                "cpu_s": round(st.get("executorCpuTime", 0) / 1e9, 2),
                "gc_s": round(st.get("jvmGcTime", 0) / 1000, 2),
                "shuf_r_mb": round(st.get("shuffleReadBytes", 0) / 1e6, 1),
                "shuf_w_mb": round(st.get("shuffleWriteBytes", 0) / 1e6, 1),
                "spill_mb": round(
                    (st.get("memoryBytesSpilled", 0) + st.get("diskBytesSpilled", 0))
                    / 1e6,
                    1,
                ),
                "input_mb": round(st.get("inputBytes", 0) / 1e6, 1),
            }
        )
    return sorted(rows, key=lambda r: r["stage"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--skip-warm", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from nexlt_spark.flatten import flatten_transcripts
    from nexlt_spark.index.packed import _SENTINEL, build_blocked_direct
    from nexlt_spark.session import get_spark

    spark = get_spark(
        app_name=f"nexlt-profile-{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=4 * args.cores,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    transcripts = spark.read.parquet(args.input)
    n = transcripts.count()

    if not args.skip_warm:  # JIT warm through the identical path
        wdocs = flatten_transcripts(transcripts.sample(0.05, seed=1)).persist()
        build_blocked_direct(wdocs)
        spark.catalog.clearCache()

    last_stage = max((s["stageId"] for s in _rest(spark, "/stages")), default=-1)

    # the production flatten_emit phase, exactly as bench_scaling times it:
    # build_blocked_direct's stats collect materializes flatten + persist +
    # emit + packed persist + sentinel agg
    t0 = time.perf_counter()
    documents = flatten_transcripts(transcripts).persist()
    idx = build_blocked_direct(documents)
    flatten_emit = round(time.perf_counter() - t0, 2)

    stages = _stage_rows(spark, last_stage)
    print(
        json.dumps(
            {
                "cores": args.cores,
                "n_turns": n,
                "flatten_emit_s": flatten_emit,
                "n_docs": idx.stats.n_docs,
                "stages": stages,
            },
            indent=1,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
