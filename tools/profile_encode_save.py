"""Per-stage decomposition of the encode_save phase at one parallelism
level — finds why save_blocked doesn't scale (round-3 diagnosis tool,
sibling of profile_flatten.py which found the flatten Arrow round-trip).

encode_save = repartition(term,rsalt) -> sort -> stream-encode kernel ->
repartition(bucket, rsalt%8) -> partitioned parquet write, plus the
term_stats/doc_stats/stats writes. This dumps each stage's task metrics
AND each stage's wall window (firstTaskLaunchedTime..completionTime), so
driver-side serial time (job commit, file renames) shows up as wall not
covered by any stage.

Usage (pin externally, fresh JVM per level):

    taskset -c 0-1 python tools/profile_encode_save.py --cores 2 --input DIR
    taskset -c 0-7 python tools/profile_encode_save.py --cores 8 --input DIR
"""

from __future__ import annotations

import argparse
import datetime as dt
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


def _ts(s: str) -> float:
    return dt.datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def _stage_rows(spark, after_stage: int):
    rows = []
    for st in _rest(spark, "/stages?status=complete"):
        if st["stageId"] <= after_stage:
            continue
        wall = None
        try:
            wall = round(_ts(st["completionTime"]) - _ts(st["firstTaskLaunchedTime"]), 2)
        except Exception:
            pass
        rows.append(
            {
                "stage": st["stageId"],
                "name": st["name"].split("\n")[0][:70],
                "tasks": st["numCompleteTasks"],
                "wall_s": wall,
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
                "output_mb": round(st.get("outputBytes", 0) / 1e6, 1),
            }
        )
    return sorted(rows, key=lambda r: r["stage"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--store", default=None, help="store dir (default tmp)")
    ap.add_argument("--skip-warm", action="store_true")
    args = ap.parse_args()

    import shutil
    import tempfile

    from nexlt_spark.flatten import flatten_transcripts
    from nexlt_spark.index.packed import build_blocked_direct, save_blocked
    from nexlt_spark.session import get_spark

    spark = get_spark(
        app_name=f"nexlt-profile-save-{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=4 * args.cores,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    transcripts = spark.read.parquet(args.input)
    n = transcripts.count()
    store = args.store or tempfile.mkdtemp(prefix=f"nexlt_profsave_{args.cores}_")

    if not args.skip_warm:  # JIT warm through the identical path
        wdocs = flatten_transcripts(transcripts.sample(0.05, seed=1)).persist()
        widx = build_blocked_direct(wdocs)
        save_blocked(widx, os.path.join(store, "warm"))
        spark.catalog.clearCache()

    pre_flatten = max((s["stageId"] for s in _rest(spark, "/stages")), default=-1)
    t0 = time.perf_counter()
    documents = flatten_transcripts(transcripts).persist()
    idx = build_blocked_direct(documents)
    flatten_emit = round(time.perf_counter() - t0, 2)

    last_stage = max((s["stageId"] for s in _rest(spark, "/stages")), default=-1)
    t0 = time.perf_counter()
    save_blocked(idx, os.path.join(store, "main"))
    encode_save = round(time.perf_counter() - t0, 2)

    f_stages = _stage_rows(spark, pre_flatten)
    stages = [s for s in f_stages if s["stage"] > last_stage]
    f_stages = [s for s in f_stages if s["stage"] <= last_stage]
    f_covered = round(sum(s["wall_s"] or 0 for s in f_stages), 2)
    covered = round(sum(s["wall_s"] or 0 for s in stages), 2)
    print(
        json.dumps(
            {
                "cores": args.cores,
                "n_turns": n,
                "flatten_emit_s": flatten_emit,
                "flatten_stage_wall_covered_s": f_covered,
                "flatten_uncovered_s": round(flatten_emit - f_covered, 2),
                "encode_save_s": encode_save,
                "stage_wall_covered_s": covered,
                "uncovered_s": round(encode_save - covered, 2),
                "flatten_stages": f_stages,
                "stages": stages,
            },
            indent=1,
        )
    )
    shutil.rmtree(store, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
