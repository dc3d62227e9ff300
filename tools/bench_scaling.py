"""Scaling-efficiency evidence for BASELINE.json north_rule.

The rule requires the job to run "at N and 4N executors with throughput
scaling efficiency >= 0.8". No real cluster exists in this sandbox, so —
as instructed — we evidence it by running the SAME job on the SAME input
at two parallelism levels in fresh JVMs:

    local[8]   (N cores)      vs      local[32]  (4N cores)

Protocol (each level a fresh ``python tools/bench_scaling.py --worker``
subprocess, so no JIT/caching carry-over):

1. parent generates ONE deterministic transcripts parquet (seeded synth,
   fixed file layout) — both workers read identical bytes;
2. worker times the full index build (read -> flatten w/ stable docIDs ->
   tokenize/tf mapInPandas -> df agg -> materialize) and reports
   turns/sec; then p50 over the reference query shapes;
3. parent computes  efficiency = (tps_4N / tps_N) / 4  and writes the
   BENCH.md scaling section.

The job itself scales its task counts with the core count exactly as a
cluster submission would (shuffle partitions = 4 x cores) — "same job,
same input, bigger cluster".

Usage:  python tools/bench_scaling.py [--convs 60000] [--out BENCH.md]
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
EXEC_MEM_MB = 12288  # per-executor memory for local-cluster levels


def _parse_level(tok: str) -> tuple[int, str, str]:
    """Level token → (total_cores, master_url, label).

    "8"   → 8 cores, local[8]               (thread-multiplexed stand-in)
    "4x2" → 8 cores, local-cluster[4,2,MEM] (4 EXECUTOR JVMs × 2 cores —
            the literal N-executors shape of the north rule: each
            executor has its own JVM heap, GC, and Python-runner pool,
            replicated 4× at the 4N level exactly as a real cluster
            would)
    """
    if "x" in tok:
        n, c = (int(p) for p in tok.split("x"))
        return n * c, f"local-cluster[{n},{c},{EXEC_MEM_MB}]", f"{n}x{c}"
    c = int(tok)
    return c, f"local[{c}]", str(c)


def _worker(level: str, input_dir: str, repeats: int) -> None:
    """One parallelism level: warm JVM, then time the FULL production
    pipeline (flatten -> index -> blocked/compressed store on disk), then
    query p50 against the bucket-pruned blocked store.

    The warmup build (5% sample through the identical code path) exists
    because a cold JVM spends 10-20 s JIT-compiling Spark/codegen — noise
    that would swamp the scaling signal; cluster executors are long-lived
    and warm, so the warm measurement is the faithful one.
    """
    import shutil
    import tempfile

    from nexlt_spark.index.blocks import load_blocked_index
    from nexlt_spark.index.packed import build_blocked_direct, save_blocked
    from nexlt_spark.flatten import flatten_transcripts
    from nexlt_spark.query.exact import bm25_topk
    from nexlt_spark.query.model import Query, QueryFilters
    from nexlt_spark.session import get_spark

    cpus, master, label = _parse_level(level)
    extra = {
        # small input files: force enough read splits to feed all cores
        "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
    }
    if master.startswith("local-cluster"):
        extra["spark.executor.memory"] = f"{EXEC_MEM_MB}m"
        # Size each executor JVM's internal pools (GC/JIT/netty/fork-join)
        # to its CORE QUOTA, exactly as a YARN/K8s container's cgroup
        # limit makes the JVM do (UseContainerSupport). Without this,
        # every executor boots unpinned, reads the machine's 32 cores,
        # and sizes ~23 ParallelGC threads — so 4 pinned executors stack
        # ~92 runnable GC threads onto 8 cores whenever collections
        # coincide (measured: stage GC time 79 s vs 26 s with the quota,
        # and erratic 2-4x CPU inflation on cache-build stages).
        cores_per_exec = int(master.split("[", 1)[1].split(",")[1])
        extra["spark.executor.extraJavaOptions"] = (
            f"-XX:ActiveProcessorCount={cores_per_exec}"
        )
    spark = get_spark(
        app_name=f"nexlt-scaling-{label}",
        master=master,
        shuffle_partitions=4 * cpus,
        extra_conf=extra,
    )
    pin_cores = os.environ.get("NEXLT_PIN_CORES")
    if pin_cores:
        # Executor-only pinning (local-cluster levels): a real cluster's
        # driver runs on its own node, so the driver JVM floats and ONLY
        # the executor JVMs are confined to the level's core budget. Must
        # happen BEFORE the warmup build: executor Python workers fork on
        # first task and inherit the affinity.
        spark.sparkContext.parallelize(range(cpus), cpus).count()  # executors up
        out = subprocess.run(
            ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
            capture_output=True,
            text=True,
        )
        pids = out.stdout.split()
        assert pids, "executor-pinning requested but no executor JVMs found"
        for pid in pids:
            subprocess.run(["taskset", "-acp", pin_cores, pid], capture_output=True)
        print(f"pinned {len(pids)} executor JVMs to cores {pin_cores}", file=sys.stderr)
    transcripts = spark.read.parquet(input_dir)
    n_turns = transcripts.count()  # warm FS cache outside the timer
    # NEXLT_BENCH_STORE_DIR=/dev/shm models per-node distributed storage:
    # on this box ALL levels share ONE ~615 MB/s /tmp disk, so the
    # store-write step of the 4N level is bandwidth-throttled in a way a
    # real cluster (per-executor-node HDFS/S3 write paths) is not.
    store = tempfile.mkdtemp(
        prefix=f"nexlt_store_{cpus}_",
        dir=os.environ.get("NEXLT_BENCH_STORE_DIR") or None,
    )

    # NEXLT_WIRE=varint: compress run payloads BEFORE the emit→encode
    # exchange (~4 B/posting instead of 16 B) — the bandwidth-bound
    # configuration a real cluster shuffle wants; raw is the loopback
    # default (see index.packed._emit_packed)
    wire = os.environ.get("NEXLT_WIRE", "raw")

    def full_build(src, out, phases=None):
        # the scale-path pipeline: packed posting runs (index.packed).
        # Phase split costs nothing extra: build_blocked_direct's stats
        # collect materializes flatten+emit+persist; encode+store-write
        # run lazily inside save_blocked.
        t = time.perf_counter()
        documents = flatten_transcripts(src).persist()
        idx = build_blocked_direct(documents, wire=wire)
        if phases is not None:
            phases["flatten_emit"] = round(time.perf_counter() - t, 2)
        t = time.perf_counter()
        save_blocked(idx, out, n_buckets=32)
        if phases is not None:
            phases["encode_save"] = round(time.perf_counter() - t, 2)
        return documents, idx

    # ---- warmup: identical code path on a 5% sample ----------------------
    warm_docs, warm_idx = full_build(
        transcripts.sample(0.05, seed=1), os.path.join(store, "warm")
    )
    spark.catalog.clearCache()

    # ---- timed: one full-pipeline build (the parent interleaves and
    # medians multiple fresh-JVM invocations per level to beat the
    # machine's run-to-run variance) ---------------------------------------
    phases: dict = {}
    t0 = time.perf_counter()
    documents, idx = full_build(transcripts, os.path.join(store, "main"), phases)
    build_sec = time.perf_counter() - t0

    # ---- queries against the on-disk bucket-pruned blocked store ---------
    bidx = load_blocked_index(spark, os.path.join(store, "main")).persist()
    bidx.term_stats.count()
    queries = [
        Query(terms=["error"], k=10),
        Query(terms=["the"], k=10),  # Zipf head
        Query(terms=["run", "file"], mode="and", k=10),
        Query(terms=["spark", "index", "merge"], mode="or", k=10),
        Query(terms=["data"], filters=QueryFilters(roles=["user", "assistant"]), k=10),
    ]
    for q in queries:  # warm plans/broadcasts
        bm25_topk(bidx, documents, q).collect()
    lats = []
    for _ in range(repeats):
        for q in queries:
            t0 = time.perf_counter()
            bm25_topk(bidx, documents, q).collect()
            lats.append(time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_turns": n_turns,
                "build_sec": round(build_sec, 3),
                "phases": phases,
                "turns_per_sec": round(n_turns / build_sec, 1),
                "query_p50_sec": round(statistics.median(lats), 4),
            }
        )
    )
    shutil.rmtree(store, ignore_errors=True)
    spark.stop()


def _gen_input(input_dir: str, n_convs: int) -> None:
    from nexlt_spark.session import get_spark
    from nexlt_spark.synth import synth_transcripts

    spark = get_spark(app_name="nexlt-scaling-gen", master="local[32]")
    synth_transcripts(spark, n_convs=n_convs, seed=42).repartition(128).write.mode(
        "overwrite"
    ).parquet(input_dir)
    spark.stop()


def _run_worker(level: str, input_dir: str, repeats: int, pin: bool = False) -> dict:
    cores, _, _ = _parse_level(level)
    cmd = [
        sys.executable,
        os.path.abspath(__file__),
        "--worker",
        level,
        "--input",
        input_dir,
        "--repeats",
        str(repeats),
    ]
    env = dict(os.environ, NEXLT_DRIVER_MEM="48g")
    if pin:
        if "x" in level:
            # local-cluster level: pin ONLY the executor JVMs (inside the
            # worker, once they register) — the driver floats, as it would
            # on its own cluster node.
            env["NEXLT_PIN_CORES"] = f"0-{cores - 1}"
        else:
            # local[] level: driver == executor JVM, so pin the whole
            # process tree to exactly `cores` physical cores. Unpinned,
            # the small level's threads + Python workers spread over ALL
            # 32 physical cores — a 2-core "cluster" borrowing 4x its
            # core budget, which corrupts the comparison.
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, timeout=3600, check=True, env=env
    )
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(last)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--worker",
        default="",
        help="run as worker at a level: '8' = local[8], '4x2' = local-cluster[4,2]",
    )
    ap.add_argument("--input", default=DEFAULT_INPUT)
    ap.add_argument("--convs", type=int, default=250000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH.md"))
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument(
        "--pin",
        action="store_true",
        help="taskset-pin each level to exactly N cores (faithful N-core cluster stand-in)",
    )
    args = ap.parse_args()

    if args.worker:
        _worker(args.worker, args.input, args.repeats)
        return

    if not os.path.exists(os.path.join(args.input, "_SUCCESS")):
        print(f"generating input ({args.convs} convs) -> {args.input}", file=sys.stderr)
        _gen_input(args.input, args.convs)

    lo, hi = args.levels.split(",")
    runs = {lo: [], hi: []}
    # interleaved A/B/A/B...: each level measured `trials` times in fresh
    # JVMs, alternating, so slow machine drift hits both levels equally;
    # median per level is the reported number
    for trial in range(args.trials):
        for level in (lo, hi):
            # flush dirty pages + cool down before each worker: the
            # previous worker wrote (and deleted) a full store on the one
            # shared disk, and its writeback otherwise lands INSIDE the
            # next worker's timed store flush (observed as a bimodal
            # encode_save: 46 s outlier vs 13-15 s mode at 8 cores)
            os.sync()
            time.sleep(5)
            print(f"trial {trial}: worker at {level} ...", file=sys.stderr)
            r = _run_worker(level, args.input, args.repeats, pin=args.pin)
            runs[level].append(r)
            print(json.dumps(r), file=sys.stderr)

    res = {}
    for level in (lo, hi):
        med_tps = statistics.median(r["turns_per_sec"] for r in runs[level])
        res[level] = dict(runs[level][0])
        res[level]["turns_per_sec"] = round(med_tps, 1)
        res[level]["build_sec"] = round(res[level]["n_turns"] / med_tps, 3)
        res[level]["query_p50_sec"] = round(
            statistics.median(r["query_p50_sec"] for r in runs[level]), 4
        )
        res[level]["all_tps"] = [r["turns_per_sec"] for r in runs[level]]

    ratio = _parse_level(hi)[0] / _parse_level(lo)[0]
    eff = (res[hi]["turns_per_sec"] / res[lo]["turns_per_sec"]) / ratio
    summary = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": f"(tps_{hi}c/tps_{lo}c)/{ratio:g}",
        "levels": res,
    }
    print(json.dumps(summary))

    section = f"""
## 4. Measured scaling evidence (north_rule: N vs 4N)

Same job, same input (deterministic synth transcripts, seed=42,
{res[lo]['n_turns']} turns, one shared parquet fileset). Protocol: fresh JVM
per run, JIT warmed via an identical 5% build, shuffle partitions =
4 x cores (the job scales its task counts with the cluster exactly as a
real submission would), levels interleaved A/B x{args.trials} and medianed to
cancel machine drift. Pipeline timed end-to-end: flatten (stable docIDs)
-> tokenize/tf -> stats -> salted blocked encode -> bucket-partitioned
store on disk. Produced by `python tools/bench_scaling.py`.
Per-trial throughputs: {lo} {res[lo]['all_tps']},
{hi} {res[hi]['all_tps']}.

| Parallelism | Build (s) | Throughput (turns/s) | Query p50 (s) |
|---|---|---|---|
| {lo}  (N)  | {res[lo]['build_sec']} | {res[lo]['turns_per_sec']} | {res[lo]['query_p50_sec']} |
| {hi} (4N) | {res[hi]['build_sec']} | {res[hi]['turns_per_sec']} | {res[hi]['query_p50_sec']} |

**Scaling efficiency = (tps_4N / tps_N) / 4 = {eff:.3f}**
(target >= 0.8 per BASELINE.json north_rule; efficiency is defined on
build throughput — the query p50s at this toy corpus are per-task
scheduling-overhead-bound, not data-bound, so they do not speed up with
more cores the way a 100 TB query would).
"""
    marker = "## 4. Measured scaling evidence"
    if os.path.exists(args.out):
        body = open(args.out).read()
        body = body.split(marker)[0].rstrip() + "\n" + section
    else:
        body = "# BENCH — measured numbers\n" + section
    with open(args.out, "w") as fh:
        fh.write(body)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
