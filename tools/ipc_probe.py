"""Syscalls-per-turn probe for the build pipeline (VERDICT r4 next #1).

No strace/perf exists in this sandbox, so the probe reads the kernel's
own per-process accounting instead — which, unlike strace, adds ZERO
overhead to the measured run:

- /proc/<pid>/io  → syscr / syscw: the number of read(2)/write(2)-family
  syscalls the process has issued (exact counts, all threads);
- /proc/<pid>/status → voluntary_ctxt_switches (≈ blocking syscall
  round-trips: socket waits, futex sleeps) + nonvoluntary.

The probe runs ONE pinned build (same phases as tools/bench_scaling.py:
flatten+emit materialize, then encode+save) and reports the DELTA of
those counters summed over the whole process tree (driver python, JVM,
every Python worker) divided by turns indexed. Python workers spawned
during the build are counted from zero — their whole life is
build-attributable; processes that die before the final snapshot lose
their counts (workers are reused, so in practice nothing dies).

Why: the r4 scaling forensics (BENCH.md §4) put the 2→8-core ceiling at
host scheduler/IPC latency on the syscall-heavy JVM↔Python socket path —
14-22% sys time, under-saturated pinned cores, all compute probes clean.
This tool makes "syscall-heavy" a measured number so the r5 mitigations
(1 MiB socket buffers via spark.buffer.size, 64k-row build Arrow
batches) have a before/after.

Usage:
  python tools/ipc_probe.py --cores 8 --convs 30000 \
      [--arrow-batch 65536] [--buffer-size 1048576] [--label r5]

Compare configurations:
  python tools/ipc_probe.py --cores 8 --arrow-batch 10000 --buffer-size 65536 --label r4
  python tools/ipc_probe.py --cores 8 --label r5   # library defaults
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

IO_KEYS = ("syscr", "syscw", "read_bytes", "write_bytes")
CTX_KEYS = ("voluntary_ctxt_switches", "nonvoluntary_ctxt_switches")


def _proc_children() -> dict[int, int]:
    """pid → ppid for every live process."""
    out = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                st = f.read()
            # field 4 is ppid; comm (field 2) may contain spaces — split
            # after the closing paren
            ppid = int(st.rsplit(")", 1)[1].split()[1])
            out[int(d)] = ppid
        except (OSError, IndexError, ValueError):
            continue
    return out


def _tree_pids(root: int) -> list[int]:
    parents = _proc_children()
    kids: dict[int, list[int]] = {}
    for pid, ppid in parents.items():
        kids.setdefault(ppid, []).append(pid)
    out, stack = [], [root]
    while stack:
        p = stack.pop()
        out.append(p)
        stack.extend(kids.get(p, []))
    return out


def _counters(pid: int) -> dict[str, int] | None:
    c: dict[str, int] = dict.fromkeys(CTX_KEYS, 0)
    try:
        with open(f"/proc/{pid}/io") as f:
            # /proc/<pid>/io aggregates ALL threads of the process
            for line in f:
                k, _, v = line.partition(":")
                if k in IO_KEYS:
                    c[k] = int(v)
        # ctxt switches in /proc/<pid>/status are the LEADER THREAD only
        # — a JVM does its socket/futex waiting on worker threads, so sum
        # over every task. Threads that exit mid-build lose their counts
        # (undercount, never overcount — deltas stay a lower bound).
        for tid in os.listdir(f"/proc/{pid}/task"):
            try:
                with open(f"/proc/{pid}/task/{tid}/status") as f:
                    for line in f:
                        k, _, v = line.partition(":")
                        if k in CTX_KEYS:
                            c[k] += int(v)
            except OSError:
                continue
    except OSError:
        return None
    return c


def snapshot(root: int) -> dict[int, dict[str, int]]:
    out = {}
    for pid in _tree_pids(root):
        c = _counters(pid)
        if c is not None:
            out[pid] = c
    return out


def delta(before: dict, after: dict) -> dict[str, int]:
    keys = IO_KEYS + CTX_KEYS
    tot = dict.fromkeys(keys, 0)
    for pid, c in after.items():
        base = before.get(pid, {})
        for k in keys:
            tot[k] += c.get(k, 0) - base.get(k, 0)
    return tot


def _worker(args) -> None:
    # env knobs must be set BEFORE get_spark reads them
    if args.arrow_batch:
        os.environ["NEXLT_ARROW_BATCH_BUILD"] = str(args.arrow_batch)
    if args.buffer_size:
        os.environ["NEXLT_BUFFER_SIZE"] = str(args.buffer_size)
    import importlib

    import nexlt_spark.index.packed as packed

    importlib.reload(packed)  # re-read NEXLT_ARROW_BATCH_BUILD
    from nexlt_spark.flatten import flatten_transcripts
    from nexlt_spark.index.packed import build_blocked_direct, save_blocked
    from nexlt_spark.session import get_spark
    from nexlt_spark.synth import synth_transcripts

    import shutil
    import tempfile

    spark = get_spark(
        app_name=f"ipc-probe-{args.cores}",
        master=f"local[{args.cores}]",
        shuffle_partitions=4 * args.cores,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    if args.input and os.path.isdir(args.input):
        transcripts = spark.read.parquet(args.input)
    else:
        transcripts = synth_transcripts(spark, n_convs=args.convs, seed=42).persist()
    n_turns = transcripts.count()
    store = tempfile.mkdtemp(prefix=f"ipc_probe_{args.cores}_")

    def full_build(src, out):
        documents = flatten_transcripts(src).persist()
        idx = build_blocked_direct(documents)
        save_blocked(idx, out, n_buckets=32)
        return documents

    # warmup (JIT) on a 5% sample, identical code path
    full_build(transcripts.sample(0.05, seed=1), os.path.join(store, "warm"))
    spark.catalog.clearCache()

    root = os.getpid()
    before = snapshot(root)
    t0 = time.perf_counter()
    full_build(transcripts, os.path.join(store, "main"))
    build_sec = time.perf_counter() - t0
    after = snapshot(root)

    d = delta(before, after)
    res = {
        "metric": "ipc_probe",
        "label": args.label,
        "cores": args.cores,
        "n_turns": n_turns,
        "build_sec": round(build_sec, 2),
        "turns_per_sec": round(n_turns / build_sec, 1),
        "arrow_batch": os.environ.get("NEXLT_ARROW_BATCH_BUILD", "default"),
        "buffer_size": os.environ.get("NEXLT_BUFFER_SIZE", "default"),
        "totals": d,
        "per_turn": {
            "syscalls_rw": round((d["syscr"] + d["syscw"]) / n_turns, 2),
            "vctx": round(d["voluntary_ctxt_switches"] / n_turns, 2),
            "nvctx": round(d["nonvoluntary_ctxt_switches"] / n_turns, 2),
        },
    }
    print(json.dumps(res))
    shutil.rmtree(store, ignore_errors=True)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--convs", type=int, default=30000)
    ap.add_argument("--input", default="")
    ap.add_argument("--arrow-batch", type=int, default=0)
    ap.add_argument("--buffer-size", type=int, default=0)
    ap.add_argument("--label", default="")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--no-pin", action="store_true")
    args = ap.parse_args()

    if args.worker:
        _worker(args)
        return

    # parent: relaunch self pinned (taskset applies to the whole tree —
    # JVM and Python workers inherit), mirroring bench_scaling's local[]
    # pinning so numbers are comparable with the scaling record
    cmd = [sys.executable, os.path.abspath(__file__), "--worker"]
    for k in ("cores", "convs", "input", "arrow_batch", "buffer_size", "label"):
        v = getattr(args, k)
        if v:
            cmd += [f"--{k.replace('_', '-')}", str(v)]
    if not args.no_pin:
        cmd = ["taskset", "-c", f"0-{args.cores - 1}"] + cmd
    env = dict(os.environ, NEXLT_DRIVER_MEM="24g")
    r = subprocess.run(cmd, env=env)
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
