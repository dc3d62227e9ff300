"""Sustained query-throughput (QPS) bench over the production serving plan.

bench.py measures one query at a time (latency); a searcher node serves a
CONCURRENT stream. This tool fires a mixed workload — term / AND-2 / OR-3
shapes whose terms are sampled from the corpus vocabulary by document
frequency (Zipf-weighted, so the mix hits head, mid and tail terms the way
real traffic does) — through the planner-routed serving path
(query/planner.topk) on the ON-DISK blocked store, and reports sustained
QPS plus latency percentiles at increasing client concurrency.

Why client threads scale here: on a warm store the routed plan is usually
the zero-Spark-job driver skip-data WAND (PLANS.md §"Driver skip-data
WAND") whose hot loops are numpy kernels that release the GIL; when the
planner routes to the exact scan instead, those are ordinary Spark jobs
the scheduler runs concurrently. This is the single-node analog of one
Solr searcher draining a request queue — in production QPS scales
horizontally with searcher REPLICAS (each holding the store), so the
number that matters is per-node sustained QPS, which this measures.

Output: one JSON line
  {"workload": N, "levels": {"1": {"qps":..., "p50_ms":..., "p95_ms":...,
   "p99_ms":...}, ...}, "routes": {"wand": n, "exact": n}, ...}

Usage:
  python tools/bench_qps.py [--n-convs 4000] [--queries 200]
      [--threads 1,4,16] [--cpus 32] [--seed 7] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nexlt_spark.flatten import flatten_transcripts  # noqa: E402
from nexlt_spark.index.blocks import load_blocked_index  # noqa: E402
from nexlt_spark.index.packed import build_blocked_direct, save_blocked  # noqa: E402
from nexlt_spark.query.planner import (  # noqa: E402
    choose_topk_path,
    topk as planner_topk,
    topk_rows as planner_topk_rows,
)
from nexlt_spark.session import get_spark  # noqa: E402
from nexlt_spark.synth import synth_transcripts  # noqa: E402


def build_workload(vocab, dfs, n_queries: int, rng: random.Random):
    """Mixed query shapes with df-weighted term choice (head terms are
    asked about more — the Zipf shape of real query logs)."""
    weights = [float(d) for d in dfs]
    shapes = ["term"] * 4 + ["and2"] * 3 + ["or3"] * 3  # 40/30/30 mix
    out = []
    for _ in range(n_queries):
        shape = rng.choice(shapes)
        n = {"term": 1, "and2": 2, "or3": 3}[shape]
        terms = []
        while len(terms) < n:
            t = rng.choices(vocab, weights=weights, k=1)[0]
            if t not in terms:
                terms.append(t)
        out.append((terms, "and" if shape == "and2" else "or"))
    return out


def percentile(sorted_vals, p):
    i = min(len(sorted_vals) - 1, max(0, int(round(p * (len(sorted_vals) - 1)))))
    return sorted_vals[i]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-convs", type=int, default=4000)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--threads", default="1,4,16")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--shards", type=int, default=0,
                    help="serve through N on-disk shards (scatter-gather "
                         "driver rows, ExactStatsCache-global stats) "
                         "instead of the single store")
    args = ap.parse_args()
    levels = [int(x) for x in args.threads.split(",")]

    spark = get_spark(
        app_name="nexlt-bench-qps",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # corpus + on-disk store (all outside the timers)
    transcripts = synth_transcripts(spark, n_convs=args.n_convs, seed=42).persist()
    documents = flatten_transcripts(transcripts).persist()
    documents.count()
    bidx = build_blocked_direct(documents, positions=True)
    store = os.path.join(tempfile.mkdtemp(prefix="nexlt_qps_"), "store")
    save_blocked(bidx, store)
    sidx = load_blocked_index(spark, store)
    sharded = None
    if args.shards:
        from nexlt_spark.index.sharded import combine_shards

        sdirs = []
        for i in range(args.shards):
            part = documents.where(F.pmod(F.col("doc_id"), F.lit(args.shards)) == i)
            sdir = os.path.join(tempfile.mkdtemp(prefix=f"nexlt_qps_sh{i}_"), "store")
            save_blocked(build_blocked_direct(part), sdir)
            sdirs.append(sdir)
        sharded = combine_shards([load_blocked_index(spark, d) for d in sdirs])

    # vocabulary by df (one job, outside the timers)
    rows = sidx.term_stats.select("term", "df").collect()
    rows.sort(key=lambda r: (-r["df"], r["term"]))
    vocab = [r["term"] for r in rows]
    dfs = [r["df"] for r in rows]

    rng = random.Random(args.seed)
    workload = build_workload(vocab, dfs, args.queries, rng)

    # warm the driver metadata + JIT exactly once per distinct term set —
    # a production searcher's steady state (Lucene TermStates are cached
    # per-searcher the same way)
    routes = {"wand": 0, "exact": 0}
    for terms, mode in workload:
        routes[choose_topk_path(sidx, terms, args.k, mode)] += 1
    for terms, mode in {(tuple(t), m): None for t, m in workload}:
        if sharded is not None:
            from nexlt_spark.index.sharded import sharded_topk_rows

            sharded_topk_rows(sharded, list(terms), k=args.k, mode=mode)
        else:
            planner_topk(sidx, list(terms), k=args.k, mode=mode).collect()

    def serve(q):
        # the searcher serving shape: routed rows, no DataFrame/py4j on
        # the driver-plan route (planner.topk_rows docstring)
        terms, mode = q
        stats = {}
        t0 = time.perf_counter()
        if sharded is not None:
            from nexlt_spark.index.sharded import sharded_topk_rows

            sharded_topk_rows(sharded, terms, k=args.k, mode=mode,
                              stats_out=stats)
            return time.perf_counter() - t0, "sharded"
        planner_topk_rows(sidx, terms, k=args.k, mode=mode, stats_out=stats)
        return time.perf_counter() - t0, stats.get("path", "?")

    out_levels = {}
    for t in levels:
        # interleave-shuffle per level with a level-specific seed so every
        # level serves the same multiset of queries in a different order
        wl = list(workload)
        random.Random(args.seed + t).shuffle(wl)
        wall0 = time.perf_counter()
        if t == 1:
            served = [serve(q) for q in wl]
        else:
            with ThreadPoolExecutor(max_workers=t) as ex:
                served = list(ex.map(serve, wl))
        wall = time.perf_counter() - wall0
        lat = sorted(s for s, _ in served)
        level = {
            "qps": round(len(wl) / wall, 1),
            "p50_ms": round(percentile(lat, 0.50) * 1e3, 1),
            "p95_ms": round(percentile(lat, 0.95) * 1e3, 1),
            "p99_ms": round(percentile(lat, 0.99) * 1e3, 1),
            "wall_s": round(wall, 2),
        }
        for route in ("wand", "exact"):
            rl = sorted(s for s, r in served if r == route)
            if rl:
                level[f"{route}_p50_ms"] = round(percentile(rl, 0.50) * 1e3, 1)
        out_levels[str(t)] = level

    print(
        json.dumps(
            {
                "metric": "serving_qps",
                "workload": len(workload),
                "n_turns": documents.count(),
                "k": args.k,
                "levels": out_levels,
                "routes": routes,
                "shards": args.shards or None,
                "cpus": args.cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
