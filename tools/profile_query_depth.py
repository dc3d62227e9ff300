"""Profile the at-depth query path phase by phase (VERDICT #8).

Builds (once) a persistent 2.25M-turn blocked store at
/tmp/nexlt_depth_store, then times each per-query component against it:
term_dfs collect, bucket discovery, scoring+topk job, stored-field fetch.

Usage: [taskset -c 0-7] python tools/profile_query_depth.py [--cores 8]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

INPUT = "/tmp/nexlt_scaling/input"
STORE = "/tmp/nexlt_depth_store"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    from nexlt_spark.flatten import flatten_transcripts
    from nexlt_spark.index.blocks import load_blocked_index
    from nexlt_spark.index.packed import build_blocked_direct, save_blocked
    from nexlt_spark.query.exact import bm25_topk, score_postings, paginate
    from nexlt_spark.query.model import Query, QueryFilters
    from nexlt_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(
        app_name="nexlt-depth-profile",
        master=f"local[{args.cores}]",
        shuffle_partitions=4 * args.cores,
    )

    if not os.path.exists(os.path.join(STORE, "docs", "_SUCCESS")):
        print("building depth store (one-time)...", file=sys.stderr)
        transcripts = spark.read.parquet(INPUT)
        documents = flatten_transcripts(transcripts).persist()
        idx = build_blocked_direct(documents, positions=True)
        save_blocked(idx, STORE, n_buckets=32)
        documents.write.mode("overwrite").parquet(os.path.join(STORE, "docs"))
        documents.unpersist()
        spark.catalog.clearCache()

    documents = spark.read.parquet(os.path.join(STORE, "docs"))
    bidx = load_blocked_index(spark, STORE).persist()
    n_terms = bidx.term_stats.count()
    n_docs = documents.count()
    print(f"store: {n_docs} docs, {n_terms} terms", file=sys.stderr)

    queries = [
        Query(terms=["error"], k=10),
        Query(terms=["the"], k=10),
        Query(terms=["run", "file"], mode="and", k=10),
        Query(terms=["spark", "index", "merge"], mode="or", k=10),
        Query(terms=["data"], filters=QueryFilters(roles=["user", "assistant"]), k=10),
    ]

    # warm: plans, broadcasts, persisted partitions
    for q in queries:
        bm25_topk(bidx, documents, q).collect()

    # --- phase timings on the 2-term AND query -----------------------------
    q = queries[2]
    tphases = {k: [] for k in ["term_dfs", "buckets", "score_topk", "fetch", "full"]}
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        dfs = bidx.term_dfs(q.terms)
        tphases["term_dfs"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        tdf = bidx.term_stats.where(F.col("term").isin(list(q.terms)))
        _ = [r["term_bucket"] for r in tdf.select("term_bucket").distinct().collect()]
        tphases["buckets"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        scored = score_postings(bidx, q.terms, q.mode)
        topk = paginate(scored, [F.col("score").desc(), F.col("doc_id").asc()], 0, q.k)
        rows = topk.collect()
        tphases["score_topk"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        ids = [r["doc_id"] for r in rows]
        documents.where(F.col("doc_id").isin(ids)).collect()
        tphases["fetch"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        bm25_topk(bidx, documents, q).collect()
        tphases["full"].append(time.perf_counter() - t0)

    for k, v in tphases.items():
        print(f"{k:>10}: median {statistics.median(v):.3f}s  {[round(x,3) for x in v]}")

    # --- p50 across all shapes (the §4 metric) -----------------------------
    lats = []
    for _ in range(args.repeats):
        for q in queries:
            t0 = time.perf_counter()
            bm25_topk(bidx, documents, q).collect()
            lats.append(time.perf_counter() - t0)
    print(f"bm25_topk p50 across shapes: {statistics.median(lats):.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
