"""The production job script for ``spark-submit --py-files`` (north_rule).

Run exactly as a cluster submission would — the package arrives ONLY via
the --py-files zip, never from the driver's cwd:

    python -m nexlt_spark.deploy                       # builds dist/nexlt_spark.zip
    spark-submit --master local-cluster[2,2,2048] \
        --py-files dist/nexlt_spark.zip \
        tools/submit_job.py --input /path/transcripts --store /path/store

Reads a transcripts parquet (conv_id, turn_idx, role, text, tool, ts),
flattens under stable turn ordering, builds the packed blocked index,
writes the bucket-partitioned store, and prints one JSON metrics line
(turns, postings throughput) — the job the scaling rule times at N and
4N executors. tests/test_submit.py runs this file through a LITERAL
spark-submit against a multi-executor local-cluster master and checks
the store serves rank-identical queries.
"""

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--store", required=True)
    ap.add_argument("--positions", action="store_true")
    ap.add_argument("--n-buckets", type=int, default=32)
    args = ap.parse_args()

    # no sys.path games: on a real submission these imports resolve from
    # the --py-files zip distributed to driver and executors
    from pyspark.sql import SparkSession

    from nexlt_spark.flatten import flatten_transcripts
    from nexlt_spark.index.packed import build_blocked_direct, save_blocked

    spark = SparkSession.builder.appName("nexlt-submit-build").getOrCreate()
    t0 = time.perf_counter()
    transcripts = spark.read.parquet(args.input)
    documents = flatten_transcripts(transcripts).persist()
    idx = build_blocked_direct(documents, positions=args.positions)
    save_blocked(idx, args.store, n_buckets=args.n_buckets)
    n_turns = documents.count()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "job": "nexlt-submit-build",
                "n_turns": n_turns,
                "n_docs": idx.stats.n_docs,
                "build_sec": round(wall, 3),
                "turns_per_sec": round(n_turns / wall, 1),
                "store": args.store,
                "executors": spark.sparkContext.defaultParallelism,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
