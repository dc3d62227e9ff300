"""Physical-plan evidence → PLANS.md.

Captures `.explain("formatted")` for the engine's headline operators and
asserts the plan properties that matter at 100 TB:

- parquet scans carry PushedFilters / pruned ReadSchema (predicate
  pushdown + column pruning reach the source);
- small-side joins are BroadcastHashJoin (no shuffle of the big side);
- relevance top-k compiles to TakeOrderedAndProject (per-partition heap,
  no global sort);
- scoring stages sit inside WholeStageCodegen spans (no per-row Python
  in the hot path).

Usage: python tools/explain_plans.py [--out PLANS.md]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "PLANS.md"))
    args = ap.parse_args()

    from nexlt_spark.index.build import build_index
    from nexlt_spark.query.exact import bm25_topk, run_query
    from nexlt_spark.query.model import Query, QueryFilters
    from nexlt_spark.session import get_spark

    spark = get_spark(app_name="nexlt-plans", master="local[8]", shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    idx = build_index(docs).persist()
    idx.doc_stats.count()

    # sections: (title, plan text, must_contain, must_not_contain)
    sections: list[tuple[str, str, list[str], list[str]]] = []

    # 1. pushdown + pruning: metadata filter over the source table
    q1 = docs.where((F.col("lang") == "en") & (F.col("doc_id") < 100)).select(
        "doc_id", "text"
    )
    sections.append(
        (
            "Source filter + projection (S1/P1/P2)",
            plan_text(q1),
            ["PushedFilters", "ReadSchema"],
            [],
        )
    )

    # 2. relevance top-k: TakeOrderedAndProject, codegen scoring
    q2 = bm25_topk(idx, docs, Query(terms=["spark", "join"], k=10))
    sections.append(
        (
            "BM25 top-k (O3/P14/P15)",
            plan_text(q2),
            # "codegen id" marks operators fused into WholeStageCodegen
            # spans (formatted explain under AQE prints ids, not the span)
            ["TakeOrderedAndProject", "codegen id", "BroadcastHashJoin"],
            [],
        )
    )

    # 3. filtered query: fq as left-semi broadcast-able join
    q3 = bm25_topk(
        idx, docs, Query(terms=["value"], filters=QueryFilters(roles=None), k=10)
    )
    del q3  # same shape as q2; keep doc of the sort/count path instead
    q4 = run_query(idx, docs, Query(terms=["query"], sort=[("text_lc", "asc")], k=20))
    sections.append(
        ("Sorted query path (O2/O5)", plan_text(q4), ["TakeOrderedAndProject"], [])
    )

    # 4. phrase from the positions index: postings-only — the plan of a
    # store-loaded index must contain NO Python eval stage (the documents
    # re-tokenizer would show up as ArrowEvalPython/MapInPandas)
    import tempfile

    from nexlt_spark.index.build import InvertedIndex
    from nexlt_spark.query.exact import phrase_docs

    pos_idx = build_index(docs, positions=True)
    store = tempfile.mkdtemp(prefix="nexlt-plans-")
    pos_idx.postings.write.mode("overwrite").parquet(f"{store}/postings")
    pos_idx.doc_stats.write.mode("overwrite").parquet(f"{store}/doc_stats")
    pos_idx.term_stats.write.mode("overwrite").parquet(f"{store}/term_stats")
    loaded = InvertedIndex(
        postings=spark.read.parquet(f"{store}/postings"),
        doc_stats=spark.read.parquet(f"{store}/doc_stats"),
        term_stats=spark.read.parquet(f"{store}/term_stats"),
        stats=pos_idx.stats,
    )
    q5 = phrase_docs(loaded, docs, ["table", "part"])
    sections.append(
        (
            "Phrase query from the positions index (Q2)",
            plan_text(q5),
            ["PushedFilters"],
            ["MapInPandas", "ArrowEvalPython", "BatchEvalPython"],
        )
    )

    # 4b. sloppy phrase ("a b"~N): the greedy position-chain variant must
    # keep the same postings-only, zero-Python shape — the ordered-window
    # verify is nested higher-order Columns, not a UDF
    q5s = phrase_docs(loaded, docs, ["table", "part"], slop=2)
    sections.append(
        (
            'Sloppy phrase ("table part"~2): ordered window from positions',
            plan_text(q5s),
            ["PushedFilters"],
            ["MapInPandas", "ArrowEvalPython", "BatchEvalPython"],
        )
    )

    # 5. embedding near-dup: exact projection-bucketed join — no cartesian
    from nexlt_spark.ops.similarity import projection_near_dup_pairs

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q6 = projection_near_dup_pairs(emb, dim=64, threshold=0.9)
    sections.append(
        (
            "Embedding near-dup: exact projection-bucketed self-join",
            plan_text(q6),
            ["Join"],
            ["CartesianProduct", "BroadcastNestedLoopJoin"],
        )
    )

    # 5b. IVF store probe: cell IN (probed…) must be a PARTITION filter on
    # the hive partitionBy("cell") layout — unprobed cells pruned at
    # planning time, and the top-k stays a per-partition heap
    from nexlt_spark.ops.similarity import (
        ivf_assign,
        ivf_store_topk,
        train_ivf_centroids,
        write_ivf_store,
    )

    cents = train_ivf_centroids(emb, n_cells=4, dim=64, iters=4)
    ivf_path = tempfile.mkdtemp(prefix="nexlt-plans-ivf-") + "/store"
    write_ivf_store(ivf_assign(emb, cents), cents, ivf_path)
    qv = [float(x) for x in emb.select("embedding").head()[0]]
    q6b = ivf_store_topk(spark, ivf_path, qv, nprobe=1, k=10)
    sections.append(
        (
            "IVF store probe: partition-pruned cell scan + top-k heap",
            plan_text(q6b),
            ["PartitionFilters", "TakeOrderedAndProject"],
            ["CartesianProduct", "SortMergeJoin"],
        )
    )

    # 6. facet.query: every predicate in ONE aggregate over one scan
    from nexlt_spark.query.facets import facet_query_counts

    q7 = facet_query_counts(
        docs,
        {
            "en": F.col("lang") == "en",
            "long": F.col("n_chars") >= 400,
            "has_spark": F.col("text").contains("spark"),
        },
    )
    sections.append(
        (
            "facet.query: k predicates, one scan, one aggregate",
            plan_text(q7),
            ["HashAggregate"],
            ["Union", "Join"],
        )
    )

    # 7-9. packed ranged store: the serving plans. Saved + reloaded so the
    # parquet scan (bucket pruning, term pushdown) is part of the plan.
    from nexlt_spark.index.blocks import load_blocked_index
    from nexlt_spark.index.packed import build_blocked_direct, save_blocked
    from nexlt_spark.query.exact import paginate, score_postings
    from nexlt_spark.query.ranged import phrase_score_ranged
    from nexlt_spark.query.wand import wand_topk

    pstore = tempfile.mkdtemp(prefix="nexlt-plans-packed-")
    save_blocked(build_blocked_direct(docs, range_shift=8, positions=True), pstore)
    bidx = load_blocked_index(spark, pstore)

    q8 = paginate(
        score_postings(bidx, ["spark", "join"], "and", per_range_limit=10),
        [F.col("score").desc(), F.col("doc_id").asc()], 0, 10,
    )
    sections.append(
        (
            "Per-range fused BM25 (ranged store): one grouped kernel, block bytes only",
            plan_text(q8),
            # decode+score+arity live in ONE FlatMapGroupsInPandas after a
            # single rsalt exchange of compressed block rows; top-k is a
            # per-partition heap; the term filter reaches the parquet scan
            ["FlatMapGroupsInPandas", "TakeOrderedAndProject", "PushedFilters"],
            # no tokenizer pass, no posting-row shuffle joins
            ["MapInPandas", "ArrowEvalPython", "SortMergeJoin", "CartesianProduct"],
        )
    )

    q9 = paginate(
        phrase_score_ranged(bidx, ["table", "part"], limit=10),
        [F.col("score").desc(), F.col("doc_id").asc()], 0, 10,
    )
    sections.append(
        (
            "Fused phrase on the ranged store: adjacency + scoring in-kernel (Q2)",
            plan_text(q9),
            ["FlatMapGroupsInPandas", "TakeOrderedAndProject", "PushedFilters"],
            # positions never leave the kernel; documents.text never read
            ["MapInPandas", "ArrowEvalPython", "SortMergeJoin", "Join"],
        )
    )

    q10 = wand_topk(bidx, ["spark", "join"], k=10, mode="or")
    sections.append(
        (
            "WAND rescore on the ranged store (candidate-masked kernel, dense candidates)",
            plan_text(q10),
            ["FlatMapGroupsInPandas", "TakeOrderedAndProject"],
            ["MapInPandas", "ArrowEvalPython", "SortMergeJoin"],
        )
    )

    # sparse candidates (the 10^7+-doc WAND design case): the rescore's
    # rows plan decodes+masks in place on the scan — NO groupBy exchange
    # of block payloads; only masked posting rows reach the fold. Forced
    # here with rescore="rows" (the small plan corpus makes every slice
    # coverage look dense otherwise); at scale the auto rule picks this
    # plan whenever candidate slices cover <30% of the docID space.
    q10b = wand_topk(bidx, ["table", "scan"], k=10, mode="and", rescore="rows")
    sections.append(
        (
            "WAND rescore, sparse candidates: shuffle-free rows plan (no payload exchange)",
            plan_text(q10b),
            ["MapInPandas", "TakeOrderedAndProject"],
            ["FlatMapGroupsInPandas", "SortMergeJoin", "CartesianProduct"],
        )
    )

    # 11. sharded scatter-gather: union of per-shard pruned scans feeding
    # ONE TakeOrderedAndProject — no extra shuffle, no cartesian, and the
    # term filter still reaches every shard's parquet scan
    from nexlt_spark.index.sharded import combine_shards

    shard_paths = []
    for i in range(2):
        sp = tempfile.mkdtemp(prefix=f"nexlt-plans-shard{i}-")
        save_blocked(
            build_blocked_direct(
                docs.where(F.pmod(F.col("doc_id"), F.lit(2)) == i)
            ),
            sp,
        )
        shard_paths.append(sp)
    shidx = combine_shards([load_blocked_index(spark, p) for p in shard_paths])
    q11 = bm25_topk(shidx, docs, Query(terms=["spark", "join"], k=10))
    sections.append(
        (
            "Sharded search: union of pruned shard scans, one top-k merge",
            plan_text(q11),
            # the only exchange is the same per-doc score fold the
            # single-store plan has — sharding itself adds none
            ["Union", "TakeOrderedAndProject", "PushedFilters"],
            ["SortMergeJoin", "CartesianProduct"],
        )
    )

    failures: list[str] = []
    out_lines = [
        "# PLANS — physical-plan evidence (`.explain(\"formatted\")`)",
        "",
        f"Generated by `python tools/explain_plans.py` at `{SF_DIR}`. Each section",
        "lists the plan properties asserted for 100 TB viability; regeneration",
        "fails loudly if a property disappears.",
        "",
    ]
    for title, text, must_contain, must_not in sections:
        out_lines += [f"## {title}", ""]
        missing = [m for m in must_contain if m not in text]
        present_bad = [m for m in must_not if m in text]
        if missing:
            failures.append(f"{title}: missing {missing}")
        if present_bad:
            failures.append(f"{title}: must-not-contain violated {present_bad}")
        asserted = [f"`{m}`" + (" ✗" if m in missing else " ✓") for m in must_contain]
        asserted += [f"no `{m}`" + (" ✗" if m in present_bad else " ✓") for m in must_not]
        out_lines += [
            "Asserted: " + ", ".join(asserted),
            "",
            "```",
            text.strip(),
            "```",
            "",
        ]

    with open(args.out, "w") as fh:
        fh.write("\n".join(out_lines))
    print(f"wrote {args.out}", file=sys.stderr)
    if failures:
        print("PLAN PROPERTY FAILURES:", *failures, sep="\n  ", file=sys.stderr)
        sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
