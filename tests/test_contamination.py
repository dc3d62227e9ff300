"""Benchmark-contamination detection vs a brute-force Python oracle.

The op must flag containment (a benchmark item embedded in a long
document), which near-dup Jaccard provably misses, and must never
shuffle the corpus on shingle (broadcast join asserted on the plan).
"""

import re

import pytest

from nexlt_spark.ops.contamination import decontaminate, ngram_contamination


def _grams(text, n):
    toks = re.findall(r"[a-z0-9]+", text.lower())
    if not toks:
        return set()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@pytest.fixture(scope="module")
def corpus(spark):
    bench_q = "what is the sum of the first twelve positive odd integers"
    filler = " ".join(f"w{i} token{i % 7}" for i in range(120))
    rows = [
        # long doc containing the benchmark question verbatim (the case
        # Jaccard misses: |doc grams| >> |shared grams|)
        (0, f"{filler} someone asked {bench_q} on the forum {filler}"),
        (1, "a perfectly clean document about spark joins and shuffles " * 6),
        (2, f"partial echo: sum of the first twelve positive odd integers"),
        (3, bench_q),  # the item itself pasted bare
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench_items(spark):
    return spark.createDataFrame(
        [
            (100, "what is the sum of the first twelve positive odd integers"),
            (101, "name the largest moon of neptune"),
        ],
        "doc_id long, text string",
    )


def test_matches_bruteforce_oracle(spark, corpus, bench_items):
    n = 5
    got = {
        (r["doc_id"], r["bench_id"]): (r["n_hits"], r["doc_shingles"], r["overlap_frac"])
        for r in ngram_contamination(corpus, bench_items, shingle_n=n).collect()
    }
    docs = {r["doc_id"]: r["text"] for r in corpus.collect()}
    bench = {r["doc_id"]: r["text"] for r in bench_items.collect()}
    want = {}
    for d, dt in docs.items():
        dg = _grams(dt, n)
        for b, bt in bench.items():
            bg = _grams(bt, n)
            hits = len(dg & bg)
            if hits >= 1:
                want[(d, b)] = (hits, len(dg), hits / len(bg))
    assert set(got) == set(want)
    for k, (hits, dsh, frac) in want.items():
        g_hits, g_dsh, g_frac = got[k]
        assert (g_hits, g_dsh) == (hits, dsh)
        assert abs(g_frac - frac) < 1e-12


def test_containment_not_jaccard(spark, corpus, bench_items):
    """The long doc 0 fully contains item 100: overlap_frac must be 1.0
    even though its Jaccard to the item is tiny."""
    r = {
        (x["doc_id"], x["bench_id"]): x
        for x in ngram_contamination(corpus, bench_items, shingle_n=5).collect()
    }
    full = r[(0, 100)]
    assert full["overlap_frac"] == pytest.approx(1.0)
    assert full["doc_shingles"] > 20 * full["n_hits"] / full["overlap_frac"] / 25
    # the bare paste is flagged too; the clean doc never is
    assert (3, 100) in r
    assert not any(d == 1 for d, _ in r)


def test_min_hits_threshold(spark, corpus, bench_items):
    all_pairs = ngram_contamination(corpus, bench_items, shingle_n=5, min_hits=1)
    strict = ngram_contamination(corpus, bench_items, shingle_n=5, min_hits=3)
    keep = {(r["doc_id"], r["bench_id"]) for r in strict.collect()}
    assert keep == {
        (r["doc_id"], r["bench_id"])
        for r in all_pairs.collect()
        if r["n_hits"] >= 3
    }


def test_decontaminate_removes_exactly_flagged(spark, corpus, bench_items):
    flagged = {
        r["doc_id"] for r in ngram_contamination(corpus, bench_items, shingle_n=5).collect()
    }
    kept = {r["doc_id"] for r in decontaminate(corpus, bench_items, shingle_n=5).collect()}
    everyone = {r["doc_id"] for r in corpus.collect()}
    assert kept == everyone - flagged


def test_plan_broadcasts_benchmark_no_shuffle_on_shingle(spark, corpus, bench_items):
    """The corpus must meet the benchmark in a broadcast hash join — a
    sort-merge join would shuffle the full corpus shingle stream on an
    8-byte key, the thing this op is shaped to avoid at 10^12 turns."""
    plan = ngram_contamination(corpus, bench_items, shingle_n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan.split("BroadcastHashJoin")[0]
    # exactly ONE shuffle in the whole plan: the groupBy over join
    # survivors. The per-side shingle counts ride the exploded rows
    # (computed row-locally pre-explode), so there is no corpus-wide
    # sizes aggregation and no corpus-sized join back.
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_broadcast_gate_routes(spark, corpus, bench_items, monkeypatch):
    """broadcast=False must run a shuffled join on the 8-byte shingle key
    (the graceful-degradation route for an unbounded 'benchmark' input)
    and produce byte-identical results; the auto gate must pick it when
    the benchmark row count exceeds the cap."""
    import nexlt_spark.ops.contamination as C

    want = sorted(
        map(tuple, ngram_contamination(corpus, bench_items, shingle_n=5, broadcast=True).collect())
    )
    shuffled = ngram_contamination(corpus, bench_items, shingle_n=5, broadcast=False)
    assert sorted(map(tuple, shuffled.collect())) == want
    plan = shuffled._jdf.queryExecution().executedPlan().toString()
    # no forced broadcast: the shingle join is a shuffled join (AQE may
    # still pick SMJ/shuffled-hash — either is fine; BroadcastHashJoin
    # on the shingle key is what must NOT be forced)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan

    # auto gate: cap of 1 row → the 2-item benchmark takes the shuffle route
    monkeypatch.setattr(C, "BROADCAST_MAX_BENCH_ITEMS", 1)
    gated = C.ngram_contamination(corpus, bench_items, shingle_n=5)
    assert sorted(map(tuple, gated.collect())) == want
    gplan = gated._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in gplan or "ShuffledHashJoin" in gplan, gplan
