"""near_dup_clusters ≡ union-find; dedup_survivors keeps one per cluster.

The transitive-closure step between a pair-producing near-dup op and the
actual dedup action. Oracle: an independently-implemented python
union-find over the same edges.
"""

import random

import pytest
from pyspark.sql import functions as F

from nexlt_spark.ops.dedup import dedup_survivors, near_dup_clusters


def _uf_components(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a long, doc_b long"
    )


def test_clusters_handcrafted(spark):
    # chain 1-2-3, pair 10-11, triangle 20-21-22, singleton edge 30-31
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22), (30, 31)]
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in near_dup_clusters(_pairs_df(spark, edges)).collect()
    }
    ids = sorted({x for e in edges for x in e})
    assert got == _uf_components(ids, edges)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_clusters_random_graphs(spark, seed):
    rng = random.Random(seed)
    ids = list(range(60))
    edges = sorted(
        {tuple(sorted(rng.sample(ids, 2))) for _ in range(50)}
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in near_dup_clusters(_pairs_df(spark, edges)).collect()
    }
    touched = sorted({x for e in edges for x in e})
    assert got == _uf_components(touched, edges)


def test_clusters_long_chain_converges(spark):
    # a 12-node path needs several propagation rounds — the worst
    # realistic shape; must converge well inside the cap
    edges = [(i, i + 1) for i in range(12)]
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in near_dup_clusters(_pairs_df(spark, edges)).collect()
    }
    assert set(got.values()) == {0} and len(got) == 13


def test_survivors_end_to_end(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string"
    )
    edges = [(0, 1), (1, 2), (5, 6)]  # clusters {0,1,2} and {5,6}
    out = sorted(
        r["doc_id"] for r in dedup_survivors(docs, _pairs_df(spark, edges)).collect()
    )
    # keep cluster minima 0 and 5; untouched 3, 4, 7 pass through
    assert out == [0, 3, 4, 5, 7]


def test_survivors_on_real_minhash_pairs(spark, sf_dir):
    from nexlt_spark.ops.minhash import near_duplicate_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = near_duplicate_pairs(docs, threshold=0.9, n_hashes=16, n_bands=4)
    kept = dedup_survivors(docs, pairs)
    labels = near_dup_clusters(pairs)
    n_docs = docs.count()
    n_losers = labels.where(F.col("doc_id") != F.col("cluster_id")).count()
    assert kept.count() == n_docs - n_losers
    # exactly one representative per cluster survives
    reps = {r["cluster_id"] for r in labels.collect()}
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert reps <= kept_ids


def test_alternating_star_matches_union_find(spark):
    from nexlt_spark.ops.dedup import alternating_star_cc

    rng = random.Random(7)
    ids = list(range(80))
    edges = sorted({tuple(sorted(rng.sample(ids, 2))) for _ in range(70)})
    pairs = spark.createDataFrame(edges, "a long, b long")
    got = {r["doc_id"]: r["cluster_id"] for r in alternating_star_cc(pairs).collect()}
    touched = sorted({x for e in edges for x in e})
    assert got == _uf_components(touched, edges)


def test_alternating_star_self_loop_singleton(spark):
    from nexlt_spark.ops.dedup import alternating_star_cc

    pairs = spark.createDataFrame([(5, 5), (1, 2)], "a long, b long")
    got = {r["doc_id"]: r["cluster_id"] for r in alternating_star_cc(pairs).collect()}
    assert got == {5: 5, 1: 1, 2: 1}


def test_adversarial_chain_switches_to_star_and_converges(spark):
    """A 1000-node path graph has diameter 999 — min-label propagation
    would need ~1000 rounds (the r3 code raised at 20). The switch to
    alternating large-star/small-star (O(log n) rounds) must converge and
    still produce component-min labels."""
    n = 1000
    edges = [(i, i + 1) for i in range(n - 1)]
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in near_dup_clusters(_pairs_df(spark, edges), switch_after=4).collect()
    }
    assert len(got) == n and set(got.values()) == {0}


def test_survivors_unchanged_with_star_path(spark):
    """dedup_survivors semantics are identical whichever CC algorithm
    labeled the clusters (switch_after=0 forces the star path)."""
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(8)], "doc_id long, text string"
    )
    edges = [(0, 1), (1, 2), (5, 6)]
    labels = near_dup_clusters(_pairs_df(spark, edges), switch_after=0)
    losers = {r["doc_id"] for r in labels.where(F.col("doc_id") != F.col("cluster_id")).collect()}
    assert losers == {1, 2, 6}
