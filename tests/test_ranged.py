"""Per-range fused scorer (query.ranged) ≡ the generic fold plan.

The ranged kernel must be bit-identical (not just rank-identical) to
fold_scores' sort_array + F.aggregate fold, because both implement the
same IEEE-754 operation sequence (scoring.py contract). Tested across
many doc ranges (small range_shift ⇒ multi-group merges at test scale),
with per-range top-k truncation, fused phrase adjacency, fq filters,
NOT clauses, and the store roundtrip of the ranged flag.
"""

import pytest
from pyspark.sql import functions as F

from nexlt_spark.index.blocks import load_blocked_index
from nexlt_spark.index.packed import build_blocked_direct, save_blocked
from nexlt_spark.query.exact import (
    bm25_topk,
    fold_scores,
    phrase_score_postings,
    score_postings,
)
from nexlt_spark.query.model import Query, QueryFilters
from nexlt_spark.query.ranged import phrase_score_ranged, score_ranged


@pytest.fixture(scope="module")
def ranged_idx(documents):
    # range_shift=8 ⇒ ~256-doc ranges ⇒ many rsalt groups at test scale
    return build_blocked_direct(documents, range_shift=8, positions=True).persist()


def _scores(df):
    return sorted((r["doc_id"], r["score"]) for r in df.collect())


QUERIES = [
    (["the"], "or"),  # Zipf head, single term (identity fold)
    (["error"], "or"),
    (["run", "file"], "and"),
    (["error", "data", "merge"], "or"),
    (["the", "spark"], "and"),
]


def test_ranged_scores_bit_identical_to_fold(index, ranged_idx):
    for terms, mode in QUERIES:
        want = _scores(score_postings(index, terms, mode))  # flat generic fold
        got = _scores(score_ranged(ranged_idx, terms, mode))
        assert got == want, (terms, mode)


def test_ranged_absent_and_missing_terms(ranged_idx):
    assert score_ranged(ranged_idx, ["zzzqqq"], "or").count() == 0
    assert score_ranged(ranged_idx, ["the", "zzzqqq"], "and").count() == 0
    # OR with one absent term scores the present one
    assert score_ranged(ranged_idx, ["the", "zzzqqq"], "or").count() > 0


def test_per_range_limit_preserves_global_topk(index, ranged_idx):
    for terms, mode in QUERIES:
        full = score_ranged(ranged_idx, terms, mode)
        want = [
            (r["doc_id"], r["score"])
            for r in full.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(10)
            .collect()
        ]
        lim = score_ranged(ranged_idx, terms, mode, limit=10)
        got = [
            (r["doc_id"], r["score"])
            for r in lim.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(10)
            .collect()
        ]
        assert got == want, (terms, mode)


def test_ranged_phrase_matches_generic_fused(pos_index, ranged_idx, documents):
    for phrase in [["merge", "part"], ["the", "fast"], ["batch", "batch"]]:
        want = _scores(phrase_score_postings(pos_index, phrase))
        got = _scores(phrase_score_ranged(ranged_idx, phrase))
        assert got == want, phrase


def test_ranged_phrase_limit(ranged_idx):
    phrase = ["the", "fast"]
    full = phrase_score_ranged(ranged_idx, phrase)
    want = [
        (r["doc_id"], r["score"])
        for r in full.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(5)
        .collect()
    ]
    got = [
        (r["doc_id"], r["score"])
        for r in phrase_score_ranged(ranged_idx, phrase, limit=5)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(5)
        .collect()
    ]
    assert got == want


def test_bm25_topk_ranged_end_to_end(index, ranged_idx, documents):
    cases = [
        Query(terms=["error", "data"], k=10),
        Query(terms=["run", "file"], mode="and", k=10),
        Query(terms=["data"], filters=QueryFilters(roles=["user"]), k=10),
        Query(terms=["error"], not_terms=["file"], k=10),
        Query(terms=["merge", "part"], phrase="merge part", k=10),
        Query(terms=["error"], k=10, start=5),
    ]
    for q in cases:
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in bm25_topk(index, documents, q).collect()
        ]
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in bm25_topk(ranged_idx, documents, q).collect()
        ]
        assert got == want, q


def test_search_two_phase_matches_bm25_topk(index, ranged_idx, documents):
    from nexlt_spark.query.exact import search

    cases = [
        Query(terms=["error", "data"], k=10),
        Query(terms=["run", "file"], mode="and", k=10),
        Query(terms=["data"], filters=QueryFilters(roles=["user"]), k=10),
        Query(terms=["error"], not_terms=["file"], k=10),
        Query(terms=["merge", "part"], phrase="merge part", k=10),
        Query(terms=["error"], k=10, start=5),
        Query(terms=["zzzqqq"], k=10),
    ]
    for idx in (index, ranged_idx):
        for q in cases:
            want = [
                (r["doc_id"], round(r["score"], 9), r["text"])
                for r in bm25_topk(idx, documents, q).collect()
            ]
            got = [
                (doc_id, round(score, 9), row["text"])
                for doc_id, score, row in search(idx, documents, q)
            ]
            assert got == want, q


def test_ranged_flag_roundtrip(spark, ranged_idx, tmp_path):
    path = str(tmp_path / "store")
    save_blocked(ranged_idx, path, n_buckets=8)
    loaded = load_blocked_index(spark, path)
    assert loaded.ranged and loaded.has_positions
    for terms, mode in QUERIES[:3]:
        assert _scores(score_ranged(loaded, terms, mode)) == _scores(
            score_ranged(ranged_idx, terms, mode)
        )


def test_term_cache_consistent_with_store(spark, ranged_idx, tmp_path):
    path = str(tmp_path / "store2")
    save_blocked(ranged_idx, path, n_buckets=8)
    loaded = load_blocked_index(spark, path)
    dfs1 = loaded.term_dfs(["the", "error", "zzzqqq"])
    dfs2 = loaded.term_dfs(["the", "error", "zzzqqq"])  # cached second hit
    assert dfs1 == dfs2
    assert "zzzqqq" not in dfs1
    want = {
        r["term"]: r["df"]
        for r in loaded.term_stats.where(F.col("term").isin(["the", "error"])).collect()
    }
    assert dfs1 == want
    assert loaded.term_buckets(["the", "error"]) == sorted(
        {
            r["term_bucket"]
            for r in loaded.term_stats.where(
                F.col("term").isin(["the", "error"])
            ).collect()
        }
    )
