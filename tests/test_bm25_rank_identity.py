"""The frozen reference query set: engine ≡ pure-Python BM25 oracle.

Rank-identical (doc_id order exact); scores equal to float64
reproducibility (engine and oracle share tokenizer, idf libm, operation
order, and term-sorted summation — see nexlt_spark.scoring).
"""

import math

import pytest

from nexlt_spark.query.exact import run_query, bm25_topk
from nexlt_spark.query.model import Query, QueryFilters

# Frozen query set (FIXTURES.md §3): shapes mirror NeXLT's surface.
QUERIES = [
    ("single_term", Query(terms=["run"], k=10)),
    ("single_term_hot", Query(terms=["the"], k=10)),  # Zipf head (idf floor)
    ("single_term_rare", Query(terms=["w1999"], k=10)),
    ("absent_term", Query(terms=["zzzznotaword"], k=10)),
    ("multi_or", Query(terms=["spark", "index"], mode="or", k=10)),
    ("multi_and", Query(terms=["spark", "index"], mode="and", k=10)),
    ("three_and", Query(terms=["run", "file", "test"], mode="and", k=10)),
    ("and_with_absent", Query(terms=["run", "zzzznotaword"], mode="and", k=10)),
    ("unicode_term", Query(terms=["café"], k=10)),
    ("filtered_role", Query(terms=["error"], filters=QueryFilters(roles=["user", "assistant"]), k=10)),
    ("filtered_tool", Query(terms=["data"], filters=QueryFilters(tools=["bash", "search"]), k=10)),
    (
        "filtered_ts",
        Query(
            terms=["table"],
            filters=QueryFilters(ts_from="2026-01-05 00:00:00", ts_to="2026-03-01 00:00:00"),
            k=10,
        ),
    ),
    ("exists_scored", Query(terms=["value"], exists=True, k=10)),
    ("k_gt_hits", Query(terms=["w1998"], k=1000)),
    ("paginated", Query(terms=["query"], start=20, k=10)),
    ("deep_page", Query(terms=["w1997"], start=100000, k=10)),
    ("mixed_case_query", Query(terms=["ERROR"], k=10)),
    # SO3 NOT clauses (parallel.cgi raw Lucene syntax): prohibited terms
    # are non-scoring exclusions
    ("not_term", Query(terms=["run"], not_terms=["file"], k=10)),
    ("not_multi", Query(terms=["spark", "index"], mode="or", not_terms=["the"], k=10)),
    ("not_absent", Query(terms=["run"], not_terms=["zzzznotaword"], k=10)),
    ("not_and_mode", Query(terms=["run", "file"], mode="and", not_terms=["error"], k=10)),
    (
        "not_with_filter",
        Query(terms=["data"], not_terms=["table"], filters=QueryFilters(roles=["user"]), k=10),
    ),
]


@pytest.mark.parametrize("name,q", QUERIES, ids=[n for n, _ in QUERIES])
def test_rank_identity(index, documents, oracle, name, q):
    want = oracle.topk(q)
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_topk(index, documents, q).select("doc_id", "score").collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want], f"{name}: rank mismatch"
    for (gd, gs), (wd, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-12, abs_tol=1e-15), (name, gd, gs, ws)


PHRASES = [
    ("phrase_common", Query(phrase="the run", k=10)),
    ("phrase_rare", Query(phrase="index search term", k=10)),
    ("phrase_absent", Query(phrase="zzz yyy", k=10)),
    ("phrase_single", Query(phrase="merge", k=10)),
]


@pytest.mark.parametrize("name,q", PHRASES, ids=[n for n, _ in PHRASES])
def test_phrase_rank_identity(index, documents, oracle, name, q):
    want = oracle.topk(q)
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_topk(index, documents, q).select("doc_id", "score").collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want], f"{name}: rank mismatch"
    for (gd, gs), (wd, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-12, abs_tol=1e-15)


def test_num_found_matches(index, documents, oracle):
    for q in [
        Query(count_only=True),
        Query(count_only=True, exists=True),
        Query(terms=["spark"], count_only=True),
        Query(terms=["spark", "join"], mode="and", count_only=True),
        Query(count_only=True, filters=QueryFilters(roles=["tool"])),
        Query(terms=["spark"], not_terms=["join"], count_only=True),
        Query(count_only=True, not_terms=["the"]),
    ]:
        got = run_query(index, documents, q).collect()[0]["num_found"]
        assert got == oracle.num_found(q)


def test_sorted_queries_match(index, documents, oracle):
    for q in [
        Query(terms=["query"], sort=[("text_lc", "asc")], k=50),
        Query(terms=["table"], sort=[("role", "asc")], k=50),
        Query(terms=["table"], sort=[("role", "desc")], k=25),
        Query(sort=[("text_lc", "asc")], exists=True, k=30, start=10),
        Query(terms=["query"], not_terms=["run"], sort=[("text_lc", "asc")], k=50),
    ]:
        got = [r["doc_id"] for r in run_query(index, documents, q).select("doc_id").collect()]
        assert got == oracle.sorted_query(q)


def test_tie_break_by_doc_id(spark):
    """Identical texts ⇒ identical scores ⇒ doc_id asc ordering."""
    from nexlt_spark.index.build import build_index
    from nexlt_spark.oracle import OracleIndex

    rows = [(i, "same text here") for i in range(7)] + [(7, "other words entirely")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(docs)
    got = bm25_topk(idx, docs, Query(terms=["same"], k=10)).select("doc_id").collect()
    assert [r["doc_id"] for r in got] == list(range(7))
    want = OracleIndex([{"doc_id": i, "text": t} for i, t in rows]).topk(Query(terms=["same"], k=10))
    assert [d for d, _ in want] == list(range(7))
