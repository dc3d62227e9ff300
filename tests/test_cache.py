"""queryResultCache semantics: window over-fetch, LRU, hit = zero jobs."""

import pytest
from pyspark.sql import functions as F

from nexlt_spark.query.cache import cache_stats, cached_topk, query_key
from nexlt_spark.query.exact import bm25_topk
from nexlt_spark.query.model import Query, QueryFilters


def _uncached(index, documents, q):
    return [
        (r["doc_id"], r["score"])
        for r in bm25_topk(index, documents, q).select("doc_id", "score").collect()
    ]


def test_cached_equals_uncached(index, documents):
    q = Query(terms=["error"], k=10)
    assert cached_topk(index, documents, q) == _uncached(index, documents, q)


def test_second_page_served_from_window(index, documents, spark):
    """rows 0-9 over-fetches the 20-row window; rows 10-19 must be a
    pure cache hit (zero Spark jobs) and equal the uncached page."""
    base = Query(terms=["data"], k=10)
    cached_topk(index, documents, base)  # fills the 20-row window
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    page2 = cached_topk(index, documents, Query(terms=["data"], start=10, k=10))
    assert tracker.getJobIdsForGroup(None) == before  # no jobs ran
    assert page2 == _uncached(index, documents, Query(terms=["data"], start=10, k=10))


def test_exhausted_window_short_circuits(index, documents, spark):
    """A query matching fewer docs than the window marks itself
    exhausted; asking for more rows afterwards must not re-plan."""
    q = Query(terms=["w1998"], k=10)  # rare term
    first = cached_topk(index, documents, q)
    if len(first) >= 10:
        pytest.skip("w1998 unexpectedly common in this corpus")
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    more = cached_topk(index, documents, Query(terms=["w1998"], k=200))
    assert tracker.getJobIdsForGroup(None) == before
    assert more == first


def test_filters_and_mode_are_part_of_the_key():
    a = query_key(Query(terms=["x"], filters=QueryFilters(roles=["user"])))
    b = query_key(Query(terms=["x"], filters=QueryFilters(roles=["assistant"])))
    c = query_key(Query(terms=["x"]))
    d = query_key(Query(terms=["x"], mode="and"))
    assert len({a, b, c, d}) == 4
    # start/k are NOT part of the key — the window is shared
    assert query_key(Query(terms=["x"], k=10)) == query_key(Query(terms=["x"], start=10, k=10))


def test_lru_eviction(index, documents):
    for t in ["error", "data", "file"]:
        cached_topk(index, documents, Query(terms=[t], k=5), cache_size=2)
    assert cache_stats(index)["entries"] <= 2


def test_rejects_unrankable_shapes(index, documents):
    with pytest.raises(ValueError):
        cached_topk(index, documents, Query(terms=["x"], sort=[("text_lc", "asc")]))
    with pytest.raises(ValueError):
        cached_topk(index, documents, Query(terms=["x"], count_only=True))
    with pytest.raises(ValueError):
        cached_topk(index, documents, Query())


def test_fetch_returns_all_rows_even_past_cache_capacity(index, documents):
    """A request larger than the documentCache must still return every
    requested row — eviction bounds reuse, not the current response
    (regression: rows fetched this request were evicted before the
    response was built, silently dropping ranked docs from the page)."""
    from nexlt_spark.query.cache import cached_fetch

    ids = [r["doc_id"] for r in documents.select("doc_id").limit(12).collect()]
    got = cached_fetch(index, documents, ids, cache_size=8)
    assert sorted(got.keys()) == sorted(ids)  # nothing dropped
    # hits must be MRU-touched before misses insert: re-request a mix of
    # the 8 surviving rows + new ids under the same tiny capacity
    more = [r["doc_id"] for r in documents.select("doc_id").limit(20).collect()]
    got2 = cached_fetch(index, documents, more, cache_size=8)
    assert sorted(got2.keys()) == sorted(more)


def test_filtered_query_cached_correctly(index, documents):
    q = Query(terms=["run"], filters=QueryFilters(roles=["user"]), k=10)
    got = cached_topk(index, documents, q)
    assert got == _uncached(index, documents, q)
    # and the hit returns the same
    assert cached_topk(index, documents, q) == got
