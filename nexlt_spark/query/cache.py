"""Per-searcher query-result cache — the Solr queryResultCache analog.

The reference configures three 512-entry caches with autowarm 0
(solrconfig.xml:534-558: filterCache / queryResultCache / documentCache)
plus a result-page over-fetch window (queryResultWindowSize=20,
queryResultMaxDocsCached=200, solrconfig.xml:637-642): a /select for
rows 0-9 collects and caches the top 20, so the next page is served
from cache without touching the index.

Transposition: an index object here is an immutable snapshot exactly
like a Solr searcher (rebuilds/reopens produce a NEW object — see
incremental.live_blocked_index), so caches live ON the index instance
and die with it; autowarm 0 means a fresh searcher starts cold, which
is also the natural behavior here. Cached values are the collected
(doc_id, score) rank lists — k·16 bytes, driver-side — never DataFrames
(a DataFrame caches nothing but lineage). The fetch of stored fields
stays a doc_id IN (…) parquet point-read per request (the documentCache
role is played by the OS page cache over the parquet files).

Only relevance-ranked term/phrase queries are cached (the shape Solr's
queryResultCache holds: an ordered docID window per (q, fq, sort)).
Filter / sort / count requests re-plan — they are single-scan jobs with
no rank window to reuse.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import List, Optional, Tuple

from nexlt_spark.query.model import Query

# solrconfig.xml:534-558 / 637-642
DEFAULT_CACHE_SIZE = 512
RESULT_WINDOW = 20
MAX_DOCS_CACHED = 200

_CACHE_ATTR = "_query_result_cache"


def query_key(q: Query) -> Tuple:
    """Canonical, hashable identity of a ranked query — every field that
    can change the rank list (start/k excluded: the window is shared)."""
    f = q.filters
    return (
        tuple(sorted(set(q.terms))),
        q.mode,
        tuple(sorted(set(q.not_terms))) if q.not_terms else None,
        q.phrase,
        q.phrase_slop,
        tuple(sorted((q.boosts or {}).items())) or None,
        q.exists,
        tuple(sorted(f.roles)) if f.roles else None,
        tuple(sorted(f.tools)) if f.tools else None,
        f.ts_from,
        f.ts_to,
        tuple(sorted(f.conv_ids)) if f.conv_ids else None,
        tuple(sorted((k, tuple(sorted(v))) for k, v in (f.fields or {}).items())) or None,
    )


def _cache(index) -> OrderedDict:
    c = getattr(index, _CACHE_ATTR, None)
    if c is None:
        c = OrderedDict()
        setattr(index, _CACHE_ATTR, c)  # index objects are mutable snapshots
    return c


def cached_topk(
    index,
    documents,
    q: Query,
    cache_size: int = DEFAULT_CACHE_SIZE,
    window: int = RESULT_WINDOW,
) -> List[Tuple[int, float]]:
    """Rank window for q with queryResultCache semantics: serve
    (start, start+k) from the cached window when it covers the request,
    else collect a window-rounded superset once and cache it.

    Returns the requested slice as [(doc_id, score), …] in rank order.
    Pair with a doc_id IN (…) point-fetch (query.exact.search phase 2)
    for stored fields.
    """
    if q.sort or q.count_only or not (q.terms or q.phrase):
        raise ValueError("cached_topk caches relevance-ranked queries only")
    need = q.start + q.k
    key = query_key(q)
    cache = _cache(index)
    hit = cache.get(key)
    if hit is not None and (hit["n"] >= need or hit["exhausted"]):
        cache.move_to_end(key)  # LRU touch
        return hit["rows"][q.start : need]

    # miss (or window too small): over-fetch to the window boundary, the
    # queryResultWindowSize=20 round-up, capped at MAX_DOCS_CACHED
    fetch = min(max(need, window, ((need + window - 1) // window) * window), MAX_DOCS_CACHED)
    fetch = max(fetch, need)  # deep pages beyond the cap: fetch exactly
    from pyspark.sql import functions as F

    from nexlt_spark.query.exact import paginate, ranked_scores

    qq = Query(
        terms=q.terms, mode=q.mode, not_terms=q.not_terms, phrase=q.phrase,
        phrase_slop=q.phrase_slop, boosts=q.boosts,
        filters=q.filters, exists=q.exists, start=0, k=fetch,
    )
    scored = ranked_scores(index, documents, qq)
    rows = [
        (r["doc_id"], r["score"])
        for r in paginate(
            scored, [F.col("score").desc(), F.col("doc_id").asc()], 0, fetch
        ).collect()
    ]
    if fetch <= MAX_DOCS_CACHED:
        cache[key] = {"rows": rows, "n": fetch, "exhausted": len(rows) < fetch}
        cache.move_to_end(key)
        while len(cache) > cache_size:
            cache.popitem(last=False)  # evict LRU
    return rows[q.start : need]


_DOC_CACHE_ATTR = "_document_cache"
DOC_CACHE_SIZE = 512  # solrconfig.xml:549-553 documentCache size=512


def cached_fetch(
    index,
    documents,
    ids: List[int],
    cache_size: int = DOC_CACHE_SIZE,
) -> dict:
    """doc_id → full stored row (as dict), with documentCache semantics
    (solrconfig.xml:549-553): rows fetched once per searcher are served
    driver-side on every later request that pages over them. Only the
    MISSING ids go to Spark (one ``doc_id IN (…)`` row-group-pruned
    point read); a fully-cached request issues NO job at all — which is
    exactly how a Solr page repeat behaves (queryResultCache window +
    documentCache rows, zero index reads)."""
    cache = getattr(index, _DOC_CACHE_ATTR, None)
    if cache is None:
        cache = OrderedDict()
        setattr(index, _DOC_CACHE_ATTR, cache)
    # Touch hits FIRST so this request's rows are MRU before any eviction,
    # and build the response before evicting: a request larger than the
    # cache (or one whose hits are LRU-oldest) must still return every
    # fetched row — eviction bounds what the NEXT request can reuse, never
    # what this one returns.
    out = {}
    for i in ids:
        if i in cache:
            cache.move_to_end(i)  # LRU touch
            out[i] = cache[i]
    missing = [i for i in ids if i not in out]
    if missing:
        from pyspark.sql import functions as F

        for r in documents.where(F.col("doc_id").isin(missing)).collect():
            d = r.asDict()
            out[d["doc_id"]] = d
            cache[d["doc_id"]] = d
        while len(cache) > cache_size:
            cache.popitem(last=False)
    return out


def cache_stats(index) -> dict:
    c = getattr(index, _CACHE_ATTR, None)
    d = getattr(index, _DOC_CACHE_ATTR, None)
    return {
        "entries": len(c) if c else 0,
        "size_limit": DEFAULT_CACHE_SIZE,
        "doc_entries": len(d) if d else 0,
        "doc_size_limit": DOC_CACHE_SIZE,
    }
