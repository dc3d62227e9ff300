"""The logical query — Spark transposition of NeXLT's query surface.

The reference assembles queries three ways (SURVEY.md §3): the ajax-solr
ParameterStore (solrTestLib_v2.js:38-102), corpus.cgi field:value strings
(CGI/corpus.cgi:326-339), and parallel.cgi raw Lucene syntax. All of them
reduce to: scored terms/phrase (q) + conjunctive filters (fq) + sort +
start/rows (+ fl). This dataclass is that reduction.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple


@dataclass
class QueryFilters:
    """fq analogs — conjunctive, non-scoring (SURVEY.md SO1-SO3).

    roles/tools: disjunctive value lists, e.g. product:("A" OR "B")
    (solrTestLib_v2.js:58-72). ts_from/ts_to: date-range predicate
    (AthenaExportMt.java:314-328 analog). conv_ids: id filter.
    """

    roles: Optional[Sequence[str]] = None
    tools: Optional[Sequence[str]] = None
    ts_from: Optional[str] = None  # ISO timestamp, inclusive
    ts_to: Optional[str] = None  # ISO timestamp, exclusive
    conv_ids: Optional[Sequence[str]] = None
    # generic equality filters: column → disjunctive value list (the
    # parser routes unknown fq fields here, e.g. lang:en over documents)
    fields: Optional[dict] = None

    def is_empty(self) -> bool:
        return not (
            self.roles or self.tools or self.ts_from or self.ts_to or self.conv_ids or self.fields
        )


@dataclass
class Query:
    """One logical query against the index.

    terms    — scored bag of terms (already-analyzed forms are fine; raw
               text is passed through the shared tokenizer).
    mode     — 'or' (default Lucene SHOULD) or 'and' (corpus.cgi:338 AND).
    not_terms — Lucene NOT / prohibited clauses (parallel.cgi raw syntax,
               SURVEY.md SO3): docs containing ANY of these terms are
               excluded. Non-scoring, like fq — exclusion never changes
               surviving docs' scores.
    phrase   — exact-phrase filter, fq enu:"..." analog
               (solrTestLib_v2.js:43,53); non-scoring, candidates scored
               by their terms.
    phrase_slop — ``"..."~N`` (Lucene sloppy phrase; the raw-syntax
               surface parallel.cgi links users to). ORDERED semantics:
               a doc matches iff its token stream contains the phrase
               tokens in order within a window of ``len(tokens)+slop``
               positions (span − (n−1) ≤ slop). Lucene additionally
               matches REORDERED terms when the slop budget covers the
               transpositions; this engine implements the ordered
               subset and documents the divergence here. Requires a
               positions index. 0 = exact adjacency (the default).
    boosts   — raw-term → query-time boost (``term^2.5``, Lucene boost
               syntax). Each raw term's boost multiplies the BM25 idf of
               every analyzed token it produces (Lucene: boost scales
               the clause's score contribution); tokens produced by
               several boosted raw terms multiply their boosts.
               Non-scoring clauses (fq, NOT, filters) ignore boosts,
               matching Solr.
    filters  — conjunctive metadata filters.
    sort     — None = relevance (score desc, doc_id asc tiebreak,
               CGI/parallel.cgi:157 analog); else [(col, 'asc'|'desc'),…]
               with text_lc asc appended as the reference does
               (solrTestLib_v2.js:83-96).
    start/k  — offset pagination (PagerWidget.js:153) and rows
               (solrconfig.xml:846 default 10).
    count_only — numFound only (*:* analog, solrconfig.xml:1359).
    exists   — require non-empty text, the `field:['' TO *]` existence
               filter (corpus.cgi:330,335).
    fl       — projected columns (solrTestLib_v2.js:99).
    """

    terms: List[str] = field(default_factory=list)
    mode: str = "or"
    not_terms: Optional[List[str]] = None
    phrase: Optional[str] = None
    phrase_slop: int = 0
    boosts: Optional[dict] = None
    filters: QueryFilters = field(default_factory=QueryFilters)
    sort: Optional[List[Tuple[str, str]]] = None
    start: int = 0
    k: int = 10
    count_only: bool = False
    exists: bool = False
    fl: Optional[List[str]] = None
