"""Exact BM25 query path — postings lookup → column-algebra scoring → top-k.

Spark transposition of the reference's /select lifecycle (SURVEY.md §3.1):
q/fq parse → filter intersection → scorer over postings → top-k collector
→ stored-field fetch. Here:

- term lookup   = postings.where(term isin qterms)          [Q1]
- fq filters    = left-semi join against the filtered doc set [SO1-SO3]
- scoring       = pure Column algebra (no UDF), contributions folded in
                  term-sorted order for deterministic float summation
- top-k         = orderBy(score desc, doc_id asc).limit(k) →
                  TakeOrderedAndProject (per-partition heap + driver
                  merge — the Lucene priority-queue collector analog)
- fetch         = broadcast join of the tiny top-k set into documents
                  (documentCache/fl analog, solrconfig.xml:555, Q11)

idf comes from a driver-side Python math.log over exact (N, df) ints —
see nexlt_spark.scoring for why (rank-identity across runtimes).
"""

from __future__ import annotations

from itertools import chain
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nexlt_spark.analysis import tokenize
from nexlt_spark.index.build import InvertedIndex
from nexlt_spark.query.model import Query, QueryFilters
from nexlt_spark.scoring import contribution_col, idf

EMPTY_SCORED_SCHEMA = "doc_id long, score double"


def analyze_terms(raw: List[str], analyzer: str = "standard") -> List[str]:
    """Run query terms through the shared analyzer (Q7: same chain both
    sides, schema.xml:241,293 stemming-at-both-ends analog)."""
    out: List[str] = []
    for r in raw:
        out.extend(tokenize(r, analyzer))
    return out


def filter_documents(documents: DataFrame, f: QueryFilters, exists: bool = False) -> DataFrame:
    """Apply conjunctive fq filters to the documents table (SO1/SO2/F4)."""
    d = documents
    if f.roles:
        d = d.where(F.col("role").isin(list(f.roles)))
    if f.tools:
        d = d.where(F.col("tool").isin(list(f.tools)))
    if f.conv_ids:
        d = d.where(F.col("conv_id").isin(list(f.conv_ids)))
    if f.ts_from:
        d = d.where(F.col("ts") >= F.to_timestamp(F.lit(f.ts_from)))
    if f.ts_to:
        d = d.where(F.col("ts") < F.to_timestamp(F.lit(f.ts_to)))
    if f.fields:
        for col, vals in sorted(f.fields.items()):
            d = d.where(F.col(col).isin(list(vals)))
    if exists:
        d = d.where(F.col("text").isNotNull() & (F.length("text") > 0))
    return d


def idf_map_col(idfs: dict):
    """term → idf literal map Column (driver-computed floats, see scoring)."""
    return F.create_map(
        *chain.from_iterable((F.lit(t), F.lit(v)) for t, v in idfs.items())
    )[F.col("term")]


def fold_scores(
    p: DataFrame,
    idfs: dict,
    avgdl: float,
    n_required: Optional[int] = None,
) -> DataFrame:
    """(term, doc_id, tf, dl) rows → (doc_id, score). THE deterministic
    float fold shared by the exact path and the WAND rescore: per-doc
    contributions are collected, sorted by term, and summed left-to-right
    (SURVEY.md §7.4 rank-identity-under-floats). n_required: AND-mode
    arity check (doc must match all terms)."""
    contrib = contribution_col(idf_map_col(idfs), F.col("tf"), F.col("dl"), avgdl)
    if len(idfs) == 1:
        # single-term fast path: one posting row per doc ⇒ the fold is the
        # identity — no groupBy shuffle at all. Float-identical to the
        # general path (a sum of one contribution) ⇒ rank-identity holds.
        return p.select("doc_id", contrib.alias("score"))
    g = p.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct(F.col("term"), contrib.alias("c")))).alias("cs")
    )
    if n_required is not None:
        g = g.where(F.size("cs") == n_required)
    return g.select(
        "doc_id",
        F.aggregate("cs", F.lit(0.0), lambda acc, x: acc + x["c"]).alias("score"),
    )


def score_postings(
    index: InvertedIndex,
    terms: List[str],
    mode: str = "or",
    doc_filter: Optional[DataFrame] = None,
    per_range_limit: Optional[int] = None,
    boosts: Optional[dict] = None,
) -> DataFrame:
    """(doc_id, score) for a term query. Deterministic float fold.

    doc_filter: optional DataFrame with a doc_id column; candidates are
    restricted via left-semi join (non-scoring fq semantics — filters
    never change scores, matching Solr).

    per_range_limit: on a ranged store, truncate each doc-range to its
    top-(limit) rows inside the kernel (global-order-preserving); pass
    start+k only when no post-hoc row removal (NOT terms) follows.

    boosts: analyzed-term → query-time boost (``term^2.5``); multiplies
    that term's idf, i.e. scales its whole BM25 contribution, exactly as
    a Lucene boost scales the clause score. Applied identically here and
    in the ranged kernel (one driver-side float multiply before the plan
    is built — rank identity vs the oracle holds boosted or not).
    """
    if getattr(index, "ranged", False):
        # per-range fused plan (query.ranged): decode+score+arity in one
        # numpy kernel per disjoint doc range — no postings-row shuffle.
        # Scores are bit-identical to the fold below (non-scoring fq ⇒
        # the filter semi-join commutes with scoring).
        from nexlt_spark.query.ranged import score_ranged

        scored = score_ranged(
            index, terms, mode, per_range_limit if doc_filter is None else None,
            boosts=boosts,
        )
        if doc_filter is not None:
            scored = scored.join(doc_filter.select("doc_id"), "doc_id", "left_semi")
        return scored
    spark = index.doc_stats.sparkSession
    qterms = sorted(set(terms))
    dfs = index.term_dfs(qterms)
    present = [t for t in qterms if t in dfs]
    if not present or (mode == "and" and len(present) < len(qterms)):
        return spark.createDataFrame([], EMPTY_SCORED_SCHEMA)

    n = index.stats.n_docs
    avgdl = index.stats.avgdl
    idfs = {t: idf(n, dfs[t]) for t in present}
    if boosts:
        idfs = {t: v * boosts.get(t, 1.0) for t, v in idfs.items()}

    if hasattr(index, "lookup"):
        p = index.lookup(present)
    else:
        p = index.postings.where(F.col("term").isin(present))
    if doc_filter is not None:
        p = p.join(doc_filter.select("doc_id"), "doc_id", "left_semi")

    return fold_scores(p, idfs, avgdl, len(present) if mode == "and" else None)


def prohibited_docs(index: InvertedIndex, not_terms: List[str], analyzer: str = "standard"):
    """doc_ids matching ANY prohibited term (SO3 NOT clause,
    CGI/parallel.cgi raw Lucene syntax). Returns None when no analyzed
    not-term exists in the index (nothing to exclude). Posting-set union —
    NOT is then a left_anti join, never a scan of documents."""
    nts = sorted(set(analyze_terms(not_terms, analyzer)))
    dfs = index.term_dfs(nts)  # ONE stats job for every NOT term
    present = [t for t in nts if t in dfs]
    if not present:
        return None
    if hasattr(index, "lookup"):
        p = index.lookup(present)
    else:
        p = index.postings.where(F.col("term").isin(present))
    return p.select("doc_id").distinct()


def phrase_match_docs(
    index: InvertedIndex, phrase_tokens: List[str], slop: int = 0
) -> DataFrame:
    """doc_ids containing the phrase, from the POSITIONS INDEX only.

    The Lucene PhraseQuery plan (the reference UI's default text filter is
    a quoted phrase fq — web/nexlt/jslib/solrTestLib_v2.js:43,53 — served
    from Lucene's positions postings): intersect the phrase terms'
    postings, then verify adjacency by intersecting shifted position sets
    — pos(t0) ∩ (pos(t1)-1) ∩ … ∩ (pos(tm)-m) non-empty. The plan touches
    ONLY the phrase terms' posting rows (never documents.text): one
    groupBy(doc_id) over those rows, then pure JVM array algebra. Repeated
    phrase tokens reuse the same posting row at each offset.

    slop > 0 (``"..."~N``, the sloppy PhraseQuery of the raw syntax
    parallel.cgi exposes): ORDERED window semantics — match iff an
    in-order, strictly-increasing position chain exists whose span minus
    (n−1) is ≤ slop (see Query.phrase_slop for the Lucene-reorder
    divergence note). Same postings-only plan: per start position the
    greedy minimal-end chain is built with nested higher-order Column
    functions (transform/filter/array_min — whole-stage codegen, no UDF);
    greedy is optimal because taking the smallest valid next position
    never hurts later steps, so span minimality per start is exact.
    """
    spark = index.doc_stats.sparkSession
    uniq = sorted(set(phrase_tokens))
    dfs = index.term_dfs(uniq)
    if len(dfs) < len(uniq):  # a phrase term absent from the corpus
        return spark.createDataFrame([], "doc_id long")
    p = index.lookup(uniq, positions=True).select("term", "doc_id", "positions")
    per_doc = (
        p.groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("term"), F.col("positions")))
            ).alias("pm")
        )
        .where(F.size("pm") == len(uniq))  # token-AND prefilter
    )
    return per_doc.where(_phrase_alive_col(phrase_tokens, slop)).select("doc_id")


def _phrase_alive_col(phrase_tokens: List[str], slop: int):
    """Boolean Column over a ``pm`` (term → ascending positions array) map
    column: does an in-order position chain of the phrase tokens exist
    with span − (n−1) ≤ slop? slop 0 compiles to the shifted-intersect
    adjacency form; slop > 0 to greedy minimal-end chains. Shared by the
    two-pass (phrase_match_docs) and fused (phrase_score_postings) plans.
    """

    def _shift(i: int):
        # NB: a `lambda x, _i=i:` two-parameter lambda would be read by
        # pyspark as the (element, index) transform form — closure factory
        return lambda x: x - i

    if slop <= 0:
        alive = F.col("pm")[phrase_tokens[0]]
        for i, t in enumerate(phrase_tokens[1:], start=1):
            alive = F.array_intersect(alive, F.transform(F.col("pm")[t], _shift(i)))
        return F.size(alive) > 0

    def _chain(t: str):
        # closure factory (arity-1 pitfall above); nulls propagate a
        # broken chain: array_min(filter(…)) of no successor is NULL,
        # x > NULL filters everything, and the final NULL span compares
        # to NULL which `where` treats as no-match
        arr = F.col("pm")[t]
        return lambda e: F.array_min(F.filter(arr, lambda x: x > e))

    def _pair_within(prev_col, next_col):
        # exact ordered two-token window test: ∃ a∈prev, b∈next with
        # a < b ≤ a + slop + 1. Expanding each b into its admissible
        # predecessor window and intersecting keeps the work linear in
        # |next|·(slop+1) with ONE intersect per doc — the per-end
        # filter+array_min chain below is O(|prev|·|next|) interpreted
        # HOF evaluations and allocates a filtered copy of the positions
        # array per element, which on Zipf-head terms ("the run"~3 at
        # ~200k docs) turns into a GC storm with 0.8 s → 15 s swings.
        preds = F.flatten(
            F.transform(
                next_col, lambda b: F.sequence(b - F.lit(slop + 1), b - F.lit(1))
            )
        )
        return F.size(F.array_intersect(prev_col, preds)) > 0

    n = len(phrase_tokens)

    if n == 1:
        # a one-token "phrase" (any slop) is just term presence — the
        # chain below degenerates to span 0 ≤ slop for every position
        return F.size(F.col("pm")[phrase_tokens[0]]) > 0

    # window expansion is linear in slop; for pathological slops keep the
    # chain-only form (the parser never emits these, but the API allows)
    expand_ok = slop < 64

    if n == 2 and expand_ok:
        # for two tokens the pairwise window test IS the span criterion
        # (span − 1 = gap ≤ slop), so it is exact on its own
        return _pair_within(F.col("pm")[phrase_tokens[0]], F.col("pm")[phrase_tokens[1]])

    starts = F.col("pm")[phrase_tokens[0]]
    ends = starts
    for t in phrase_tokens[1:]:
        ends = F.transform(ends, _chain(t))
    chain_alive = F.exists(
        F.zip_with(starts, ends, lambda s, e: (e - s - F.lit(n - 1)) <= F.lit(slop)),
        lambda b: b,
    )
    if not expand_ok:
        return chain_alive
    # n ≥ 3: every adjacent token pair of a qualifying chain is itself
    # in-order within the total slack, so the conjunction of pairwise
    # window tests is a necessary condition — a cheap codegen-friendly
    # gate; CaseWhen evaluates the quadratic greedy chain only on the
    # docs that pass it
    pre = _pair_within(F.col("pm")[phrase_tokens[0]], F.col("pm")[phrase_tokens[1]])
    for a, b in zip(phrase_tokens[1:], phrase_tokens[2:]):
        pre = pre & _pair_within(F.col("pm")[a], F.col("pm")[b])
    return F.when(pre, chain_alive).otherwise(F.lit(False))


def phrase_score_postings(
    index: InvertedIndex,
    phrase_tokens: List[str],
    doc_filter: Optional[DataFrame] = None,
    slop: int = 0,
    boosts: Optional[dict] = None,
) -> DataFrame:
    """FUSED phrase plan: adjacency verify + BM25 scoring in ONE
    groupBy(doc_id) over the phrase terms' postings.

    Applicable when the scored terms are exactly the phrase's tokens (the
    common quoted-query shape). One aggregation collects both the
    term-sorted contribution structs (the deterministic fold input —
    float-identical to fold_scores) and the term→positions map; adjacency
    and arity filter the aggregated rows. Halves the shuffle of the
    two-pass plan (phrase_match_docs + score_postings re-grouping the
    same posting rows).

    slop > 0 swaps the adjacency intersect for the same greedy
    minimal-end ordered-window chain as phrase_match_docs — the verify
    runs on the pm map this aggregation already collects, so sloppy
    phrases keep the one-pass shuffle shape.
    """
    spark = index.doc_stats.sparkSession
    uniq = sorted(set(phrase_tokens))
    dfs = index.term_dfs(uniq)
    if len(dfs) < len(uniq):
        return spark.createDataFrame([], EMPTY_SCORED_SCHEMA)
    n, avgdl = index.stats.n_docs, index.stats.avgdl
    idfs = {t: idf(n, dfs[t]) for t in uniq}
    if boosts:
        idfs = {t: v * boosts.get(t, 1.0) for t, v in idfs.items()}

    p = index.lookup(uniq, positions=True)
    if doc_filter is not None:
        p = p.join(doc_filter.select("doc_id"), "doc_id", "left_semi")
    contrib = contribution_col(idf_map_col(idfs), F.col("tf"), F.col("dl"), avgdl)
    g = p.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct(F.col("term"), contrib.alias("c")))).alias("cs"),
        F.map_from_entries(
            F.collect_list(F.struct(F.col("term"), F.col("positions")))
        ).alias("pm"),
    )
    g = g.where(F.size("cs") == len(uniq))  # token-AND arity
    g = g.where(_phrase_alive_col(phrase_tokens, slop))
    return g.select(
        "doc_id",
        F.aggregate("cs", F.lit(0.0), lambda acc, x: acc + x["c"]).alias("score"),
    )


def phrase_candidates(
    documents: DataFrame, phrase_tokens: List[str], analyzer: str = "standard"
) -> DataFrame:
    """doc_ids whose token stream contains the phrase as adjacent tokens —
    FALLBACK for indexes built without positions.

    Re-tokenizes the (possibly pre-filtered) documents and substring-tests
    the joined token stream. Exact w.r.t. the shared tokenizer, but a
    corpus scan per query — prefer phrase_match_docs on a positions index
    (build_index(positions=True)); this remains only for positions-less
    indexes.
    """
    from nexlt_spark.analysis import tokenize_udf_col

    joined = F.concat(
        F.lit(" "), F.array_join(tokenize_udf_col(F.col("text"), analyzer), " "), F.lit(" ")
    )
    needle = " " + " ".join(phrase_tokens) + " "
    return documents.where(F.instr(joined, needle) > 0).select("doc_id")


def phrase_docs(
    index: InvertedIndex,
    documents: DataFrame,
    phrase_tokens: List[str],
    analyzer: str = "standard",
    doc_filter: Optional[DataFrame] = None,
    slop: int = 0,
) -> DataFrame:
    """Dispatch phrase matching: positions index when available (postings
    only — the scale plan), else the re-tokenize fallback. Returns the
    doc_id set, intersected with doc_filter when given."""
    if getattr(index, "has_positions", False):
        cand = phrase_match_docs(index, phrase_tokens, slop=slop)
        if doc_filter is not None:
            cand = cand.join(doc_filter.select("doc_id"), "doc_id", "left_semi")
        return cand
    if slop > 0:
        raise ValueError(
            "sloppy phrases (\"...\"~N) require a positions index; "
            "build with positions=True"
        )
    base = documents if doc_filter is None else documents.join(
        doc_filter.select("doc_id"), "doc_id", "left_semi"
    )
    return phrase_candidates(base, phrase_tokens, analyzer)


def paginate(df: DataFrame, sort_cols, start: int, k: int) -> DataFrame:
    """Offset pagination O5: limit(start+k) then window row_number on the
    tiny limited set (never a global single-partition sort of the full
    result — the limit runs as TakeOrderedAndProject first)."""
    top = df.orderBy(*sort_cols).limit(start + k)
    if start == 0:
        return top
    w = Window.orderBy(*sort_cols)
    return (
        top.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") > start)
        .drop("_rn")
    )


def ranked_scores(
    index: InvertedIndex,
    documents: DataFrame,
    q: Query,
    unlimited_ranges: bool = False,
) -> DataFrame:
    """(doc_id, score) of every match of a relevance query — the shared
    rank-phase dispatch behind bm25_topk / search / cache.cached_topk:
    picks the fused per-range phrase plan, the one-pass phrase plan, or
    the postings fold; applies fq / existence / NOT. Unpaginated (callers
    paginate with the canonical score-desc doc_id-asc order).

    unlimited_ranges=True disables the ranged kernels' per-range
    top-(start+k) truncation — required by callers that page PAST the
    first start+k rows (cursorMark keyset paging), where the truncation
    is no longer global-order-preserving."""
    an = getattr(index, "analyzer", "standard")
    terms = analyze_terms(q.terms, an)
    if q.phrase:
        terms = terms + [t for t in tokenize(q.phrase, an) if t not in terms]
        mode = "and"
    else:
        mode = q.mode

    # effective analyzed-token boosts: each raw boosted clause (term or
    # quoted phrase) scales every token it analyzes to; tokens reached by
    # several boosted clauses multiply (model.py Query.boosts contract)
    eff_boosts = None
    if q.boosts:
        eff_boosts = {}
        for raw, b in q.boosts.items():
            for tok in tokenize(raw, an):
                eff_boosts[tok] = eff_boosts.get(tok, 1.0) * b

    doc_filter = None
    if not q.filters.is_empty() or q.exists:
        doc_filter = filter_documents(documents, q.filters, q.exists).select("doc_id")
    # per-range kernels may truncate each range to its top-(start+k) rows
    # (global-order-preserving) when no NOT-clause removes rows afterwards
    prl = (q.start + q.k) if not (q.not_terms or unlimited_ranges) else None
    if (
        q.phrase
        and getattr(index, "has_positions", False)
        and set(terms) <= set(tokenize(q.phrase, an))
    ):
        ptoks = tokenize(q.phrase, an)
        if getattr(index, "ranged", False):
            # fused per-range phrase plan: adjacency (or ordered slop
            # window) + scoring inside the range kernel (positions never
            # leave it); boosts scale the kernel's idfs driver-side
            from nexlt_spark.query.ranged import phrase_score_ranged

            scored = phrase_score_ranged(
                index, ptoks, prl if doc_filter is None else None,
                slop=q.phrase_slop, boosts=eff_boosts,
            )
            if doc_filter is not None:
                scored = scored.join(doc_filter.select("doc_id"), "doc_id", "left_semi")
        else:
            # fused one-pass phrase plan (scored terms are the phrase tokens)
            scored = phrase_score_postings(
                index, ptoks, doc_filter, slop=q.phrase_slop, boosts=eff_boosts
            )
    else:
        if q.phrase:
            doc_filter = phrase_docs(
                index, documents, tokenize(q.phrase, an), an, doc_filter,
                slop=q.phrase_slop,
            )
        scored = score_postings(
            index, terms, mode, doc_filter, per_range_limit=prl, boosts=eff_boosts
        )
    if q.not_terms:
        excl = prohibited_docs(index, q.not_terms, an)
        if excl is not None:
            scored = scored.join(excl, "doc_id", "left_anti")
    return scored


def bm25_topk(
    index: InvertedIndex,
    documents: DataFrame,
    q: Query,
) -> DataFrame:
    """Relevance-ranked top-k: (doc_id, score, …fl columns)."""
    scored = ranked_scores(index, documents, q)
    sort_cols = [F.col("score").desc(), F.col("doc_id").asc()]
    topk = paginate(scored, sort_cols, q.start, q.k)

    fl = q.fl or [c for c in documents.columns if c != "doc_id"]
    fetched = documents.join(F.broadcast(topk), "doc_id").select(
        "doc_id", "score", *fl
    )
    # re-sort after the fetch join (joins don't preserve order)
    return fetched.orderBy(F.col("score").desc(), F.col("doc_id").asc())


def search(index: InvertedIndex, documents: DataFrame, q: Query):
    """Two-phase eager search: rank top-k, then point-fetch stored fields.

    The Lucene/Solr /select lifecycle is two-phase — collect the top-k
    (docID, score) first, then fetch stored fields for exactly those k
    docIDs (documentCache, solrconfig.xml:555). bm25_topk expresses the
    whole thing lazily, which makes the fetch a broadcast join against a
    full documents scan; at depth that scan dominates latency. Here the
    rank phase is materialized (k rows to the driver — bounded by q.k),
    and the fetch becomes `doc_id IN (…k ids…)` — pushed into the
    parquet scan, pruning row groups by doc_id min/max (stable docIDs
    are range-partitioned, flatten.assign_stable_ids). Returns a list of
    Rows in rank order.
    """
    scored = ranked_scores(index, documents, q)

    # phase 1: rank (TakeOrderedAndProject; ≤ start+k rows to the driver)
    ranked = paginate(
        scored, [F.col("score").desc(), F.col("doc_id").asc()], q.start, q.k
    ).collect()
    if not ranked:
        return []
    # phase 2: point fetch — doc_id IN pushed to the parquet scan
    ids = [r["doc_id"] for r in ranked]
    fl = q.fl or [c for c in documents.columns if c != "doc_id"]
    fetched = {
        r["doc_id"]: r
        for r in documents.where(F.col("doc_id").isin(ids)).select("doc_id", *fl).collect()
    }
    out = []
    for r in ranked:
        row = fetched.get(r["doc_id"])
        if row is not None:
            out.append((r["doc_id"], r["score"], row))
    return out


def sorted_matches(
    index: InvertedIndex, documents: DataFrame, q: Query
) -> Tuple[DataFrame, List[Tuple[str, str]]]:
    """Match set of a SORTED (non-relevance) query plus its effective
    TOTAL sort spec — q.sort with the reference's text_lc tiebreak
    (solrTestLib_v2.js:83-96) and a final unique doc_id asc appended, so
    the order admits deterministic offset pagination (run_query) and
    keyset cursor pagination (query.cursor / select_cursor) alike."""
    an = getattr(index, "analyzer", "standard")
    base = filter_documents(documents, q.filters, q.exists)
    if q.not_terms:
        excl = prohibited_docs(index, q.not_terms, an)
        if excl is not None:
            base = base.join(excl, "doc_id", "left_anti")
    if q.terms:
        terms = analyze_terms(q.terms, an)
        scored = score_postings(index, terms, q.mode, base.select("doc_id"))
        base = base.join(scored.select("doc_id"), "doc_id", "left_semi")
    if q.phrase:
        base = base.join(
            phrase_docs(
                index, documents, tokenize(q.phrase, an), an,
                base.select("doc_id"), slop=q.phrase_slop,
            ),
            "doc_id",
            "left_semi",
        )
    spec = [(c, d) for c, d in (q.sort or [])]
    names = [c for c, _ in spec]
    if "doc_id" in names:
        # truncate at the unique key: columns after it can never affect
        # the order, and keeping them bloats cursor marks (a text_lc
        # tiebreak would base64 whole lowercased documents into every
        # nextCursorMark) and the after-cursor filter
        spec = spec[: names.index("doc_id") + 1]
    else:
        if "text_lc" not in names:
            spec.append(("text_lc", "asc"))
        spec.append(("doc_id", "asc"))
    if any(c == "text_lc" for c, _ in spec) and "text_lc" not in base.columns:
        # synthesized ONLY when the effective order needs it — otherwise
        # every result row would carry a lowercased copy of the text
        base = base.withColumn("text_lc", F.lower(F.col("text")))
    return base, spec


def run_query(index: InvertedIndex, documents: DataFrame, q: Query) -> DataFrame:
    """Dispatch over the full query surface (SURVEY.md §2.7)."""
    spark = documents.sparkSession

    an = getattr(index, "analyzer", "standard")
    # lazy: prohibited_docs runs a term-stats collect, and the q.sort and
    # bm25_topk branches below handle NOT terms themselves — computing it
    # eagerly here would run that job twice (or for nothing)
    _excl_memo: List = []

    def _not(df: DataFrame) -> DataFrame:
        if not q.not_terms:
            return df
        if not _excl_memo:
            _excl_memo.append(prohibited_docs(index, q.not_terms, an))
        excl = _excl_memo[0]
        return df if excl is None else df.join(excl, "doc_id", "left_anti")

    # match-all / count-only: numFound (A6)
    if q.count_only:
        base = _not(filter_documents(documents, q.filters, q.exists))
        if q.phrase:
            # numFound must respect the phrase constraint too (A6 over
            # Q2) — counting the unphrased match set silently inflates it
            base = base.join(
                phrase_docs(
                    index, documents, tokenize(q.phrase, an), an,
                    base.select("doc_id"), slop=q.phrase_slop,
                ),
                "doc_id",
                "left_semi",
            )
        if q.terms:
            terms = analyze_terms(q.terms, an)
            scored = score_postings(index, terms, q.mode, base.select("doc_id"))
            return scored.agg(F.count(F.lit(1)).alias("num_found"))
        return base.agg(F.count(F.lit(1)).alias("num_found"))

    # non-relevance sort (O2): sort=srclc asc etc., reference appends
    # srclc asc as final tiebreak (solrTestLib_v2.js:83-96); we append
    # doc_id asc for total determinism.
    if q.sort:
        base, spec = sorted_matches(index, documents, q)
        cols = [F.col(c).asc() if d == "asc" else F.col(c).desc() for c, d in spec]
        fl = q.fl or [c for c in base.columns]
        return paginate(base, cols, q.start, q.k).select(*fl)

    if not q.terms and not q.phrase:
        # pure filter query (existence etc.): deterministic doc_id order
        base = _not(filter_documents(documents, q.filters, q.exists))
        fl = q.fl or base.columns
        return paginate(base, [F.col("doc_id").asc()], q.start, q.k).select(*fl)

    return bm25_topk(index, documents, q)
