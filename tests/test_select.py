"""/select facade: raw request strings → same plans as the structured API.

select() may only ever re-express run_query/facets/highlight — every test
pins facade output to the equivalent structured call, plus the Solr
semantics the module docstring promises (non-scoring fq, q∧fq facet
domain, contradictory fq matches nothing).
"""

import pytest
from pyspark.sql import functions as F

from nexlt_spark.query.exact import filter_documents, run_query
from nexlt_spark.query.model import Query, QueryFilters
from nexlt_spark.query.parser import QueryParseError
from nexlt_spark.query.select import matching_docs, parse_request, select


def rows(df, *cols):
    return [tuple(r[c] for c in cols) for r in df.collect()]


def test_page_matches_structured_query(index, documents):
    got = select(index, documents, q="error", fq=["role:user"], rows=10).docs
    want = run_query(
        index, documents, Query(terms=["error"], filters=QueryFilters(roles=["user"]), k=10)
    )
    assert rows(got, "doc_id", "score") == rows(want, "doc_id", "score")


def test_fq_phrase_is_nonscoring_filter(pos_index, documents):
    got = select(pos_index, documents, q="error", fq=['"the run"'], rows=10).docs
    want = run_query(pos_index, documents, Query(terms=["error"], phrase="the run", k=10))
    assert rows(got, "doc_id", "score") == rows(want, "doc_id", "score")


def test_fq_scored_term_raises(index, documents):
    with pytest.raises(QueryParseError, match="non-scoring"):
        select(index, documents, q="error", fq=["somebareterm"])


def test_and_or_and_not_via_raw_q(index, documents):
    got = select(index, documents, q="run AND file -error", rows=10).docs
    want = run_query(
        index, documents,
        Query(terms=["run", "file"], mode="and", not_terms=["error"], k=10),
    )
    assert rows(got, "doc_id", "score") == rows(want, "doc_id", "score")


def test_conjunctive_fq_intersection(index, documents):
    q = parse_request("data", fq=["role:(user OR assistant)", "role:user"])
    assert q.filters.roles == ["user"]


def test_contradictory_fq_matches_nothing(index, documents):
    resp = select(
        index, documents, q="data", fq=["role:user", "role:assistant"],
        compute_num_found=True,
    )
    assert resp.num_found == 0
    assert resp.docs.count() == 0


def test_num_found_counts_matches_not_page(index, documents):
    resp = select(index, documents, q="data", rows=3, compute_num_found=True)
    want = run_query(index, documents, Query(terms=["data"], count_only=True)).collect()[0][
        "num_found"
    ]
    assert resp.num_found == want
    assert resp.docs.count() == min(3, want)


def test_facet_field_counts_over_match_domain(index, documents):
    resp = select(index, documents, q="data", facet_field=["role"])
    matches = matching_docs(index, documents, parse_request("data"))
    want = sorted(
        (r["role"], r["n"])
        for r in matches.groupBy("role").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    got = sorted(rows(resp.facet_fields["role"], "role", "n"))
    assert got == want and sum(n for _, n in got) > 0


def test_facet_query_and_range(index, documents):
    resp = select(
        index, documents, q="*:*",
        facet_query={"user_docs": "role = 'user'", "long": F.length("text") > 200},
        facet_range={"turn_idx": (0.0, 30.0, 10.0)},
    )
    fq = dict(rows(resp.facet_queries, "facet", "n"))
    base = filter_documents(documents, QueryFilters())
    assert fq["user_docs"] == base.where("role = 'user'").count()
    assert fq["long"] == base.where(F.length("text") > 200).count()
    fr = rows(resp.facet_ranges["turn_idx"], "bucket_start", "n")
    assert [b for b, _ in fr] == [0.0, 10.0, 20.0]
    assert sum(n for _, n in fr) == base.where("turn_idx >= 0 and turn_idx < 30").count()


def test_highlight_on_page_only(index, documents):
    resp = select(index, documents, q="error", rows=5, hl=True)
    got = resp.docs.collect()
    assert 0 < len(got) <= 5
    assert any("<em>" in r["snippet"] for r in got)


def test_sort_path(index, documents):
    got = select(index, documents, q="table", sort=[("text_lc", "asc")], rows=20).docs
    want = run_query(index, documents, Query(terms=["table"], sort=[("text_lc", "asc")], k=20))
    assert rows(got, "conv_id", "ts") == rows(want, "conv_id", "ts")


def test_synonyms_expand_under_or(index, documents):
    syn = {"mistake": ["error"]}
    got = select(index, documents, q="mistake", synonyms=syn, rows=10).docs
    want = run_query(index, documents, Query(terms=["error"], k=10))
    assert rows(got, "doc_id", "score") == rows(want, "doc_id", "score")


def test_synonyms_under_and_refused(index, documents):
    with pytest.raises(QueryParseError, match="AND"):
        select(index, documents, q="mistake AND file", synonyms={"mistake": ["error"]})


def test_match_all_with_fq_only(index, documents):
    resp = select(index, documents, q="*:*", fq=["role:user"], rows=7,
                  compute_num_found=True)
    base = filter_documents(documents, QueryFilters(roles=["user"]))
    assert resp.num_found == base.count()
    assert resp.docs.count() == 7
    # pure-filter page is deterministic doc_id order
    assert rows(resp.docs, "doc_id") == rows(
        base.orderBy("doc_id").limit(7).select("doc_id")
    , "doc_id")


# ---------------------------------------------------------------------------
# select_rows: the handler-level caches wired into the facade
# ---------------------------------------------------------------------------


def test_select_rows_matches_lazy_select(documents):
    from nexlt_spark.index.build import build_index
    from nexlt_spark.query.select import select_rows

    idx = build_index(documents).persist()  # fresh searcher: cold caches
    got = select_rows(idx, documents, q="error", rows=5)
    want = [r.asDict() for r in select(idx, documents, q="error", rows=5).docs.collect()]
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (r["doc_id"], round(r["score"], 9)) for r in want
    ]
    # every stored column the lazy page carries is present
    assert set(want[0]) <= set(got[0])


def test_select_rows_repeat_page_runs_zero_jobs(documents):
    from nexlt_spark.index.build import build_index
    from nexlt_spark.query.select import select_rows

    idx = build_index(documents).persist()
    spark = documents.sparkSession
    sc = spark.sparkContext
    first = select_rows(idx, documents, q="error AND data", rows=5)
    assert first
    # repeat the identical page under a job group: Solr repeat-page
    # behavior = queryResultCache window + documentCache rows, no index
    # read — here, zero Spark jobs in the group
    sc.setJobGroup("nexlt-cache-hit", "repeat page must not run jobs")
    try:
        again = select_rows(idx, documents, q="error AND data", rows=5)
        job_ids = sc.statusTracker().getJobIdsForGroup("nexlt-cache-hit")
    finally:
        sc.setJobGroup("", "")
    assert again == first
    assert list(job_ids) == []


def test_select_rows_next_page_inside_window(documents):
    """rows 0-4 over-fetches the rank window to 20 rows; page 2
    (start=5) serves its RANK slice from cache — the only job it may run
    is the stored-field point fetch for the 5 unseen docs (Solr's
    documentCache contract exactly: rank from queryResultCache, stored
    fields read once per doc). A page-2 REPEAT then runs zero jobs."""
    from nexlt_spark.index.build import build_index
    from nexlt_spark.query.select import select_rows

    idx = build_index(documents).persist()
    sc = documents.sparkSession.sparkContext
    page1 = select_rows(idx, documents, q="data", rows=5)
    sc.setJobGroup("nexlt-window-hit", "page 2: at most the point fetch")
    try:
        page2 = select_rows(idx, documents, q="data", start=5, rows=5)
        job_ids = sc.statusTracker().getJobIdsForGroup("nexlt-window-hit")
    finally:
        sc.setJobGroup("", "")
    assert len(list(job_ids)) <= 1  # no rank job — only the doc fetch
    assert page1 and page2
    assert not {r["doc_id"] for r in page1} & {r["doc_id"] for r in page2}
    # rank continuity across the page boundary
    assert page1[-1]["score"] >= page2[0]["score"]
    sc.setJobGroup("nexlt-window-repeat", "page 2 repeat must run no jobs")
    try:
        again = select_rows(idx, documents, q="data", start=5, rows=5)
        repeat_ids = sc.statusTracker().getJobIdsForGroup("nexlt-window-repeat")
    finally:
        sc.setJobGroup("", "")
    assert again == page2
    assert list(repeat_ids) == []


def test_select_accepts_sharded_index(documents, tmp_path):
    """The facade serves a distributed-shards index (solrconfig.xml:
    837-838) — same rows as the single-store facade, caches included."""
    from nexlt_spark.index.blocks import load_blocked_index
    from nexlt_spark.index.packed import build_blocked_direct, save_blocked
    from nexlt_spark.index.sharded import combine_shards
    from nexlt_spark.query.select import select_rows

    spark = documents.sparkSession
    paths = []
    for i in range(2):
        p = str(tmp_path / f"shard{i}")
        save_blocked(
            build_blocked_direct(documents.where(F.pmod(F.col("doc_id"), F.lit(2)) == i)),
            p,
        )
        paths.append(p)
    shidx = combine_shards([load_blocked_index(spark, p) for p in paths])
    single = build_blocked_direct(documents)
    got = select_rows(shidx, documents, q="error OR data", rows=8)
    want = select_rows(single, documents, q="error OR data", rows=8)
    assert [(r["doc_id"], round(r["score"], 9)) for r in got] == [
        (r["doc_id"], round(r["score"], 9)) for r in want
    ]
    # repeat page on the sharded handler also serves cache-side
    sc = spark.sparkContext
    sc.setJobGroup("nexlt-sharded-hit", "")
    try:
        again = select_rows(shidx, documents, q="error OR data", rows=8)
        job_ids = sc.statusTracker().getJobIdsForGroup("nexlt-sharded-hit")
    finally:
        sc.setJobGroup("", "")
    assert again == got
    assert list(job_ids) == []


# ---- select_url: the raw URL-query-string form the reference's clients emit ----


def test_url_page_matches_structured_select(index, documents):
    from nexlt_spark.query.select import select_url

    got = select_url(index, documents, "q=error&fq=role:user&rows=10").docs
    want = select(index, documents, q="error", fq=["role:user"], rows=10).docs
    assert rows(got, "doc_id", "score") == rows(want, "doc_id", "score")


def test_url_decoding_and_full_url_accepted(index, documents):
    """+ is space, %XX decodes, and a full handler URL is stripped to its
    query string — the CGI clients send exactly these shapes."""
    from nexlt_spark.query.select import select_url

    got = select_url(
        index, documents,
        "http://host:8983/solr/select?q=error+data&fq=role%3Auser&rows=5",
    ).docs
    want = select(index, documents, q="error data", fq=["role:user"], rows=5).docs
    assert rows(got, "doc_id", "score") == rows(want, "doc_id", "score")


def test_url_facets_require_facet_true(index, documents):
    from nexlt_spark.query.select import select_url

    off = select_url(index, documents, "q=error&facet.field=role")
    assert off.facet_fields == {}
    on = select_url(index, documents, "q=error&facet=true&facet.field=role")
    assert "role" in on.facet_fields
    want = select(index, documents, q="error", facet_field=["role"]).facet_fields["role"]
    assert sorted(rows(on.facet_fields["role"], "role", "n")) == sorted(rows(want, "role", "n"))


def test_url_facet_range_and_query(index, documents):
    from nexlt_spark.query.select import select_url

    r = select_url(
        index, documents,
        "q=*:*&facet=true&facet.range=turn_idx"
        "&facet.range.start=0&facet.range.end=40&facet.range.gap=10"
        "&facet.query=role:user&facet.query=role:assistant",
    )
    want = select(
        index, documents, q="*:*",
        facet_range={"turn_idx": (0.0, 40.0, 10.0)},
        facet_query={
            "role:user": F.col("role").isin(["user"]),
            "role:assistant": F.col("role").isin(["assistant"]),
        },
    )
    assert rows(r.facet_ranges["turn_idx"], "bucket_start", "n") == rows(
        want.facet_ranges["turn_idx"], "bucket_start", "n"
    )
    assert sorted(rows(r.facet_queries, "facet", "n")) == sorted(
        rows(want.facet_queries, "facet", "n")
    )


def test_url_sort_fl_and_paging(index, documents):
    from nexlt_spark.query.select import select_url

    got = select_url(
        index, documents, "q=error&sort=ts desc,doc_id asc&start=5&rows=5&fl=conv_id,ts"
    ).docs
    want = select(
        index, documents, q="error", sort=[("ts", "desc"), ("doc_id", "asc")],
        start=5, rows=5, fl=["conv_id", "ts"],
    ).docs
    assert got.columns == want.columns
    assert rows(got, "conv_id", "ts") == rows(want, "conv_id", "ts")


def test_url_unsupported_components_raise(index, documents):
    from nexlt_spark.query.select import select_url

    for bad in (
        "q=error&group=true&group.field=lang",
        "q=error&mlt=true",
        "q=error&spellcheck=true",
        "q=error&q.op=AND",
        "q=error&sort=ts sideways",
        "q=error&facet=true&facet.query=bareterm",
        "q=error&facet=true&facet.range=turn_idx",  # missing start/end/gap
    ):
        with pytest.raises(QueryParseError):
            select_url(index, documents, bad)


def test_url_response_encoding_params_ignored(index, documents):
    from nexlt_spark.query.select import select_url

    got = select_url(index, documents, "q=error&wt=json&indent=true&rows=3").docs
    want = select(index, documents, q="error", rows=3).docs
    assert rows(got, "doc_id", "score") == rows(want, "doc_id", "score")


def test_url_param_soup_never_crashes_untyped(index, documents):
    """Random /select param soup must either produce a SelectResponse or
    raise QueryParseError/ValueError (the 400s) — no other exception type
    may escape the facade. Query execution is NOT triggered (responses
    stay lazy), so this fuzzes the parse/dispatch layer."""
    import random

    from nexlt_spark.query.select import SelectResponse, select_url

    rng = random.Random(20260819)
    keys = ["q", "fq", "rows", "start", "sort", "fl", "facet", "facet.field",
            "facet.range", "facet.range.start", "facet.range.end",
            "facet.range.gap", "facet.date", "facet.date.start", "facet.date.end",
            "facet.date.gap", "facet.limit", "facet.sort", "facet.prefix",
            "hl", "hl.fragsize", "wt", "df", "zzz"]
    vals = ["error", "role:user", "*:*", "true", "false", "5", "-1", "ts desc",
            "ts", "turn_idx", "role", "0", "100", "10", "+1DAY", "2026-01-01",
            '"a b"', "a AND b", "[1 TO 2]", "", "%2B", "count", "x,y"]
    for _ in range(300):
        n = rng.randrange(0, 7)
        req = "&".join(
            f"{rng.choice(keys)}={rng.choice(vals)}" for _ in range(n)
        )
        try:
            r = select_url(index, documents, req)
        except (ValueError,):  # QueryParseError is a ValueError
            continue
        assert isinstance(r, SelectResponse)


def test_unknown_fl_ignored_unknown_sort_raises(index, documents):
    """Solr semantics at the handler: unknown fl names are skipped by the
    response writer (fl=10 must not become an AnalysisException); unknown
    sort fields are a 400 ('can not sort on undefined field')."""
    from nexlt_spark.query.select import select_url

    got = select_url(index, documents, "q=error&fl=10,conv_id&rows=3").docs
    assert "conv_id" in got.columns and "10" not in got.columns
    got.collect()  # executes cleanly
    # an fl with no known fields falls back to all stored fields
    allf = select_url(index, documents, "q=error&fl=bogus&rows=3").docs
    assert "text" in allf.columns
    with pytest.raises(QueryParseError, match="undefined field"):
        select_url(index, documents, "q=error&sort=bogus desc")


def test_url_unknown_param_raises(index, documents):
    """An unknown /select param must be a 400, not a silent no-op: a
    typo'd or unported param (qf, boost, defTyp) could be one that
    changes results on a real Solr."""
    from nexlt_spark.query.select import select_url

    for bad in ("q=error&qf=text^2", "q=error&boost=score", "q=error&defTyp=lucene"):
        with pytest.raises(QueryParseError, match="unknown /select param"):
            select_url(index, documents, bad)


def test_url_facet_query_not_clause_refused(index, documents):
    """facet.query with a NOT clause needs posting-set subtraction, not a
    per-doc Column — dropping it silently would inflate the count, so the
    facade must refuse."""
    from nexlt_spark.query.select import select_url

    with pytest.raises(QueryParseError, match="filter-shaped"):
        select_url(
            index, documents,
            "q=*:*&facet=true&facet.query=role:user%20-error",
        )


def test_count_only_respects_phrase(pos_index, documents):
    """numFound for a phrase query must count phrase MATCHES, not the
    unphrased filter set (regression: the count_only branch ignored
    q.phrase and returned the corpus count)."""
    from nexlt_spark.analysis import tokenize
    from nexlt_spark.query.exact import phrase_docs

    toks = tokenize("the run", "standard")
    want = phrase_docs(pos_index, documents, toks).count()
    got = run_query(
        pos_index, documents, Query(phrase="the run", count_only=True)
    ).collect()[0]["num_found"]
    n_all = documents.count()
    assert got == want
    assert 0 < got < n_all  # meaningful: some docs match, not all


def test_num_found_respects_phrase_slop(pos_index, documents):
    """num_found / facet domains must use the same slop window as the
    page (regression: matching_docs dropped phrase_slop, so a sloppy
    page could report num_found < len(docs))."""
    r = select(
        pos_index, documents, q='"the run"~2', rows=1000,
        compute_num_found=True,
    )
    assert r.num_found == r.docs.count()
    tight = select(
        pos_index, documents, q='"the run"', rows=1000, compute_num_found=True
    )
    assert r.num_found >= tight.num_found > 0


def test_highlight_independent_of_fl(pos_index, documents):
    """Solr highlights regardless of fl (regression: fl excluding text
    crashed highlight with an unresolved-column error)."""
    r = select(pos_index, documents, q="error", fl=["role"], hl=True, rows=5)
    rows_ = r.docs.collect()
    assert rows_ and "snippet" in rows_[0].asDict()
    assert "text" not in rows_[0].asDict()


def test_sort_score_desc_is_relevance(index, documents):
    from nexlt_spark.query.select import select_url

    got = select_url(index, documents, "q=error&sort=score desc&rows=5").docs
    want = select(index, documents, q="error", rows=5).docs
    assert rows(got, "doc_id") == rows(want, "doc_id")
    with pytest.raises(QueryParseError, match="score"):
        select_url(index, documents, "q=error&sort=score asc")


def test_bad_numeric_params_are_400s(index, documents):
    from nexlt_spark.query.select import select_url

    for url in (
        "q=error&rows=ten",
        "q=error&start=x",
        "q=error&hl=true&hl.fragsize=big",
        "q=error&facet=true&facet.range=n_chars&facet.range.start=low"
        "&facet.range.end=9&facet.range.gap=3",
    ):
        with pytest.raises(QueryParseError):
            select_url(index, documents, url)
