"""Raw query-string parser (CGI/parallel.cgi + corpus.cgi syntax) → Query."""

import pytest

from nexlt_spark.query.model import Query
from nexlt_spark.query.parser import QueryParseError, parse_query


def test_bare_terms_default_or():
    q = parse_query("spark join")
    assert q.terms == ["spark", "join"] and q.mode == "or" and not q.not_terms


def test_field_terms_and_mode():
    q = parse_query("text:spark AND text:join")
    assert q.terms == ["spark", "join"] and q.mode == "and"


def test_or_mode_explicit():
    q = parse_query("spark OR join")
    assert q.terms == ["spark", "join"] and q.mode == "or"


def test_not_and_minus():
    q = parse_query("spark NOT join -merge")
    assert q.terms == ["spark"]
    assert q.not_terms == ["join", "merge"]


def test_quoted_phrase_default_and_field():
    assert parse_query('"big table"').phrase == "big table"
    assert parse_query('text:"big table" spark').phrase == "big table"
    assert parse_query('text:"big table" spark').terms == ["spark"]


def test_filter_fields_route_to_slots():
    q = parse_query("error role:user tool:bash conv:c1")
    assert q.filters.roles == ["user"]
    assert q.filters.tools == ["bash"]
    assert q.filters.conv_ids == ["c1"]
    assert q.terms == ["error"]


def test_same_field_disjunction():
    # the ajax-solr product:("A" OR "B") shape, solrTestLib_v2.js:58-72
    q = parse_query('data role:(user OR assistant)')
    assert q.filters.roles == ["user", "assistant"]


def test_unknown_filter_field_goes_generic():
    q = parse_query("value AND lang:en")
    assert q.terms == ["value"] and q.mode == "or"  # AND joins a filter, not a scored clause
    assert q.filters.fields == {"lang": ["en"]}


def test_ts_range_and_open_ends():
    q = parse_query("table ts:[2026-01-05 TO 2026-03-01]")
    assert q.filters.ts_from == "2026-01-05T00:00:00.000000"
    assert q.filters.ts_to == "2026-03-01T00:00:00.000000"
    q2 = parse_query("table ts:[2026-01-05 TO *]")
    assert q2.filters.ts_from == "2026-01-05T00:00:00.000000" and q2.filters.ts_to is None


def test_repeated_ts_ranges_intersect():
    # two clauses intersect (never overwrite), with mixed-precision bounds
    # normalized so max/min is chronological, not lexicographic
    q = parse_query("table ts:[2026-1-2 TO 2026-03-01] ts:[2026-01-05T06:00:00 TO *]")
    assert q.filters.ts_from == "2026-01-05T06:00:00.000000"
    assert q.filters.ts_to == "2026-03-01T00:00:00.000000"
    # a half-open clause must not clear the other bound
    q2 = parse_query("table ts:[2026-01-05 TO 2026-03-01] ts:[* TO 2026-02-01]")
    assert q2.filters.ts_from == "2026-01-05T00:00:00.000000"
    assert q2.filters.ts_to == "2026-02-01T00:00:00.000000"


def test_ts_offsets_and_long_fractions_normalize_to_utc():
    """Offset forms Spark's to_timestamp accepts must parse (regression:
    normalize_ts rejected them), converted to UTC per the pinned
    spark.sql.session.timeZone=UTC; 7+ fractional digits truncate to
    microseconds like TimestampType does."""
    q = parse_query("table ts:[2024-01-01T00:00:00+02:00 TO *]")
    assert q.filters.ts_from == "2023-12-31T22:00:00.000000"
    q2 = parse_query("table ts:[* TO 2024-01-01T00:00:00-05:00]")
    assert q2.filters.ts_to == "2024-01-01T05:00:00.000000"
    q3 = parse_query("table ts:[2024-01-01T12:30:45.1234567890Z TO *]")
    assert q3.filters.ts_from == "2024-01-01T12:30:45.123456"


def test_bad_timestamp_raises():
    import pytest

    from nexlt_spark.query.parser import QueryParseError

    with pytest.raises(QueryParseError):
        parse_query("table ts:[2026-13-40 TO *]")
    with pytest.raises(QueryParseError):
        parse_query("table ts:[yesterday TO *]")


def test_existence_and_matchall():
    assert parse_query("text:[* TO *]").exists is True
    q = parse_query("*:*")
    assert q.terms == [] and not q.exists and q.filters.is_empty()


def test_mixed_and_or_raises():
    with pytest.raises(QueryParseError, match="mixed"):
        parse_query("a AND b OR c")


def test_max_boolean_clauses_cap():
    raw = " OR ".join(f"t{i}" for i in range(30))
    with pytest.raises(QueryParseError, match="boolean clauses"):
        parse_query(raw, max_clauses=10)
    assert parse_query(raw, max_clauses=30).mode == "or"


def test_syntax_errors():
    for bad in ["role:", "AND spark", "spark AND", 'role:(user OR', "ts:[2024]"]:
        with pytest.raises(QueryParseError):
            parse_query(bad)


def test_parsed_query_runs_end_to_end(pos_index, documents, oracle):
    """Raw string → Query → engine == the same Query built by hand."""
    from nexlt_spark.query.exact import bm25_topk

    raw = parse_query('run AND file NOT error role:(user OR assistant)')
    byhand = Query(
        terms=["run", "file"], mode="and", not_terms=["error"], k=10,
        filters=raw.filters,
    )
    got = [r["doc_id"] for r in bm25_topk(pos_index, documents, raw).collect()]
    want = [r["doc_id"] for r in bm25_topk(pos_index, documents, byhand).collect()]
    assert got == want and got == [d for d, _ in oracle.topk(byhand)]


def test_generic_field_filter_applies(spark):
    from nexlt_spark.index.build import build_index
    from nexlt_spark.query.exact import run_query

    docs = spark.createDataFrame(
        [(0, "alpha beta", "en"), (1, "alpha beta", "fr"), (2, "alpha", "en")],
        "doc_id long, text string, lang string",
    )
    idx = build_index(docs)
    q = parse_query("alpha AND lang:en", count_only=True)
    assert run_query(idx, docs, q).collect()[0]["num_found"] == 2


# ------------------------------------------------------------------ fuzz

def test_parser_never_crashes_on_noise():
    """Any input must either parse into a Query or raise QueryParseError —
    the handler surface (select.py) turns the latter into a 400, so no
    other exception type may escape (hypothesis-style seeded fuzz)."""
    import random

    from nexlt_spark.query.model import Query
    from nexlt_spark.query.parser import QueryParseError, parse_query

    rng = random.Random(20260818)
    alphabet = list('ab :"()[]*-^~AND OR NOT role:ts TO 0123456789.')
    for _ in range(3000):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 24)))
        try:
            q = parse_query(s)
        except QueryParseError:
            continue
        assert isinstance(q, Query)


def test_parser_roundtrip_fuzz():
    """Semantic fuzz: build a random intended Query, render it to the raw
    syntax, parse it back, and assert every slot survives — terms and
    their order, mode, NOT clauses, phrase+slop, boosts, role/tool/conv
    filters, generic fields, and normalized ts bounds. Complements the
    noise fuzz above (which only asserts no crash)."""
    import random

    from nexlt_spark.query.parser import parse_query

    words = ["spark", "join", "merge", "tables", "scan", "filter",
             "shuffle", "codec", "batch", "plan"]
    rng = random.Random(20260820)
    for _ in range(500):
        pool = rng.sample(words, 7)
        terms = pool[:rng.randrange(1, 4)]
        rest = pool[len(terms):]
        mode = rng.choice(["and", "or"]) if len(terms) > 1 else "or"
        not_terms = rest[:rng.randrange(0, 3)]
        boost_term = rng.choice(terms) if rng.random() < 0.4 else None
        boost = round(rng.uniform(1.5, 8.0), 1)
        phrase = "big data" if rng.random() < 0.4 else None
        slop = rng.randrange(1, 4) if phrase and rng.random() < 0.5 else 0
        roles = rng.sample(["user", "assistant", "system"], rng.randrange(0, 3))
        tool = rng.choice(["bash", "python"]) if rng.random() < 0.3 else None
        lang = rng.choice(["en", "de"]) if rng.random() < 0.3 else None
        ts = rng.random() < 0.3

        sep = " AND " if mode == "and" else rng.choice([" OR ", " "])
        scored = sep.join(
            (f"{t}^{boost}" if t == boost_term else t) for t in terms
        )
        parts = [scored]
        for t in not_terms:
            parts.append(rng.choice([f"NOT {t}", f"-{t}"]))
        if phrase:
            parts.append(f'"{phrase}"~{slop}' if slop else f'"{phrase}"')
        if len(roles) == 1:
            parts.append(f"role:{roles[0]}")
        elif len(roles) == 2:
            parts.append(f"role:({roles[0]} OR {roles[1]})")
        if tool:
            parts.append(f"tool:{tool}")
        if lang:
            parts.append(f"lang:{lang}")
        if ts:
            parts.append("ts:[2026-01-05 TO 2026-03-01]")
        tail = parts[1:]
        rng.shuffle(tail)  # clause order must not matter
        raw = " ".join([parts[0]] + tail)

        q = parse_query(raw)
        assert q.terms == terms, raw
        assert q.mode == mode, raw
        assert sorted(q.not_terms or []) == sorted(not_terms), raw
        assert q.phrase == phrase, raw
        assert q.phrase_slop == slop, raw
        if boost_term:
            assert q.boosts == {boost_term: boost}, raw
        else:
            assert q.boosts is None, raw
        assert (q.filters.roles or []) == (roles or None or []), raw
        assert (q.filters.tools or []) == ([tool] if tool else []), raw
        if lang:
            assert q.filters.fields == {"lang": [lang]}, raw
        if ts:
            assert q.filters.ts_from == "2026-01-05T00:00:00.000000", raw
            assert q.filters.ts_to == "2026-03-01T00:00:00.000000", raw
