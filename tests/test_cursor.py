"""cursorMark keyset paging: full-walk equivalence to the global sort
(no dup, no miss, any depth), Solr termination contract, null sort
values under Spark's default null placement, plan shape (filter +
TakeOrderedAndProject — no Window, no offset skip), and mark hygiene.
"""

import pytest
from pyspark.sql import functions as F

from nexlt_spark.query.cursor import (
    CursorError,
    after_cursor_col,
    cursor_page,
    decode_cursor,
    encode_cursor,
)
from nexlt_spark.query.exact import ranked_scores
from nexlt_spark.query.model import Query
from nexlt_spark.query.parser import QueryParseError
from nexlt_spark.query.select import select_cursor, select_url


def walk(index, documents, page_rows=7, **kw):
    """Drive the Solr client loop: page until next == sent."""
    mark = "*"
    out, pages = [], 0
    while True:
        rows, nxt = select_cursor(index, documents, rows=page_rows, cursor_mark=mark, **kw)
        out.extend(rows)
        pages += 1
        assert pages < 500, "cursor walk did not terminate"
        if nxt == mark:
            assert rows == []  # the terminal request is empty
            return out
        mark = nxt


# --------------------------------------------------------------------------
# predicate unit semantics: for EVERY cursor position, the filter yields
# exactly the suffix of Spark's own orderBy — including null cells on
# both asc (nulls first) and desc (nulls last) columns
# --------------------------------------------------------------------------

def test_after_cursor_equals_orderby_suffix_with_nulls(spark):
    rows = [
        (i, a, b)
        for i, (a, b) in enumerate(
            [(None, "x"), (None, None), (1, "k"), (1, None), (1, "k"),
             (2, "a"), (2, "z"), (None, "x"), (3, None), (1, "a")]
        )
    ]
    df = spark.createDataFrame(rows, "id long, a int, b string")
    spec = [("a", "asc"), ("b", "desc"), ("id", "asc")]
    ordered = df.orderBy(F.col("a").asc(), F.col("b").desc(), F.col("id").asc()).collect()
    for i, cur in enumerate(ordered):
        vals = [cur[c] for c, _ in spec]
        got = sorted(
            r["id"] for r in df.where(after_cursor_col(df, spec, vals)).collect()
        )
        want = sorted(r["id"] for r in ordered[i + 1:])
        assert got == want, f"cursor at sorted position {i} ({vals})"


def test_mark_roundtrip_and_malformed():
    vals = [3.14159, None, "txt", 7]
    assert decode_cursor(encode_cursor(vals)) == vals
    assert decode_cursor("*") is None
    with pytest.raises(CursorError):
        decode_cursor("not-base64!!")
    with pytest.raises(CursorError):
        encode_cursor([object()])


def test_mark_spec_stamp_rejects_foreign_sort():
    # a mark minted under one sort, replayed against a same-arity but
    # different sort, must raise — not cast to NULL literals and report
    # a false end-of-results
    spec_a = [("ts", "asc"), ("doc_id", "asc")]
    spec_b = [("doc_id", "asc"), ("ts", "asc")]
    mark = encode_cursor([7, 42], sort_spec=spec_a)
    assert decode_cursor(mark, expect_spec=spec_a) == [7, 42]
    with pytest.raises(CursorError):
        decode_cursor(mark, expect_spec=spec_b)
    # unstamped marks (no sort_spec at mint time) stay permissive
    assert decode_cursor(encode_cursor([7, 42]), expect_spec=spec_b) == [7, 42]


def test_mark_timestamp_roundtrips_as_exact_micros():
    import base64 as _b64
    import datetime as _dt
    import json as _json

    ts = _dt.datetime(2026, 3, 29, 1, 30, 0, 123456)  # DST-adjacent instant
    payload = _json.loads(_b64.urlsafe_b64decode(encode_cursor([ts]).encode()))
    tag, v = payload["v"][0]
    assert tag == "tsu" and isinstance(v, int)  # exact integer micros, not ISO text


# --------------------------------------------------------------------------
# facade walks
# --------------------------------------------------------------------------

def test_sorted_walk_is_the_global_order(index, documents):
    got = walk(index, documents, q="*:*", sort=[("ts", "asc")], page_rows=11)
    want = (
        documents.withColumn("text_lc", F.lower("text"))
        .orderBy(F.col("ts").asc(), F.col("text_lc").asc(), F.col("doc_id").asc())
        .collect()
    )
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    assert len(set(r["doc_id"] for r in got)) == len(got)  # no dup anywhere


def test_sorted_desc_walk(index, documents):
    got = walk(index, documents, q="*:*", sort=[("ts", "desc")], page_rows=13)
    want = (
        documents.withColumn("text_lc", F.lower("text"))
        .orderBy(F.col("ts").desc(), F.col("text_lc").asc(), F.col("doc_id").asc())
        .collect()
    )
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]


def test_relevance_walk_is_the_full_ranking(index, documents):
    got = walk(index, documents, q="error", page_rows=5)
    want = (
        ranked_scores(index, documents, Query(terms=["error"]))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .collect()
    )
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    assert [r["score"] for r in got] == pytest.approx([r["score"] for r in want])
    # page rows carry the stored fields, like any /select page
    assert "text" in got[0] and "role" in got[0]


def test_fq_respected_and_matchall_pages_by_doc_id(index, documents):
    got = walk(index, documents, q="*:*", fq=["role:user"], page_rows=17)
    want = documents.where(F.col("role") == "user").orderBy("doc_id").collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]


def test_empty_result_first_page_terminates(index, documents):
    rows, nxt = select_cursor(index, documents, q="zzzqqqabsent", rows=5)
    assert rows == [] and nxt == "*"


def test_cursor_from_other_sort_rejected(index, documents):
    mark = encode_cursor(["only-one-value"])
    with pytest.raises((CursorError, QueryParseError)):
        select_cursor(
            index, documents, q="*:*", sort=[("ts", "asc")], cursor_mark=mark
        )


def test_select_url_routes_cursor_elsewhere(index, documents):
    with pytest.raises(QueryParseError, match="select_cursor"):
        select_url(index, documents, "q=error&cursorMark=*")


# --------------------------------------------------------------------------
# plan shape: a deep page is one filter + TakeOrderedAndProject — no
# Window, no row_number skip, no global sort of the full match set
# --------------------------------------------------------------------------

def test_cursor_page_plan_is_take_ordered(spark):
    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("ts")
    )
    spec = [("ts", "asc"), ("doc_id", "asc")]
    deep_mark = encode_cursor([50, 9_000])
    plan = (
        cursor_page(df, spec, deep_mark, 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan
