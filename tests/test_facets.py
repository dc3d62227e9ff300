"""Faceting (A7): facet.field / facet.query / facet.range semantics."""

import pytest
from pyspark.sql import functions as F

from nexlt_spark.query.facets import (
    facet_field_counts,
    facet_query_counts,
    facet_range_counts,
)


def test_facet_field_counts(documents):
    got = {r["role"]: r["n"] for r in facet_field_counts(documents, "role").collect()}
    want = {
        r["role"]: r["cnt"]
        for r in documents.groupBy("role").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want and sum(got.values()) == documents.count()


def test_facet_query_counts_one_scan(documents):
    preds = {
        "users": F.col("role") == "user",
        "long": F.length("text") > 200,
        "none": F.col("role") == "no-such-role",
    }
    got = {r["facet"]: r["n"] for r in facet_query_counts(documents, preds).collect()}
    assert got["users"] == documents.where(F.col("role") == "user").count()
    assert got["long"] == documents.where(F.length("text") > 200).count()
    assert got["none"] == 0
    # one scan for all predicates: a single aggregate, no join/union
    plan = facet_query_counts(documents, preds)._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan and "Join" not in plan


def test_facet_range_counts_with_empty_buckets(spark):
    rows = [(i, float(v)) for i, v in enumerate([1, 5, 5, 27, 95, 95, 95, 150])]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {r["bucket_start"]: r["n"] for r in facet_range_counts(df, "v", 0, 100, 10).collect()}
    # 10 buckets, all reported; out-of-range value 150 excluded
    assert len(got) == 10
    assert got[0.0] == 3 and got[20.0] == 1 and got[90.0] == 3
    assert got[10.0] == 0 and got[50.0] == 0
    assert sum(got.values()) == 7


def test_facet_range_boundary_semantics(spark):
    # start inclusive, end exclusive, bucket edges belong to the right bucket
    df = spark.createDataFrame([(0, 0.0), (1, 10.0), (2, 99.999), (3, 100.0)], "id long, v double")
    got = {r["bucket_start"]: r["n"] for r in facet_range_counts(df, "v", 0, 100, 10).collect()}
    assert got[0.0] == 1 and got[10.0] == 1 and got[90.0] == 1
    assert sum(got.values()) == 3  # v=100.0 excluded


def test_facet_refinements(spark):
    """SimpleFacetParameters (AbstractFacetWidget.js:43-54): prefix,
    mincount, limit/offset paging, sort=count|index, missing."""
    rows = [("apple",), ("apple",), ("apricot",), ("banana",), ("banana",),
            ("banana",), ("cherry",), (None,)]
    df = spark.createDataFrame(rows, "fruit string")

    # prefix filters before counting; nulls excluded from value rows
    got = {r["fruit"]: r["n"] for r in facet_field_counts(df, "fruit", prefix="ap").collect()}
    assert got == {"apple": 2, "apricot": 1}

    # sort=count desc with value tiebreak; limit+offset page the list
    ordered = [r["fruit"] for r in facet_field_counts(df, "fruit", sort="count").collect()]
    assert ordered == ["banana", "apple", "apricot", "cherry"]
    page = [r["fruit"] for r in facet_field_counts(df, "fruit", sort="count", limit=2, offset=1).collect()]
    assert page == ["apple", "apricot"]

    # mincount prunes; sort=index is lexicographic
    got = [r["fruit"] for r in facet_field_counts(df, "fruit", mincount=2, sort="index").collect()]
    assert got == ["apple", "banana"]

    # missing appends the null-count row
    rows_all = facet_field_counts(df, "fruit", missing=True).collect()
    assert {r["fruit"]: r["n"] for r in rows_all}[None] == 1

    import pytest as _pt
    with _pt.raises(ValueError):
        facet_field_counts(df, "fruit", sort="sideways")


def test_facet_refinements_via_url(index, documents):
    """select_url threads global facet.<p> and per-field f.<fld>.facet.<p>
    (Solr precedence: per-field wins)."""
    from nexlt_spark.query.select import select, select_url

    r = select_url(
        index, documents,
        "q=*:*&facet=true&facet.field=role&facet.limit=1&f.role.facet.sort=count",
    )
    want = select(
        index, documents, q="*:*", facet_field=["role"],
        facet_params={"role": {"limit": 1, "sort": "count"}},
    )
    assert [tuple(x) for x in r.facet_fields["role"].collect()] == [
        tuple(x) for x in want.facet_fields["role"].collect()
    ]
    assert r.facet_fields["role"].count() == 1


def test_facet_date_counts(spark):
    """facet.date: timestamp histogram with Solr date-math gaps; empty
    buckets 0; [start, end) boundaries; Z-suffixed bounds accepted."""
    from nexlt_spark.query.facets import facet_date_counts, parse_date_gap

    rows = [("2026-01-01 00:30:00",), ("2026-01-01 05:59:59",),
            ("2026-01-01 06:00:00",), ("2026-01-02 10:00:00",),
            ("2026-01-04 00:00:00",)]  # the last is == end → excluded
    df = spark.createDataFrame(rows, "t string").select(
        F.to_timestamp("t").alias("ts")
    )
    got = {
        str(r["bucket_start"]): r["n"]
        for r in facet_date_counts(
            df, "ts", "2026-01-01T00:00:00Z", "2026-01-04T00:00:00Z", "+6HOURS"
        ).collect()
    }
    assert len(got) == 12  # 3 days / 6h, empties included
    assert got["2026-01-01 00:00:00"] == 2
    assert got["2026-01-01 06:00:00"] == 1
    assert got["2026-01-02 06:00:00"] == 1
    assert sum(got.values()) == 4

    assert parse_date_gap("+1DAY") == 86400
    assert parse_date_gap("+2WEEKS") == 14 * 86400
    import pytest as _pt
    for bad in ("+1MONTH", "1DAY", "+0.5DAY", "sideways"):
        with _pt.raises(ValueError):
            parse_date_gap(bad)


def test_facet_date_via_url(index, documents):
    from nexlt_spark.query.select import select_url

    lo, hi = documents.agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd'T'00:00:00").alias("lo"),
        F.date_format(F.date_add(F.max("ts"), 1), "yyyy-MM-dd'T'00:00:00").alias("hi"),
    ).collect()[0]
    r = select_url(
        index, documents,
        f"q=*:*&facet=true&facet.date=ts&facet.date.start={lo}"
        f"&facet.date.end={hi}&facet.date.gap=%2B1DAY",
    )
    hist = r.facet_dates["ts"].collect()
    assert sum(x["n"] for x in hist) == documents.count()
    assert all(x["n"] >= 0 for x in hist)


def test_facet_date_bounds_parse_driver_side(spark):
    """facet.date bounds are validated on the driver (no Spark job for
    two literals): garbage raises QueryParseError before any job, and
    mixed-precision ISO spellings of the same instant bucket identically."""
    from datetime import datetime, timedelta

    from nexlt_spark.query.facets import facet_date_counts
    from nexlt_spark.query.parser import QueryParseError

    t0 = datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [(t0 + timedelta(hours=6 * i),) for i in range(8)], "ts timestamp"
    )

    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    with pytest.raises(QueryParseError, match="unparseable"):
        facet_date_counts(df, "ts", "garbage", "2026-01-03", "+1DAY")
    with pytest.raises(ValueError, match="start < end"):
        facet_date_counts(df, "ts", "2026-01-03", "2026-01-01", "+1DAY")
    assert tracker.getJobIdsForGroup(None) == before  # zero jobs to reject

    terse = facet_date_counts(df, "ts", "2026-01-01", "2026-01-03", "+1DAY")
    verbose = facet_date_counts(
        df, "ts", "2026-01-01T00:00:00", "2026-01-03T00:00:00.000", "+1DAY"
    )
    assert sorted(map(tuple, terse.collect())) == sorted(map(tuple, verbose.collect()))


def test_facet_fuzz_matches_python_fold(spark):
    """Property fuzz: random data + random refinement combos for all
    three facet forms must match a plain-Python fold implementing the
    documented Solr semantics (null exclusion, prefix-before-aggregate,
    mincount, count/index sort with value-asc tiebreak, offset/limit
    paging, facet.missing appended last, [start,end) buckets with
    empties)."""
    import random
    from collections import Counter

    rng = random.Random(20260820)
    for trial in range(3):
        n = rng.randrange(60, 140)
        langs = ["en", "de", "fr", "es", None]
        rows = [
            (rng.choice(langs), rng.randrange(0, 200)) for _ in range(n)
        ]
        df = spark.createDataFrame(rows, "lang string, n_chars long")

        # --- facet.field with random refinements -------------------------
        prefix = rng.choice([None, "e", "d", "z"])
        mincount = rng.randrange(0, 4)
        limit = rng.choice([-1, 2, 3])
        offset = rng.choice([0, 1])
        sort = rng.choice([None, "count", "index"])
        missing = rng.random() < 0.5
        got = [
            (r["lang"], r["n"])
            for r in facet_field_counts(
                df, "lang", prefix, mincount, limit, offset, sort, missing
            ).collect()
        ]
        vals = [v for v, _ in rows if v is not None]
        if prefix is not None:
            vals = [v for v in vals if v.startswith(prefix)]
        counts = [(v, c) for v, c in Counter(vals).items() if c >= mincount]
        eff_sort = sort or ("count" if limit >= 0 else "index")
        if eff_sort == "count":
            counts.sort(key=lambda t: (-t[1], t[0]))
        else:
            counts.sort(key=lambda t: t[0])
        counts = counts[offset:]
        if limit >= 0:
            counts = counts[:limit]
        if missing:
            counts.append((None, sum(1 for v, _ in rows if v is None)))
        assert got == counts, (trial, prefix, mincount, limit, offset, sort, missing)

        # --- facet.query -------------------------------------------------
        k = rng.randrange(0, 200)
        lang_pick = rng.choice(["en", "de"])
        preds = {
            "small": F.col("n_chars") < k,
            "lang it's": F.col("lang") == lang_pick,  # quote stays inert
        }
        gotq = {
            r["facet"]: r["n"] for r in facet_query_counts(df, preds).collect()
        }
        assert gotq == {
            "small": sum(1 for _, c in rows if c < k),
            "lang it's": sum(1 for v, _ in rows if v == lang_pick),
        }, trial

        # --- facet.range -------------------------------------------------
        start = rng.randrange(0, 40)
        gap = rng.randrange(5, 40)
        end = start + gap * rng.randrange(1, 6)
        gotr = sorted(
            (r["bucket_start"], r["n"])
            for r in facet_range_counts(df, "n_chars", start, end, gap).collect()
        )
        wantr = []
        for b in range((end - start) // gap):
            lo, hi = start + b * gap, start + (b + 1) * gap
            wantr.append(
                (float(lo), sum(1 for _, c in rows if lo <= c < min(hi, end)))
            )
        assert gotr == wantr, (trial, start, end, gap)


def test_facet_response_all_modes(documents):
    """facet_response = the three modes of one request in one long-form
    frame; each mode's rows must equal the standalone function's."""
    from pyspark.sql import functions as F

    from nexlt_spark.query.facets import facet_response

    preds = {"user_turns": F.col("role") == "user"}
    out = facet_response(
        documents, fields=["role"], predicates=preds, ranges=[("turn_idx", 0, 10, 5)]
    )
    rows = out.collect()
    kinds = {r["kind"] for r in rows}
    assert kinds == {"field:role", "query", "range:turn_idx"}
    field_part = {r["facet"]: r["n"] for r in rows if r["kind"] == "field:role"}
    want_field = {
        r["role"]: r["n"] for r in facet_field_counts(documents, "role").collect()
    }
    assert field_part == {str(k): v for k, v in want_field.items()}
    q_part = {r["facet"]: r["n"] for r in rows if r["kind"] == "query"}
    assert q_part == {
        "user_turns": documents.where(F.col("role") == "user").count()
    }
    r_part = {r["facet"]: r["n"] for r in rows if r["kind"] == "range:turn_idx"}
    want_range = {
        str(int(r["bucket_start"])): r["n"]
        for r in facet_range_counts(documents, "turn_idx", 0, 10, 5).collect()
    }
    assert r_part == want_range
