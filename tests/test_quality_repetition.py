"""Repetition quality signals (Gopher §A1.1 analogs) and C4-style
boilerplate line stripping — verified against independently-computed
driver-side oracles (collections.Counter, not the Spark expressions).
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from nexlt_spark.ops.dedup import boilerplate_lines, strip_boilerplate_lines
from nexlt_spark.ops.textstats import repetition_scores


# --------------------------------------------------------------------------
# oracle — plain Python re-statement of the documented semantics
# --------------------------------------------------------------------------

def _tokens(text):
    import re

    return re.findall(r"[a-z0-9]+", text.lower())


def _grams(toks, n):
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _oracle(text, top_ns=(2, 3), dup_ns=(5,)):
    lines = [ln for ln in text.split("\n") if ln != ""]
    cnt = Counter(lines)
    n_lines = len(lines)
    dup = [ln for ln in lines if cnt[ln] > 1]
    total_chars = sum(len(ln) for ln in lines)
    out = {
        "dup_line_frac": len(dup) / n_lines if n_lines else 0.0,
        "dup_line_char_frac": (
            sum(len(ln) for ln in dup) / total_chars if total_chars else 0.0
        ),
    }
    toks = _tokens(text)
    for n in top_ns:
        g = Counter(_grams(toks, n))
        # the MOST FREQUENT gram's char mass (ties -> larger mass), per
        # the Gopher statistic — not the max mass over all grams
        mass = (
            max((c, c * len(s)) for s, c in g.items())[1] if g else 0
        )
        out[f"top_{n}gram_char_frac"] = min(mass / len(text), 1.0) if text else 0.0
    for n in dup_ns:
        g = Counter(_grams(toks, n))
        mass = sum(c * len(s) for s, c in g.items() if c > 1)
        out[f"dup_{n}gram_char_frac"] = min(mass / len(text), 1.0) if text else 0.0
    return {k: round(v, 6) for k, v in out.items()}


CASES = [
    "a b c d e f g h",
    "spam spam spam spam spam spam",
    "buy now\nbuy now\nunique line\nbuy now",
    "the quick brown fox jumps the quick brown fox jumps",
    "",
    "short",
    "one\n\ntwo\n\none",  # empty lines are ignored by the line signals
    "x y x y x y x y x y x y",  # dominated by one bigram
    # most-frequent-vs-biggest-mass discriminator: "x y" occurs 3x
    # (mass 9) while the rarer "aaaaaaaa bbbbbbbb" occurs 2x (mass 34);
    # the Gopher top-2gram statistic must report the frequent one's mass
    "x y x y x y aaaaaaaa bbbbbbbb c aaaaaaaa bbbbbbbb d",
]


def test_null_text_yields_zeros_not_nulls(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "a b a b a b")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in repetition_scores(df).collect()}
    for c in rows[0].asDict():
        if c != "doc_id":
            assert rows[0][c] == 0.0, c  # zeros, not NULLs
    assert rows[1]["top_2gram_char_frac"] > 0


def test_repetition_matches_oracle(spark):
    df = spark.createDataFrame(
        list(enumerate(CASES)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_scores(df).collect()}
    assert set(got) == set(range(len(CASES)))
    for i, text in enumerate(CASES):
        want = _oracle(text)
        for k, v in want.items():
            assert got[i][k] == pytest.approx(v, abs=1e-6), (i, k, text)


def test_repetition_on_real_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    rows = repetition_scores(docs).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(rows) == len(texts)
    for r in rows:
        want = _oracle(texts[r["doc_id"]])
        for k, v in want.items():
            assert r[k] == pytest.approx(v, abs=1e-6), (r["doc_id"], k)


def test_local_impl_identical_to_shuffle_impl(spark, sf_dir):
    """The map-only sorted-run-scan path (default) and the explode +
    groupBy reference path must agree exactly — synthetic discriminator
    cases AND a real-corpus sample, including non-default n's where one
    n serves both a top_ and a dup_ signal."""
    synth = spark.createDataFrame(list(enumerate(CASES)), "doc_id long, text string")
    real = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    for df in (synth, real):
        for kw in ({}, {"top_ns": (2, 4), "dup_ns": (2, 6)}):
            loc = {
                r["doc_id"]: r.asDict()
                for r in repetition_scores(df, impl="local", **kw).collect()
            }
            shuf = {
                r["doc_id"]: r.asDict()
                for r in repetition_scores(df, impl="shuffle", **kw).collect()
            }
            assert set(loc) == set(shuf)
            for d, row in loc.items():
                for k, v in row.items():
                    assert v == pytest.approx(shuf[d][k], abs=1e-9), (d, k)


def test_local_impl_plan_is_map_only(spark):
    """The default path must contain NO exchange: every signal is
    row-local, so the operator scales as a pure map job at 10^12 turns."""
    df = spark.createDataFrame(list(enumerate(CASES)), "doc_id long, text string")
    plan = repetition_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_repetition_bounds_and_custom_ns(spark):
    df = spark.createDataFrame(
        list(enumerate(CASES)), "doc_id long, text string"
    )
    out = repetition_scores(df, top_ns=(4,), dup_ns=(2, 6))
    assert set(out.columns) == {
        "doc_id",
        "dup_line_frac",
        "dup_line_char_frac",
        "top_4gram_char_frac",
        "dup_2gram_char_frac",
        "dup_6gram_char_frac",
    }
    for r in out.collect():
        for c in out.columns:
            if c != "doc_id":
                assert 0.0 <= r[c] <= 1.0


# --------------------------------------------------------------------------
# boilerplate line stripping
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def web_corpus(spark):
    rows = [
        (0, "Accept cookies\nreal content zero\nAll rights reserved", "en"),
        (1, "Accept cookies\nreal content one\nAll rights reserved", "de"),
        (2, "Accept cookies\nreal content two\nAll rights reserved", "fr"),
        (3, "totally unique document", "en"),
        (4, "Accept cookies\nAll rights reserved", "en"),
        (5, "Accept cookies\nAccept cookies\nonly here", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string").persist()


def test_boilerplate_set_counts_distinct_docs(web_corpus):
    # 'Accept cookies' is in 5 docs (doc 5's self-repeat counts ONCE);
    # 'All rights reserved' in 4; every content line in 1
    bp = {r["doc_freq"] for r in boilerplate_lines(web_corpus, 3).collect()}
    assert sorted(bp) == [4, 5]
    assert boilerplate_lines(web_corpus, 6).count() == 0


def test_strip_preserves_order_columns_and_empty_docs(web_corpus):
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate_lines(web_corpus, 3).collect()
    }
    assert out[0]["text"] == "real content zero"
    assert out[3]["text"] == "totally unique document"
    assert out[4]["text"] == ""  # all-boilerplate doc survives, emptied
    assert out[5]["text"] == "only here"
    assert out[1]["lang"] == "de"  # non-text columns pass through
    assert len(out) == web_corpus.count()  # no docs dropped


def test_strip_order_preserved_multiline(spark):
    # interleave boilerplate between per-doc-unique content lines; order
    # must survive the reassembly groupBy
    rows = [
        (i, "\n".join([f"first {i}", "BP", f"second {i}", "BP", f"third {i}"]), "en")
        for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = strip_boilerplate_lines(df, 3).collect()
    for r in out:
        i = r["doc_id"]
        assert r["text"] == f"first {i}\nsecond {i}\nthird {i}"


def test_strip_noop_below_threshold(web_corpus):
    out = strip_boilerplate_lines(web_corpus, 7)
    orig = {r["doc_id"]: r["text"] for r in web_corpus.collect()}
    for r in out.collect():
        assert r["text"] == orig[r["doc_id"]]
