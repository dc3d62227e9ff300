"""Regression: emit kernels must apply the analyzer chain in tokenize()'s
order (token_map, THEN stream_map/drop) — ADVICE r2 high finding.

Before the fix, fr_light/it_light builds ran _drop_empty on RAW tokens
(a no-op) and then stemmed articles to '', emitting term-'' postings that
collided with the doc-stats sentinel: n_docs double-counted, dl counted
articles, and phrase positions included article offsets. These tests pin
the fixed semantics at three levels: the shared batch tokenizer helper,
the flat build, and the packed/blocked build.
"""

import numpy as np
import pandas as pd
import pytest

from nexlt_spark.analysis import ANALYZERS, batch_token_codes, tokenize

FR_TEXTS = [
    "L'article de l'école",  # elisions mid-stream
    "l'homme et la femme",
    "c'est l'eau",  # leading elisions
    "L'",  # degenerate: article only → zero tokens
    "bonjour tout le monde",  # no elision at all
    None,  # null text
    "",  # empty text
]

MIXED_TEXTS = [
    "Hello, world! FULL-width：１２３",
    "l'article de l'école jusqu'au matin",
    "l'acqua dell'arte",
    "日本語のテキストです",
    "mixed 日本語 and english l'eau",
    "ภาษาไทยกับ Spark ปนกัน",
    "",
    None,
    "   ",
]


def _streams_from_codes(texts, spec):
    doc_idx, codes, uniques, lens = batch_token_codes(pd.Series(texts), spec)
    streams = [[] for _ in texts]
    for d, c in zip(doc_idx, codes):
        streams[int(d)].append(uniques[int(c)])
    return streams, lens


@pytest.mark.parametrize("name", sorted(ANALYZERS))
def test_batch_token_codes_matches_tokenize(name):
    """The shared kernel tokenizer reproduces tokenize() exactly — same
    terms, same in-doc order, same per-doc lengths — for EVERY chain."""
    spec = ANALYZERS[name]
    streams, lens = _streams_from_codes(MIXED_TEXTS, spec)
    for i, t in enumerate(MIXED_TEXTS):
        expect = tokenize(t, name)
        assert streams[i] == expect, f"{name}: doc {i} stream mismatch"
        assert int(lens[i]) == len(expect), f"{name}: doc {i} dl mismatch"


def test_no_empty_terms_after_elision():
    spec = ANALYZERS["fr_light"]
    doc_idx, codes, uniques, lens = batch_token_codes(pd.Series(FR_TEXTS), spec)
    emitted = {uniques[int(c)] for c in codes}
    assert "" not in emitted
    # the article-only doc dropped to zero tokens
    assert int(lens[3]) == 0


@pytest.fixture(scope="module")
def fr_docs(spark):
    rows = [(i, t) for i, t in enumerate(FR_TEXTS)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_flat_build_fr_light(spark, fr_docs):
    from nexlt_spark.index.build import build_index

    idx = build_index(fr_docs, analyzer="fr_light", positions=True)
    # sentinel collision would double-count docs with articles
    assert idx.stats.n_docs == len(FR_TEXTS)
    expect_dls = {i: len(tokenize(t, "fr_light")) for i, t in enumerate(FR_TEXTS)}
    got_dls = {r["doc_id"]: r["dl"] for r in idx.doc_stats.collect()}
    assert got_dls == expect_dls
    assert idx.stats.total_tokens == sum(expect_dls.values())
    # no '' term ever reaches postings
    assert idx.postings.where("term = ''").count() == 0
    # positions are post-drop offsets: «L'article de l'école» tokenizes to
    # [articl, de, ecol] at positions 0,1,2 — NOT the raw 1,2,4
    pos = {
        (r["doc_id"], r["term"]): list(r["positions"])
        for r in idx.lookup(["articl", "de", "ecol"], positions=True).collect()
        if r["doc_id"] == 0
    }
    assert pos[(0, "articl")] == [0]
    assert pos[(0, "de")] == [1]
    assert pos[(0, "ecol")] == [2]


def test_flat_build_fr_light_phrase(spark, fr_docs):
    """End-to-end: the phrase «l'article de l'école» must match doc 0 off
    the positions index (adjacency over post-drop offsets)."""
    from nexlt_spark.index.build import build_index
    from nexlt_spark.query.exact import phrase_match_docs

    idx = build_index(fr_docs, analyzer="fr_light", positions=True)
    toks = tokenize("l'article de l'école", "fr_light")
    assert toks == ["articl", "de", "ecol"]
    docs = {r["doc_id"] for r in phrase_match_docs(idx, toks).collect()}
    assert 0 in docs


def test_packed_build_fr_light(spark, fr_docs):
    from nexlt_spark.index.packed import build_blocked_direct

    bidx = build_blocked_direct(fr_docs, analyzer="fr_light", positions=True)
    assert bidx.stats.n_docs == len(FR_TEXTS)
    expect_dls = {i: len(tokenize(t, "fr_light")) for i, t in enumerate(FR_TEXTS)}
    assert bidx.stats.total_tokens == sum(expect_dls.values())
    got_dls = {r["doc_id"]: r["dl"] for r in bidx.doc_stats.collect()}
    assert got_dls == expect_dls
    assert bidx.term_stats.where("term = ''").count() == 0
