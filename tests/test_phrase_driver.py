"""Driver phrase plan (VERDICT r4 next #4): skip-data-pruned phrase
top-k must be rank- AND score-identical to the exact fused phrase plan
across adjacency/slop/boosts/empty shapes, and must actually prune —
decoding candidate-hit blocks, not whole postings lists."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nexlt_spark.index.packed import build_blocked_direct, save_blocked
from nexlt_spark.index.blocks import load_blocked_index
from nexlt_spark.query.exact import paginate, phrase_score_postings
from nexlt_spark.query.phrase_driver import phrase_topk, phrase_topk_driver
from nexlt_spark.query.ranged import phrase_match_docs_np


@pytest.fixture(scope="module")
def pos_store(spark, documents, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pos_store") / "idx")
    bidx = build_blocked_direct(documents, range_shift=6, block_size=16, positions=True)
    save_blocked(bidx, path, n_buckets=8)
    return load_blocked_index(spark, path)


def _exact_phrase(pos_index, tokens, k, slop=0, boosts=None):
    scored = phrase_score_postings(pos_index, tokens, slop=slop, boosts=boosts)
    return [
        (r["doc_id"], r["score"])
        for r in paginate(
            scored, [F.col("score").desc(), F.col("doc_id").asc()], 0, k
        ).collect()
    ]


PHRASES = [
    (["merge", "part"], 0),
    (["the", "fast"], 0),
    (["batch", "batch"], 0),  # duplicate-token phrase
    (["the", "run"], 0),  # hot-hot
    (["the", "run"], 3),  # sloppy
    (["merge", "part"], 2),
    (["the", "nosuchterm"], 0),  # absent token → empty
    (["run"], 0),  # single-token degenerate
]


@pytest.mark.parametrize("tokens,slop", PHRASES)
def test_driver_phrase_equals_exact(pos_index, pos_store, tokens, slop):
    stats = {}
    got = phrase_topk(pos_store, tokens, k=10, slop=slop, as_rows=True,
                      stats_out=stats)
    assert stats["plan"] == "driver"  # the store is eligible: must route driver
    assert got == _exact_phrase(pos_index, tokens, 10, slop)


def test_driver_phrase_with_boosts(pos_index, pos_store):
    boosts = {"merge": 2.0}
    got = phrase_topk(pos_store, ["merge", "part"], k=10, boosts=boosts, as_rows=True)
    assert got == _exact_phrase(pos_index, ["merge", "part"], 10, boosts=boosts)


def test_driver_phrase_dataframe_form(pos_index, pos_store):
    df = phrase_topk(pos_store, ["merge", "part"], k=5)
    got = [(r["doc_id"], r["score"]) for r in df.collect()]
    assert got == _exact_phrase(pos_index, ["merge", "part"], 5)


def test_driver_phrase_actually_prunes(pos_store):
    """A hot+less-hot phrase must decode less than the full lists: the
    leapfrog decodes the rarer list fully, then only candidate-hit
    blocks of the hotter term."""
    from nexlt_spark.query.wand import _term_meta

    stats = {}
    rows = phrase_topk(pos_store, ["the", "fast"], k=10, as_rows=True,
                       stats_out=stats)
    assert rows, "fixture corpus must contain 'the fast' phrases"
    total_postings = sum(
        m[0] for m in _term_meta(pos_store, ["fast", "the"]).values()
    )
    assert stats["decoded_postings"] < total_postings
    assert stats["pos_blocks"] <= stats["blocks_total"]


def test_driver_phrase_caps_fallback_identical(pos_index, pos_store, monkeypatch):
    """Past the driver decode caps the router falls back to the Spark
    plan — same results."""
    import nexlt_spark.query.phrase_driver as P

    monkeypatch.setattr(P, "DRIVER_DECODE_MAX_POSTINGS", 1)
    stats = {}
    got = phrase_topk(pos_store, ["the", "fast"], k=10, as_rows=True,
                      stats_out=stats)
    assert stats["plan"] == "spark"
    assert got == _exact_phrase(pos_index, ["the", "fast"], 10)


def test_phrase_match_np_mirrors_column_semantics():
    """Unit sanity for the shared verify: tiny hand-built arrays."""
    # doc 1: "a b c"; doc 2: "a x b"; doc 3: "b a"
    term = np.array(["a", "b", "c", "a", "x", "b", "b", "a"], dtype=object)
    doc = np.array([1, 1, 1, 2, 2, 2, 3, 3], dtype=np.int64)
    pos = np.array([0, 1, 2, 0, 1, 2, 0, 1], dtype=np.int64)
    assert phrase_match_docs_np(term, doc, pos, ["a", "b"], 0).tolist() == [1]
    assert phrase_match_docs_np(term, doc, pos, ["a", "b"], 1).tolist() == [1, 2]
    assert phrase_match_docs_np(term, doc, pos, ["a", "b", "c"], 0).tolist() == [1]
    assert phrase_match_docs_np(term, doc, pos, ["b", "a"], 0).tolist() == [3]
    assert phrase_match_docs_np(term, doc, pos, ["c", "a"], 5).tolist() == []
