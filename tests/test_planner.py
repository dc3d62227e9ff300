"""Planner invariants: path choice is stats-driven, results path-invariant.

The planner (query.planner) may only ever change latency — both routes
are rank-identical — and must decide from cached metadata without
scanning postings. These tests pin the decision rules to corpus shapes:
single-list and flat-idf ("narrow vocabulary") queries go exact; AND
driven by a rare list goes WAND; the estimate is a sane fraction.
"""

import pytest
from pyspark.sql import functions as F

from nexlt_spark.index.packed import build_blocked_direct
from nexlt_spark.query.exact import paginate, score_postings
from nexlt_spark.query.planner import (
    choose_topk_path,
    estimate_kept_fraction,
    topk,
)


@pytest.fixture(scope="module")
def ranged(documents):
    b = build_blocked_direct(documents, range_shift=8)
    b.blocks = b.blocks.persist()
    b.blocks.count()
    return b


def _exact(index, terms, k, mode="or"):
    scored = score_postings(index, terms, mode)
    return [
        (r["doc_id"], r["score"])
        for r in paginate(
            scored, [F.col("score").desc(), F.col("doc_id").asc()], 0, k
        ).collect()
    ]


def test_single_term_goes_exact(ranged):
    assert choose_topk_path(ranged, ["error"], 10, "or") == "exact"


def test_absent_terms_go_exact(ranged):
    assert choose_topk_path(ranged, ["nosuchterm"], 10, "or") == "exact"
    assert choose_topk_path(ranged, ["the", "nosuchterm"], 10, "and") == "exact"


def test_and_rare_list_goes_wand(ranged):
    # every present multi-term AND on this small corpus has a rarest list
    # far under the candidate cap → conjunction-by-smallest-list
    assert choose_topk_path(ranged, ["run", "file"], 10, "and") == "wand"


def test_or_flat_idf_goes_exact(ranged):
    # synth vocab is narrow: common terms share similar idf, θ̂ prunes
    # little → kept fraction high → exact
    kf = estimate_kept_fraction(ranged, ["the", "run", "data"])
    assert kf is not None and 0.0 <= kf <= 1.0
    assert choose_topk_path(ranged, ["the", "run", "data"], 10, "or") == "exact"


def test_estimate_none_when_absent(ranged):
    assert estimate_kept_fraction(ranged, ["nosuchterm"]) is None


@pytest.mark.parametrize(
    "terms,mode,k",
    [
        (["error"], "or", 10),
        (["run", "file"], "and", 10),
        (["run", "file"], "or", 10),
        (["the", "w1998"], "or", 5),
        (["spark", "index", "merge"], "or", 10),
        (["the", "nosuchterm"], "and", 10),
    ],
)
def test_planned_topk_matches_exact(index, ranged, terms, mode, k):
    stats = {}
    got = [
        (r["doc_id"], r["score"])
        for r in topk(ranged, terms, k=k, mode=mode, stats_out=stats).collect()
    ]
    assert stats["path"] in ("wand", "exact")
    assert got == _exact(index, terms, k, mode)


def test_planner_runs_no_job_when_cached(ranged, spark):
    """After the metadata cache is warm, planning must not launch jobs."""
    choose_topk_path(ranged, ["run", "file"], 10, "and")  # warm
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    choose_topk_path(ranged, ["run", "file"], 10, "and")
    choose_topk_path(ranged, ["run", "file"], 10, "or")
    after = tracker.getJobIdsForGroup(None)
    assert before == after
