"""Resumability invariant (M5): crash → resume ≡ uninterrupted build.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics"; "resume-from-checkpoint produces postings identical to an
uninterrupted build" (BASELINE.md §3)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from nexlt_spark.index.checkpoint import (
    build_resumable,
    build_runs,
    done_chunks,
    merge_runs,
)

N_CHUNKS = 6


def _all_rows(bidx, index):
    terms = [r["term"] for r in index.term_stats.select("term").collect()]
    return sorted(
        tuple(r) for r in bidx.lookup(terms).select("term", "doc_id", "tf", "dl").collect()
    )


@pytest.fixture(scope="module")
def uninterrupted(spark, documents, index, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt_full"))
    bidx = build_resumable(documents, path, n_chunks=N_CHUNKS, build_id="full")
    return path, bidx


def test_uninterrupted_matches_flat_index(index, uninterrupted):
    _path, bidx = uninterrupted
    assert _all_rows(bidx, index) == sorted(
        tuple(r) for r in index.postings.select("term", "doc_id", "tf", "dl").collect()
    )
    assert bidx.stats.n_docs == index.stats.n_docs
    assert bidx.stats.total_tokens == index.stats.total_tokens


def test_crash_then_resume_identical(spark, documents, index, uninterrupted, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt_crash"))
    with pytest.raises(RuntimeError, match="injected failure"):
        build_runs(documents, path, n_chunks=N_CHUNKS, build_id="crashy", fail_after=2)
    assert done_chunks(path, N_CHUNKS) == [0, 1]
    with pytest.raises(RuntimeError, match="cannot merge"):
        merge_runs(spark, path, N_CHUNKS)

    # resume: only the remaining chunks run
    resumed = build_runs(documents, path, n_chunks=N_CHUNKS, build_id="crashy")
    assert [r.chunk for r in resumed] == [2, 3, 4, 5]
    bidx = merge_runs(spark, path, N_CHUNKS, build_id="crashy")

    _fp, full_bidx = uninterrupted
    assert _all_rows(bidx, index) == _all_rows(full_bidx, index)
    assert bidx.stats.n_docs == full_bidx.stats.n_docs


def test_resume_is_idempotent_noop(documents, uninterrupted):
    path, _ = uninterrupted
    again = build_runs(documents, path, n_chunks=N_CHUNKS)
    assert again == []  # every chunk skipped via done-marker


def test_lineage_and_metrics(uninterrupted, index):
    path, _ = uninterrupted
    with open(os.path.join(path, "lineage.json")) as fh:
        lin = json.load(fh)
    assert lin["build_id"] == "full"
    assert len(lin["chunks"]) == N_CHUNKS
    for c in lin["chunks"]:
        assert c["n_docs"] > 0 and c["bytes"] > 0 and c["seconds"] > 0
        assert c["postings_per_sec"] > 0
    snap = lin["stats_snapshot"]
    assert snap["n_docs"] == index.stats.n_docs
    assert snap["avgdl"] == index.stats.avgdl
    # chunk doc counts partition the corpus exactly
    assert sum(c["n_docs"] for c in lin["chunks"]) == index.stats.n_docs


def test_chunking_is_deterministic(documents):
    ids = documents.select(
        "doc_id", F.pmod(F.col("doc_id"), F.lit(N_CHUNKS)).alias("c")
    ).collect()
    for r in ids:
        assert r["c"] == r["doc_id"] % N_CHUNKS
