"""Blocked postings: block path ≡ flat path; salting; save/load roundtrip."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nexlt_spark.index.blocks import (
    BlockedIndex,
    build_blocks,
    decode_terms,
    load_blocked_index,
    save_blocked_index,
)
from nexlt_spark.query.exact import bm25_topk
from nexlt_spark.query.model import Query

TERMS = ["run", "the", "error", "w1998", "café"]


@pytest.fixture(scope="module")
def blocked(index):
    return BlockedIndex(
        blocks=build_blocks(index, salt_threshold=10**9).persist(),
        doc_stats=index.doc_stats,
        term_stats=index.term_stats,
        stats=index.stats,
    )


@pytest.fixture(scope="module")
def blocked_salted(index):
    # absurdly low threshold + tiny ranges: every term with df>5 is salted
    return BlockedIndex(
        blocks=build_blocks(index, salt_threshold=5, range_shift=6).persist(),
        doc_stats=index.doc_stats,
        term_stats=index.term_stats,
        stats=index.stats,
    )


def _flat_rows(index, terms):
    return sorted(
        tuple(r) for r in index.lookup(terms).select("term", "doc_id", "tf", "dl").collect()
    )


def test_decode_equals_flat(index, blocked):
    assert _flat_rows(blocked, TERMS) == _flat_rows(index, TERMS)


def test_decode_equals_flat_salted(index, blocked_salted):
    assert _flat_rows(blocked_salted, TERMS) == _flat_rows(index, TERMS)


def test_salting_splits_hot_terms(blocked_salted):
    n_groups = (
        blocked_salted.blocks.where(F.col("term") == "the")
        .select("rsalt")
        .distinct()
        .count()
    )
    assert n_groups > 1  # hot term really is split across range runs


def test_blocks_are_docid_sorted_and_disjoint(blocked_salted):
    rows = (
        blocked_salted.blocks.where(F.col("term") == "the")
        .select("rsalt", "block_id", "first_doc_id", "last_doc_id")
        .collect()
    )
    spans = sorted((r["first_doc_id"], r["last_doc_id"]) for r in rows)
    for (f1, l1), (f2, l2) in zip(spans, spans[1:]):
        assert l1 < f2  # strictly disjoint, globally sorted


@pytest.mark.parametrize(
    "q",
    [
        Query(terms=["run"], k=10),
        Query(terms=["the"], k=10),
        Query(terms=["spark", "index"], mode="and", k=10),
        Query(terms=["spark", "index", "merge"], mode="or", k=25),
        Query(phrase="the run", k=10),
    ],
    ids=["term", "hot", "and", "or", "phrase"],
)
def test_blocked_query_rank_identical_to_flat(index, documents, blocked_salted, q):
    flat = [(r["doc_id"], r["score"]) for r in bm25_topk(index, documents, q).collect()]
    blk = [(r["doc_id"], r["score"]) for r in bm25_topk(blocked_salted, documents, q).collect()]
    assert flat == blk  # bit-identical scores: same arithmetic, same fold


def test_save_load_roundtrip(tmp_path_factory, index, documents, spark):
    path = str(tmp_path_factory.mktemp("idxstore"))
    save_blocked_index(index, path, n_buckets=8, salt_threshold=50, range_shift=7)
    loaded = load_blocked_index(spark, path)
    assert loaded.stats.n_docs == index.stats.n_docs
    assert loaded.stats.total_tokens == index.stats.total_tokens
    q = Query(terms=["run", "file"], mode="or", k=10)
    flat = [(r["doc_id"], r["score"]) for r in bm25_topk(index, documents, q).collect()]
    blk = [(r["doc_id"], r["score"]) for r in bm25_topk(loaded, documents, q).collect()]
    assert flat == blk
    # bucket pruning must not lose terms
    assert loaded.term_dfs(["run", "file"]) == index.term_dfs(["run", "file"])
