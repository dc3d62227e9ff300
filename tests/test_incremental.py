"""Incremental ingest invariants (SO5/ST1-ST5): upsert batches +
tombstones + compaction must be logically identical to a from-scratch
build over the last-write-wins table.

docIDs differ between the two paths by design (incremental numbers new
docs past prior batches, Lucene-segment style; a fresh build dense-ranks
all keys), so equality is asserted per doc_key, and BM25 ranking is
compared as (doc_key, score) lists — scores are docID-independent.
"""

import pytest
from pyspark.sql import functions as F

from nexlt_spark.flatten import flatten_transcripts
from nexlt_spark.index.build import build_index
from nexlt_spark.index.incremental import (
    batches_done,
    compact,
    ingest_batch,
    live_documents,
    live_index,
)
from nexlt_spark.ops.ingest import latest_by_key
from nexlt_spark.query.exact import score_postings
from nexlt_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def batches(spark):
    """batch1: convs 0..59; batch2: convs 40..79 with changed text and
    later ts for the overlap (an upsert of convs 40..59) plus 20 new."""
    b1 = synth_transcripts(spark, n_convs=60, seed=7).persist()
    overlap = synth_transcripts(spark, n_convs=80, seed=7).where(
        F.col("conv_id") >= "conv-00000040"
    )
    b2 = (
        overlap.withColumn("text", F.concat(F.lit("updated v2 "), F.coalesce("text", F.lit(""))))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1000 DAYS"))
        .persist()
    )
    return b1, b2


@pytest.fixture(scope="module")
def inc_path(spark, batches, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("inc"))
    b1, b2 = batches
    r1 = ingest_batch(b1, path, build_id="b1")
    r2 = ingest_batch(b2, path, build_id="b2")
    assert r1.batch == 0 and r2.batch == 1
    assert r2.first_doc_id == r1.max_doc_id + 1
    # every overlapping turn got tombstoned exactly once
    assert r2.n_tombstones > 0
    return path


@pytest.fixture(scope="module")
def expected(spark, batches):
    """From-scratch build over the logical last-write-wins table."""
    b1, b2 = batches
    merged = latest_by_key(b1.unionByName(b2), ["conv_id", "turn_idx"], "ts", "role")
    docs = flatten_transcripts(merged, num_partitions=8).persist()
    return docs, build_index(docs).persist()


def _by_key(index, docs):
    """postings as a set of (term, doc_key, tf, dl) via the doc_id map."""
    keyed = index.postings.join(docs.select("doc_id", "doc_key"), "doc_id")
    return sorted(tuple(r) for r in keyed.select("term", "doc_key", "tf", "dl").collect())


def test_live_docs_match_lww_table(spark, inc_path, expected):
    docs_exp, _ = expected
    live = live_documents(spark, inc_path)
    got = sorted(
        tuple(r) for r in live.select("doc_key", "text", "role", "tool").collect()
    )
    want = sorted(
        tuple(r) for r in docs_exp.select("doc_key", "text", "role", "tool").collect()
    )
    assert got == want


def test_live_postings_match_scratch_build(spark, inc_path, expected):
    docs_exp, idx_exp = expected
    live_docs = live_documents(spark, inc_path)
    idx = live_index(spark, inc_path)
    assert _by_key(idx, live_docs) == _by_key(idx_exp, docs_exp)


def test_global_stats_recomputed_over_live(spark, inc_path, expected):
    _, idx_exp = expected
    idx = live_index(spark, inc_path)
    assert idx.stats.n_docs == idx_exp.stats.n_docs
    assert idx.stats.total_tokens == idx_exp.stats.total_tokens


def test_bm25_rank_identical_by_doc_key(spark, inc_path, expected):
    docs_exp, idx_exp = expected
    live_docs = live_documents(spark, inc_path).persist()
    idx = live_index(spark, inc_path)
    for terms, mode in [(["updated", "v2"], "and"), (["the", "error"], "or"), (["table"], "or")]:
        def topk(i, d):
            s = score_postings(i, terms, mode)
            keyed = s.join(d.select("doc_id", "doc_key"), "doc_id")
            return [
                (r["doc_key"], r["score"])
                for r in keyed.orderBy(F.col("score").desc(), F.col("doc_key").asc())
                .limit(10)
                .collect()
            ]

        assert topk(idx, live_docs) == topk(idx_exp, docs_exp), (terms, mode)


def test_compact_preserves_everything(spark, inc_path, expected, tmp_path_factory):
    docs_exp, idx_exp = expected
    out = str(tmp_path_factory.mktemp("inc_compacted"))
    compact(spark, inc_path, out)
    assert len(batches_done(out)) == 1
    assert batches_done(out)[0]["n_tombstones"] == 0
    live = live_documents(spark, out)
    idx = live_index(spark, out)
    assert _by_key(idx, live) == _by_key(idx_exp, docs_exp)
    # compaction never renumbers: doc_id→doc_key map unchanged vs pre-compact
    pre = live_documents(spark, inc_path)
    assert sorted(
        tuple(r) for r in live.select("doc_id", "doc_key").collect()
    ) == sorted(tuple(r) for r in pre.select("doc_id", "doc_key").collect())


def test_empty_batch_is_noop(spark, inc_path):
    n_before = len(batches_done(inc_path))
    empty = synth_transcripts(spark, n_convs=10, seed=7).where(F.lit(False))
    assert ingest_batch(empty, inc_path) is None
    assert len(batches_done(inc_path)) == n_before
