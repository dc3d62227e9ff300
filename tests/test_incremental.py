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


@pytest.fixture(scope="module")
def inc_pos_path(spark, batches, tmp_path_factory):
    """Same two batches ingested with positions=True (phrase-capable)."""
    path = str(tmp_path_factory.mktemp("inc_pos"))
    b1, b2 = batches
    ingest_batch(b1, path, build_id="b1", positions=True)
    ingest_batch(b2, path, build_id="b2", positions=True)
    return path


def test_live_blocked_index_serves_fused_plans(spark, inc_pos_path, expected):
    """The incremental store reopened as a ranged BlockedIndex must be
    rank-identical to the from-scratch build on every serving plan:
    per-range fused BM25, WAND, and in-kernel phrase."""
    from nexlt_spark.index.incremental import live_blocked_index
    from nexlt_spark.query.ranged import phrase_score_ranged
    from nexlt_spark.query.wand import wand_topk

    docs_exp, idx_exp = expected
    live_docs = live_documents(spark, inc_pos_path).persist()
    bidx = live_blocked_index(spark, inc_pos_path, range_shift=6)
    bidx.blocks = bidx.blocks.persist()
    assert bidx.ranged and bidx.has_positions

    def keyed_topk(scored, d, k=10):
        keyed = scored.join(d.select("doc_id", "doc_key"), "doc_id")
        return [
            (r["doc_key"], round(r["score"], 9))
            for r in keyed.orderBy(F.col("score").desc(), F.col("doc_key").asc())
            .limit(k)
            .collect()
        ]

    for terms, mode in [(["updated", "v2"], "and"), (["the", "error"], "or")]:
        got = keyed_topk(score_postings(bidx, terms, mode), live_docs)
        want = keyed_topk(score_postings(idx_exp, terms, mode), docs_exp)
        assert got == want, (terms, mode)
        got_w = keyed_topk(wand_topk(bidx, terms, k=10, mode=mode), live_docs)
        assert got_w == want, ("wand", terms, mode)

    # phrase: every batch-2 overlap doc starts with "updated v2"
    got_p = keyed_topk(phrase_score_ranged(bidx, ["updated", "v2"]), live_docs, k=5)
    assert len(got_p) == 5
    texts = {r["doc_key"]: r["text"] for r in live_docs.collect()}
    for dk, _ in got_p:
        assert "updated v2" in texts[dk].lower()


def test_positions_mismatch_refused(spark, inc_pos_path, batches):
    b1, _ = batches
    with pytest.raises(ValueError, match="positions"):
        ingest_batch(b1, inc_pos_path, positions=False)


def test_empty_batch_is_noop(spark, inc_path):
    n_before = len(batches_done(inc_path))
    empty = synth_transcripts(spark, n_convs=10, seed=7).where(F.lit(False))
    assert ingest_batch(empty, inc_path) is None
    assert len(batches_done(inc_path)) == n_before


# ---- Iceberg time travel over the manifest list: snapshots = commits ----


def test_as_of_batch_reads_the_old_snapshot(spark, batches, tmp_path_factory):
    """as_of_batch=0 must read the store exactly as it was after batch 0
    committed: batch-1 docs absent, batch-1's tombstoned docs live again,
    stats and BM25 scores recomputed over that snapshot — byte-equal to a
    store that never saw batch 1."""
    path = str(tmp_path_factory.mktemp("tt"))
    b1, b2 = batches
    ingest_batch(b1, path, build_id="b1")
    snap0_docs = {
        (r["doc_key"], r["text"]) for r in live_documents(spark, path).collect()
    }
    snap0_rank = _by_key(live_index(spark, path), live_documents(spark, path))
    ingest_batch(b2, path, build_id="b2")

    # current state differs (upserts landed) …
    now_docs = {(r["doc_key"], r["text"]) for r in live_documents(spark, path).collect()}
    assert now_docs != snap0_docs
    # … but the time-traveled read reproduces snapshot 0 exactly
    tt_docs = {
        (r["doc_key"], r["text"])
        for r in live_documents(spark, path, as_of_batch=0).collect()
    }
    assert tt_docs == snap0_docs
    tt_rank = _by_key(
        live_index(spark, path, as_of_batch=0),
        live_documents(spark, path, as_of_batch=0),
    )
    assert tt_rank == snap0_rank
    # as-of-latest == the plain live read
    latest = {(r["doc_key"], r["text"]) for r in live_documents(spark, path, as_of_batch=1).collect()}
    assert latest == now_docs
    with pytest.raises(ValueError):
        live_documents(spark, path, as_of_batch=7)


def test_rollback_restores_snapshot_and_reissues_batches(spark, batches, tmp_path_factory):
    """rollback(to_batch=0) = Iceberg rollback_to_snapshot + expire: the
    live read equals the as-of-0 read, and the next ingest commits as
    batch 1 again."""
    from nexlt_spark.index.incremental import rollback

    path = str(tmp_path_factory.mktemp("rb"))
    b1, b2 = batches
    ingest_batch(b1, path, build_id="b1")
    snap0_docs = {
        (r["doc_key"], r["text"]) for r in live_documents(spark, path).collect()
    }
    ingest_batch(b2, path, build_id="b2")
    assert rollback(path, 0) == [1]
    assert [m["batch"] for m in batches_done(path)] == [0]
    after = {(r["doc_key"], r["text"]) for r in live_documents(spark, path).collect()}
    assert after == snap0_docs
    r2 = ingest_batch(b2, path, build_id="b2-again")
    assert r2.batch == 1
    with pytest.raises(ValueError):
        rollback(path, 5)


def test_random_ingest_sequences_match_lww_fold(spark, tmp_path_factory):
    """Property fuzz over SO5/ST3/ST5: random sequences of overlapping
    upsert batches (random conv windows, strictly increasing ts epochs)
    must leave the store logically identical to a from-scratch build over
    the last-write-wins fold — postings by doc_key and global stats —
    including when the sequence compacts to a new store dir mid-way.
    Complements the fixed 2-batch fixture above with arbitrary overlap
    patterns."""
    import random

    rng = random.Random(20260820)
    for trial in range(2):
        path = str(tmp_path_factory.mktemp(f"fuzzinc{trial}"))
        applied = []
        n_steps = rng.randrange(3, 5)
        for step in range(n_steps):
            lo = rng.randrange(0, 30)
            hi = lo + rng.randrange(5, 20)
            b = (
                synth_transcripts(spark, n_convs=hi, seed=11 + trial)
                .where(F.col("conv_id") >= f"conv-{lo:08d}")
                .withColumn(
                    "text",
                    F.concat(F.lit(f"v{step} "), F.coalesce("text", F.lit(""))),
                )
                .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {1000 * (step + 1)} DAYS"))
                .persist()
            )
            ingest_batch(b, path, build_id=f"fz{trial}-{step}")
            applied.append(b)
            if step == n_steps - 2 and rng.random() < 0.5:
                out = str(tmp_path_factory.mktemp(f"fuzzcomp{trial}"))
                compact(spark, path, out, build_id=f"cp{trial}")
                path = out
        merged = applied[0]
        for b in applied[1:]:
            merged = merged.unionByName(b)
        merged = latest_by_key(merged, ["conv_id", "turn_idx"], "ts", "role")
        docs_exp = flatten_transcripts(merged, num_partitions=4).persist()
        idx_exp = build_index(docs_exp)
        live_docs = live_documents(spark, path).persist()
        idx = live_index(spark, path)
        assert _by_key(idx, live_docs) == _by_key(idx_exp, docs_exp), (
            trial,
            [m["batch"] for m in batches_done(path)],
        )
        assert idx.stats.n_docs == idx_exp.stats.n_docs
        assert idx.stats.total_tokens == idx_exp.stats.total_tokens
