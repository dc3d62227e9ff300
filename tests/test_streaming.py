"""Structured Streaming ingest: file-drop stream → incremental index;
checkpointed, idempotent, equal to a from-scratch batch build (per
doc_key — streaming docIDs are arrival-ordered, Lucene-segment style).
"""

import pytest
from pyspark.sql import functions as F

from nexlt_spark.flatten import flatten_transcripts
from nexlt_spark.index.build import build_index
from nexlt_spark.index.incremental import batches_done, live_documents, live_index
from nexlt_spark.ops.ingest import latest_by_key
from nexlt_spark.streaming import stream_ingest_available_now
from nexlt_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    return {
        "drop": str(root / "drop"),
        "index": str(root / "index"),
        "ckpt": str(root / "ckpt"),
    }


def _drop(df, drop_dir):
    df.coalesce(1).write.mode("append").parquet(drop_dir)


def test_stream_drains_drop_dir(spark, dirs):
    b1 = synth_transcripts(spark, n_convs=25, seed=11)
    _drop(b1, dirs["drop"])
    stream_ingest_available_now(spark, dirs["drop"], dirs["index"], dirs["ckpt"])
    assert len(batches_done(dirs["index"])) >= 1
    live = live_documents(spark, dirs["index"])
    assert live.count() == flatten_transcripts(b1, num_partitions=4).count()


def test_stream_is_idempotent_without_new_files(spark, dirs):
    n_before = len(batches_done(dirs["index"]))
    docs_before = live_documents(spark, dirs["index"]).count()
    # re-running with no new files must index nothing new
    stream_ingest_available_now(spark, dirs["drop"], dirs["index"], dirs["ckpt"])
    assert len(batches_done(dirs["index"])) == n_before
    assert live_documents(spark, dirs["index"]).count() == docs_before


def test_stream_upserts_and_matches_batch_build(spark, dirs):
    # second drop: updated versions of convs 10.. plus brand-new convs
    b1 = synth_transcripts(spark, n_convs=25, seed=11)
    b2 = (
        synth_transcripts(spark, n_convs=35, seed=11)
        .where(F.col("conv_id") >= "conv-00000010")
        .withColumn("text", F.concat(F.lit("streamed v2 "), F.coalesce("text", F.lit(""))))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 900 DAYS"))
    )
    _drop(b2, dirs["drop"])
    stream_ingest_available_now(spark, dirs["drop"], dirs["index"], dirs["ckpt"])

    merged = latest_by_key(b1.unionByName(b2), ["conv_id", "turn_idx"], "ts", "role")
    docs_exp = flatten_transcripts(merged, num_partitions=4).persist()
    idx_exp = build_index(docs_exp)

    live = live_documents(spark, dirs["index"])
    idx = live_index(spark, dirs["index"])

    got_docs = sorted(tuple(r) for r in live.select("doc_key", "text").collect())
    want_docs = sorted(tuple(r) for r in docs_exp.select("doc_key", "text").collect())
    assert got_docs == want_docs

    def by_key(i, d):
        keyed = i.postings.join(d.select("doc_id", "doc_key"), "doc_id")
        return sorted(tuple(r) for r in keyed.select("term", "doc_key", "tf", "dl").collect())

    assert by_key(idx, live) == by_key(idx_exp, docs_exp)
    assert idx.stats.n_docs == idx_exp.stats.n_docs
