"""Flatten invariants: stable docIDs + per-turn text equality (north_star)."""

from pyspark.sql import functions as F

from nexlt_spark.flatten import flatten_transcripts


def test_doc_ids_dense_and_ordered(documents):
    rows = documents.select("doc_id", "conv_id", "turn_idx").orderBy("doc_id").collect()
    n = len(rows)
    assert [r["doc_id"] for r in rows] == list(range(n))
    keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
    assert keys == sorted(keys)  # doc_id order == (conv_id, turn_idx) order
    assert len(set(keys)) == n


def test_doc_ids_stable_across_partitioning(transcripts):
    a = flatten_transcripts(transcripts, num_partitions=3)
    b = flatten_transcripts(transcripts.repartition(17), num_partitions=11)
    da = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in a.collect()}
    db = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in b.collect()}
    assert da == db


def test_per_turn_text_equality(transcripts, documents):
    """North-star invariant: every flattened doc's text == source row's text
    joined on (conv_id, turn_idx)."""
    j = transcripts.alias("t").join(
        documents.alias("d"),
        on=[F.col("t.conv_id") == F.col("d.conv_id"), F.col("t.turn_idx") == F.col("d.turn_idx")],
        how="full_outer",
    )
    bad = j.where(
        F.col("t.conv_id").isNull()
        | F.col("d.conv_id").isNull()
        | ~F.col("t.text").eqNullSafe(F.col("d.text"))
    ).count()
    assert bad == 0


def test_doc_key_and_text_lc(documents):
    r = documents.where(
        (F.col("doc_key") != F.concat_ws(":", "conv_id", "turn_idx"))
        | ~F.col("text_lc").eqNullSafe(F.lower(F.col("text")))
    ).count()
    assert r == 0


def test_null_order_key_fails_fast(spark):
    """A null (conv_id, turn_idx) violates the unique-key contract and
    must raise up front — not poison the driver-side boundary sort or
    silently yield a null doc_id (ADVICE r3)."""
    import pytest

    from nexlt_spark.flatten import assign_stable_ids

    df = spark.createDataFrame(
        [("c1", 0), (None, 1), ("c2", 0)], "conv_id string, turn_idx int"
    )
    with pytest.raises(ValueError, match="null"):
        assign_stable_ids(df).collect()
