"""Packed posting-run build ≡ flat build (the scale-path equivalence).

build_blocked_direct must produce an index whose decoded postings,
stats, and query results are identical to the flat path's blocked index
— only the physical build dataflow differs (packed runs vs posting
rows).
"""

import pytest
from pyspark.sql import functions as F

from nexlt_spark.index.blocks import build_blocks, decode_terms, load_blocked_index
from nexlt_spark.index.packed import build_blocked_direct, save_blocked
from nexlt_spark.query.exact import score_postings
from nexlt_spark.query.wand import wand_topk


@pytest.fixture(scope="module")
def packed_idx(documents):
    return build_blocked_direct(documents).persist()


def _decoded(bidx, terms):
    return sorted(
        tuple(r)
        for r in bidx.lookup(terms).select("term", "doc_id", "tf", "dl").collect()
    )


def test_packed_stats_match_flat(index, packed_idx):
    assert packed_idx.stats.n_docs == index.stats.n_docs
    assert packed_idx.stats.total_tokens == index.stats.total_tokens


def test_packed_term_stats_match_flat(index, packed_idx):
    flat = sorted(tuple(r) for r in index.term_stats.collect())
    packed = sorted(tuple(r) for r in packed_idx.term_stats.collect())
    assert packed == flat


def test_packed_doc_stats_match_flat(index, packed_idx):
    flat = sorted(tuple(r) for r in index.doc_stats.collect())
    packed = sorted(tuple(r) for r in packed_idx.doc_stats.collect())
    assert packed == flat


def test_packed_postings_match_flat(index, packed_idx):
    terms = [r["term"] for r in index.term_stats.select("term").collect()]
    flat = sorted(
        tuple(r) for r in index.postings.select("term", "doc_id", "tf", "dl").collect()
    )
    assert _decoded(packed_idx, terms) == flat


def test_packed_blocks_are_docid_sorted_disjoint_ranges(packed_idx):
    rows = packed_idx.blocks.select(
        "term", "rsalt", "block_id", "first_doc_id", "last_doc_id"
    ).collect()
    by_term = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append(r)
    for term, rs in by_term.items():
        rs.sort(key=lambda r: (r["rsalt"], r["block_id"]))
        prev_last = -1
        for r in rs:
            assert r["first_doc_id"] > prev_last, term
            assert r["last_doc_id"] >= r["first_doc_id"]
            prev_last = r["last_doc_id"]


def test_packed_query_scores_match_flat(index, packed_idx):
    for terms, mode in [(["the"], "or"), (["run", "file"], "and"), (["error", "data"], "or")]:
        flat = sorted(
            tuple(r) for r in score_postings(index, terms, mode).collect()
        )
        packed = sorted(
            tuple(r) for r in score_postings(packed_idx, terms, mode).collect()
        )
        assert packed == flat, (terms, mode)


def test_packed_wand_topk(packed_idx, index):
    got = [
        (r["doc_id"], r["score"])
        for r in wand_topk(packed_idx, ["error", "data"], k=10, mode="or").collect()
    ]
    want_df = score_postings(index, ["error", "data"], "or")
    want = [
        (r["doc_id"], r["score"])
        for r in want_df.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10).collect()
    ]
    assert got == want


def test_packed_save_load_roundtrip(spark, packed_idx, index, tmp_path):
    path = str(tmp_path / "store")
    save_blocked(packed_idx, path, n_buckets=8)
    loaded = load_blocked_index(spark, path)
    assert loaded.stats.n_docs == index.stats.n_docs
    assert loaded.analyzer == "standard"
    terms = ["the", "error", "data"]
    assert _decoded(loaded, terms) == _decoded(packed_idx, terms)


@pytest.mark.parametrize("positions,wire", [(False, "raw"), (True, "raw"), (True, "varint")])
def test_stream_encode_identical_to_grouped(documents, positions, wire):
    """group_exec="stream" (repartition+sort+mapInPandas multi-group
    kernel) must produce BYTE-IDENTICAL block rows to the literal
    groupBy.applyInPandas form — same merge core, different framing."""
    a = build_blocked_direct(documents, positions=positions, wire=wire, group_exec="stream")
    b = build_blocked_direct(documents, positions=positions, wire=wire, group_exec="grouped")
    cols = ["term", "rsalt", "block_id", "n", "first_doc_id", "last_doc_id",
            "doc_ids", "tfs", "dls", "max_tfnorm"] + (["pos"] if positions else [])
    rows_a = sorted(tuple(bytes(x) if isinstance(x, (bytes, bytearray)) else x for x in r)
                    for r in a.blocks.select(*cols).collect())
    rows_b = sorted(tuple(bytes(x) if isinstance(x, (bytes, bytearray)) else x for x in r)
                    for r in b.blocks.select(*cols).collect())
    assert rows_a == rows_b
    assert a.stats == b.stats


def test_stream_encode_carry_across_tiny_batches(documents):
    """Groups spanning MANY Arrow batches: feed the stream kernel
    3-row batches so every nontrivial (term, rsalt) group crosses
    batch boundaries and the carry path runs repeatedly — output must
    equal the per-group kernel on the same sorted rows."""
    import pandas as pd

    from nexlt_spark.index.packed import (
        _SENTINEL,
        _emit_packed,
        _encode_packed,
        _encode_packed_stream,
        PACKED_SCHEMA,
    )
    from pyspark.sql import functions as F

    packed = documents.select("doc_id", "text").mapInPandas(
        _emit_packed("doc_id", "text", "standard", 4, False, "raw"),
        schema=PACKED_SCHEMA,
    )
    posts = packed.where(F.col("term") != _SENTINEL).toPandas()
    posts = posts.sort_values(["term", "rsalt"], kind="stable").reset_index(drop=True)

    stream = _encode_packed_stream(10.0, 16, False, "raw")
    grouped = _encode_packed(10.0, 16, False, "raw")

    def tiny_batches(n):
        for i in range(0, len(posts), n):
            yield posts.iloc[i : i + n].reset_index(drop=True)

    got = pd.concat(list(stream(tiny_batches(3))), ignore_index=True)
    want = pd.concat(
        [grouped(g.reset_index(drop=True)) for _, g in posts.groupby(["term", "rsalt"], sort=False)],
        ignore_index=True,
    )
    key = ["term", "rsalt", "block_id"]
    got = got.sort_values(key, kind="stable").reset_index(drop=True)
    want = want.sort_values(key, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
