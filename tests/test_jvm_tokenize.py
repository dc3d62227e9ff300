"""tokenizer='jvm': the pure-Catalyst emit must equal the Arrow kernel.

Output equivalence is exact (same posting rows, same sentinels, same
positions) — the two paths implement one tokenizer spec, so the index
they build is THE same index, and every downstream test transfers.
"""

import pytest
from pyspark.sql import functions as F

from nexlt_spark.index.build import build_index
from nexlt_spark.query.exact import bm25_topk
from nexlt_spark.query.model import Query


def _rows(df, positions=False):
    cols = ["term", "doc_id", "tf", "dl"] + (["positions"] if positions else [])
    out = []
    for r in df.select(*cols).collect():
        row = (r["term"], r["doc_id"], r["tf"], r["dl"])
        if positions:
            row += (tuple(r["positions"]) if r["positions"] is not None else None,)
        out.append(row)
    return sorted(out)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark spark join the JOIN Spark"),
        (1, "a b a b a c_d under_score splits"),
        (2, None),
        (3, ""),
        (4, "unicode Café café  числа 42 42"),
        (5, "punct, only!!! ..."),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jvm_emit_equals_arrow_emit(corpus):
    a = build_index(corpus, persist_raw=False)
    j = build_index(corpus, persist_raw=False, tokenizer="jvm")
    assert _rows(a.postings) == _rows(j.postings)
    assert sorted(map(tuple, a.doc_stats.collect())) == sorted(
        map(tuple, j.doc_stats.collect())
    )
    assert (a.stats.n_docs, a.stats.total_tokens) == (j.stats.n_docs, j.stats.total_tokens)


def test_jvm_positions_equal_arrow_positions(corpus):
    a = build_index(corpus, persist_raw=False, positions=True)
    j = build_index(corpus, persist_raw=False, positions=True, tokenizer="jvm")
    assert _rows(a.postings, positions=True) == _rows(j.postings, positions=True)


def test_jvm_rank_identity_on_real_fixture(documents):
    a = build_index(documents).persist()
    j = build_index(documents, tokenizer="jvm").persist()
    for q in (
        Query(terms=["spark", "join"], k=15),
        Query(terms=["the"], k=15),
        Query(terms=["run", "file"], mode="and", k=15),
    ):
        ra = [
            (r["doc_id"], round(r["score"], 9))
            for r in bm25_topk(a, documents, q).select("doc_id", "score").collect()
        ]
        rj = [
            (r["doc_id"], round(r["score"], 9))
            for r in bm25_topk(j, documents, q).select("doc_id", "score").collect()
        ]
        assert ra == rj


def test_jvm_plan_has_no_python(corpus):
    j = build_index(corpus, persist_raw=False, tokenizer="jvm")
    plan = j.postings._jdf.queryExecution().executedPlan().toString()
    for marker in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert marker not in plan


def test_jvm_rejects_nonstandard_chain(corpus):
    with pytest.raises(ValueError, match="standard"):
        build_index(corpus, tokenizer="jvm", analyzer="en_porter")
