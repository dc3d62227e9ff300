"""Thai dictionary segmenter (VERDICT r4 next #8): the shipped
longest-match lexicon chain must segment real Thai correctly, hold the
emit-kernel identity every chain must hold, and keep BM25 rank identity
vs the oracle; a real wordlist file variant is skipif-gated on
$NEXLT_THAI_WORDLIST."""

import os

import pandas as pd
import pytest

from nexlt_spark.analysis import ANALYZERS, batch_token_codes, tokenize
from nexlt_spark.segment import (
    THAI_STARTER_LEXICON,
    load_wordlist,
    longest_match_segmenter,
    register_thai,
    thai_chain,
)


@pytest.fixture()
def th_dict():
    name = register_thai("th_dict_test")
    yield name
    ANALYZERS.pop(name, None)


def test_starter_lexicon_segments_real_thai(th_dict):
    # everyday sentences segment into dictionary words, not bigrams
    assert tokenize("วันนี้ฉันไปโรงเรียนกับเพื่อน", th_dict) == [
        "วันนี้", "ฉัน", "ไป", "โรงเรียน", "กับ", "เพื่อน"
    ]
    assert tokenize("ผมกินข้าวแล้ว", th_dict) == ["ผม", "กิน", "ข้าว", "แล้ว"]
    # longest match wins: วันนี้ is one word, not วัน + นี้
    assert "วันนี้" in THAI_STARTER_LEXICON


def test_mixed_script_and_unknown_runs(th_dict):
    # non-Thai text tokenizes as standard lowercase runs alongside
    assert tokenize("ผมใช้ Spark กับ Thai123", th_dict) == [
        "ผม", "ใช้", "spark", "กับ", "thai123"
    ]
    # unknown Thai runs come out as ONE token (not char spray)
    toks = tokenize("ฤๅษีดัดตน", th_dict)
    assert toks == ["ฤๅษีดัดตน"]


def test_unknown_between_known_words(th_dict):
    # unknown run bounded by dictionary words on both sides
    toks = tokenize("ผมฤๅษีกิน", th_dict)
    assert toks == ["ผม", "ฤๅษี", "กิน"]


def test_emit_kernel_identity(th_dict):
    """The vectorized batch path must segment exactly like tokenize()."""
    rows = [
        (0, "วันนี้ฉันไปโรงเรียน"),
        (1, "ผมกินข้าวกับเพื่อน"),
        (2, "spark test no thai"),
        (3, ""),
    ]
    texts = pd.Series([t for _, t in rows])
    doc_idx, codes, uniques, lens = batch_token_codes(texts, ANALYZERS[th_dict])
    per_doc = [[] for _ in rows]
    for di, c in zip(doc_idx, codes):
        per_doc[di].append(uniques[c])
    assert per_doc == [tokenize(t, th_dict) for _, t in rows]
    assert list(lens) == [len(x) for x in per_doc]


def test_rank_identity_vs_oracle(spark, th_dict):
    from nexlt_spark.index.build import build_index
    from nexlt_spark.oracle import OracleIndex
    from nexlt_spark.query.exact import bm25_topk
    from nexlt_spark.query.model import Query

    rows = [
        (0, "วันนี้ฉันไปโรงเรียนกับเพื่อน"),
        (1, "เพื่อนของฉันกินข้าวที่บ้าน"),
        (2, "ผมอ่านหนังสือภาษาไทย"),
        (3, "spark index test"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(docs, analyzer=th_dict).persist()
    for terms in (["เพื่อน"], ["ฉัน", "ข้าว"], ["หนังสือ"]):
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in bm25_topk(idx, docs, Query(terms=terms, k=10))
            .select("doc_id", "score")
            .collect()
        ]
        oracle = OracleIndex([r.asDict() for r in docs.collect()], analyzer=th_dict)
        want = [(d, round(s, 9)) for d, s in oracle.topk(Query(terms=terms, k=10))]
        assert got == want, terms


def test_wordlist_loader(tmp_path):
    p = tmp_path / "words.txt"
    p.write_text("# comment\nมะม่วง\n\nส้มตำ\n", encoding="utf-8")
    words = load_wordlist(str(p))
    assert words == frozenset({"มะม่วง", "ส้มตำ"})
    chain = thai_chain(wordlist_path=str(p))
    assert chain.segmenter("ผมกินส้มตำ") == ["ผม", "กิน", "ส้มตำ"]


def test_empty_lexicon_rejected():
    with pytest.raises(ValueError):
        longest_match_segmenter([])


@pytest.mark.skipif(
    not os.environ.get("NEXLT_THAI_WORDLIST")
    or not os.path.exists(os.environ.get("NEXLT_THAI_WORDLIST", "")),
    reason="real Thai wordlist not present (set NEXLT_THAI_WORDLIST)",
)
def test_real_wordlist_rank_identity(spark):
    """With a full public dictionary mounted, the same invariants hold
    (the out-of-the-box chain just gets better recall)."""
    name = register_thai("th_dict_full", os.environ["NEXLT_THAI_WORDLIST"])
    try:
        from nexlt_spark.index.build import build_index
        from nexlt_spark.oracle import OracleIndex
        from nexlt_spark.query.exact import bm25_topk
        from nexlt_spark.query.model import Query

        rows = [(0, "วันนี้อากาศดีมาก"), (1, "ฉันชอบกินอาหารไทย")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        idx = build_index(docs, analyzer=name).persist()
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in bm25_topk(idx, docs, Query(terms=["อาหาร"], k=10))
            .select("doc_id", "score")
            .collect()
        ]
        oracle = OracleIndex([r.asDict() for r in docs.collect()], analyzer=name)
        want = [
            (d, round(s, 9)) for d, s in oracle.topk(Query(terms=["อาหาร"], k=10))
        ]
        assert got == want
    finally:
        ANALYZERS.pop("th_dict_full", None)
