"""Analyzer chains (Porter variant), synonyms, highlighting, exports.

The Porter chain must preserve the engine⇔oracle rank-identity contract
exactly as the standard chain does (same-function-both-sides, Q7).
"""

import pytest
from pyspark.sql import functions as F

from nexlt_spark.analysis import tokenize
from nexlt_spark.index.build import build_index
from nexlt_spark.oracle import OracleIndex
from nexlt_spark.ops.export import MOSES_DELIM, export_moses, export_tsv
from nexlt_spark.query.enrich import expand_synonyms, highlight, parse_synonyms
from nexlt_spark.query.exact import bm25_topk
from nexlt_spark.query.model import Query
from nexlt_spark.stemmer import porter_stem

VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "motoring": "motor",
    "sing": "sing", "conflated": "conflat", "sized": "size", "hopping": "hop",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "digitizer": "digit", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "electriciti": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "adjustable": "adjust", "defensible": "defens",
    "replacement": "replac", "adoption": "adopt", "activate": "activ",
    "effective": "effect", "probate": "probat", "rate": "rate", "controll": "control",
    "roll": "roll", "happy": "happi", "sky": "sky",
}


def test_porter_vectors():
    got = {w: porter_stem(w) for w in VECTORS}
    assert got == VECTORS


def test_porter_chain_is_stemmed_standard_chain():
    text = "The operators were RUNNING conditional queries happily"
    assert tokenize(text, "en_porter") == [porter_stem(t) for t in tokenize(text)]


@pytest.fixture(scope="module")
def stem_docs(spark):
    rows = [
        (0, "the runner was running many runs daily"),
        (1, "she runs a running club"),
        (2, "completely unrelated lexicon entry"),
        (3, "operators operate operational machinery"),
        (4, "run"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


@pytest.fixture(scope="module")
def stem_index(stem_docs):
    return build_index(stem_docs, analyzer="en_porter").persist()


@pytest.fixture(scope="module")
def stem_oracle(stem_docs):
    return OracleIndex([r.asDict() for r in stem_docs.collect()], analyzer="en_porter")


def test_stemming_match_and_rank_identity(stem_docs, stem_index, stem_oracle):
    """Q7: 'running' matches run/runs/runner docs; ranks ≡ oracle."""
    for terms in (["running"], ["operated"], ["runs", "operator"]):
        q = Query(terms=terms, k=10)
        got = [
            (r["doc_id"], r["score"])
            for r in bm25_topk(stem_index, stem_docs, q).select("doc_id", "score").collect()
        ]
        assert got == stem_oracle.topk(q), terms
    # stems actually unify: 'running' reaches every run-family doc
    ids = {d for d, _ in stem_oracle.topk(Query(terms=["running"], k=10))}
    assert {0, 1, 4} <= ids


def test_analyzer_recorded_on_index(stem_index):
    assert stem_index.analyzer == "en_porter"


def test_standard_chain_unchanged(stem_docs):
    idx = build_index(stem_docs)
    assert idx.analyzer == "standard"
    # standard chain: 'running' only matches the literal token
    rows = idx.postings.where(F.col("term") == "running").collect()
    assert {r["doc_id"] for r in rows} == {0, 1}


# ---------------------------------------------------------------------------
# synonyms (Q6)
# ---------------------------------------------------------------------------

SYN_LINES = [
    "# comment",
    "GB, gib, gigabyte, gigabytes",
    "MB => megabyte, megabytes",
    "Television, TV",
]


def test_parse_synonyms_formats():
    m = parse_synonyms(SYN_LINES)
    assert m["gb"] == ["gb", "gib", "gigabyte", "gigabytes"]
    assert m["gigabyte"] == ["gb", "gib", "gigabyte", "gigabytes"]
    assert m["mb"] == ["megabyte", "megabytes"]  # one-way mapping
    assert "megabyte" not in m
    assert m["tv"] == ["television", "tv"]


def test_expand_synonyms():
    m = parse_synonyms(SYN_LINES)
    assert expand_synonyms(["gb", "other"], m) == [
        "gb", "gib", "gigabyte", "gigabytes", "other",
    ]
    # '=>' mapping REPLACES the LHS token (SynonymFilterFactory semantics):
    # a query for 'mb' matches megabyte/megabytes docs, not literal 'mb'
    assert expand_synonyms(["mb"], m) == ["megabyte", "megabytes"]


def test_synonym_query_reaches_synonym_docs(spark):
    rows = [
        (0, "drive capacity one gigabyte exactly"),
        (1, "drive capacity one gb exactly"),
        (2, "drive capacity unknown"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(docs)
    m = parse_synonyms(SYN_LINES)
    q = Query(terms=expand_synonyms(["gb"], m), mode="or", k=10)
    ids = {r["doc_id"] for r in bm25_topk(idx, docs, q).collect()}
    assert ids == {0, 1}


# ---------------------------------------------------------------------------
# highlighting (Q9)
# ---------------------------------------------------------------------------


def test_highlight_wraps_and_fragments(spark):
    long_tail = " filler" * 60
    rows = [
        (0, "alpha beta gamma" + long_tail),
        (1, ("pad " * 50) + "the target word here" + long_tail),
        (2, "no match at all in this one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["snippet"] for r in highlight(df, ["target", "beta"], fragsize=60).collect()}
    assert "<em>beta</em>" in out[0]
    assert "<em>target</em>" in out[1]  # fragment window reached a deep match
    assert "<em>" not in out[2] and out[2].startswith("no match")
    assert all(len(s) <= 60 + 2 * len("<em></em>") + 10 for s in out.values())


def test_highlight_case_insensitive_word_boundary(spark):
    df = spark.createDataFrame(
        [(0, "Targets TARGET targeting target")], "doc_id long, text string"
    )
    s = highlight(df, ["target"], fragsize=200).collect()[0]["snippet"]
    assert s.count("<em>") == 2  # TARGET + target; not Targets/targeting
    assert "<em>TARGET</em>" in s and "<em>target</em>" in s


# ---------------------------------------------------------------------------
# export sinks (S6/S9)
# ---------------------------------------------------------------------------


def test_export_moses_roundtrip(spark, tmp_path):
    rows = [(0, "hello world", "user"), (1, "second row", None)]
    df = spark.createDataFrame(rows, "doc_id long, text string, role string")
    p = str(tmp_path / "moses")
    export_moses(df, p, ["text", "role", "doc_id"], compression=None)
    back = sorted(r["value"] for r in spark.read.text(p).collect())
    assert back == sorted([f"hello world{MOSES_DELIM}user{MOSES_DELIM}0",
                           f"second row{MOSES_DELIM}{MOSES_DELIM}1"])


def test_export_tsv_roundtrip(spark, tmp_path):
    rows = [(0, "clean text", "en"), (1, "tab\there nl\nthere", "fr")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    p = str(tmp_path / "tsv")
    export_tsv(df, p)
    back = spark.read.option("sep", "\t").option("header", True).csv(p)
    got = sorted(tuple(r) for r in back.collect())
    assert got == [("0", "clean text", "en"), ("1", "tab here nl there", "fr")]


# -- S5: positional-array record decode ------------------------------------


def test_positional_to_records(spark):
    """Header-defined field order, by-index projection, short rows → NULL
    (the Perl reader's undef for missing trailing props)."""
    from nexlt_spark.ops.ingest import positional_to_records

    header = ["id", "src", "trn", "state"]
    rows = [
        (1, ["s1", "hello", "hallo", "translated"]),
        (2, ["s2", "bye", "tschuess"]),  # short row: state missing
    ]
    df = spark.createDataFrame(rows, "rec long, vals array<string>")
    out = positional_to_records(df, "vals", header)
    got = {r["rec"]: (r["id"], r["src"], r["trn"], r["state"]) for r in out.collect()}
    assert got[1] == ("s1", "hello", "hallo", "translated")
    assert got[2] == ("s2", "bye", "tschuess", None)
    assert out.columns == ["rec", "id", "src", "trn", "state"]


# ---------------------------------------------------------------------------
# CJK bigram chain (schema.xml:501-510 text_cjk analog)
# ---------------------------------------------------------------------------


def test_cjk_bigram_tokenize_semantics():
    assert tokenize("日本語", "cjk_bigram") == ["日本", "本語"]
    assert tokenize("日", "cjk_bigram") == ["日"]  # lone CJK char passes through
    assert tokenize("spark 日本 engine", "cjk_bigram") == ["spark", "日本", "engine"]
    # mixed script inside one string: runs bigram independently
    assert tokenize("日本spark語言", "cjk_bigram") == ["日本", "spark", "語言"]
    # hangul + katakana ranges participate
    assert tokenize("한국어", "cjk_bigram") == ["한국", "국어"]
    assert tokenize("カタカナ", "cjk_bigram") == ["カタ", "タカ", "カナ"]
    # width/compat forms normalize first (NFKC = the CJKWidthFilter step)
    assert tokenize("ｶﾀｶﾅ", "cjk_bigram") == tokenize("カタカナ", "cjk_bigram")
    # standard chain on the same input: each CJK char in one big run
    assert tokenize("日本語") == ["日本語"]


def test_cjk_udf_matches_pure_tokenizer(spark):
    from nexlt_spark.analysis import tokenize_udf_col

    texts = [
        "日本語のテスト data", "spark 引擎 测试 query", "한국어 검색 엔진",
        "no cjk at all", "語", "ﾊﾝｶｸ ｶﾀｶﾅ and ascii", "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r["i"]: list(r["toks"])
        for r in df.select("i", tokenize_udf_col(F.col("text"), "cjk_bigram").alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == tokenize(t, "cjk_bigram"), t


@pytest.fixture(scope="module")
def cjk_docs(spark):
    rows = [
        (0, "日本語の検索エンジン"),
        (1, "検索 engine with 日本語 support"),
        (2, "中文搜索引擎测试"),
        (3, "plain english document about search"),
        (4, "한국어 검색"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_cjk_rank_identity_and_phrase(cjk_docs):
    idx = build_index(cjk_docs, analyzer="cjk_bigram", positions=True).persist()
    oracle = OracleIndex([r.asDict() for r in cjk_docs.collect()], analyzer="cjk_bigram")
    for q in [
        Query(terms=["日本語"], k=10),   # analyzed to bigrams 日本+本語
        Query(terms=["検索"], k=10),
        Query(phrase="日本語", k=10),    # adjacency of 日本,本語 via positions
        Query(terms=["english"], k=10),
    ]:
        got = [
            (r["doc_id"], r["score"])
            for r in bm25_topk(idx, cjk_docs, q).select("doc_id", "score").collect()
        ]
        want = oracle.topk(q)
        assert [d for d, _ in got] == [d for d, _ in want], q
    # the phrase reaches exactly the docs containing 日本語 contiguously
    ph = {d for d, _ in oracle.topk(Query(phrase="日本語", k=10))}
    assert ph == {0, 1}
