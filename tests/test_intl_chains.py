"""Arabic / Russian / Japanese chains (text_ar, text_ru, text_ja analogs).

Same contract as the European light chains (stemmer_light docstring):
inflection groups collapse to one key, index and query share the exact
function, rank identity vs the pure-Python oracle. Kuromoji parity for
ja_seg is explicitly NOT claimed (dictionary-less approximation —
analysis.py ja_seg comment block).
"""

import pytest

from nexlt_spark.analysis import ANALYZERS, ja_stream, tokenize
from nexlt_spark.stemmer_light import (
    arabic_light_stem,
    arabic_normalize,
    russian_light_stem,
)

AR_GROUPS = [
    ["كتاب", "الكتاب", "كتابه", "والكتاب"],  # book: bare/definite/possessive/conj
    ["معلم", "المعلم", "معلمون", "معلمين", "معلمة"],  # teacher + plurals/fem
    ["مدرسة", "المدرسة", "مدرسات"],  # school (teh marbuta) + sound plural
]

RU_GROUPS = [
    ["книга", "книги", "книгу", "книгой", "книгах", "книгами"],
    ["перевод", "переводы", "переводов", "переводам", "переводами"],
    ["новый", "новая", "новое", "новые", "нового", "новыми"],
    ["ёлка", "елка", "елки"],  # ё folding
]


@pytest.mark.parametrize("group", AR_GROUPS, ids=lambda g: g[0])
def test_arabic_groups_collapse(group):
    assert len({arabic_light_stem(w) for w in group}) == 1


@pytest.mark.parametrize("group", RU_GROUPS, ids=lambda g: g[0])
def test_russian_groups_collapse(group):
    assert len({russian_light_stem(w) for w in group}) == 1


def test_arabic_normalization_folds():
    # alef variants + maksura + teh marbuta + diacritics/tatweel
    assert arabic_normalize("أَلْكِتَاب") == "الكتاب"
    assert arabic_normalize("إمام") == arabic_normalize("امام")
    assert arabic_normalize("مصطفى")[-1] == "ي"
    assert arabic_normalize("كـــتاب") == "كتاب"


def test_unrelated_stay_apart():
    assert arabic_light_stem("كتاب") != arabic_light_stem("قلم")
    assert russian_light_stem("книга") != russian_light_stem("нога")
    assert russian_light_stem("стол") != russian_light_stem("стул")


def test_ja_katakana_stem_rule():
    # JapaneseKatakanaStemFilter: drop ONE trailing ー at len >= 4 only
    assert tokenize("コンピューター", "ja_seg") == ["コンピュータ"]
    assert tokenize("ソニー", "ja_seg") == ["ソニー"]  # len 3: kept
    assert tokenize("タワー", "ja_seg") == ["タワー"]  # len 3: kept
    # halfwidth katakana folds via NFKC (the CJKWidthFilter step)
    assert tokenize("ｺﾝﾋﾟｭｰﾀ", "ja_seg") == ["コンピュータ"]


def test_ja_scripts_bigram_separately():
    # han and hiragana runs never merge into one bigram stream
    assert tokenize("日本語の文書です", "ja_seg") == ["日本", "本語", "の", "文書", "です"]
    # lone kanji passes through; romaji lowercases as maximal runs
    assert tokenize("本", "ja_seg") == ["本"]
    assert tokenize("東京タワーはTokyo Towerです", "ja_seg") == [
        "東京", "タワー", "は", "tokyo", "tower", "です"
    ]


def test_ja_stream_is_pure_stream_map():
    # chain registered as a pure stream chain → the batch emit kernels'
    # vectorized path (analysis.batch_token_codes) applies
    spec = ANALYZERS["ja_seg"]
    assert spec.token_map is None and spec.stream_map is ja_stream


def test_registry_complete():
    for name in ("ar_light", "ru_light", "ja_seg", "th_bigram"):
        assert name in ANALYZERS


def test_th_bigrams_runs():
    # Thai runs -> overlapping char bigrams; non-Thai passes through
    assert tokenize("ภาษาไทย", "th_bigram") == ["ภา", "าษ", "ษา", "าไ", "ไท", "ทย"]
    assert tokenize("ก", "th_bigram") == ["ก"]  # lone char passes whole
    assert tokenize("Spark กับ Python", "th_bigram") == [
        "spark", "กั", "ับ", "python"
    ]


def test_chain_equals_mapped_standard_chain():
    text = "الكتاب الجديد"
    assert tokenize(text, "ar_light") == [arabic_light_stem(t) for t in tokenize(text)]
    text = "Новые переводы"
    assert tokenize(text, "ru_light") == [russian_light_stem(t) for t in tokenize(text)]


@pytest.fixture(scope="module")
def intl_corpus(spark):
    rows = [
        (0, "الكتاب الجديد في المدرسة"),
        (1, "كتاب قديم عن التاريخ"),
        (2, "موضوع آخر لا علاقة له"),
        (3, "новые переводы книги готовы"),
        (4, "перевод старой книги"),
        (5, "совсем другая тема"),
        (6, "コンピューターで日本語の文書を作成"),
        (7, "コンピュータと機械学習の話"),
        (8, "全く関係ない話題"),
        (9, "ภาษาไทยสวยงาม"),
        (10, "เรียนภาษาอังกฤษ"),
        (11, "อากาศดีมาก"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize(
    "analyzer,query,want_docs",
    [
        ("ar_light", ["والكتاب"], {0, 1}),      # conj+definite form reaches both books
        ("ru_light", ["переводами"], {3, 4}),   # instrumental plural reaches both
        ("ja_seg", ["コンピューター"], {6, 7}),  # ー-stem merges both spellings
        ("th_bigram", ["ภาษา"], {9, 10}),        # shared bigrams, no segmentation
    ],
)
def test_intl_end_to_end_rank_identity(intl_corpus, analyzer, query, want_docs):
    """Index with the chain; an inflected query reaches docs containing
    only other surface forms, and engine ranks == pure-Python oracle."""
    from nexlt_spark.index.build import build_index
    from nexlt_spark.oracle import OracleIndex
    from nexlt_spark.query.exact import bm25_topk
    from nexlt_spark.query.model import Query

    idx = build_index(intl_corpus, analyzer=analyzer).persist()
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_topk(idx, intl_corpus, Query(terms=query, k=10))
        .select("doc_id", "score")
        .collect()
    ]
    assert {d for d, _ in got} == want_docs
    rows = [r.asDict() for r in intl_corpus.collect()]
    oracle = OracleIndex(rows, analyzer=analyzer)
    want = [(d, round(s, 9)) for d, s in oracle.topk(Query(terms=query, k=10))]
    assert got == want


# ---- pluggable dictionary-tokenizer slot (Chain.segmenter, r4) ------------


def _toy_ja_segmenter(vocab):
    """Greedy longest-match over a toy dictionary — the shape a real
    Kuromoji/ICU binding plugs into Chain.segmenter. Characters outside
    any dictionary word fall back to single-token emission (if they are
    word characters at all)."""
    from nexlt_spark.analysis import TOKEN_RE

    maxlen = max(map(len, vocab))

    def seg(text):
        out, i, n = [], 0, len(text)
        while i < n:
            for ln in range(min(maxlen, n - i), 0, -1):
                w = text[i : i + ln]
                if w in vocab:
                    out.append(w)
                    i += ln
                    break
            else:
                if TOKEN_RE.match(text[i]):
                    out.append(text[i])
                i += 1
        return out

    return seg


def test_dictionary_segmenter_chain_rank_identity(spark):
    """register_analyzer + Chain.segmenter: a dictionary-backed chain is
    a first-class analyzer — index build, query analysis, and the oracle
    all segment identically (index/query symmetry ⇒ BM25 rank identity),
    proving the Kuromoji/ICU/Stempel integration point works end-to-end."""
    from nexlt_spark.analysis import (
        ANALYZERS,
        Chain,
        batch_token_codes,
        register_analyzer,
        tokenize,
    )
    from nexlt_spark.index.build import build_index
    from nexlt_spark.oracle import OracleIndex
    from nexlt_spark.query.exact import bm25_topk
    from nexlt_spark.query.model import Query

    vocab = {"東京", "大学", "研究", "データ", "解析", "京大"}
    seg = _toy_ja_segmenter(vocab)
    register_analyzer("ja_toy_dict", Chain(segmenter=seg), overwrite=True)
    try:
        # segmentation is longest-match, not bigram: 東京大学 → 東京, 大学
        assert tokenize("東京大学でデータ解析", "ja_toy_dict") == [
            "東京", "大学", "で", "データ", "解析"
        ]
        rows = [
            (0, "東京大学でデータ解析の研究"),
            (1, "大学の研究データ"),
            (2, "全然関係ない話"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        idx = build_index(docs, analyzer="ja_toy_dict").persist()
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in bm25_topk(idx, docs, Query(terms=["研究"], k=10))
            .select("doc_id", "score")
            .collect()
        ]
        oracle = OracleIndex([r.asDict() for r in docs.collect()], analyzer="ja_toy_dict")
        want = [(d, round(s, 9)) for d, s in oracle.topk(Query(terms=["研究"], k=10))]
        assert got == want and {d for d, _ in got} == {0, 1}
        # emit-kernel identity: the vectorized batch path segments the
        # same way as tokenize() (the invariant every chain must hold)
        import pandas as pd

        texts = pd.Series([t for _, t in rows])
        doc_idx, codes, uniques, lens = batch_token_codes(
            texts, ANALYZERS["ja_toy_dict"]
        )
        per_doc = [[] for _ in rows]
        for di, c in zip(doc_idx, codes):
            per_doc[di].append(uniques[c])
        assert per_doc == [tokenize(t, "ja_toy_dict") for _, t in rows]
        assert list(lens) == [len(x) for x in per_doc]
    finally:
        ANALYZERS.pop("ja_toy_dict", None)


def test_register_analyzer_guards_clobber():
    import pytest as _pytest

    from nexlt_spark.analysis import ANALYZERS, Chain, register_analyzer

    with _pytest.raises(ValueError, match="already registered"):
        register_analyzer("standard", Chain())
    assert "standard" in ANALYZERS
