"""European light-stemmer chains (text_de/fr/es/it/pt analogs).

The contract these chains must satisfy (stemmer_light docstring): every
inflection group collapses to ONE key, the same function runs on index
and query side, and elided articles vanish. Char-level Lucene parity is
explicitly not claimed — group-collapse is what retrieval behavior
depends on.
"""

import pytest

from nexlt_spark.analysis import ANALYZERS, tokenize
from nexlt_spark.stemmer_light import (
    french_light_stem,
    german_light_stem,
    italian_light_stem,
    portuguese_light_stem,
    spanish_light_stem,
)

# groups of surface forms that must share a stem key
GROUPS = {
    german_light_stem: [
        ["haus", "hauses", "häuser", "häusern"],
        ["kind", "kindes", "kinder", "kindern"],
        ["leitung", "leitungen"],
        ["straße", "strasse", "straßen"],
        ["übersetzung", "uebersetzung", "übersetzungen"],
    ],
    french_light_stem: [
        ["cheval", "chevaux"],
        ["traduction", "traductions"],
        ["porte", "portes", "porté", "portée", "portées"],
        ["général", "générale", "généraux"],
    ],
    spanish_light_stem: [
        ["perro", "perra", "perros", "perras"],
        ["traduccion", "traducción", "traducciones"],
        ["luz", "luces"],
        ["clase", "clases"],
    ],
    italian_light_stem: [
        ["numero", "numeri"],
        ["portato", "portata", "portati", "portate"],
        ["stazione", "stazioni"],
        ["traduzione", "traduzioni"],
    ],
    portuguese_light_stem: [
        ["livro", "livros", "livra", "livras"],
        ["nação", "nações"],
        ["animal", "animais"],
        ["flor", "flores"],
        ["tradução", "traduções"],
    ],
}


@pytest.mark.parametrize(
    "stem,group",
    [(s, g) for s, gs in GROUPS.items() for g in gs],
    ids=lambda v: v[0] if isinstance(v, list) else getattr(v, "__name__", str(v)),
)
def test_inflection_groups_collapse(stem, group):
    keys = {stem(w) for w in group}
    assert len(keys) == 1, f"{group} -> {sorted(stem(w) for w in group)}"


def test_unrelated_words_stay_apart():
    for stem, pairs in {
        german_light_stem: [("haus", "maus"), ("kind", "wind")],
        spanish_light_stem: [("gato", "pato"), ("luz", "cruz")],
        french_light_stem: [("cheval", "journal")],
    }.items():
        for a, b in pairs:
            assert stem(a) != stem(b)


def test_french_elision_dropped():
    toks = tokenize("L'article de l'École jusqu'au matin", "fr_light")
    assert "l" not in toks and "jusqu" not in toks
    assert french_light_stem("article") in toks


def test_italian_elision_dropped():
    toks = tokenize("l'acqua dell'arte", "it_light")
    assert "l" not in toks and "dell" not in toks


def test_registry_complete():
    for name in ("de_light", "fr_light", "es_light", "it_light", "pt_light"):
        assert name in ANALYZERS


def test_chain_equals_mapped_standard_chain():
    # same invariant the Porter chain test asserts: chain ≡ stem(standard)
    text = "Die Übersetzungen der Häuser"
    assert tokenize(text, "de_light") == [
        german_light_stem(t) for t in tokenize(text)
    ]


def test_german_normalization_digraphs():
    # ue folds after consonant, survives after q/vowel
    assert german_light_stem("fuer") == german_light_stem("für")
    assert german_light_stem("quelle") == german_light_stem("quelle")
    assert german_light_stem("neue")[:3] == "neu"


@pytest.fixture(scope="module")
def de_corpus(spark):
    rows = [
        (0, "die Übersetzungen der Bücher sind fertig"),
        (1, "eine Übersetzung des Buches"),
        (2, "völlig anderes Thema ohne Bezug"),
        (3, "die Häuser und das Haus"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_de_light_end_to_end(de_corpus):
    """Index with de_light; an inflected query must reach docs that only
    contain other surface forms of the same lemma, and rank must agree
    with the pure-Python oracle on the same chain."""
    from nexlt_spark.index.build import build_index
    from nexlt_spark.oracle import OracleIndex
    from nexlt_spark.query.exact import bm25_topk
    from nexlt_spark.query.model import Query

    idx = build_index(de_corpus, analyzer="de_light").persist()
    got = bm25_topk(idx, de_corpus, Query(terms=["übersetzung"], k=10))
    ids = [r["doc_id"] for r in got.select("doc_id").collect()]
    assert set(ids) == {0, 1}

    rows = [r.asDict() for r in de_corpus.collect()]
    oracle = OracleIndex(rows, analyzer="de_light")
    want = [
        (d, round(s, 9))
        for d, s in oracle.topk(Query(terms=["übersetzung"], k=10))
    ]
    have = [
        (r["doc_id"], round(r["score"], 9))
        for r in got.select("doc_id", "score").collect()
    ]
    assert have == want
